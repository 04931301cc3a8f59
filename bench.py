#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs each headline query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "spread": {name: [min, max]}, "sf": ...}.

Noise resistance (round 3): each query is timed REPS times after the
warm-up pass and the reported per-query number is the MEDIAN; the
min/max spread is recorded alongside so a contention-skewed run is
visible in the artifact instead of silently moving the gate (the
round-2 bench read 2.0x baseline from machine load alone with zero
code change — VERDICT.md r2).

Each query is materialized through the noop sink: full computation on
the executors, no driver-side collect skewing the numbers.

Self-calibration (round 11): this VM's wall-clock drifts 20-45%
between sessions with zero code change (BASELINE.md r10; VERDICT r10
"Performance vs baseline"), so every raw total needed a hand-written
drift note to interpret. The bench times a FROZEN synthetic
reference job (pure spark.range -> join -> agg, no file I/O, no
engine code — its source must never change) and emits both the raw
total and a drift-normalized total:

    drift_factor     = median(probe_sec) / CALIBRATION_REF_SEC
    normalized_total = value / drift_factor

CALIBRATION_REF_SEC was frozen in round 11 as the median of five
independent measurements on the round-11 session (0.50-0.70 s
observed). Normalized totals are therefore comparable across
sessions in round-11 ambient units.

Interleaved calibration (round 15): the round-14 artifact proved a
single up-front calibration cannot represent BURSTY load — it read
drift 0.778 (a momentarily fast box) while zero-code-diff queries
inflated 20-65%, on a session whose drift swung 0.90→2.37 between
back-to-back runs (VERDICT r14 directive #1). The probe is now
INTERLEAVED through the measurement loop — one single-shot probe
after every third headline query in every repetition — and the
artifact reports the MEDIAN drift across all probes plus the
per-probe spread (`calibration_probes`, `drift_spread`). A run
whose drift_spread is wide (e.g. [0.8, 2.0]) is self-evidently
bursty and its normalized total should be read with that spread,
not as a point estimate; a tight spread certifies the median. The
frozen job itself and CALIBRATION_REF_SEC are unchanged — only the
sampling schedule moved.

Per-query drift adjudication (round 16): the r15 artifact exposed
run-wide burstiness but left individual movers (pricing_summary
0.99→1.35 on a zero-diff path) to judge forensics. Each sample and
each probe now carries a monotonic timestamp; a sample's LOCAL drift
is the time-interpolation of the two nearest probes over
CALIBRATION_REF_SEC, and the artifact reports per-query
`local_drift` (median of its samples' local drifts) and
`normalized_queries` (median of sample/local-drift). When a previous
round's BENCH_r*.json is present in CWD, `verdicts` machine-annotates
each query against it: raw within ±15% → flat (improved below 0.85);
raw above +15% but locally-normalized within +15% → ambient (the
movement is the box, measured at that sample's moment); both above
+15% → regressed. The verdict rule is mechanical on purpose — it
replaces the human cross-referencing of movers against drift_spread,
not the judge's final read.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "multihop_revenue",
    "top_orders_per_customer",
    "grouped_result_mix",
    "diff_city_short_time",
    # brute_force_candidates was folded into brute_force_hits in round 3
    # (driver 50-query cap); the hits query now times both stages.
    "brute_force_hits",
    "fraud_report",
    "user_sessions",
    "amount_zscore_outliers",
    "dedup_exact_survivors",
    "text_quality_stats",
    "ann_cosine_topk",
]

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

#: Frozen round-11 reference wall time of _calibration_job (median of
#: five session measurements; see module docstring). Do NOT re-measure
#: or edit when the machine changes speed — that is the drift this
#: constant exists to expose.
CALIBRATION_REF_SEC = 0.60
#: Headline queries between interleaved single-shot probes (round 15).
CALIBRATION_EVERY = 3


def _calibration_job(spark) -> None:
    """FROZEN synthetic reference job — ambient-speed yardstick.

    Pure in-memory shape (range scan -> modulo project -> broadcastable
    join -> two-phase hash aggregate) exercising codegen, shuffle and
    the noop sink with zero file I/O and zero engine code, so its wall
    time moves ONLY with machine speed. Never edit this function: every
    BENCH artifact since round 11 is normalized against its frozen
    reference time.
    """
    from pyspark.sql import functions as F

    fact = spark.range(0, 48_000_000, 1, 32).select(
        (F.col("id") % 9973).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    dim = spark.range(0, 9973).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    (
        fact.join(dim, "k")
        .groupBy("k")
        .agg(F.sum("v").alias("sv"), F.max("w").alias("mw"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def _probe(spark) -> float:
    """One single-shot timing of the frozen calibration job."""
    t0 = time.perf_counter()
    _calibration_job(spark)
    return time.perf_counter() - t0


def _drift_at(t: float, probe_events: list[tuple[float, float]]) -> float:
    """Ambient drift at monotonic time `t`: linear interpolation of
    the two probes bracketing `t` (nearest probe when `t` is outside
    the probed span), over CALIBRATION_REF_SEC."""
    before = [(pt, s) for pt, s in probe_events if pt <= t]
    after = [(pt, s) for pt, s in probe_events if pt > t]
    if before and after:
        (t0, s0), (t1, s1) = before[-1], after[0]
        sec = s0 + (s1 - s0) * ((t - t0) / (t1 - t0)) if t1 > t0 else s0
    else:
        sec = (before or after)[-1 if before else 0][1]
    return sec / CALIBRATION_REF_SEC


def _previous_artifact_queries() -> dict | None:
    """Parsed payload (queries / spread / normalized_queries) from the
    newest BENCH_r*.json beside this script, if any — the comparison
    base for machine verdicts."""
    import glob
    import re

    best_n, best = -1, None
    for path in glob.glob(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")
    ):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
        except (OSError, ValueError):
            continue
        if parsed.get("queries") and int(m.group(1)) > best_n:
            best_n, best = int(m.group(1)), parsed
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf

    from etl_process_for_fraud_transactions_spark.plans import QUERIES
    from etl_process_for_fraud_transactions_spark.session import get_spark

    spark = get_spark("etl-fraud-bench")
    # Warm-up: run each headline plan once at the smallest SF so
    # whole-stage codegen compiles and the JVM JIT warms before
    # measurement (identical plan shapes -> Janino cache hits). The
    # reported numbers are steady-state wall times at the target SF.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            if name in QUERIES:
                QUERIES[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()

    # Discarded calibration warm-up (JIT/codegen for the probe shape),
    # then one opening probe so the run starts with a sample.
    _calibration_job(spark)
    probe_events: list[tuple[float, float]] = []  # (mono midpoint, sec)

    def probe_now() -> None:
        t0 = time.perf_counter()
        sec = _probe(spark)
        probe_events.append((t0 + sec / 2, sec))

    probe_now()

    samples: dict[str, list[float]] = {name: [] for name in HEADLINE if name in QUERIES}
    sample_times: dict[str, list[float]] = {name: [] for name in samples}
    # round-robin the repetitions (A,B,C,A,B,C — not A,A,A,B,B,B) so a
    # transient load spike inflates at most one sample of each query;
    # a single-shot calibration probe fires every CALIBRATION_EVERY
    # queries so the drift estimate samples the SAME ambient conditions
    # the query timings saw (r15 directive #1 — one up-front probe
    # misread a bursty box in r14).
    since_probe = 0
    for _ in range(max(REPS, 1)):
        for name in samples:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dur = time.perf_counter() - t0
            samples[name].append(dur)
            sample_times[name].append(t0 + dur / 2)
            since_probe += 1
            if since_probe >= CALIBRATION_EVERY:
                probe_now()
                since_probe = 0
    probes = [sec for _, sec in probe_events]

    timings = {name: round(statistics.median(ts), 3) for name, ts in samples.items()}
    spread = {
        name: [round(min(ts), 3), round(max(ts), 3)] for name, ts in samples.items()
    }
    total = round(sum(timings.values()), 3)
    calibration_sec = round(statistics.median(probes), 3)
    drift = (
        round(calibration_sec / CALIBRATION_REF_SEC, 3)
        if CALIBRATION_REF_SEC
        else None
    )
    drift_spread = (
        [
            round(min(probes) / CALIBRATION_REF_SEC, 3),
            round(max(probes) / CALIBRATION_REF_SEC, 3),
        ]
        if CALIBRATION_REF_SEC
        else None
    )
    normalized = round(total / drift, 3) if drift else None
    # per-query local drift + machine verdicts (round 16; see module
    # docstring "Per-query drift adjudication")
    local_drift: dict[str, float] = {}
    normalized_queries: dict[str, float] = {}
    for name, ts in samples.items():
        drifts = [_drift_at(t, probe_events) for t in sample_times[name]]
        local_drift[name] = round(statistics.median(drifts), 3)
        normalized_queries[name] = round(
            statistics.median(
                s / d if d else s for s, d in zip(ts, drifts)
            ),
            3,
        )
    verdicts: dict[str, str] | None = None
    prev = _previous_artifact_queries()
    if prev:
        # compare drift-corrected against drift-corrected when the
        # previous artifact has per-query normalization (r16+), raw
        # otherwise; a mover still inside the previous round's OWN
        # observed per-query spread (+5%) is ambient — the box covered
        # that range last round with this exact code
        verdicts = {}
        prev_q = prev.get("queries", {})
        prev_norm = prev.get("normalized_queries") or {}
        prev_spread = prev.get("spread", {})
        for name, raw in timings.items():
            base = prev_norm.get(name) or prev_q.get(name)
            if not base:
                verdicts[name] = "new"
                continue
            cmp = normalized_queries[name] / base
            spread_max = (prev_spread.get(name) or [None, None])[1]
            if cmp < 0.85:
                verdicts[name] = "improved"
            elif cmp <= 1.15:
                verdicts[name] = "flat"
            elif spread_max and raw <= spread_max * 1.05:
                verdicts[name] = "ambient"
            else:
                verdicts[name] = "regressed"
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "reps": REPS,
                "sf": sf_num,
                "calibration_sec": calibration_sec,
                "calibration_ref_sec": CALIBRATION_REF_SEC,
                "calibration_probes": [round(p, 3) for p in probes],
                "drift_factor": drift,
                "drift_spread": drift_spread,
                "normalized_total": normalized,
                "local_drift": local_drift,
                "normalized_queries": normalized_queries,
                "verdicts": verdicts,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
