"""10x scale-up measurement (VERDICT r15 #3): every scale claim so far
is a plan-shape argument measured at <= sf0.1 (~600k rows / 5k docs);
this tool buys one real measurement a decade up to catch constants the
plans hide (the r15 listing-tax precedent).

Phased CLI (one phase per command window — the detached-runner lesson
in the round-workflow notes); results accumulate in
/tmp/scale10/results.jsonl and `report` prints the exponent table:

    python tools/scale_bench.py gen            # build /tmp/scale10/sf1
    python tools/scale_bench.py fraud  base    # sf0.1
    python tools/scale_bench.py fraud  x10     # /tmp/scale10/sf1
    python tools/scale_bench.py neardup base|x10
    python tools/scale_bench.py bm25   base|x10
    python tools/scale_bench.py report

Fixture construction (deterministic, pyarrow — no RNG):

- events x10: replica r shifts event_id by r*10_000_000 (terminal =
  event_id % 40 keeps its 40 groups), user_id by r*100_000 (multiple
  of 100, so card_num = user_id % 100 keeps the analog's EXACT card
  mix — the domain scales as MORE TRANSACTIONS PER CARD, which is the
  honest axis here because the analog pins the card universe), and ts
  by r seconds (structure-preserving jitter; within-window density
  genuinely grows 10x, which is what the windowed rules and the
  hot-key gate must absorb at scale).
- documents x10 BIJECTED (near-dup fixture): replica r>0 suffixes
  every word with str(r) — a per-replica vocabulary bijection, so each
  replica reproduces the original's near-dup cluster structure without
  cross-replica mega-clusters: group COUNT grows 10x, group size
  stays (honest weak scaling for banding + verify). n_chars is
  recomputed from the rewritten text.
- documents x10 VERBATIM (bm25 fixture, documents_rep.parquet): same
  text, fresh doc_ids — term document-frequency grows 10x like a real
  corpus, so build cost AND the serve-side postings-bucket reads scale
  honestly.

Measurement protocol: one get_spark() session per phase, per-plan
warm-up run (codegen/JIT) then REPS timed runs; the phase records all
reps plus the min (the box is bursty — BASELINE documents 0.9-2.37x
swings; min-of-reps is the least ambient-sensitive point estimate for
a SCALING RATIO where both sides use the same protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/scale10"
X10 = os.path.join(ROOT, "sf1")
RESULTS = os.path.join(ROOT, "results.jsonl")
R = 10
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))


def gen() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(X10, exist_ok=True)

    ev = pq.read_table(os.path.join(BASE_SF, "events.parquet"))
    reps = []
    for r in range(R):
        t = ev
        t = t.set_column(
            t.schema.get_field_index("event_id"), "event_id",
            pc.add(t["event_id"], r * 10_000_000),
        )
        t = t.set_column(
            t.schema.get_field_index("user_id"), "user_id",
            pc.add(t["user_id"], r * 100_000),
        )
        ts_us = t["ts"].cast(pa.int64())
        t = t.set_column(
            t.schema.get_field_index("ts"), "ts",
            pc.add(ts_us, r * 1_000_000).cast(pa.timestamp("us")),
        )
        reps.append(t)
    # small row groups: Spark splits a single parquet file at
    # row-group boundaries, so a default-written 10x file scans with
    # 1-2 tasks — measuring the fixture's IO shape, not the engine
    # (observed: the curation scan pinned at 2 partitions for 50k
    # docs). ~32 groups lets scan parallelism grow with the data the
    # way a real multi-file 100 TB table's would.
    pq.write_table(
        pa.concat_tables(reps), os.path.join(X10, "events.parquet"),
        row_group_size=32_768,
    )
    print("events:", sum(len(t) for t in reps))

    docs = pq.read_table(os.path.join(BASE_SF, "documents.parquet"))
    doc_ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs, sources = docs["lang"].to_pylist(), docs["source"].to_pylist()
    bij_cols = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
    rep_cols = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
    rot_cols = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
    vocab = sorted({w for t in texts for w in t.split(" ") if w})
    for r in range(R):
        suf = str(r) if r else ""
        pmap = (
            {w: vocab[(vi + r * 7) % len(vocab)]
             for vi, w in enumerate(vocab)}
            if r else None
        )
        for i, txt in enumerate(texts):
            new_id = doc_ids[i] + r * 1_000_000
            bij = (
                " ".join(w + suf for w in txt.split(" ")) if suf else txt
            )
            # permuted variant (curation fixture): replica r maps each
            # word through a per-replica VOCAB->VOCAB permutation
            # (shift r*7 through the sorted fixture vocabulary; 31 is
            # prime so all nine shifts are distinct derangement-ish
            # maps). Docs stay inside the fixture vocabulary — the
            # language/stopword/LM gates keep firing at realistic
            # per-replica rates — while word SEQUENCES differ across
            # replicas, so span windows, fingerprints and shingles do
            # NOT collapse cross-replica. (A plain rotation fixture
            # was pathological: interior 16-token windows survive
            # rotation verbatim, every window lands in ~R docs and the
            # span-mask join-back explodes — real corpora don't
            # duplicate every window 10x.)
            rot = (
                " ".join(pmap.get(w, w) for w in txt.split(" "))
                if pmap else txt
            )
            for cols, body in (
                (bij_cols, bij), (rep_cols, txt), (rot_cols, rot)
            ):
                cols["doc_id"].append(new_id)
                cols["text"].append(body)
                cols["lang"].append(langs[i])
                cols["source"].append(sources[i])
                cols["n_chars"].append(len(body))
    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()),
         ("lang", pa.string()), ("source", pa.string()),
         ("n_chars", pa.int64())]
    )
    pq.write_table(
        pa.table(bij_cols, schema=schema),
        os.path.join(X10, "documents.parquet"),
        row_group_size=2048,
    )
    pq.write_table(
        pa.table(rep_cols, schema=schema),
        os.path.join(X10, "documents_rep.parquet"),
        row_group_size=2048,
    )
    pq.write_table(
        pa.table(rot_cols, schema=schema),
        os.path.join(X10, "documents_perm.parquet"),
        row_group_size=2048,
    )
    print("documents:", len(bij_cols["doc_id"]))

    emb = pq.read_table(os.path.join(BASE_SF, "embeddings.parquet"))
    vec_ids = emb["vec_id"].to_pylist()
    vecs = emb["embedding"].to_pylist()
    labels = emb["label"].to_pylist()
    e_cols = {"vec_id": [], "embedding": [], "label": []}
    for r in range(R):
        for i, v in enumerate(vecs):
            e_cols["vec_id"].append(vec_ids[i] + r * 1_000_000)
            # deterministic per-replica nudge on dim 0: keeps the
            # cluster geometry (cells grow 10x in population, not in
            # count) while avoiding exact-duplicate vectors
            e_cols["embedding"].append(
                [v[0] + r * 1e-3] + list(v[1:]) if v else v
            )
            e_cols["label"].append(labels[i])
    pq.write_table(
        pa.table(
            e_cols,
            schema=pa.schema(
                [("vec_id", pa.int64()),
                 ("embedding", pa.list_(pa.float32())),
                 ("label", pa.int32())]
            ),
        ),
        os.path.join(X10, "embeddings.parquet"),
        row_group_size=1024,
    )
    print("embeddings:", len(e_cols["vec_id"]))


def _record(phase: str, label: str, **fields) -> None:
    os.makedirs(ROOT, exist_ok=True)
    row = {"phase": phase, "label": label, **fields}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


def _session():
    from etl_process_for_fraud_transactions_spark.session import get_spark

    return get_spark("scale-bench")


def _timed(build_df, reps: int = REPS) -> list[float]:
    """Warm once (codegen/JIT), then time `reps` full executions."""
    build_df().write.format("noop").mode("overwrite").save()
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        build_df().write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
    return out

def _sf_dir(label: str) -> str:
    return BASE_SF if label == "base" else X10


def phase_fraud(label: str) -> None:
    from etl_process_for_fraud_transactions_spark.plans import QUERIES

    spark = _session()
    sf = _sf_dir(label)
    n = QUERIES["fraud_report"](spark, sf).count()
    walls = _timed(lambda: QUERIES["fraud_report"](spark, sf))
    _record("fraud_report", label, rows=n, walls=walls, wall=min(walls))


def phase_neardup(label: str) -> None:
    """Production near-dup path: xxhash64 mode (the registered row's
    portable md5 mode exists for the oracle; scale runs the fast
    engine-internal path a user would)."""
    from etl_process_for_fraud_transactions_spark.operators.dedup import (
        minhash_near_duplicates,
    )
    from etl_process_for_fraud_transactions_spark.sources.testdata import (
        load_table,
    )

    spark = _session()
    docs = load_table(spark, _sf_dir(label), "documents")

    def build():
        return minhash_near_duplicates(
            docs, k=3, num_hashes=32, bands=8, threshold=0.6
        )

    n = build().count()
    walls = _timed(build)
    _record("near_dedup", label, pairs=n, walls=walls, wall=min(walls))


def phase_curation(label: str) -> None:
    """The widest operator surface in one plan: the registered
    corpus_curation_pipeline row (span cascade + dedup + decontam +
    quality/language/LM gates + split) over the vocab-PERMUTED corpus:
    docs stay inside the fixture vocabulary so every gate keeps firing
    at realistic per-replica rates (the suffix-bijected corpus dies
    wholesale at the stopword/LM gates; verbatim replicas die at exact
    dedup; a rotation fixture made every span window a 10x duplicate),
    while word sequences differ across replicas so span windows,
    fingerprints and shingles scale honestly through ALL stages."""
    import shutil

    from etl_process_for_fraud_transactions_spark.plans import QUERIES

    spark = _session()
    if label == "base":
        sf = BASE_SF
    else:
        sf = os.path.join(ROOT, "sf1_perm")
        os.makedirs(sf, exist_ok=True)
        shutil.copyfile(
            os.path.join(X10, "documents_perm.parquet"),
            os.path.join(sf, "documents.parquet"),
        )
    n = QUERIES["corpus_curation_pipeline"](spark, sf).count()
    walls = _timed(lambda: QUERIES["corpus_curation_pipeline"](spark, sf))
    _record("curation", label, rows=n, walls=walls, wall=min(walls))


def phase_ivf(label: str) -> None:
    """IvfIndex build + cell-pruned serve over the 10x embeddings
    (cells keep their COUNT, population grows 10x — the corpus-growth
    axis a serving index actually faces): build should scale
    ~linearly, serve with the probed cells' row growth."""
    import shutil

    from etl_process_for_fraud_transactions_spark.operators.similarity import (
        IvfIndex,
    )
    from etl_process_for_fraud_transactions_spark.sources.warehouse import (
        Warehouse,
    )

    spark = _session()
    emb = spark.read.parquet(
        os.path.join(_sf_dir(label), "embeddings.parquet")
    )
    wh_dir = os.path.join(ROOT, f"ivf_wh_{label}")
    shutil.rmtree(wh_dir, ignore_errors=True)
    wh = Warehouse(spark, wh_dir)
    idx = IvfIndex(wh, partitioned=True)
    t0 = time.perf_counter()
    idx.build(emb, n_cells=16, seed=42)
    build_wall = round(time.perf_counter() - t0, 3)
    queries = emb.orderBy("vec_id").limit(8).selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    ).localCheckpoint()
    serve_walls = _timed(lambda: idx.topk(queries, k=10, nprobe=2))
    n = idx.topk(queries, k=10, nprobe=2).count()
    _record(
        "ivf", label, rows=n, build_wall=build_wall,
        serve_walls=serve_walls, serve_wall=min(serve_walls),
    )


def phase_bm25(label: str) -> None:
    """Build a partitioned Bm25Index over the VERBATIM x10 corpus
    (term df grows with the corpus) and serve a frozen 8-query
    workload; build and serve are recorded separately — build should
    scale ~linearly, serve should track the queried terms' postings
    (which grow with df), never the corpus row count."""
    import shutil

    from pyspark.sql import functions as F  # noqa: F401

    from etl_process_for_fraud_transactions_spark.operators.retrieval import (
        Bm25Index,
    )
    from etl_process_for_fraud_transactions_spark.sources.warehouse import (
        Warehouse,
    )

    spark = _session()
    if label == "base":
        docs = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
    else:
        docs = spark.read.parquet(os.path.join(X10, "documents_rep.parquet"))
    wh_dir = os.path.join(ROOT, f"wh_{label}")
    shutil.rmtree(wh_dir, ignore_errors=True)
    wh = Warehouse(spark, wh_dir)
    idx = Bm25Index(wh, partitioned=True)
    t0 = time.perf_counter()
    idx.build(docs)
    build_wall = round(time.perf_counter() - t0, 3)
    queries = {
        f"q{i}": terms
        for i, terms in enumerate(
            [["hash", "join"], ["table", "scan"], ["merge", "sort"],
             ["window", "group"], ["stream", "batch"], ["vector", "value"],
             ["customer", "order"], ["query", "filter"]]
        )
    }
    serve_walls = _timed(lambda: idx.topk(queries, topk=10))
    n = idx.topk(queries, topk=10).count()
    _record(
        "bm25", label, rows=n, build_wall=build_wall,
        serve_walls=serve_walls, serve_wall=min(serve_walls),
    )


def report() -> None:
    import math

    rows = [json.loads(line) for line in open(RESULTS)]
    by = {}
    for r in rows:
        by[(r["phase"], r["label"])] = r  # newest run wins
    print(f"{'phase':<14} {'base':>9} {'x10':>9} {'ratio':>7} {'exponent':>9}")
    for phase, key in [
        ("fraud_report", "wall"), ("near_dedup", "wall"),
        ("curation", "wall"),
        ("bm25 build", None), ("bm25 serve", None),
        ("ivf build", None), ("ivf serve", None),
    ]:
        p = phase.split(" ")[0]
        k = key or ("build_wall" if "build" in phase else "serve_wall")
        b, x = by.get((p, "base")), by.get((p, "x10"))
        if not (b and x):
            continue
        ratio = x[k] / b[k]
        expo = math.log10(ratio) if ratio > 0 else float("nan")
        print(f"{phase:<14} {b[k]:>9.3f} {x[k]:>9.3f} {ratio:>7.2f} {expo:>9.2f}")


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "report"
    if cmd == "gen":
        gen()
    elif cmd == "fraud":
        phase_fraud(sys.argv[2])
    elif cmd == "neardup":
        phase_neardup(sys.argv[2])
    elif cmd == "curation":
        phase_curation(sys.argv[2])
    elif cmd == "ivf":
        phase_ivf(sys.argv[2])
    elif cmd == "bm25":
        phase_bm25(sys.argv[2])
    elif cmd == "report":
        report()
    else:
        raise SystemExit(f"unknown phase {cmd!r}")


if __name__ == "__main__":
    main()
