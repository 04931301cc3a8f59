"""Round-6 BASELINE measurements: the round-5 curation operators plus
the hashed-shingle store and the cheapened star-contraction probe.

Usage: python tools/curation_bench.py [sf_dir]
Prints one line per measurement: name, median seconds, runs.
Noop sink = count() (or write to a tmp dir where the operator's cost
IS the write), warm JVM, median-of-3.
"""

from __future__ import annotations

import shutil
import statistics
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from etl_process_for_fraud_transactions_spark.session import get_spark  # noqa: E402
from etl_process_for_fraud_transactions_spark.sources.testdata import load_table  # noqa: E402


def timed(fn, n=3, warm=1):
    for _ in range(warm):
        fn()
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return statistics.median(runs), runs


def main(sf_dir: str) -> None:
    spark = get_spark("curation-bench")
    docs = load_table(spark, sf_dir, "documents").localCheckpoint()
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        .localCheckpoint()
    )
    n_docs, n_vecs = docs.count(), emb.count()
    print(f"sf_dir={sf_dir} docs={n_docs} vecs={n_vecs}")

    from etl_process_for_fraud_transactions_spark.operators.sampling import (
        sample_to_mixture,
    )
    from etl_process_for_fraud_transactions_spark.operators.similarity import (
        near_dedup_embeddings,
    )
    from etl_process_for_fraud_transactions_spark.operators.text import (
        chunk_documents,
        gopher_quality_flags,
        pack_chunks,
        scrub_pii,
    )

    sources = [r[0] for r in docs.select("source").distinct().collect()]
    shares = {s: 1.0 for s in sources}

    chunks = chunk_documents(docs, chunk_tokens=128, overlap=16).localCheckpoint()
    n_chunks = chunks.count()
    print(f"chunks(128/16)={n_chunks}")

    cases = {
        "gopher_quality_flags": lambda: gopher_quality_flags(docs).count(),
        "scrub_pii": lambda: scrub_pii(docs).count(),
        "pack_chunks (auto shards)": lambda: pack_chunks(
            chunks, max_tokens=2048
        ).count(),
        "sample_to_mixture (uniform shares over all sources)": lambda: (
            sample_to_mixture(docs, shares).count()
        ),
        "near_dedup_embeddings (64 planes, 4 bands, c>=0.7)": lambda: (
            near_dedup_embeddings(emb, dim=64, min_cosine=0.7).count()
        ),
    }
    for name, fn in cases.items():
        med, runs = timed(fn)
        print(f"{name}: median {med:.2f} s  runs={[round(r, 2) for r in runs]}")

    # hashed vs raw shingle store: bootstrap a 90% corpus, check the
    # 10% batch (matches the round-5 incremental row's split)
    from etl_process_for_fraud_transactions_spark.operators.dedup_incremental import (
        NearDupIndex,
    )
    from etl_process_for_fraud_transactions_spark.sources.warehouse import Warehouse

    split = int(n_docs * 0.9)
    corpus = docs.filter(F.col("doc_id") < split)
    batch = docs.filter(F.col("doc_id") >= split).localCheckpoint()
    for store in ("raw", "hashed"):
        root = tempfile.mkdtemp(prefix=f"ndidx_{store}_")
        try:
            idx = NearDupIndex(Warehouse(spark, root), store=store)
            t0 = time.perf_counter()
            idx.bootstrap(corpus)
            boot = time.perf_counter() - t0
            logical = idx.wh.read(idx.shingles_table).select(
                F.sum(
                    F.aggregate(
                        "sh",
                        F.lit(0).cast("long"),
                        lambda a, s: a
                        + (
                            F.length(s)
                            if store == "raw"
                            else F.lit(8).cast("long")
                        ),
                    )
                )
            ).first()[0]
            med, runs = timed(lambda: idx.check(batch, threshold=0.5).count())
            print(
                f"NearDupIndex store={store}: bootstrap {boot:.2f} s, "
                f"verify-store logical {logical / 1e6:.1f} MB, "
                f"check median {med:.2f} s runs={[round(r, 2) for r in runs]}"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)

    spark.stop()


def round6(sf_dir: str) -> None:
    """Round-6 operator measurements (run: python tools/curation_bench.py
    --round6 [sf_dir])."""
    import math
    import struct

    from pyspark.sql import functions as F

    from etl_process_for_fraud_transactions_spark.operators.decontaminate import (
        contamination_report,
    )
    from etl_process_for_fraud_transactions_spark.operators.multimodal import (
        ASSET_SCHEMA,
        audio_features,
        encode_wav,
    )
    from etl_process_for_fraud_transactions_spark.operators.quality_model import (
        score_quality,
        train_quality_model,
    )
    from etl_process_for_fraud_transactions_spark.operators.sampling import (
        shuffle_deterministic,
    )
    from etl_process_for_fraud_transactions_spark.operators.text import (
        mask_frequent_spans,
    )
    from etl_process_for_fraud_transactions_spark.session import get_spark
    from etl_process_for_fraud_transactions_spark.sources.testdata import load_table

    spark = get_spark("curation-bench-r6")
    docs = load_table(spark, sf_dir, "documents").localCheckpoint()
    n_docs = docs.count()
    bench = (
        docs.filter(F.col("doc_id") % 101 == 7)
        .selectExpr("doc_id AS bench_id", "text")
        .localCheckpoint()
    )
    print(f"sf_dir={sf_dir} docs={n_docs} bench_items={bench.count()}")

    # tiny labeled set for the classifier (labels don't matter for speed)
    labeled = docs.limit(200).withColumn(
        "label", (F.col("doc_id") % 2).cast("double")
    )
    model = train_quality_model(labeled)

    rate = 8000
    sine = struct.pack(
        f"<{rate // 10}h",
        *[
            int(0.5 * 32767 * math.sin(2 * math.pi * 440 * t / rate))
            for t in range(rate // 10)
        ],
    )
    assets = spark.createDataFrame(
        [
            (i, "audio", "wav", encode_wav(rate, 1, sine), (None, None, None))
            for i in range(2000)
        ],
        ASSET_SCHEMA,
    ).localCheckpoint()

    cases = {
        "mask_frequent_spans (L=16, min_docs=5)": lambda: mask_frequent_spans(
            docs, span_tokens=16, min_docs=5
        ).count(),
        "contamination_report exact broadcast (k=8)": lambda: (
            contamination_report(docs, bench, k=8).count()
        ),
        "contamination_report bloom cascade (k=8, fpp 1e-3)": lambda: (
            contamination_report(docs, bench, k=8, prefilter="bloom").count()
        ),
        "score_quality (folded sigmoid)": lambda: (
            score_quality(docs, model).count()
        ),
        "shuffle_deterministic (global order)": lambda: (
            shuffle_deterministic(docs).write.format("noop").mode("overwrite").save()
        ),
        "audio_features (2000 wav assets, 0.1 s PCM16)": lambda: (
            audio_features(assets).count()
        ),
    }
    for name, fn in cases.items():
        med, runs = timed(fn)
        print(f"{name}: median {med:.2f} s  runs={[round(r, 2) for r in runs]}")
    spark.stop()


def round7(sf_dir: str) -> None:
    """Round-7 measurements (run: python tools/curation_bench.py
    --round7 [sf_dir]): the cap_per_domain mega-domain straggler fix,
    the bloom-vs-exact-broadcast crossover at the 10^7-key scale the
    cascade exists for, and the portable span-hash premium."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from etl_process_for_fraud_transactions_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )
    from etl_process_for_fraud_transactions_spark.operators.text import (
        mask_frequent_spans,
    )
    from etl_process_for_fraud_transactions_spark.operators.web import (
        cap_per_domain,
        registered_domain,
    )
    from etl_process_for_fraud_transactions_spark.session import get_spark
    from etl_process_for_fraud_transactions_spark.sources.testdata import load_table

    spark = get_spark("curation-bench-r7")

    # --- planted mega-domain WITH text payload: the shape the round-6
    # `weak` was about — a single window over the domain key shuffles
    # FULL rows, so the whole corpus' text moves keyed on the domain
    # and a mega-domain becomes one sort task; the hot-domain-isolated
    # rewrite counts per domain on an (id, domain) projection,
    # broadcasts the over-cap domain list, ranks only the over-cap
    # pairs and applies the policy in ONE map-side pass. Text must be
    # INCOMPRESSIBLE (md5 chains): constant filler compresses ~1000x
    # in the lz4 shuffle files and hides the cost being measured.
    import shutil as _sh
    import tempfile as _tmp

    def _gen(root, mega_rows, total=2_000_000):
        (
            spark.range(total)
            .select(
                F.col("id").alias("doc_id"),
                F.when(
                    F.col("id") < mega_rows,
                    F.concat(F.lit("https://mega.example.com/p"), F.col("id")),
                )
                .otherwise(
                    F.concat(
                        F.lit("https://d"),
                        F.col("id") % 10_000,
                        F.lit(".org/x"),
                        F.col("id"),
                    )
                )
                .alias("url"),
                F.expr(
                    "concat_ws(' ', transform(sequence(1, 32),"
                    " i -> md5(concat(cast(id as string), '-', i))))"
                ).alias("text"),
            )
            .write.mode("overwrite")
            .parquet(root)
        )
        return spark.read.parquet(root)

    def _single_window(urls):
        # the round-6 shape the fix replaced
        w = Window.partitionBy("__dom").orderBy(F.asc("doc_id"))
        return (
            urls.withColumn("__dom", registered_domain(F.col("url")))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= 1000)
            .drop("__dom", "__rn")
            # sum(length(text)) forces the text through the plan —
            # count() would let Catalyst prune it out of the window
            # shuffle and hide exactly the cost being measured
            .agg(F.sum(F.length("text")))
            .collect()
        )

    def _iso(urls):
        return (
            cap_per_domain(urls, max_docs=1000)
            .agg(F.sum(F.length("text")))
            .collect()
        )

    for label, mega in (("10pct-mega (realistic)", 200_000),
                        ("80pct-mega (adversarial)", 1_600_000)):
        root = _tmp.mkdtemp(prefix="capbench_")
        try:
            urls = _gen(root, mega)
            for name, fn in (
                ("cap single-window (r6 shape)", _single_window),
                ("cap hot-domain-isolated (r7)", _iso),
            ):
                med, runs = timed(lambda f=fn, u=urls: f(u))
                print(
                    f"{name} {label}: median {med:.2f} s  "
                    f"runs={[round(r, 2) for r in runs]}"
                )
        finally:
            _sh.rmtree(root, ignore_errors=True)

    # --- bloom crossover at 10^7 keys --------------------------------
    keys = (
        spark.range(10_000_000)
        .select(F.concat(F.lit("key-"), F.col("id")).alias("k"))
        .localCheckpoint()
    )
    # rare-hit membership — the decontamination / blocklist shape the
    # cascade exists for: 1% of probes are members, so the verify join
    # sees ~1% + fpp of the probe side instead of half of it
    probe = (
        spark.range(10_000_000)
        .select(
            F.when(
                F.col("id") % 100 == 0, F.concat(F.lit("key-"), F.col("id"))
            )
            .otherwise(F.concat(F.lit("miss-"), F.col("id")))
            .alias("k")
        )
        .localCheckpoint()
    )

    def exact_broadcast():
        return probe.join(F.broadcast(keys), "k", "left_semi").count()

    t0 = time.perf_counter()
    bits_df, m, kh = bloom_build(keys, "k", fpp=0.01, n_items=10_000_000)
    build_s = time.perf_counter() - t0
    print(
        f"bloom_build 10^7 keys fpp=0.01: {build_s:.2f} s  "
        f"bitset={m // 8 / 1e6:.0f} MB k={kh}"
    )

    def bloom_cascade():
        pruned = (
            probe.crossJoin(F.broadcast(bits_df))
            .filter(
                bloom_might_contain(F.col("k"), F.col("__bloom_bits"), m, kh)
            )
            .drop("__bloom_bits")
        )
        return pruned.join(keys, "k", "left_semi").count()

    for name, fn in (
        ("membership 10^7 probe vs 10^7 keys, exact broadcast", exact_broadcast),
        ("membership 10^7 probe vs 10^7 keys, bloom prune + verify", bloom_cascade),
    ):
        med, runs = timed(fn)
        print(f"{name}: median {med:.2f} s  runs={[round(r, 2) for r in runs]}")

    # --- portable span-hash premium ----------------------------------
    docs = load_table(spark, sf_dir, "documents").localCheckpoint()
    for name, portable in (
        ("mask_frequent_spans xxhash64 (fast path)", False),
        ("mask_frequent_spans portable md5 (oracle path)", True),
    ):
        med, runs = timed(
            lambda p=portable: mask_frequent_spans(
                docs, span_tokens=16, min_docs=3, portable=p
            ).count()
        )
        print(f"{name}: median {med:.2f} s  runs={[round(r, 2) for r in runs]}")
    spark.stop()


def round8(sf_dir: str) -> None:
    """Round-8 measurements (run: python tools/curation_bench.py
    --round8 [sf_dir]): the HTML->text extraction rungs head-to-head —
    the regexp keep-everything path (strip_html, in-plan codegen) vs
    the DOM-fidelity boilerplate-pruning path (extract_main_content,
    Arrow-batched Python) on the sf documents wrapped in a realistic
    chrome template (nav + sidebar + footer around the body text)."""
    from pyspark.sql import functions as F

    from etl_process_for_fraud_transactions_spark.operators.extract import (
        extract_main_content,
    )
    from etl_process_for_fraud_transactions_spark.operators.text import (
        strip_html,
    )
    from etl_process_for_fraud_transactions_spark.session import get_spark
    from etl_process_for_fraud_transactions_spark.sources.testdata import load_table

    spark = get_spark("curation-bench-r8")
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(
            "<html><head><title>t</title><style>p{color:red}</style>"
            "<script>var x=1;</script></head><body>"
            "<nav><a href='/'>Home</a> <a href='/n'>News</a> "
            "<a href='/s'>Sports</a> <a href='/a'>About</a></nav>"
            "<div><li><a href='/x1'>Trending one</a></li>"
            "<li><a href='/x2'>Trending two</a></li></div><h1>Doc "
        ),
        F.col("doc_id"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit(
            "</p><footer><a href='/t'>Terms</a> | <a href='/p'>Privacy"
            "</a> | Copyright Example Media</footer></body></html>"
        ),
    )
    pages = docs.select("doc_id", html.alias("html")).localCheckpoint()
    n = pages.count()
    print(f"sf_dir={sf_dir} pages={n}")
    sink = lambda df: df.select(  # noqa: E731 — non-prunable sink
        F.sum(F.length("text"))
    ).collect()
    med, runs = timed(lambda: sink(strip_html(pages)))
    print(f"strip_html (regexp, codegen): median {med:.2f} s runs={[round(r,2) for r in runs]}")
    med, runs = timed(lambda: sink(extract_main_content(pages)))
    print(f"extract_main_content (DOM, Arrow python): median {med:.2f} s runs={[round(r,2) for r in runs]}")
    # verdict sanity: the DOM path must actually be dropping chrome
    r = (
        extract_main_content(pages)
        .select(
            F.sum("n_content_blocks").alias("c"),
            F.sum("n_boilerplate_blocks").alias("b"),
        )
        .first()
    )
    print(f"blocks: content={r.c} boilerplate={r.b}")
    spark.stop()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args else "/root/testdata/sf0.1"
    if "--round8" in sys.argv:
        round8(sf)
    elif "--round7" in sys.argv:
        round7(sf)
    elif "--round6" in sys.argv:
        round6(sf)
    else:
        main(sf)
