"""Known-answer tests for dedup and text-analysis operators."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_process_for_fraud_transactions_spark.operators import dedup as D
from etl_process_for_fraud_transactions_spark.operators import text as X


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "the quick  brown FOX jumps over the lazy dog!"),  # exact dup after normalize
        (3, "The quick brown fox jumps over the lazy cat"),    # near dup (1 token differs)
        (4, "Der schnelle braune Fuchs und der faule Hund ist da"),
        (5, "completely different text about spark engines and shuffles"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    groups = D.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0].doc_ids == [1, 2]

    kept = sorted(r.doc_id for r in D.dedup_exact(docs).collect())
    assert kept == [1, 3, 4, 5]  # smallest id survives


def test_dedup_survivor_map_and_lineage(spark, docs):
    m = {
        r.doc_id: (r.survivor_id, r.group_size)
        for r in D.dedup_survivor_map(docs).collect()
    }
    # every doc appears exactly once; dup group {1,2} points at 1
    assert set(m) == {1, 2, 3, 4, 5}
    assert m[1] == (1, 2) and m[2] == (1, 2)
    assert m[3] == (3, 1) and m[4] == (4, 1) and m[5] == (5, 1)

    pairs = {(r.dropped_id, r.survivor_id) for r in D.dedup_lineage(docs).collect()}
    assert pairs == {(2, 1)}
    # consistency: survivors from the map == dedup_exact's kept set
    survivors = {sid for sid, _ in m.values()}
    assert survivors == {r.doc_id for r in D.dedup_exact(docs).collect()}


def test_dedup_against_corpus(spark, docs):
    new = spark.createDataFrame(
        [
            (10, "THE QUICK brown fox jumps over the lazy dog"),  # already in corpus (norm-dup of 1)
            (11, "brand new document one"),
            (12, "brand  NEW document one!"),  # in-batch dup of 11 after normalize
            (13, "brand new document two"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in D.dedup_against_corpus(new, docs).collect())
    assert kept == [11, 13]


def test_shingles_and_jaccard(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    sh = df.select(D.shingles("text", k=3).alias("sh")).collect()[0].sh
    assert sh == ["a b c", "b c d"]
    # short doc: whole text as single shingle
    df2 = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert df2.select(D.shingles("text", 3).alias("s")).collect()[0].s == ["a b"]


def test_minhash_seeds_are_distinct(spark):
    """The num_hashes signature slots must come from DIFFERENT hash
    functions. Regression: binding the seed via `lambda x, s=s:` makes
    PySpark use the two-arg (element, index) HOF form — every slot
    silently computed the same function and the signature collapsed to
    num_hashes copies of one min (banding degenerated to single-hash).
    Double-hash replay checked against python for exactness."""
    import hashlib

    text = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame([(text,)], "text string")
    for portable in (True, False):
        sig = df.select(
            D.minhash_signature(D.shingles("text", 3), 8, portable=portable).alias("s")
        ).collect()[0].s
        assert len(set(sig)) > 1, (portable, sig)

    toks = text.split()
    shs = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    hp = [
        (
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16),
            int(hashlib.md5(s.encode()).hexdigest()[15:29], 16),
        )
        for s in shs
    ]
    want = [min(h1 + s * h2 for h1, h2 in hp) for s in range(8)]
    got = df.select(
        D.minhash_signature(D.shingles("text", 3), 8, portable=True).alias("s")
    ).collect()[0].s
    assert list(got) == want


def test_minhash_num_hashes_overflow_guard(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    with pytest.raises(ValueError, match="112"):
        df.select(D.minhash_signature(D.shingles("text", 3), 128))
    # the documented max builds and runs
    sig = df.select(
        D.minhash_signature(D.shingles("text", 3), 112).alias("s")
    ).collect()[0].s
    assert len(sig) == 112


def test_minhash_near_duplicates(spark, docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.minhash_near_duplicates(docs, threshold=0.4).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical after normalize
    assert (1, 3) in pairs and 0.4 <= pairs[(1, 3)] < 1.0
    assert all(5 not in p for p in pairs)


def test_simhash(spark, docs):
    sig = docs.filter("doc_id = 1").select(
        D.simhash_signature("text").alias("s")
    ).collect()[0].s
    assert len(sig) == 64 and set(sig) <= {0, 1}
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in D.simhash_near_duplicates(docs, max_hamming=10).collect()
    }
    assert pairs.get((1, 2)) == 0  # identical normalized text -> identical simhash


def test_token_count_and_fingerprint(spark, docs):
    tc = {r.doc_id: r.n for r in docs.select("doc_id", X.token_count("text").alias("n")).collect()}
    assert tc[1] == 9
    fp = docs.select("doc_id", X.fingerprint_md5("text").alias("f")).collect()
    fps = {r.doc_id: r.f for r in fp}
    assert fps[1] == fps[2] and fps[1] != fps[3]


def test_quality_stats(spark, docs):
    row = D.exact_duplicates  # noqa: F841  (keep import referenced)
    stats = {r.doc_id: r for r in X.quality_stats(docs).collect()}
    assert stats[1].n_tokens == 9
    assert stats[2].punct_ratio > 0
    assert stats[1].stopword_ratio == pytest.approx(2 / 9)  # 'the' x2


def test_rolling_hash_and_bpe_tokens(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "ab"), (3, "ba")], "doc_id long, text string")
    out = {r.doc_id: r.h for r in df.select("doc_id", X.rolling_hash("text").alias("h")).collect()}
    # hand-computed: ((0*31+97)*31+98) % (2^31-1) = 3105
    assert out[1] == 3105 and out[2] == 3105
    assert out[3] == (98 * 31 + 97)  # order-sensitive, unlike a bag hash
    tc = spark.createDataFrame([(1, "hello, world! 42")], "doc_id long, text string")
    n = tc.select(X.bpe_ish_token_count("text").alias("n")).collect()[0].n
    assert n == 5  # hello , world ! 42


def test_detect_language(spark, docs):
    pred = {r.doc_id: r.pred_lang for r in X.detect_language(docs).collect()}
    assert pred[1] == "en"
    assert pred[4] == "de"
    assert pred[5] == "en"  # 'and' marker


def test_hash_split_stable_and_disjoint(spark):
    from etl_process_for_fraud_transactions_spark.operators.sampling import (
        hash_bucket,
        train_val_split,
    )

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    labeled = train_val_split(df, "doc_id", val_buckets=2)
    counts = {r.split: r.n for r in labeled.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val"}
    # ~12.5% val, generous tolerance for 2000 ids
    assert 0.08 < counts["val"] / 2000 < 0.18
    # stable across recomputation and repartition
    a = {r.doc_id: r.split for r in labeled.collect()}
    b = {r.doc_id: r.split for r in train_val_split(df.repartition(7), "doc_id", 2).collect()}
    assert a == b

    with pytest.raises(ValueError):
        hash_bucket("doc_id", buckets=0)

    # non-divisor bucket counts take the 60-bit conv path: complete
    # coverage of [0, buckets) and roughly uniform occupancy
    five = df.select(hash_bucket("doc_id", buckets=5).alias("b"))
    counts5 = {r.b: r.n for r in five.groupBy("b").agg(F.count("*").alias("n")).collect()}
    assert set(counts5) == {0, 1, 2, 3, 4}
    assert all(0.1 < n / 2000 < 0.3 for n in counts5.values())


def test_chunk_documents(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y")], "doc_id long, text string"
    )
    out = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_chunk_tokens)
        for r in X.chunk_documents(df, chunk_tokens=5, overlap=2).collect()
    }
    assert out == {
        (1, 0): ("a b c d e", 5),
        (1, 1): ("d e f g", 4),  # remainder chunk, starts at overlap
        (2, 0): ("x y", 2),      # shorter than one chunk -> single chunk
    }

    with pytest.raises(ValueError):
        X.chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunk_documents_lossless_reconstruction(spark):
    """Property: dropping each chunk's leading overlap (except chunk 0)
    and concatenating in chunk order reproduces the exact normalized
    token stream — chunking loses nothing and duplicates only the
    declared overlap."""
    import random

    rng = random.Random(7)
    rows = [
        (i, " ".join(rng.choice("alpha beta gamma delta eps".split())
                     for _ in range(rng.randint(1, 57))))
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunk, overlap = 16, 4
    step = chunk - overlap

    got = {}
    for r in X.chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect():
        got.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text.split(" ")

    for doc_id, text in rows:
        expected = text.split(" ")
        chunks = got[doc_id]
        rebuilt = []
        for cid in sorted(chunks):
            toks = chunks[cid]
            rebuilt.extend(toks if cid == 0 else toks[overlap:])
            if cid > 0:  # consecutive chunks agree on the overlap region
                assert chunks[cid - 1][-overlap:] == toks[:overlap] or len(
                    chunks[cid - 1]
                ) < chunk  # tail chunk may be short
        assert rebuilt == expected, doc_id
        # every non-final chunk starts exactly `step` tokens after its
        # predecessor
        assert all(len(chunks[c]) <= chunk for c in chunks)


def test_dedup_against_empty_corpus(spark, docs):
    empty = spark.createDataFrame([], "doc_id long, text string")
    kept = sorted(r.doc_id for r in D.dedup_against_corpus(docs, empty).collect())
    assert kept == [1, 3, 4, 5]  # batch-internal dedup still applies


def test_prefix_filter_jaccard_is_exact_at_the_boundary(spark):
    """Pairs at J exactly 0.5 — the borderline the round-2 MinHash
    banding dropped with ~60% probability — must ALL survive, and the
    result must equal a brute-force all-pairs computation."""
    import itertools

    # 12 tokens each, sharing exactly 8 of 16 distinct 3-shingles ->
    # construct overlapping halves; plus unrelated docs and a cross-
    # source near-dup that must be excluded by the group filter
    base = "a b c d e f g h i j k l m n o p q r s t".split()
    rows = [
        (1, "s1", " ".join(base[0:12])),      # shingles of tokens 0..11
        (2, "s1", " ".join(base[4:16])),      # overlap region 4..11
        (3, "s1", " ".join(base[8:20])),      # overlap with 2, not 1
        (4, "s1", "zz yy xx ww vv uu"),       # unrelated
        (5, "s2", " ".join(base[0:12])),      # identical to 1, other source
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs_exact(
            df, threshold=0.3, group_col="source"
        ).collect()
    }

    # brute force in python over the same shingle definition
    def shingle_set(text):
        toks = text.split()
        if len(toks) <= 3:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    expected = {}
    for (ia, sa, ta), (ib, sb, tb) in itertools.combinations(rows, 2):
        if sa != sb:
            continue
        A, B = shingle_set(ta), shingle_set(tb)
        j = len(A & B) / len(A | B)
        if j >= 0.3:
            expected[(min(ia, ib), max(ia, ib))] = j

    assert set(got) == set(expected)
    for pair, j in expected.items():
        assert abs(got[pair] - j) < 1e-12, pair
    # the cross-source identical pair (1,5) must NOT appear
    assert (1, 5) not in got


class TestGopherFlags:
    def test_known_answers(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.text import (
            gopher_quality_flags,
        )

        good = " ".join(
            "the quick brown fox and that dog have fun with energy".split() * 6
        )  # 66 words, all alpha, stopword-rich
        bullets = "\n".join(f"- item {i}" for i in range(10))
        symbols = " ".join(["word#tag"] * 30 + ["plain"] * 30)
        short = "tiny text here"
        rows = [(1, good), (2, bullets), (3, symbols), (4, short)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in gopher_quality_flags(df).collect()}

        assert got[1].passes_gopher
        assert got[1].n_words == 66
        # bullets: every line starts with '-' -> bullet gate fails
        assert not got[2].ok_bullet_lines and not got[2].passes_gopher
        # symbols: 30/60 words carry '#' -> ratio 0.5 > 0.1
        assert not got[3].ok_symbol_ratio and not got[3].passes_gopher
        # short: word count gate
        assert not got[4].ok_word_count and not got[4].passes_gopher

    def test_map_only_plan(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.text import (
            gopher_quality_flags,
        )

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = (
            gopher_quality_flags(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan and "Join" not in plan


class TestScrubPii:
    def test_known_answers(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.text import scrub_pii

        rows = [
            (1, "contact bob@example.com or call 555-123-4567 today"),
            (2, "ssn 123-45-6789 card 4111 1111 1111 1111 ip 192.168.1.1"),
            (3, "no pii here just plain prose about spark joins"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in scrub_pii(df).collect()}
        assert "[EMAIL]" in got[1].text and "bob@" not in got[1].text
        assert "[PHONE]" in got[1].text and "4567" not in got[1].text
        assert got[1].n_pii_masked == 2
        assert "[SSN]" in got[2].text and "[CARD]" in got[2].text
        assert "[IP]" in got[2].text
        # the SSN masked as SSN, not half-eaten by the phone regex
        assert "[PHONE]" not in got[2].text
        assert got[3].text == rows[2][1]
        assert got[3].n_pii_masked == 0

    def test_driver_probe_near_misses_survive_all_patterns(self, spark):
        """The pii_scrub_audit driver row (plans/queries_llm.py)
        injects one near-miss per kind and its oracle assumes NONE of
        the five regexes touches it — including cross-kind claims
        (e.g. the greedy phone regex on the bad-SSN shape). Pin that
        assumption at the unit level, and the positive twin: every
        injected-literal shape masks fully in one replacement."""
        from etl_process_for_fraud_transactions_spark.operators.text import scrub_pii
        from etl_process_for_fraud_transactions_spark.plans.queries_llm import (
            _PII_NEAR,
            _PII_TOKENS,
        )

        near = spark.createDataFrame(
            [(i, f"pad {n} z") for i, n in enumerate(_PII_NEAR)],
            "doc_id long, text string",
        )
        for r in scrub_pii(near).collect():
            assert r.n_pii_masked == 0, r
            assert r.text == f"pad {_PII_NEAR[r.doc_id]} z", r

        injected = [
            "user7@example.com", "223-33-2223", "4223 1111 2222 2223",
            "10.57.0.58", "555-223-2223",
        ]
        pos = spark.createDataFrame(
            [(i, f"pad {p} q {p} z") for i, p in enumerate(injected)],
            "doc_id long, text string",
        )
        for r in scrub_pii(pos).collect():
            tok = _PII_TOKENS[r.doc_id]
            assert r.n_pii_masked == 2, r
            assert r.text == f"pad {tok} q {tok} z", r

    def test_map_only(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.text import scrub_pii

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan


class TestPackChunks:
    def test_bounded_packs_and_determinism(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.text import (
            chunk_documents,
            pack_chunks,
        )

        docs = spark.createDataFrame(
            [(i, " ".join(f"w{j}" for j in range(5 + (i * 7) % 40)))
             for i in range(40)],
            "doc_id long, text string",
        )
        chunks = chunk_documents(docs, chunk_tokens=16, overlap=4)
        packed = pack_chunks(chunks, max_tokens=64, shards=4)
        rows = packed.collect()
        assert all(r.pack_id is not None for r in rows)
        totals = {}
        for r in rows:
            totals[r.pack_id] = totals.get(r.pack_id, 0) + r.n_chunk_tokens
        # bounded overflow: every pack < max + chunk size
        assert all(t < 64 + 16 for t in totals.values())
        # dense: a non-final pack spans a full max_tokens window minus
        # at most one straddling chunk -> total >= max - chunk_size
        by_shard = {}
        for pid, t in totals.items():
            by_shard.setdefault(pid // 2**32, []).append((pid, t))
        for packs in by_shard.values():
            for pid, t in sorted(packs)[:-1]:
                assert t >= 64 - 16, (pid, t)
        # deterministic under re-partitioning
        again = pack_chunks(chunks.repartition(7), max_tokens=64, shards=4)
        key = lambda r: (r.doc_id, r.chunk_id, r.pack_id)
        assert sorted(map(key, again.collect())) == sorted(map(key, rows))

    def test_auto_shards_scale_with_rows(self, spark):
        """shards=None derives the count from input size (clamped to
        >=32) and the result still satisfies the packing bounds; an
        explicit shards value gives reproducible pack_ids."""
        from etl_process_for_fraud_transactions_spark.operators.text import (
            chunk_documents,
            pack_chunks,
        )

        docs = spark.createDataFrame(
            [(i, " ".join(f"w{j}" for j in range(30))) for i in range(20)],
            "doc_id long, text string",
        )
        chunks = chunk_documents(docs, chunk_tokens=16, overlap=4)
        packed = pack_chunks(chunks, max_tokens=64)  # auto shards -> 32
        totals = {}
        for r in packed.collect():
            totals[r.pack_id] = totals.get(r.pack_id, 0) + r.n_chunk_tokens
        assert all(t < 64 + 16 for t in totals.values())
        # small input clamps to the 32-shard floor: shard ids < 32
        assert all(pid // 2**32 < 32 for pid in totals)

    def test_shard_col_controls_assignment_and_replays(self, spark):
        """shard_col makes the shard assignment caller-owned: pack_id
        decodes to exactly the given column value, and the greedy bin
        is replayable from a plain running sum — the contract the
        document_chunks driver row's SQL oracle depends on."""
        import pytest

        from etl_process_for_fraud_transactions_spark.operators.text import (
            chunk_documents,
            pack_chunks,
        )
        from pyspark.sql import functions as F

        docs = spark.createDataFrame(
            [(i, " ".join(f"w{j}" for j in range(5 + (i * 7) % 40)))
             for i in range(40)],
            "doc_id long, text string",
        )
        chunks = chunk_documents(docs, chunk_tokens=16, overlap=4).withColumn(
            "grp", F.pmod(F.col("doc_id"), F.lit(3))
        )
        packed = pack_chunks(chunks, max_tokens=64, shard_col="grp")
        rows = sorted(packed.collect(), key=lambda r: (r.grp, r.doc_id, r.chunk_id))
        running = {}
        for r in rows:
            assert r.pack_id // 2**32 == r.grp, r
            before = running.get(r.grp, 0)
            assert r.pack_id % 2**32 == before // 64, r
            running[r.grp] = before + r.n_chunk_tokens
        # user's column survives untouched
        assert "grp" in packed.columns
        with pytest.raises(ValueError, match="mutually exclusive"):
            pack_chunks(chunks, max_tokens=64, shard_col="grp", shards=4)


class TestStripHtml:
    def test_extracts_visible_text_and_structure(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.text import (
            strip_html,
        )

        html = (
            "<html><head><title>junk</title><style>p{color:red}</style></head>"
            "<body><script>var x = '<p>not text</p>';</script>"
            "<!-- a comment -->"
            "<h1>Header &amp; Title</h1>"
            "<p>First &quot;paragraph&quot; text.</p>"
            "<div>Second<br>line with a <a href='x'>link label</a>.</div>"
            "<ul><li>alpha</li><li>beta</li></ul>"
            "</body></html>"
        )
        df = spark.createDataFrame([(1, html)], "doc_id long, html string")
        got = strip_html(df).first().text
        assert "junk" not in got          # head subtree dropped
        assert "color:red" not in got     # style dropped
        assert "not text" not in got      # script content dropped whole
        assert "comment" not in got
        assert "Header & Title" in got    # entity decoded
        assert 'First "paragraph" text.' in got
        assert "link label" in got        # inline tag unwrapped, text kept
        # block boundaries became line structure: header and paragraph
        # are separate lines
        lines = got.split("\n")
        assert any(line.strip() == "Header & Title" for line in lines)
        assert "alpha" in got and "beta" in got

    def test_plain_text_passes_through(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.text import (
            strip_html,
        )

        df = spark.createDataFrame(
            [(1, "just a plain sentence with  extra   spaces")],
            "doc_id long, html string",
        )
        assert (
            strip_html(df).first().text
            == "just a plain sentence with extra spaces"
        )

    def test_map_only_plan(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.text import (
            strip_html,
        )

        df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
        plan = strip_html(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan


class TestMinhashBandParams:
    def test_crossover_tracks_threshold(self):
        from etl_process_for_fraud_transactions_spark.operators.dedup import (
            minhash_band_params,
        )

        for t in (0.3, 0.5, 0.7, 0.9):
            n, b, r = minhash_band_params(t)
            assert n == b * r and n <= 112
            crossover = (1 / b) ** (1 / r)
            assert abs(crossover - t) < 0.15, (t, b, r, crossover)

    def test_weights_shift_the_curve(self):
        from etl_process_for_fraud_transactions_spark.operators.dedup import (
            minhash_band_params,
        )

        _, b_fp, r_fp = minhash_band_params(0.5, fp_weight=5.0)
        _, b_fn, r_fn = minhash_band_params(0.5, fn_weight=5.0)
        # penalizing FPs pushes the crossover up (stricter candidates);
        # penalizing FNs pushes it down (looser candidates)
        assert (1 / b_fp) ** (1 / r_fp) > (1 / b_fn) ** (1 / r_fn)

    def test_rejects_degenerate_threshold(self):
        import pytest

        from etl_process_for_fraud_transactions_spark.operators.dedup import (
            minhash_band_params,
        )

        with pytest.raises(ValueError):
            minhash_band_params(0.0)
        with pytest.raises(ValueError):
            minhash_band_params(1.0)


class TestScriptDetection:
    def test_dominant_script_known_answers(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.text import (
            dominant_script,
        )

        rows = [
            (1, "plain english text with words"),
            (2, "Привет мир это русский текст"),
            (3, "这是一段中文文本内容测试"),
            (4, "これは日本語のテキストです"),
            (5, "한국어 텍스트 샘플 문장"),
            (6, "هذا نص عربي للاختبار"),
            (7, "Ελληνικό κείμενο εδώ"),
            (8, "यह हिंदी पाठ है"),
            (9, "1234 5678 !!!"),
            (10, "abcdefghij клмнопрсту"),  # exactly half each script
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: r.s
            for r in df.select(
                "doc_id", dominant_script("text").alias("s")
            ).collect()
        }
        assert got[1] == "latin"
        assert got[2] == "cyrillic"
        assert got[3] == "cjk" and got[4] == "cjk" and got[5] == "cjk"
        assert got[6] == "arabic"
        assert got[7] == "greek"
        assert got[8] == "devanagari"
        assert got[9] == "und"          # no letters at all
        assert got[10] == "mixed"       # neither script holds > 50%

    def test_script_ratios_sum_and_plan(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.text import (
            script_ratios,
        )

        df = spark.createDataFrame(
            [(1, "abc это mixed")], "doc_id long, text string"
        )
        sel = df.select(
            *[v.alias(k) for k, v in script_ratios("text").items()]
        )
        row = sel.first()
        assert 0.0 < row.latin < 1.0 and 0.0 < row.cyrillic < 1.0
        assert abs(row.latin + row.cyrillic - 1.0) < 1e-9
        plan = sel._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_near_dedup_auto_band_matches_explicit(spark):
    """auto_band=True must equal the explicit (num_hashes, bands)
    minhash_band_params picks for the threshold — same candidates,
    same verdicts."""
    from etl_process_for_fraud_transactions_spark.operators.dedup import (
        minhash_band_params,
        near_dedup,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "the quick brown fox jumps over the lazy dog near the creek"),
        (3, "a completely different document about spark physical plans"),
        (4, "another unrelated text concerning parquet row group pruning"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n, b, _ = minhash_band_params(0.8)
    auto = sorted(
        (r.doc_id, r.survivor_id)
        for r in near_dedup(df, threshold=0.8, auto_band=True).collect()
    )
    explicit = sorted(
        (r.doc_id, r.survivor_id)
        for r in near_dedup(
            df, threshold=0.8, num_hashes=n, bands=b
        ).collect()
    )
    assert auto == explicit
    assert any(s != d for d, s in auto)  # the near-pair clustered


def test_unclosed_script_documented_behavior(spark):
    """Pinned limit: an unclosed <script> can't be subtree-dropped
    (no terminator for the block match) — the tag strips, the
    orphaned code text survives, and the document is NOT truncated.
    The quality gates catch the leaked code via punctuation ratio."""
    from etl_process_for_fraud_transactions_spark.operators.text import (
        strip_html,
    )

    df = spark.createDataFrame(
        [(1, "<p>real text</p><script>var x = 1; leaked()")],
        "doc_id long, html string",
    )
    got = strip_html(df).first().text
    assert "real text" in got          # document not truncated
    assert "leaked()" in got           # honest leak, not silent drop
    assert "<script>" not in got       # the tag itself strips


def test_escaped_entities_decode_once(spark):
    """'&amp;lt;' is the VISIBLE text '&lt;' — decoding '&amp;' before
    '&lt;' would double-decode it into a live '<' and reintroduce
    markup after tag stripping."""
    from etl_process_for_fraud_transactions_spark.operators.text import (
        strip_html,
    )

    df = spark.createDataFrame(
        [(1, "<p>use &amp;lt;div&amp;gt; to mark &amp; join</p>")],
        "doc_id long, html string",
    )
    got = strip_html(df).first().text
    assert got == "use &lt;div&gt; to mark & join"


def test_compression_ratio_separates_spam_from_prose(spark):
    from etl_process_for_fraud_transactions_spark.operators.text import (
        compression_ratio,
    )

    prose = (
        "the committee reviewed seventeen distinct proposals before "
        "narrowing the field to three finalists whose budgets differed "
        "substantially in scope, staffing and projected maintenance cost"
    )
    spam = "buy cheap pills now " * 40
    df = spark.createDataFrame(
        [(1, prose), (2, spam), (3, "")], "doc_id long, text string"
    )
    got = {r.doc_id: r.compression_ratio for r in compression_ratio(df).collect()}
    assert got[2] < 0.2 < got[1]          # spam compresses far below prose
    assert got[3] == 1.0                  # empty text: nothing repetitive
    # python replay: exact zlib contract
    import zlib

    raw = prose.encode()
    assert got[1] == len(zlib.compress(raw, 6)) / len(raw)


def test_tokens_unicode_cjk_and_latin(spark):
    """CJK chars tokenize one-per-char, Latin words as runs — the
    whitespace default would treat a whole CJK sentence as one token
    (and normalize_text would delete it outright)."""
    from etl_process_for_fraud_transactions_spark.operators.text import (
        token_count_unicode,
        tokens_unicode,
    )

    df = spark.createDataFrame(
        [
            (1, "我爱Spark引擎"),
            (2, "hello world 123"),
            (3, "日本語のテキスト"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.t for r in df.select(
        "doc_id", tokens_unicode("text").alias("t")).collect()}
    assert got[1] == ["我", "爱", "spark", "引", "擎"]
    assert got[2] == ["hello", "world", "123"]
    assert len(got[3]) == 8          # each CJK char its own token
    assert got[4] == []
    n = {r.doc_id: r.n for r in df.select(
        "doc_id", token_count_unicode("text").alias("n")).collect()}
    assert n[1] == 5 and n[2] == 3 and n[4] == 0


def test_near_dedup_unicode_catches_cjk_near_dups(spark):
    """The ASCII normalizer deletes CJK text, so the default ladder
    sees empty token sets; unicode=True shingles over per-character
    tokens and finds the CJK near-pair."""
    from etl_process_for_fraud_transactions_spark.operators.dedup import (
        minhash_near_duplicates,
        near_dedup,
    )

    a = "今天的天气非常好我们一起去公园散步吧然后喝茶"
    b = "今天的天气非常好我们一起去公园散步吧然后喝水"  # 1 char differs
    c = "完全不同的一段中文内容讲的是机器学习系统设计"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    # default ladder: ASCII normalize kills the text -> no pairs...
    # (all three become EMPTY shingle sets; identical empties must not
    # explode into pairs either way, but the point is recall is zero)
    pairs_uni = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(
            docs, threshold=0.5, unicode=True
        ).collect()
    }
    assert (1, 2) in pairs_uni
    assert all(3 not in p for p in pairs_uni)
    verdict = {
        r.doc_id: r.is_survivor
        for r in near_dedup(docs, threshold=0.5, unicode=True).collect()
    }
    assert verdict == {1: True, 2: False, 3: True}


def test_simhash_and_exact_jaccard_unicode(spark):
    """The unicode option reaches SimHash and the exact-Jaccard join
    too: CJK near-pairs surface under both, a distinct doc does not."""
    from etl_process_for_fraud_transactions_spark.operators.dedup import (
        ngram_jaccard_pairs_exact,
        simhash_near_duplicates,
    )

    a = "今天的天气非常好我们一起去公园散步吧然后喝茶"
    b = "今天的天气非常好我们一起去公园散步吧然后喝水"
    c = "完全不同的一段中文内容讲的是机器学习系统设计"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    sim = {
        (r.id_a, r.id_b)
        for r in simhash_near_duplicates(
            docs, max_hamming=10, unicode=True
        ).collect()
    }
    assert (1, 2) in sim and all(3 not in p for p in sim)
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs_exact(
            docs, threshold=0.5, unicode=True
        ).collect()
    }
    assert (1, 2) in jac and jac[(1, 2)] > 0.8
    assert all(3 not in p for p in jac)


def test_quoted_attribute_gt_does_not_leak(spark):
    """Round 8: the tag pattern is quote-aware — a '>' inside a quoted
    attribute value (<a title="a>b">, inline JSON attrs) no longer
    truncates the tag and leaks the attribute tail into the text."""
    from etl_process_for_fraud_transactions_spark.operators.text import (
        strip_html,
    )

    html = (
        '<p>before <a title="a>b" href=\'x>y\'>label</a>'
        " <span data-json='{\"k\": \"v>w\"}'>inner</span> after</p>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    got = strip_html(df).first().text
    assert "label" in got and "inner" in got and "before" in got
    assert 'b"' not in got and "y'" not in got    # no attribute tail leaks
    assert "v>w" not in got
    assert got.replace("\n", " ").split() == ["before", "label", "inner", "after"]


def test_unquoted_gt_in_attribute_residual_pinned(spark):
    """Round 9 pin: an UNQUOTED '>' inside an attribute value
    terminates the tag early — the attribute tail leaks into the
    text. This is the documented parser-grade residual (same behavior
    as the pre-quote-aware pattern); quality gates catch it
    downstream via punctuation ratio, like the unclosed-script leak."""
    from etl_process_for_fraud_transactions_spark.operators.text import (
        strip_html,
    )

    df = spark.createDataFrame(
        [(1, "<p>before <img alt=a>b> after</p>")],
        "doc_id long, html string",
    )
    got = strip_html(df).first().text
    assert "before" in got and "after" in got
    assert "b>" in got                 # the pinned honest leak
    assert "<img" not in got           # the truncated tag still strips


def test_unterminated_quote_tag_strips_via_fallback(spark):
    """Round 9: a tag with an unterminated quote and NO later closing
    quote is unmatchable by the quote-aware pattern — the fallback
    pass strips it with the blunt <[^>]+> pattern instead of leaking
    the raw tag text verbatim into the corpus (ADVICE r8)."""
    from etl_process_for_fraud_transactions_spark.operators.text import (
        strip_html,
    )

    df = spark.createDataFrame(
        [(1, '<p>keep this</p><a href="broken> tail text')],
        "doc_id long, html string",
    )
    got = strip_html(df).first().text
    assert "keep this" in got
    assert "tail text" in got          # text after the bad tag survives
    assert "<a href=" not in got       # the malformed tag does NOT leak
    assert "broken" not in got


def test_latin_range_excludes_multiply_divide_signs(spark):
    """Round 8: U+00D7 (×) and U+00F7 (÷) are NOT letters — they must
    not count as latin, so ratios stay <= 1 and a digit-and-× heavy
    string is never reported latin-dominant."""
    from etl_process_for_fraud_transactions_spark.operators.text import (
        dominant_script,
        script_ratios,
    )

    rows = [
        (1, "3×4÷5 ×××× 12÷6"),            # no letters at all
        (2, "ab ×÷ это текст кир"),         # cyrillic letters dominate
        (3, "Ärger übt Çå"),                # accented latin still latin
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.s
        for r in df.select("doc_id", dominant_script("text").alias("s")).collect()
    }
    assert got[1] == "und"
    assert got[2] == "cyrillic"
    assert got[3] == "latin"
    ratios = df.select(
        "doc_id", *[v.alias(k) for k, v in script_ratios("text").items()]
    )
    for r in ratios.collect():
        for name in ("latin", "cyrillic", "cjk"):
            assert getattr(r, name) <= 1.0 + 1e-9, (r.doc_id, name)
