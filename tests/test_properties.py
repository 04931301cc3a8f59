"""Property-based tests (hypothesis): custom operators are checked
against brute-force reference models on randomized inputs.

- bucketed range joins ≡ naive join + residual filter (catches bucket
  boundary/tagging mistakes no example test would);
- SCD2 ≡ a driver-side dict model of close-out/insert semantics over
  random multi-batch histories;
- prefix-filtered Jaccard ≡ all-pairs brute force;
- pack_chunks(shard_col) ≡ a per-shard running-sum fold (the greedy
  contract the document_chunks oracle replays);
- scrub_pii ≡ identity on digit-free/@-free text (the soundness half
  of the doc_fingerprints PII-probe design).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_process_for_fraud_transactions_spark.operators.rangejoin import (
    bucketed_abs_window_self_join,
    bucketed_interval_self_join,
)
from etl_process_for_fraud_transactions_spark.operators.scd2 import scd2_apply

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
WINDOW_US = 10 * 60 * 1_000_000  # 10 minutes

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),        # key
        st.integers(min_value=0, max_value=3_000),    # offset seconds (~5 bucket widths)
        st.integers(min_value=0, max_value=999_999),  # microseconds (bucket-edge adjacent)
    ),
    min_size=0,
    max_size=25,
)


def _df(spark, rows):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("k", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
        ]
    )
    data = [
        (i, k, T0 + dt.timedelta(seconds=s, microseconds=us))
        for i, (k, s, us) in enumerate(rows)
    ]
    return spark.createDataFrame(data, schema), data


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_interval_join_matches_naive(spark, rows):
    df, data = _df(spark, rows)
    got = {
        (r[0], r[1])
        for r in bucketed_interval_self_join(df, ["k"], "ts", WINDOW_US)
        .select(F.col("r1.id"), F.col("r2.id"))
        .collect()
    }
    want = {
        (i1, i2)
        for i1, k1, t1 in data
        for i2, k2, t2 in data
        if k1 == k2 and t1 <= t2 <= t1 + dt.timedelta(microseconds=WINDOW_US)
    }
    assert got == want


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_abs_window_join_matches_naive(spark, rows):
    df, data = _df(spark, rows)
    got = {
        (r[0], r[1])
        for r in bucketed_abs_window_self_join(df, ["k"], "ts", WINDOW_US)
        .select(F.col("a.id"), F.col("b.id"))
        .collect()
    }
    want = {
        (i1, i2)
        for i1, k1, t1 in data
        for i2, k2, t2 in data
        if k1 == k2 and abs((t1 - t2).total_seconds()) * 1_000_000 <= WINDOW_US
    }
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy, events_strategy)
def test_asof_join_matches_naive(spark, left_rows, right_rows):
    from etl_process_for_fraud_transactions_spark.operators.asof import asof_join

    ldf, ldata = _df(spark, left_rows)
    # right side must be unique per (key, ts): dedup keeping min id
    seen = {}
    for i, (k, s, us) in enumerate(right_rows):
        seen.setdefault((k, s, us), i)
    rdata = [
        (i, k, T0 + dt.timedelta(seconds=s, microseconds=us))
        for (k, s, us), i in seen.items()
    ]
    rdf = spark.createDataFrame(
        [(i, k, t, f"v{i}") for i, k, t in rdata],
        "rid long, k long, ts timestamp_ntz, v string",
    ).drop("rid")
    got = {
        r.id: r.v
        for r in asof_join(ldf, rdf, ["k"], "ts", ["v"], tiebreak_col="id").collect()
    }
    want = {}
    for i, k, t in [
        (i, k, T0 + dt.timedelta(seconds=s, microseconds=us))
        for i, (k, s, us) in enumerate(left_rows)
    ]:
        cands = [(rt, f"v{ri}") for (rk, rs, rus), ri in seen.items()
                 for rt in [T0 + dt.timedelta(seconds=rs, microseconds=rus)]
                 if rk == k and rt <= t]
        want[i] = max(cands)[1] if cands else None
    assert got == want


# --- SCD2 vs dict model ----------------------------------------------------

batches_strategy = st.lists(
    st.dictionaries(
        keys=st.integers(min_value=0, max_value=4),           # business key
        values=st.integers(min_value=0, max_value=3),         # attribute
        max_size=5,
    ),
    min_size=1,
    max_size=4,
)

OPEN = dt.date(3000, 1, 1)


def _model_scd2(batches):
    """Reference model of main.py:121-379 semantics: rows as tuples
    (key, attr, eff_from, eff_to, deleted)."""
    hist: list[list] = []
    for i, batch in enumerate(batches):
        bdate = dt.date(2024, 1, 1) + dt.timedelta(days=i)
        if not hist:
            for k, v in batch.items():
                hist.append([k, v, bdate, OPEN, False])
            continue
        current = {r[0]: r for r in hist if r[3] == OPEN}
        # close-out: tuple-IN of (current ∩ staged, changed) full tuples
        close_tuples = {
            tuple(current[k][:2]) for k, v in batch.items()
            if k in current and current[k][1] != v
        }
        for r in hist:
            if tuple(r[:2]) in close_tuples:
                r[3], r[4] = bdate, True
        for k, v in batch.items():
            cur = current.get(k)
            if cur is None or cur[1] != v:
                hist.append([k, v, bdate, OPEN, False])
    return sorted(map(tuple, hist))


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(batches_strategy)
def test_scd2_matches_model(spark, batches):
    dim = None
    for i, batch in enumerate(batches):
        bdate = dt.date(2024, 1, 1) + dt.timedelta(days=i)
        stg = spark.createDataFrame(
            [(k, v) for k, v in batch.items()] or [],
            "k long, attr long",
        )
        if not batch:
            stg = spark.createDataFrame([], "k long, attr long")
        dim = scd2_apply(dim, stg, ["k"], ["attr"], F.lit(bdate))
    got = sorted(
        (r.k, r.attr, r.effective_from, r.effective_to, r.deleted_flg)
        for r in dim.collect()
    )
    assert got == _model_scd2(batches)


# --- exact prefix-filter Jaccard join ≡ brute force ------------------------

# tiny alphabet + short docs maximize shingle collisions and boundary
# Jaccard values — the regime where a candidate-generation bug (missed
# prefix, off-by-one in the prefix length) actually drops pairs
_doc_strategy = st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1"]),                               # source
        st.lists(st.sampled_from(list("abcd")), min_size=1, max_size=8),  # tokens
    ),
    min_size=0,
    max_size=10,
)


def _shingle_set(tokens: list[str], k: int = 3) -> set[str]:
    if len(tokens) <= k:
        return {" ".join(tokens)}
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_doc_strategy)
def test_prefix_filter_jaccard_matches_bruteforce(spark, docs):
    from itertools import combinations

    from etl_process_for_fraud_transactions_spark.operators.dedup import (
        ngram_jaccard_pairs_exact,
    )

    rows = [(i, src, " ".join(toks)) for i, (src, toks) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs_exact(
            df, threshold=0.5, group_col="source"
        ).collect()
    }

    expected = {}
    for (ia, sa, ta), (ib, sb, tb) in combinations(rows, 2):
        if sa != sb:
            continue
        A, B = _shingle_set(ta.split()), _shingle_set(tb.split())
        j = len(A & B) / len(A | B)
        if j >= 0.5:
            expected[(min(ia, ib), max(ia, ib))] = j

    assert set(got) == set(expected)
    for pair, j in expected.items():
        assert abs(got[pair] - j) < 1e-12, pair


_chunk_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),   # doc_id
        st.integers(min_value=0, max_value=40),   # chunk_id
        st.integers(min_value=1, max_value=50),   # n_chunk_tokens
        st.integers(min_value=0, max_value=4),    # shard value
    ),
    min_size=0,
    max_size=60,
    unique_by=lambda t: (t[0], t[1]),
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_chunk_rows_strategy)
def test_pack_chunks_shard_col_matches_running_sum_model(spark, rows):
    """pack_chunks(shard_col=...) ≡ a driver-side running-sum fold per
    shard in (doc_id, chunk_id) order — the exact greedy contract the
    document_chunks oracle replays in SQL (bin = tokens_before // max,
    pack_id = shard * 2^32 + bin), on randomized shard assignments,
    token sizes and sparse chunk ids."""
    from etl_process_for_fraud_transactions_spark.operators.text import (
        pack_chunks,
    )

    df = spark.createDataFrame(
        rows, "doc_id long, chunk_id long, n_chunk_tokens long, grp long"
    )
    got = {
        (r.doc_id, r.chunk_id): r.pack_id
        for r in pack_chunks(df, max_tokens=64, shard_col="grp").collect()
    }

    expected, running = {}, {}
    for doc_id, chunk_id, n, grp in sorted(rows, key=lambda t: (t[3], t[0], t[1])):
        before = running.get(grp, 0)
        expected[(doc_id, chunk_id)] = grp * 2**32 + before // 64
        running[grp] = before + n

    assert got == expected


_pii_free_text = st.text(
    alphabet=st.sampled_from("abcdefghij xyz.,-"), min_size=0, max_size=80
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_pii_free_text, min_size=1, max_size=8))
def test_scrub_pii_is_identity_without_digits_or_at(spark, texts):
    """Soundness half of the pii probe design: text containing no
    digit and no '@' can match none of the five patterns (each
    requires one or the other), so scrub_pii must be a byte-identity
    with n_pii_masked == 0 — on randomized letter/punct/separator
    strings including '-'/'.' runs that brush the SSN/IP shapes."""
    from etl_process_for_fraud_transactions_spark.operators.text import (
        scrub_pii,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    for r in scrub_pii(df).collect():
        assert r.n_pii_masked == 0, r
        assert r.text == texts[r.doc_id], r


# --- BPE (round 10): driver-model properties over random text ------------

@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_bpe_byte_level_invariants(texts):
    """For ANY unicode text: count == len(ids); every id is in the
    closed vocab; decode∘encode is a canonical fixpoint; and the
    token count is bounded by [#pretokens, #utf8 bytes + #pretokens]
    (each word is at least one token, at most bytes+eow)."""
    from etl_process_for_fraud_transactions_spark.operators.bpe import (
        FROZEN_BPE_BYTES,
        _pretokens,
    )

    v = set(FROZEN_BPE_BYTES.vocab().values())
    for s in texts:
        ids = FROZEN_BPE_BYTES.encode_ids(s)
        assert FROZEN_BPE_BYTES.count_tokens(s) == len(ids)
        assert set(ids) <= v
        words = _pretokens(s)
        n_bytes = sum(len(w.encode("utf-8")) for w in words)
        assert len(words) <= len(ids) <= n_bytes + len(words)
        decoded = FROZEN_BPE_BYTES.decode_ids(ids)
        assert FROZEN_BPE_BYTES.encode_ids(decoded) == ids


@given(
    s=st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=80,
    )
)
@settings(max_examples=60, deadline=None)
def test_langid_normalization_invariance(s):
    """classify_py is invariant under leading/trailing junk that the
    normalizer deletes (digits, punctuation, extra whitespace) — the
    gram stream sees only letter runs."""
    from etl_process_for_fraud_transactions_spark.operators.langid import (
        FROZEN_ROMANCE,
    )

    base = FROZEN_ROMANCE.score_py(s)
    noisy = FROZEN_ROMANCE.score_py(f"  12, {s} ...77! ")
    assert noisy == base


# --- rule 4 window-vs-pairs equivalence (round 10) -----------------------

diff_city_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),                 # card
        st.integers(min_value=0, max_value=9_000),             # offset s
        st.sampled_from(["A", "B", "C", None]),                # city
        st.integers(min_value=0, max_value=3),                 # client
    ),
    min_size=0,
    max_size=25,
)


@given(rows=diff_city_rows)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rule_diff_city_window_matches_pairs(spark, rows):
    """The round-10 range-frame rewrite of rule 4 must equal the
    bucketed pair join on randomized card/time/city data — including
    null cities (neither hits nor witnesses), boundary-exact +/-1h
    offsets and duplicate rows."""
    from etl_process_for_fraud_transactions_spark.operators.rules import (
        rule_diff_city_1h,
        rule_diff_city_1h_window,
    )

    data = [
        (
            i,
            card,
            T0 + dt.timedelta(seconds=off),
            city,
            client,
        )
        for i, (card, off, city, client) in enumerate(rows)
    ]
    schema = T.StructType(
        [
            T.StructField("trans_id", T.LongType()),
            T.StructField("card_num", T.LongType()),
            T.StructField("trans_date", T.TimestampNTZType()),
            T.StructField("terminal_city", T.StringType()),
            T.StructField("client_id", T.LongType()),
        ]
    )
    df = spark.createDataFrame(data, schema)
    key = lambda out: sorted(
        (r["trans_id"], r["client_id"]) for r in out.collect()
    )
    assert key(rule_diff_city_1h_window(df)) == key(rule_diff_city_1h(df))


brute_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),      # client
        st.integers(min_value=0, max_value=4_000),  # offset s (~3 windows)
        st.integers(min_value=1, max_value=5),      # amt (ties likely)
        st.sampled_from(["REJECT", "SUCCESS"]),
    ),
    min_size=0,
    max_size=18,
)


@given(rows=brute_rows)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rule_brute_force_window_matches_pairs(spark, rows):
    """The round-10 windowed candidate stage of rule 5 must equal the
    all-pairs implementation on randomized client/time/amount/outcome
    data — dense REJECT bursts, amount ties (broken by trans_id in
    both), exact 20-min boundaries and multi-window overlaps."""
    from etl_process_for_fraud_transactions_spark.operators.rules import (
        rule_brute_force_20min,
        rule_brute_force_20min_window,
    )

    data = [
        (
            i,
            client,
            float(amt),
            T0 + dt.timedelta(seconds=off),
            result,
            f"P{client}",
        )
        for i, (client, off, amt, result) in enumerate(rows)
    ]
    schema = T.StructType(
        [
            T.StructField("trans_id", T.LongType()),
            T.StructField("client_id", T.LongType()),
            T.StructField("amt", T.DoubleType()),
            T.StructField("trans_date", T.TimestampNTZType()),
            T.StructField("oper_result", T.StringType()),
            T.StructField("passport_num", T.StringType()),
        ]
    )
    df = spark.createDataFrame(data, schema)
    key = lambda out: sorted(
        (r["client_id"], r["trans_id"]) for r in out.collect()
    )
    assert key(rule_brute_force_20min_window(df)) == key(
        rule_brute_force_20min(df)
    )


# --- celebrity-key gate routing equivalence (round 11) --------------------

@given(rows=diff_city_rows)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rule_diff_city_gate_routing_matches_ungated(spark, rows):
    """The measured celebrity-key gate must be output-invariant on
    ARBITRARY data, not just the planted fixture: with a tiny
    threshold (hot cards trip constantly on these densities, including
    the duplicate-(trans_id, client_id)-across-legs corner the outer
    distinct exists for), the routed hot/cold union equals the pure
    window form."""
    from etl_process_for_fraud_transactions_spark.operators.rules import (
        rule_diff_city_1h_window,
    )

    data = [
        (i, card, T0 + dt.timedelta(seconds=off), city, client)
        for i, (card, off, city, client) in enumerate(rows)
    ]
    schema = T.StructType(
        [
            T.StructField("trans_id", T.LongType()),
            T.StructField("card_num", T.LongType()),
            T.StructField("trans_date", T.TimestampNTZType()),
            T.StructField("terminal_city", T.StringType()),
            T.StructField("client_id", T.LongType()),
        ]
    )
    df = spark.createDataFrame(data, schema)
    key = lambda out: sorted(
        (r["trans_id"], r["client_id"]) for r in out.collect()
    )
    assert key(rule_diff_city_1h_window(df, hot_key_max_rows=3)) == key(
        rule_diff_city_1h_window(df, hot_key_max_rows=None)
    )


@given(rows=brute_rows)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rule_brute_force_gate_routing_matches_ungated(spark, rows):
    """Rule 5's gated candidate union (window candidates for cold
    clients + pair candidates for hot ones, shared member fetch) must
    equal the pure windowed form on arbitrary dense/tied/boundary
    data."""
    from etl_process_for_fraud_transactions_spark.operators.rules import (
        rule_brute_force_20min_window,
    )

    data = [
        (
            i,
            client,
            float(amt),
            T0 + dt.timedelta(seconds=off),
            result,
            f"P{client}",
        )
        for i, (client, off, amt, result) in enumerate(rows)
    ]
    schema = T.StructType(
        [
            T.StructField("trans_id", T.LongType()),
            T.StructField("client_id", T.LongType()),
            T.StructField("amt", T.DoubleType()),
            T.StructField("trans_date", T.TimestampNTZType()),
            T.StructField("oper_result", T.StringType()),
            T.StructField("passport_num", T.StringType()),
        ]
    )
    df = spark.createDataFrame(data, schema)
    key = lambda out: sorted(
        (r["client_id"], r["trans_id"]) for r in out.collect()
    )
    assert key(rule_brute_force_20min_window(df, hot_key_max_rows=3)) == key(
        rule_brute_force_20min_window(df, hot_key_max_rows=None)
    )


# --- RRF fusion vs pure-python replay (round 11) --------------------------

rrf_legs = st.tuples(
    st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=6,
             unique=True),
    st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=6,
             unique=True),
)


@given(legs=rrf_legs, k_rrf=st.sampled_from([10, 60]))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rrf_fuse_matches_python_replay(spark, legs, k_rrf):
    """rrf_fuse must equal a direct python RRF on arbitrary leg rank
    lists: same scores to 9 dp, same (score DESC, id ASC) order, legs
    missing a doc contributing zero."""
    from etl_process_for_fraud_transactions_spark.operators.retrieval import (
        rrf_fuse,
    )

    docs_a, docs_b = legs
    a_rows = [("q", d, r + 1) for r, d in enumerate(docs_a)]
    b_rows = [("q", d, r + 1) for r, d in enumerate(docs_b)]
    schema = "query_id string, doc_id long, rank int"
    a = spark.createDataFrame(a_rows, schema) if a_rows else spark.createDataFrame([], schema)
    b = spark.createDataFrame(b_rows, schema) if b_rows else spark.createDataFrame([], schema)
    got = [
        (r.rank, r.doc_id, r.rrf_score)
        for r in rrf_fuse(a, b, k=20, k_rrf=k_rrf)
        .orderBy("rank")
        .collect()
    ]

    ra = {d: r + 1 for r, d in enumerate(docs_a)}
    rb = {d: r + 1 for r, d in enumerate(docs_b)}
    want_scores = {
        d: round(
            (1.0 / (k_rrf + ra[d]) if d in ra else 0.0)
            + (1.0 / (k_rrf + rb[d]) if d in rb else 0.0),
            9,
        )
        for d in set(ra) | set(rb)
    }
    want = [
        (i + 1, d, want_scores[d])
        for i, d in enumerate(
            sorted(want_scores, key=lambda d: (-want_scores[d], d))
        )
    ]
    assert got == want
