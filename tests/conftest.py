from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_process_for_fraud_transactions_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = os.path.join(TESTDATA, "sf0.001")
SF_ORACLE = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("etl-fraud-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    return con


def register_views(con, sf_dir: str) -> None:
    """Mirror the driver's DuckDB setup: each parquet table as a view."""
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def compare_with_oracle(spark, con, fn, sql, sf_dir, float_rel=1e-12):
    """Local replica of the driver's t2 gate: row count, column names,
    order-insensitive values."""
    import math

    sdf = fn(spark, sf_dir).toPandas()
    register_views(con, sf_dir)
    odf = con.execute(sql).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"columns differ: {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"row count {len(sdf)} vs {len(odf)}"
    cols = sorted(sdf.columns)

    def norm(df):
        rows = []
        for tup in df[cols].itertuples(index=False):
            row = []
            for v in tup:
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    row.append(None)
                elif isinstance(v, float):
                    row.append(round(v, 9))
                else:
                    row.append(str(v))
            rows.append(tuple(row))
        return sorted(rows, key=lambda r: tuple(str(x) for x in r))

    a, b = norm(sdf), norm(odf)
    mismatches = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert a == b, f"value mismatch at sorted rows {mismatches}: " + "; ".join(
        f"{a[i]} != {b[i]}" for i in mismatches
    )


# ---------------------------------------------------------------------------
# Core tier (pytest.ini: two-tier rhythm, VERDICT r15 #5). Whole fast
# modules by name, plus one representative end-to-end test per index
# family from the heavy modules. Everything else runs at round edges.
# ---------------------------------------------------------------------------

CORE_MODULES = {
    "test_plan_invariants",  # registry/oracle guards + plan lint
    "test_scd2",
    "test_rules",
    "test_writer_race",      # multi-writer contract, all families
    "test_bench_drift",
    # r16: driver-side metadata I/O fast path + §2.6 overlap helper —
    # every index family's pointer flip rides these primitives now
    "test_warehouse_fastpath",
}

CORE_TESTS = {
    # one per index family (build + serve + store round-trip)
    "test_bm25_index_serves_parity_with_in_plan",
    "test_pq_index_store_guard_and_versioned_flip",
    "test_ivf_matches_bruteforce_with_full_probe",
    "test_filter_new_matches_union_near_dedup",
    # sources: the atomic-overwrite contract everything sits on
    "test_atomic_overwrite_same_path",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[")[0]
        if mod in CORE_MODULES or name in CORE_TESTS:
            item.add_marker(pytest.mark.core)
