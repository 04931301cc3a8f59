"""As-of join: known-answer and edge cases."""

from __future__ import annotations

import datetime as dt

import pytest

from etl_process_for_fraud_transactions_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, 7, _m(0)), (2, 7, _m(25)), (3, 7, _m(10)), (4, 8, _m(5))],
        "event_id long, k long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(7, _m(10), "a"), (7, _m(20), "b"), (9, _m(0), "z")],
        "k long, ts timestamp_ntz, v string",
    )
    return left, right


def test_asof_basic(spark, frames):
    left, right = frames
    out = {
        r.event_id: r.v
        for r in asof_join(left, right, ["k"], "ts", ["v"], tiebreak_col="event_id").collect()
    }
    assert out == {
        1: None,  # before any right row
        3: "a",   # tie: right row AT 12:10 matches (>= semantics)
        2: "b",   # most recent of {a,b}
        4: None,  # key 8 has no right rows
    }


def test_asof_matches_duckdb(spark, frames):
    import duckdb

    left, right = frames
    got = sorted(
        (r.event_id, r.v)
        for r in asof_join(left, right, ["k"], "ts", ["v"], tiebreak_col="event_id").collect()
    )
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    want = sorted(
        con.execute(
            "SELECT l.event_id, r.v FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    )
    assert got == want


def test_asof_payload_collision_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("v", "ts2").withColumnRenamed("ts2", "ts2"), ["k"], "ts", ["ts"])
