"""JDBC source smoke test (SURVEY.md §2.1 S6) against embedded Apache
Derby — the one JDBC engine already on Spark's classpath, so the test
needs no network and no extra jars. Covers both directions: Spark
writes a table over JDBC, then sources.jdbc.read_jdbc_table pulls it
back as a PARTITIONED read (4 bound-split connections) and the rows
must round-trip exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_process_for_fraud_transactions_spark.sources.jdbc import read_jdbc_table

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "db"
    url = f"jdbc:derby:{db_dir};create=true"
    # seed through Spark's own JDBC writer (same driver jar)
    df = spark.range(0, 100).select(
        F.col("id").alias("client_id"),
        F.concat(F.lit("client_"), F.col("id").cast("string")).alias("name"),
        (F.col("id") % 7).cast("double").alias("balance"),
    )
    df.write.format("jdbc").option("url", url).option(
        "dbtable", "clients"
    ).option("driver", DRIVER).mode("overwrite").save()
    return url


def test_partitioned_jdbc_roundtrip(spark, derby_url):
    out = read_jdbc_table(
        spark,
        derby_url,
        "clients",
        properties={"driver": DRIVER},
        partition_column='"client_id"',
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
    )
    assert out.rdd.getNumPartitions() == 4
    rows = sorted((r.client_id, r.name, r.balance) for r in out.collect())
    assert len(rows) == 100
    assert rows[0] == (0, "client_0", 0.0)
    assert rows[13] == (13, "client_13", 6.0)
    # partition bounds must not drop or duplicate rows
    assert [r[0] for r in rows] == list(range(100))


def test_unpartitioned_read_and_pushdown(spark, derby_url):
    out = read_jdbc_table(
        spark, derby_url, "clients", properties={"driver": DRIVER}
    ).filter(F.col("client_id") < 10)
    # the filter is pushed into the JDBC scan (PushedFilters in the plan)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "client_id" in plan
    assert out.count() == 10
