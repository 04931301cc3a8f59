#!/usr/bin/env python
"""Replicate the grading driver locally: plain SparkSession ->
__spark_entry__ -> every queries() entry at the given SF compared
against its oracle_sql() via DuckDB.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
       python tools/driver_sim.py --times [sf_dir]   # per-row timing table

--times prints one "TIME name spark_s oracle_s" line per row (engine
wall-clock vs DuckDB-replay wall-clock) plus the totals — the data
behind BASELINE.md's driver-budget table, so fold-in decisions for
new query legs are made against measurements instead of guesses.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_rows(df):
    import math

    cols = sorted(df.columns)
    out = []
    for tup in df[cols].itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append(None)
            elif isinstance(v, float):
                row.append(round(v, 9))
            else:
                row.append(str(v))
        out.append(tuple(row))
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def main() -> None:
    args = sys.argv[1:]
    times = "--times" in args
    if times:
        args.remove("--times")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    print("ENTRY rows:", entrymod.entry(spark).count())
    import time

    ok, bad = 0, []
    t_spark_total = t_oracle_total = 0.0
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            t0 = time.monotonic()
            sdf = qs[name](spark, sf_dir).toPandas()
            t_spark = time.monotonic() - t0
            if name in osql:
                t0 = time.monotonic()
                odf = con.execute(osql[name]).fetchdf()
                t_oracle = time.monotonic() - t0
                if times:
                    t_spark_total += t_spark
                    t_oracle_total += t_oracle
                    print(f"TIME {name} {t_spark:.2f} {t_oracle:.2f}")
                if (
                    len(sdf) == len(odf)
                    and sorted(sdf.columns) == sorted(odf.columns)
                    and norm_rows(sdf) == norm_rows(odf)
                ):
                    ok += 1
                else:
                    bad.append(name)
                    print(f"FAIL {name}: spark={len(sdf)} oracle={len(odf)}")
            else:
                if times:
                    t_spark_total += t_spark
                    print(f"TIME {name} {t_spark:.2f} -")
                ok += 1
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(f"FAIL {name}: {str(exc)[:200]}")
    total = len(only) if only else len(qs)
    if times:
        print(f"TIME_TOTAL spark={t_spark_total:.1f}s oracle={t_oracle_total:.1f}s")
    print(f"RESULT {ok}/{total} pass; failures: {bad}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
