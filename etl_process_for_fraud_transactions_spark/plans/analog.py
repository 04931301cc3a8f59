"""Deterministic fraud-domain analog over the driver's `events` table.

The driver's correctness gate runs each Spark query against a DuckDB
oracle on the same parquet files, so the reference's domain (cards,
accounts, clients, terminals, blacklist — FIXTURES.md §B) is derived
from `events` with pure integer arithmetic that both engines compute
identically:

    transactions : one per event (trans_id=event_id, trans_date=ts,
                   card_num=user_id%100, amt=value, terminal=event_id%40,
                   oper_result = REJECT iff event_type='error')
    cards        : card_num -> account_num = card_num % 80
    accounts     : account_num -> client = account_num % 60,
                   valid_to spread over Jan-Feb 2024
    clients      : client_id with derived fio/passport/phone,
                   passport_valid_to spread over Jan-Mar 2024
    terminals    : terminal_id 0..39, city = CITY_<id%7>
    blacklist    : passports of clients with client_id % 13 == 0

The date spreads land inside the events' time range (Jan 2024) so the
expired-passport / invalid-contract rules genuinely fire.

Every Spark derivation here has a column-identical SQL twin in
SQL_CTES, used as the WITH-prelude of the oracle queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_events


def _s(col):  # int -> string, portable with SQL CAST(x AS VARCHAR)
    return col.cast("string")


def stage_transactions(events: DataFrame) -> DataFrame:
    return events.select(
        F.col("event_id").alias("trans_id"),
        F.col("ts").alias("trans_date"),
        (F.col("user_id") % 100).alias("card_num"),
        F.col("event_type").alias("oper_type"),
        F.col("value").alias("amt"),
        F.when(F.col("event_type") == "error", F.lit("REJECT"))
        .otherwise(F.lit("SUCCESS"))
        .alias("oper_result"),
        (F.col("event_id") % 40).alias("terminal"),
    )


# Dims are generated from spark.range over the full residue domain
# instead of distinct() over events: the modular-arithmetic key spaces
# are closed (0..N-1), and dim keys with no matching fact row join to
# nothing in every query here, so results are identical to the
# distinct-derivation the oracle SQL uses — while costing zero scans
# and zero shuffles (the oracle keeps the declarative DISTINCT form).


def stage_cards(events: DataFrame) -> DataFrame:
    spark = events.sparkSession
    card = F.col("id")
    return spark.range(100).select(
        card.alias("card_num"), (card % 80).alias("account_num")
    )


def stage_accounts(events: DataFrame) -> DataFrame:
    spark = events.sparkSession
    acct = F.col("id")
    return spark.range(80).select(
        acct.alias("account_num"),
        F.date_add(F.lit("2024-01-01").cast("date"), (acct % 45).cast("int")).alias(
            "valid_to"
        ),
        (acct % 60).alias("client"),
    )


def stage_clients(events: DataFrame) -> DataFrame:
    spark = events.sparkSession
    cid = F.col("id")
    return spark.range(60).select(
        cid.alias("client_id"),
        F.concat(F.lit("L"), _s(cid)).alias("last_name"),
        F.concat(F.lit("F"), _s(cid)).alias("first_name"),
        F.concat(F.lit("P"), _s(cid)).alias("patrinymic"),
        F.date_add(F.lit("1970-01-01").cast("date"), cid.cast("int")).alias(
            "date_of_birth"
        ),
        F.concat(F.lit("PA"), _s(cid)).alias("passport_num"),
        F.date_add(
            F.lit("2024-01-01").cast("date"), ((cid * 7) % 60).cast("int")
        ).alias("passport_valid_to"),
        F.concat(F.lit("+7"), _s(cid)).alias("phone"),
    )


def stage_terminals(events: DataFrame) -> DataFrame:
    spark = events.sparkSession
    tid = F.col("id")
    return spark.range(40).select(
        tid.alias("terminal_id"),
        F.when(tid % 2 == 0, F.lit("ATM")).otherwise(F.lit("POS")).alias(
            "terminal_type"
        ),
        F.concat(F.lit("CITY_"), _s(tid % 7)).alias("terminal_city"),
        F.concat(F.lit("ADDR_"), _s(tid)).alias("terminal_address"),
    )


def stage_blacklist(events: DataFrame) -> DataFrame:
    spark = events.sparkSession
    cid = F.col("id")
    return (
        spark.range(60)
        .filter(cid % 13 == 0)
        .select(
            F.concat(F.lit("PA"), _s(cid)).alias("passport_num"),
            F.lit("2024-01-01").cast("date").alias("entry_dt"),
        )
    )


def with_deleted_flg(df: DataFrame) -> DataFrame:
    """Analog dims are single-snapshot (bootstrap) -> all current."""
    return df.withColumn("deleted_flg", F.lit(False))


def domain_frames(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    events = load_events(spark, sf_dir)
    frames = {
        "transactions": stage_transactions(events),
        "cards": with_deleted_flg(stage_cards(events)),
        "accounts": with_deleted_flg(stage_accounts(events)),
        "clients": with_deleted_flg(stage_clients(events)),
        "terminals": with_deleted_flg(stage_terminals(events)),
        "blacklist": stage_blacklist(events),
    }
    return frames


# ---------------------------------------------------------------------------
# SQL twins (DuckDB). Column-for-column identical to the Spark frames.
# ---------------------------------------------------------------------------

SQL_CTES = """
transactions AS (
    SELECT event_id AS trans_id,
           ts AS trans_date,
           user_id % 100 AS card_num,
           event_type AS oper_type,
           value AS amt,
           CASE WHEN event_type = 'error' THEN 'REJECT' ELSE 'SUCCESS' END AS oper_result,
           event_id % 40 AS terminal
    FROM events
),
cards AS (
    SELECT DISTINCT user_id % 100 AS card_num,
                    (user_id % 100) % 80 AS account_num,
                    FALSE AS deleted_flg
    FROM events
),
accounts AS (
    SELECT DISTINCT (user_id % 100) % 80 AS account_num,
                    DATE '2024-01-01' + CAST(((user_id % 100) % 80) % 45 AS INT) AS valid_to,
                    ((user_id % 100) % 80) % 60 AS client,
                    FALSE AS deleted_flg
    FROM events
),
clients AS (
    SELECT DISTINCT ((user_id % 100) % 80) % 60 AS client_id,
                    'L' || CAST(((user_id % 100) % 80) % 60 AS VARCHAR) AS last_name,
                    'F' || CAST(((user_id % 100) % 80) % 60 AS VARCHAR) AS first_name,
                    'P' || CAST(((user_id % 100) % 80) % 60 AS VARCHAR) AS patrinymic,
                    DATE '1970-01-01' + CAST(((user_id % 100) % 80) % 60 AS INT) AS date_of_birth,
                    'PA' || CAST(((user_id % 100) % 80) % 60 AS VARCHAR) AS passport_num,
                    DATE '2024-01-01' + CAST(((((user_id % 100) % 80) % 60) * 7) % 60 AS INT) AS passport_valid_to,
                    '+7' || CAST(((user_id % 100) % 80) % 60 AS VARCHAR) AS phone,
                    FALSE AS deleted_flg
    FROM events
),
terminals AS (
    SELECT DISTINCT event_id % 40 AS terminal_id,
                    CASE WHEN (event_id % 40) % 2 = 0 THEN 'ATM' ELSE 'POS' END AS terminal_type,
                    'CITY_' || CAST((event_id % 40) % 7 AS VARCHAR) AS terminal_city,
                    'ADDR_' || CAST(event_id % 40 AS VARCHAR) AS terminal_address,
                    FALSE AS deleted_flg
    FROM events
),
blacklist AS (
    SELECT DISTINCT 'PA' || CAST(((user_id % 100) % 80) % 60 AS VARCHAR) AS passport_num,
                    DATE '2024-01-01' AS entry_dt
    FROM events
    WHERE ((user_id % 100) % 80) % 60 % 13 = 0
)
""".strip()


def oracle_with_domain(body: str, extra_ctes: str = "") -> str:
    """Compose an oracle query: WITH <domain CTEs>[, extra] <body>."""
    ctes = SQL_CTES + ("," + extra_ctes if extra_ctes else "")
    return f"WITH {ctes}\n{body}"
