"""Typed schemas mirroring the reference DDL (main.ddl:2-124).

The staging schema is the ingest contract: sources are projected and
renamed into it (including the reference's own `patrinymic` typo, which
is part of the schema contract — SURVEY.md §7.4)."""

from __future__ import annotations

from pyspark.sql import types as T

# --- staging (main.ddl:2-48) -------------------------------------------------

STG_TRANSACTIONS = T.StructType(
    [
        T.StructField("trans_id", T.StringType()),
        T.StructField("trans_date", T.TimestampNTZType()),
        T.StructField("card_num", T.StringType()),
        T.StructField("oper_type", T.StringType()),
        T.StructField("amt", T.DecimalType(22, 2)),
        T.StructField("oper_result", T.StringType()),
        T.StructField("terminal", T.StringType()),
    ]
)

STG_CLIENTS = T.StructType(
    [
        T.StructField("client_id", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("patrinymic", T.StringType()),  # sic (main.ddl:18)
        T.StructField("date_of_birth", T.DateType()),
        T.StructField("passport_num", T.StringType()),
        T.StructField("passport_valid_to", T.DateType()),
        T.StructField("phone", T.StringType()),
    ]
)

STG_ACCOUNTS = T.StructType(
    [
        T.StructField("account_num", T.StringType()),
        T.StructField("valid_to", T.DateType()),
        T.StructField("client", T.StringType()),
    ]
)

STG_CARDS = T.StructType(
    [
        T.StructField("card_num", T.StringType()),
        T.StructField("account_num", T.StringType()),
    ]
)

STG_TERMINALS = T.StructType(
    [
        T.StructField("terminal_id", T.StringType()),
        T.StructField("terminal_type", T.StringType()),
        T.StructField("terminal_city", T.StringType()),
        T.StructField("terminal_address", T.StringType()),
    ]
)

STG_BLACKLIST = T.StructType(
    [
        T.StructField("passport_num", T.StringType()),
        T.StructField("entry_dt", T.DateType()),
    ]
)

#: SCD2 bookkeeping columns appended to every dimension (main.ddl:56-58).
SCD2_COLS = ["effective_from", "effective_to", "deleted_flg"]

#: dimension name -> (business key cols, tracked attribute cols)
DIMENSIONS = {
    "clients": (
        ["client_id"],
        [
            "last_name",
            "first_name",
            "patrinymic",
            "date_of_birth",
            "passport_num",
            "passport_valid_to",
            "phone",
        ],
    ),
    "accounts": (["account_num"], ["valid_to", "client"]),
    "cards": (["card_num"], ["account_num"]),
    "terminals": (
        ["terminal_id"],
        ["terminal_type", "terminal_city", "terminal_address"],
    ),
}

REP_FRAUD = T.StructType(
    [
        T.StructField("event_dt", T.TimestampNTZType()),
        T.StructField("passport", T.StringType()),
        T.StructField("fio", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("report_dt", T.DateType()),
    ]
)
