from .filestream import stream_transactions, ingest_available_now  # noqa: F401
