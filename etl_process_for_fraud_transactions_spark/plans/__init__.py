from .queries import QUERIES, ORACLE  # noqa: F401
