from .queries import QUERIES, ORACLE  # noqa: F401
from . import queries_llm  # noqa: F401  (registers the LLM-pipeline inventory)
from . import queries_pipeline  # noqa: F401  (sessions + anomaly scoring)
from . import queries_sql  # noqa: F401  (set ops, rollup, pivot, lag)
