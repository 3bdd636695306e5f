from .registry import QUERIES, Query, oracle_map, query_map, register

# import for side effects: each module registers its queries
from . import core_queries  # noqa: E402,F401
from . import function_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import vector_queries  # noqa: E402,F401
from . import ml_queries  # noqa: E402,F401
from . import multimodal_queries  # noqa: E402,F401
from . import olap_queries  # noqa: E402,F401
from . import asof_queries  # noqa: E402,F401
from . import session_queries  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import analytics_queries  # noqa: E402,F401

__all__ = ["QUERIES", "Query", "register", "query_map", "oracle_map"]
