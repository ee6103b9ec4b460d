from .registry import QueryDef, all_queries, register  # noqa: F401
