from .queries import QUERIES, QueryDef

__all__ = ["QUERIES", "QueryDef"]
