from .registry import ORACLE, QUERIES, oracle, query

__all__ = ["QUERIES", "ORACLE", "query", "oracle"]
