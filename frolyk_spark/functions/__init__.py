from frolyk_spark.functions.hashing import portable_hash_expr, portable_hash_sql

__all__ = ["portable_hash_expr", "portable_hash_sql"]
