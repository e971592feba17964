from mallarddv_spark.functions.hashing import (
    apply_transformation,
    hash_col,
    hash_sql,
    quote_ident,
)

__all__ = ["hash_sql", "hash_col", "apply_transformation", "quote_ident"]
