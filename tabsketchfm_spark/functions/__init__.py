from tabsketchfm_spark.functions.hashing import (
    MINHASH_PRIME,
    NUM_PERM,
    h32_sql,
    h64_sql,
    minhash_agg_exprs,
    minhash_perm_params,
    perms_cte_duckdb,
)

__all__ = [
    "MINHASH_PRIME",
    "NUM_PERM",
    "h32_sql",
    "h64_sql",
    "minhash_agg_exprs",
    "minhash_perm_params",
    "perms_cte_duckdb",
]
