"""Content snapshot (SK3): table-level row-MinHash sketch + table dedup.

Re-designs reference ``create_content_snapshot`` (data_prep.py:319-337):
every row is stringified and space-joined, the set of row-strings is
MinHashed (100 perms) into a table-level signature; near-duplicate
TABLES are then detected by signature agreement — the reference's dedup
primitive and the basis of its content-addressed store.

Spark shape: a projection (``concat_ws``) then the same wide MIN
aggregate as column MinHash — one scan, 100 longs out, regardless of
table size. Columns are stringified explicitly (ints/strings only by
default) because float formatting differs across engines; the engine
defines snapshot semantics over explicitly-cast columns (documented
divergence from pandas str()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tabsketchfm_spark.functions.sqltext import sql_ident, sql_str_lit
from tabsketchfm_spark.functions.hashing import (
    MINHASH_PRIME,
    NUM_PERM,
    h32_sql,
    minhash_agg_sql,
    perms_cte_duckdb,
)


def content_snapshot(
    df: DataFrame, table_name: str, columns: list[str], num_perm: int = NUM_PERM
) -> DataFrame:
    """(table_name, perm, sig) — 100-slot row-set MinHash."""
    cols = ", ".join(f"CAST({sql_ident(c)} AS STRING)" for c in columns)
    h = h32_sql("row_str", "spark")
    sig = (
        df.selectExpr(f"concat_ws(' ', {cols}) AS row_str")
        .selectExpr(f"{h} AS h")
        .agg(*[F.expr(s) for s in minhash_agg_sql("h", num_perm)])
    )
    structs = ", ".join(
        f"named_struct('perm', {i}, 'sig', mh{i})" for i in range(num_perm)
    )
    tn = sql_str_lit(table_name)
    return sig.selectExpr(
        f"{tn} AS table_name", f"inline(array({structs}))"
    )


def content_snapshot_oracle_sql(
    table: str, columns: list[str], num_perm: int = NUM_PERM
) -> str:
    cols = ", ".join(f"CAST({c} AS VARCHAR)" for c in columns)
    h = h32_sql("row_str", "duckdb")
    return f"""
WITH perms AS ({perms_cte_duckdb(num_perm)}),
rows_ AS (SELECT concat_ws(' ', {cols}) AS row_str FROM {table})
SELECT '{table}' AS table_name, CAST(i AS INTEGER) AS perm,
       min((a * hv + b) % {MINHASH_PRIME}) AS sig
FROM (SELECT {h} AS hv FROM rows_) hrows, perms GROUP BY i
"""


def snapshot_similarity(
    df: DataFrame,
    table_name: str,
    columns: list[str],
    variant_filters: dict[str, str],
    num_perm: int = NUM_PERM,
) -> DataFrame:
    """Near-duplicate TABLE detection: estimated row-set Jaccard between
    filtered variants of a table (pairwise slot agreement of their
    snapshots). Output: (variant_a, variant_b, est_jaccard)."""
    snaps = None
    for vname, predicate in variant_filters.items():
        s = content_snapshot(df.where(predicate), vname, columns, num_perm)
        snaps = s if snaps is None else snaps.unionByName(s)
    a = snaps.select(
        F.col("table_name").alias("variant_a"), "perm", F.col("sig").alias("sig_a")
    )
    b = snaps.select(
        F.col("table_name").alias("variant_b"), "perm", F.col("sig").alias("sig_b")
    )
    return (
        a.join(b, "perm")
        .where(F.col("variant_a") < F.col("variant_b"))
        .groupBy("variant_a", "variant_b")
        .agg(F.avg((F.col("sig_a") == F.col("sig_b")).cast("double")).alias("est_jaccard"))
    )


def snapshot_similarity_oracle_sql(
    table: str,
    columns: list[str],
    variant_filters: dict[str, str],
    num_perm: int = NUM_PERM,
) -> str:
    cols = ", ".join(f"CAST({c} AS VARCHAR)" for c in columns)
    h = h32_sql("row_str", "duckdb")
    snaps = []
    for vname, predicate in variant_filters.items():
        snaps.append(
            f"""SELECT '{vname}' AS table_name, i AS perm,
                   min((a * hv + b) % {MINHASH_PRIME}) AS sig
            FROM (SELECT {h} AS hv FROM (SELECT concat_ws(' ', {cols}) AS row_str
                  FROM {table} WHERE {predicate}) rows_) hrows, perms GROUP BY i"""
        )
    body = "\nUNION ALL\n".join(snaps)
    return f"""
WITH perms AS ({perms_cte_duckdb(num_perm)}),
snaps AS ({body})
SELECT a.table_name AS variant_a, b.table_name AS variant_b,
       avg(CASE WHEN a.sig = b.sig THEN CAST(1.0 AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END) AS est_jaccard
FROM snaps a JOIN snaps b ON a.perm = b.perm AND a.table_name < b.table_name
GROUP BY 1, 2
"""
