"""Blocked record linkage — entity resolution across two tables.

The data-integration sibling of the engine's column-level discovery
ops: instead of "which columns join", "which ROWS refer to the same
entity". Classic Fellegi-Sunter shape, relational all the way:

1. BLOCKING: candidate pairs come from an equi-join on a cheap
   blocking key (here the nation key) — the step that turns O(|A|·|B|)
   comparison into O(Σ block²), same cost argument as LSH buckets
   (and composable with the lsh.py cap for hot blocks).
2. FIELD SIMILARITY on the candidate pairs only: character-trigram
   Jaccard for names (array_intersect/array_union over distinct
   3-grams — pure expressions, no second explode-join), bounded
   relative closeness for numerics.
3. SCORE: fixed-weight linear combination, thresholded.

Every similarity is exact integer/ratio arithmetic in a fixed
evaluation order, so the DuckDB oracle lands bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _trigrams_spark(col: str) -> str:
    return (
        f"array_distinct(transform(sequence(1, greatest(length(lower({col})) - 2, 1)),"
        f" i -> substring(lower({col}), i, 3)))"
    )


def _trigrams_duckdb(col: str) -> str:
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(length(lower({col})) - 2, 1)),"
        f" i -> substring(lower({col}), i, 3)))"
    )


def record_linkage(
    a: DataFrame,
    b: DataFrame,
    id_cols: tuple[str, str] = ("c_custkey", "s_suppkey"),
    block_cols: tuple[str, str] = ("c_nationkey", "s_nationkey"),
    name_cols: tuple[str, str] = ("c_name", "s_name"),
    num_cols: tuple[str, str] = ("c_acctbal", "s_acctbal"),
    threshold: float = 0.35,
    w_name: float = 0.7,
) -> DataFrame:
    """Linked pairs above the score threshold.
    Output: (id_a, id_b, name_jac, num_sim, score)."""
    ia, ib = id_cols
    ba, bb = block_cols
    na, nb = name_cols
    va, vb = num_cols
    left = a.select(
        F.col(ia).alias("id_a"),
        F.col(ba).alias("blk"),
        F.expr(_trigrams_spark(na)).alias("tg_a"),
        F.col(va).cast("double").alias("v_a"),
    )
    right = b.select(
        F.col(ib).alias("id_b"),
        F.col(bb).alias("blk"),
        F.expr(_trigrams_spark(nb)).alias("tg_b"),
        F.col(vb).cast("double").alias("v_b"),
    )
    pairs = left.join(right, "blk")
    name_jac = (
        F.size(F.array_intersect("tg_a", "tg_b"))
        / F.size(F.array_union("tg_a", "tg_b")).cast("double")
    )
    num_sim = F.lit(1.0) - F.abs(F.col("v_a") - F.col("v_b")) / (
        F.abs(F.col("v_a")) + F.abs(F.col("v_b")) + F.lit(1.0)
    )
    scored = pairs.select(
        "id_a",
        "id_b",
        F.round(name_jac, 6).alias("name_jac"),
        F.round(num_sim, 6).alias("num_sim"),
        F.round(
            F.lit(w_name) * name_jac + F.lit(1.0 - w_name) * num_sim, 6
        ).alias("score"),
    )
    return scored.where(F.col("score") >= threshold)


def record_linkage_oracle_sql(
    table_a: str = "customer",
    table_b: str = "supplier",
    id_cols: tuple[str, str] = ("c_custkey", "s_suppkey"),
    block_cols: tuple[str, str] = ("c_nationkey", "s_nationkey"),
    name_cols: tuple[str, str] = ("c_name", "s_name"),
    num_cols: tuple[str, str] = ("c_acctbal", "s_acctbal"),
    threshold: float = 0.35,
    w_name: float = 0.7,
) -> str:
    ia, ib = id_cols
    ba, bb = block_cols
    na, nb = name_cols
    va, vb = num_cols
    tga = _trigrams_duckdb(na)
    tgb = _trigrams_duckdb(nb)
    return f"""
WITH l AS (SELECT {ia} AS id_a, {ba} AS blk, {tga} AS tg_a,
                  CAST({va} AS DOUBLE) AS v_a FROM {table_a}),
r AS (SELECT {ib} AS id_b, {bb} AS blk, {tgb} AS tg_b,
             CAST({vb} AS DOUBLE) AS v_b FROM {table_b}),
p AS (SELECT id_a, id_b,
             len(list_intersect(tg_a, tg_b))
               / CAST(len(list_distinct(list_concat(tg_a, tg_b))) AS DOUBLE) AS nj,
             1.0 - abs(v_a - v_b) / (abs(v_a) + abs(v_b) + 1.0) AS ns
      FROM l JOIN r USING (blk))
SELECT id_a, id_b, round(nj, 6) AS name_jac, round(ns, 6) AS num_sim,
       round({w_name} * nj + {1.0 - w_name} * ns, 6) AS score
FROM p WHERE round({w_name} * nj + {1.0 - w_name} * ns, 6) >= {threshold}
"""
