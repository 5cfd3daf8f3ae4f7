"""Embedding-space search: brute-force cosine top-k, column-vote
ranking, and embedding near-duplicate detection.

Re-designs the reference's search core (SURVEY §2.8): T2 brute-force
k-NN (reference embedding_search.py:99-111), K3 join search
(embedding_search.py:166-184), K4 union/subset column-vote search
(embedding_search.py:118-164 = W4 first-match + A11 vote aggregate +
T4 final ranking), T7 self-removal, plus the north-star
embedding-cosine near-dup.

Scale shape: brute-force is a crossJoin — the right default below
~10^5 vectors per side when the small side broadcasts (no shuffle of
the big side). The 100 TB path swaps the crossJoin for an LSH bucket
join (MinHashLSH / random-hyperplane buckets) with identical output
schema; ranking logic is unchanged. Cosine is bit-identical across
engines (see functions/vector.py), so ranks need no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from tabsketchfm_spark.functions.vector import cosine_sql, cosine_sql_duckdb


def _vec(df: DataFrame, id_col: str, vec_col: str, alias_id: str, alias_vec: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(alias_id),
        F.col(vec_col).cast("array<double>").alias(alias_vec),
    )


def cosine_topk(
    emb: DataFrame,
    query_ids_max: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """T2/K3/T7: for each query vector (id < query_ids_max), the k nearest
    other vectors by cosine. Output: (q_id, rank, cand_id, cos)."""
    q = _vec(emb.where(F.col(id_col) < query_ids_max), id_col, vec_col, "q_id", "qv")
    c = _vec(emb, id_col, vec_col, "cand_id", "cv")
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("cand_id") != F.col("q_id"))
    scored = pairs.select(
        "q_id", "cand_id", F.expr(cosine_sql("qv", "cv")).alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "cand_id", F.round("cos", 6).alias("cos"))
    )


def cosine_topk_oracle_sql(
    table: str, query_ids_max: int, k: int = 10
) -> str:
    cos = cosine_sql_duckdb("q.embedding::DOUBLE[]", "c.embedding::DOUBLE[]")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS cand_id, {cos} AS cos
  FROM {table} q JOIN {table} c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {query_ids_max}),
ranked AS (
  SELECT q_id, cand_id, cos,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id)
              AS INTEGER) AS rank
  FROM scored)
SELECT q_id, rank, cand_id, round(cos, 6) AS cos FROM ranked WHERE rank <= {k}
"""


def column_vote_search(
    emb: DataFrame,
    query_label: int = 0,
    over_fetch: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
) -> DataFrame:
    """K4: treat ``label`` as a table id and each vector as a column
    embedding. For every query column (label == query_label): take the
    ``over_fetch`` nearest candidate columns from other tables
    (reference over-fetches k*3 — embedding_search.py:129), keep the
    first (nearest) match per candidate table (W4,
    embedding_search.py:134-141), then aggregate per candidate table
    (matched-column count, summed distance — A11) and rank
    (-count, +sum — T4, embedding_search.py:159-161).

    Output: (cand_table, matched_cols, dist_sum, rank).
    """
    q = emb.where(F.col(group_col) == query_label)
    c = emb.where(F.col(group_col) != query_label)
    qv = q.select(F.col(id_col).alias("q_col"), F.col(vec_col).cast("array<double>").alias("qv"))
    cv = c.select(
        F.col(id_col).alias("cand_col"),
        F.col(group_col).alias("cand_table"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = cv.crossJoin(F.broadcast(qv)).select(
        "q_col",
        "cand_col",
        "cand_table",
        (F.lit(1.0) - F.expr(cosine_sql("qv", "cv"))).alias("dist"),
    )
    wk = Window.partitionBy("q_col").orderBy(F.asc("dist"), F.asc("cand_col"))
    near = scored.withColumn("nn_rank", F.row_number().over(wk)).where(
        F.col("nn_rank") <= over_fetch
    )
    wf = Window.partitionBy("q_col", "cand_table").orderBy(
        F.asc("dist"), F.asc("cand_col")
    )
    first = near.withColumn("fm", F.row_number().over(wf)).where(F.col("fm") == 1)
    votes = first.groupBy("cand_table").agg(
        F.count(F.lit(1)).alias("matched_cols"),
        F.round(F.sum("dist"), 6).alias("dist_sum"),
    )
    wr = Window.orderBy(F.desc("matched_cols"), F.asc("dist_sum"), F.asc("cand_table"))
    return votes.select(
        "cand_table", "matched_cols", "dist_sum", F.row_number().over(wr).alias("rank")
    )


def column_vote_oracle_sql(
    table: str, query_label: int = 0, over_fetch: int = 30
) -> str:
    cos = cosine_sql_duckdb("q.embedding::DOUBLE[]", "c.embedding::DOUBLE[]")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS q_col, c.vec_id AS cand_col, c.label AS cand_table,
         1.0 - ({cos}) AS dist
  FROM {table} q JOIN {table} c ON c.label <> {query_label}
  WHERE q.label = {query_label}),
near AS (
  SELECT *, row_number() OVER (PARTITION BY q_col ORDER BY dist, cand_col) AS nn_rank
  FROM scored QUALIFY nn_rank <= {over_fetch}),
first AS (
  SELECT *, row_number() OVER (PARTITION BY q_col, cand_table
                               ORDER BY dist, cand_col) AS fm
  FROM near QUALIFY fm = 1),
votes AS (
  SELECT cand_table, count(*) AS matched_cols, round(sum(dist), 6) AS dist_sum
  FROM first GROUP BY cand_table)
SELECT cand_table, matched_cols, dist_sum,
       CAST(row_number() OVER (ORDER BY matched_cols DESC, dist_sum, cand_table)
            AS INTEGER) AS rank
FROM votes
"""


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """North-star near-dup: vector pairs with cosine >= threshold.
    Brute force here; at scale the pair generation becomes an LSH
    bucket join with this as the verify stage."""
    a = _vec(emb, id_col, vec_col, "id_a", "va")
    b = _vec(emb, id_col, vec_col, "id_b", "vb")
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select("id_a", "id_b", F.expr(cosine_sql("va", "vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def embedding_near_dups_oracle_sql(table: str, threshold: float = 0.95) -> str:
    cos = cosine_sql_duckdb("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 6) AS cos
FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
WHERE ({cos}) >= {threshold}
"""
