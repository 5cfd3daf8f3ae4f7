"""Approximate nearest neighbor over embedding columns — the scale
path for T2/K3 similarity search (SURVEY §2.8 K6: index build).

Random-hyperplane LSH: P sign-bits of dot(v, r_p) form a bucket id;
candidates share the query's bucket, then exact cosine ranks within
the bucket. The hyperplanes are pseudo-random but CLOSED-FORM
(integer-arithmetic formula per (plane, dim)), so the DuckDB oracle
regenerates them — no RNG, no parity gap (SURVEY §7.5 risk 6).

Scale shape: bucketing is one projection (P dot products per vector);
the search is an equi-join on bucket — no crossJoin anywhere. Recall
is tuned by P (fewer planes → bigger buckets) and by multi-probe
(probe_hamming=1 also scans buckets one bit-flip away).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tabsketchfm_spark.functions.vector import cosine_sql, cosine_sql_duckdb

_W_MULT = 2654435761
_W_MOD = 1000003


def _weights_spark(plane: int, dim: int) -> str:
    """array<double> of the plane's weights in [-0.5, 0.5), closed-form."""
    return (
        f"transform(sequence(0, {dim - 1}), "
        f"i -> (({_W_MULT} * ({plane} * {dim} + i + 1)) % {_W_MOD}) / {_W_MOD}.0 - 0.5)"
    )


def _weights_duckdb(plane: int, dim: int) -> str:
    return (
        f"list_transform(generate_series(0, {dim - 1}), "
        f"i -> (({_W_MULT} * ({plane} * {dim} + i + 1)) % {_W_MOD}) / {_W_MOD}.0 - 0.5)"
    )


def rh_buckets(
    emb: DataFrame,
    dim: int = 64,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): the random-hyperplane LSH bucket of each vector."""
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p in range(planes):
        dot = (
            f"aggregate(zip_with(v, {_weights_spark(p, dim)}, (x, y) -> x * y), "
            f"cast(0.0 as double), (acc, x) -> acc + x)"
        )
        bits.append(f"CASE WHEN ({dot}) >= 0 THEN {2 ** p} ELSE 0 END")
    bucket = " + ".join(bits)
    return emb.select(F.col(id_col).alias("id"), v.alias("v")).select(
        "id", F.expr(bucket).cast("int").alias("bucket")
    )


def _buckets_cte_duckdb(table: str, dim: int, planes: int) -> str:
    bits = []
    for p in range(planes):
        dot = f"list_dot_product(embedding::DOUBLE[], {_weights_duckdb(p, dim)})"
        bits.append(f"CASE WHEN ({dot}) >= 0 THEN {2 ** p} ELSE 0 END")
    bucket = " + ".join(bits)
    return (
        f"SELECT vec_id AS id, CAST({bucket} AS INTEGER) AS bucket FROM {table}"
    )


def ann_topk(
    emb: DataFrame,
    query_ids_max: int,
    k: int = 5,
    dim: int = 64,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed cosine top-k: queries (id < query_ids_max) are ranked
    against same-bucket candidates only. Output: (q_id, rank, cand_id,
    cos) — an approximation of cosine_topk with join-not-crossJoin
    candidate generation."""
    b = rh_buckets(emb, dim, planes, id_col, vec_col)
    vecs = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).join(b, "id")
    q = vecs.where(F.col("id") < query_ids_max).select(
        F.col("id").alias("q_id"), F.col("v").alias("qv"), "bucket"
    )
    c = vecs.select(F.col("id").alias("cand_id"), F.col("v").alias("cv"), "bucket")
    pairs = c.join(F.broadcast(q), "bucket").where(F.col("cand_id") != F.col("q_id"))
    scored = pairs.select(
        "q_id", "cand_id", F.expr(cosine_sql("qv", "cv")).alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "cand_id", F.round("cos", 6).alias("cos"))
    )


def ann_topk_oracle_sql(
    table: str, query_ids_max: int, k: int = 5, dim: int = 64, planes: int = 8
) -> str:
    cos = cosine_sql_duckdb("q.embedding::DOUBLE[]", "c.embedding::DOUBLE[]")
    return f"""
WITH buckets AS ({_buckets_cte_duckdb(table, dim, planes)}),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS cand_id, {cos} AS cos
  FROM {table} q
  JOIN buckets bq ON bq.id = q.vec_id
  JOIN buckets bc ON bc.bucket = bq.bucket
  JOIN {table} c ON c.vec_id = bc.id AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {query_ids_max}),
ranked AS (
  SELECT q_id, cand_id, cos,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id)
              AS INTEGER) AS rank
  FROM scored)
SELECT q_id, rank, cand_id, round(cos, 6) AS cos FROM ranked WHERE rank <= {k}
"""


# --- binary sign-sketch + Hamming ranking ------------------------------------
#
# The most compressed point of the quantization spectrum (float →
# int8 → PQ codes → 1 BIT per dim): each unit vector keeps only its
# coordinate signs, packed into 32-bit words (8 bytes at dim 64), and
# search ranks by Hamming distance bit_count(xor(...)) — for unit
# vectors the expected angle is proportional to the sign-disagreement
# count (the SimHash/Charikar bound), so Hamming order approximates
# cosine order. Every quantity is integer → bit-exact DuckDB twin.

_WORD = 32


def _sign_words_spark(dim: int) -> list[str]:
    """One packed BIGINT expression per 32-dim word (0-based u)."""
    out = []
    for w in range(dim // _WORD):
        terms = " + ".join(
            f"CASE WHEN u[{w * _WORD + i}] > cast(0 as double)"
            f" THEN {1 << i} ELSE 0 END"
            for i in range(_WORD)
        )
        out.append(f"cast({terms} as bigint)")
    return out


def _sign_words_duckdb(dim: int) -> list[str]:
    """Same packing, 1-based DuckDB lists."""
    out = []
    for w in range(dim // _WORD):
        terms = " + ".join(
            f"CASE WHEN u[{w * _WORD + i + 1}] > 0 THEN {1 << i} ELSE 0 END"
            for i in range(_WORD)
        )
        out.append(f"CAST({terms} AS BIGINT)")
    return out


def binary_hamming_topk(
    emb: DataFrame,
    query_ids_max: int,
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by Hamming distance over the 1-bit sign sketch: queries
    and candidates both carry only dim/32 packed words, the per-pair
    cost is a handful of xor+bit_count instructions, and the full
    sketch table is dim/8 bytes per vector. Output:
    (q_id, rank, cand_id, hamming)."""
    from tabsketchfm_spark.operators.vector import _unit

    words = _sign_words_spark(dim)
    sk = _unit(emb, {"id": F.col(id_col)}, vec_col).select(
        "id", *[F.expr(e).alias(f"w{w}") for w, e in enumerate(words)]
    )
    queries = sk.where(F.col("id") < query_ids_max).select(
        F.col("id").alias("q_id"),
        *[F.col(f"w{w}").alias(f"q{w}") for w in range(len(words))],
    )
    ham = F.expr(
        " + ".join(f"bit_count(w{w} ^ q{w})" for w in range(len(words)))
    ).cast("bigint")
    pairs = sk.crossJoin(F.broadcast(queries)).where(
        F.col("id") != F.col("q_id")
    )
    scored = pairs.select(
        "q_id", F.col("id").alias("cand_id"), ham.alias("hamming")
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("hamming"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "cand_id", "hamming")
    )


def binary_hamming_topk_oracle_sql(
    table: str, query_ids_max: int, k: int = 10, dim: int = 64
) -> str:
    from tabsketchfm_spark.operators.vector import _unit_cte_duckdb

    words = _sign_words_duckdb(dim)
    wl = ", ".join(f"{e} AS w{w}" for w, e in enumerate(words))
    ham = " + ".join(
        f"bit_count(xor(c.w{w}, q.w{w}))" for w in range(len(words))
    )
    return f"""
WITH un AS ({_unit_cte_duckdb(table)}),
sk AS MATERIALIZED (SELECT vec_id AS id, {wl} FROM un),
scored AS (
  SELECT q.id AS q_id, c.id AS cand_id, CAST({ham} AS BIGINT) AS hamming
  FROM sk c JOIN sk q ON q.id < {query_ids_max} AND c.id <> q.id),
ranked AS (
  SELECT q_id, cand_id, hamming,
         CAST(row_number() OVER (PARTITION BY q_id
                                 ORDER BY hamming, cand_id) AS INTEGER) AS rank
  FROM scored)
SELECT q_id, rank, cand_id, hamming FROM ranked WHERE rank <= {k}
"""
