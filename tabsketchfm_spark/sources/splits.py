"""S9: train/valid/test dataset splits (reference utils/datamodule.py:
36-40 loads pre-materialized split files; README.md:64-83 describes the
80/10/10 convention).

The engine derives splits DETERMINISTICALLY from the row's identity —
``h32(id) mod 10`` → 8/1/1 — instead of a materialized random file:
partition-layout-free, reproducible in SQL, and stable when the lake
grows (a row's split never changes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tabsketchfm_spark.functions.hashing import h32_sql


def assign_split(df: DataFrame, id_col: str) -> DataFrame:
    bucket = F.expr(h32_sql(id_col, "spark")) % 10
    return df.withColumn(
        "split",
        F.when(bucket <= 7, "train").when(bucket == 8, "valid").otherwise("test"),
    )


def split_counts(df: DataFrame, id_col: str) -> DataFrame:
    return (
        assign_split(df, id_col)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"), F.min(id_col).alias("min_id"))
    )


def split_counts_oracle_sql(table: str, id_col: str) -> str:
    h = h32_sql(id_col, "duckdb")
    return f"""
WITH s AS (SELECT {id_col},
                  CASE WHEN {h} % 10 <= 7 THEN 'train'
                       WHEN {h} % 10 = 8 THEN 'valid'
                       ELSE 'test' END AS split
           FROM {table})
SELECT split, count(*) AS n, min({id_col}) AS min_id FROM s GROUP BY split
"""


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fracs: dict[str, float],
    id_col: str,
    default_frac: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the training-mixture
    primitive (downsample over-represented languages/sources, keep
    rare ones whole). Membership is a pure function of the row id
    (md5-prefix hash mod 10000 under the per-stratum threshold): no
    rand(), so any executor, retry, or engine recomputes the same
    sample (SURVEY §7.5 risk 6) — which is exactly how the DuckDB
    twin reproduces it. One narrow filter, no shuffle; the sample
    rate is exact in expectation and ±O(1/√n) per stratum."""
    h = F.expr(h32_sql(id_col, "spark"))
    thr = F.lit(int(default_frac * 10000))
    for k, v in sorted(fracs.items()):
        thr = F.when(F.col(strata_col) == k, F.lit(int(v * 10000))).otherwise(thr)
    return df.where(F.pmod(h, F.lit(10000)) < thr)


def stratified_sample_oracle_sql(
    table: str,
    strata_col: str,
    fracs: dict[str, float],
    id_col: str,
    columns: str = "*",
    default_frac: float = 0.0,
) -> str:
    h = h32_sql(id_col, "duckdb")
    cases = " ".join(
        f"WHEN {strata_col} = '{k}' THEN {int(v * 10000)}"
        for k, v in sorted(fracs.items())
    )
    return f"""
SELECT {columns} FROM {table}
WHERE ({h}) % 10000 < (CASE {cases} ELSE {int(default_frac * 10000)} END)
"""


def weighted_sample(
    df: DataFrame,
    weight_col,
    id_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weight-proportional Bernoulli sampling: include a
    row with probability min(1, k·w/W) where W = Σ weights — the
    Horvitz-Thompson inclusion design (expected sample size k, long
    documents proportionally favored; the token-budget-aware variant
    of the mixture sampler). The inclusion test is PURE INTEGER
    arithmetic — h24·W < k·w·2^24 with h24 the md5-prefix hash mod
    2^24 — so any executor, retry, or engine recomputes the identical
    sample (no rand(), no float rounding; the DuckDB twin mirrors it
    bit-for-bit). Two passes: one agg for the scalar W (broadcast as a
    literal-free scalar subquery via crossJoin), one narrow filter —
    no shuffle of the data itself.

    Output: (id, w) for the sampled rows."""
    w = F.col("w")
    base = df.select(F.col(id_col).alias("id"), weight_col.alias("w"))
    tot = base.agg(F.sum("w").cast("bigint").alias("tw"))
    h24 = F.pmod(F.expr(h32_sql("id", "spark")), F.lit(1 << 24))
    # 128-bit comparison: h24·W and k·w·2^24 both overflow int64 once
    # total weight W exceeds ~2^39 (realistic for token-count weights at
    # corpus scale) — Spark's non-ANSI int64 would wrap silently while
    # the DuckDB twin errors. Decimal operands promote the products to
    # int128-backed decimals (values ≤ ~10^27 fit the 38-digit cap
    # exactly) == DuckDB HUGEINT on the oracle side.
    lhs = h24.cast("decimal(19,0)") * F.col("tw").cast("decimal(19,0)")
    rhs = (
        F.lit(k * (1 << 24)).cast("decimal(19,0)") * w.cast("decimal(19,0)")
    )
    return (
        base.crossJoin(F.broadcast(tot))
        .where(lhs < rhs)
        .select("id", "w")
    )


def weighted_sample_oracle_sql(
    table: str, weight_sql: str, id_col: str, k: int
) -> str:
    h = h32_sql("id", "duckdb")
    return f"""
WITH base AS (SELECT {id_col} AS id, {weight_sql} AS w FROM {table}),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM base)
SELECT id, w FROM base, tot
WHERE CAST(({h}) % {1 << 24} AS HUGEINT) * CAST(tw AS HUGEINT)
    < CAST({k * (1 << 24)} AS HUGEINT) * CAST(w AS HUGEINT)
"""


def domain_mixture_sample(
    docs: DataFrame, k: int = 2000, scale: int = 1 << 16
) -> DataFrame:
    """Temperature-balanced corpus mixture (the multilingual /
    multi-source re-weighting step of LLM corpus assembly): sample ~k
    documents with per-domain quotas ∝ n_d^0.5 — temperature τ=2
    flattening, which up-samples small (lang, source) domains relative
    to proportional sampling. α is fixed at 0.5 BECAUSE sqrt is
    IEEE-correctly-rounded in every engine while pow(x, α) is
    libm-dependent — the whole quota pipeline stays bit-reproducible.

    Determinism engineering (same family as weighted_sample): the
    irrational sqrt is quantized ONCE per domain (W_d = floor(sqrt(n_d)
    · 2^16), exact bigint), the normalizer S = Σ W_d is an exact
    integer sum (order-free), and each row's inclusion test
    h24 · (S · n_d) < k·2^24 · W_d runs in int128-backed decimals on
    the Spark side == HUGEINT in DuckDB. Rates ≥ 1 saturate naturally
    (h24 < 2^24). Two passes: a grouped count + a broadcast-joined
    narrow filter — the data itself never shuffles.

    Output: (doc_id, lang, source) for the sampled rows.
    """
    d = docs.select("doc_id", "lang", "source")
    stats = (
        d.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_d"))
        .withColumn(
            "wd",
            F.floor(F.sqrt(F.col("n_d").cast("double")) * F.lit(scale)).cast(
                "bigint"
            ),
        )
    )
    tot = stats.agg(F.sum("wd").alias("s_tot"))
    h24 = F.pmod(F.expr(h32_sql("doc_id", "spark")), F.lit(1 << 24))
    joined = d.join(F.broadcast(stats), ["lang", "source"]).crossJoin(
        F.broadcast(tot)
    )
    # operand-wise decimal casts BEFORE multiplying (the weighted_sample
    # pattern): an int64 s_tot*n_d pre-product would wrap at corpus
    # scale while the HUGEINT oracle would not
    lhs = h24.cast("decimal(19,0)") * (
        F.col("s_tot").cast("decimal(19,0)") * F.col("n_d").cast("decimal(19,0)")
    )
    rhs = F.lit(k * (1 << 24)).cast("decimal(19,0)") * F.col("wd").cast(
        "decimal(19,0)"
    )
    return joined.where(lhs < rhs).select("doc_id", "lang", "source")


def domain_mixture_sample_oracle_sql(
    table: str = "documents", k: int = 2000, scale: int = 1 << 16
) -> str:
    h = h32_sql("doc_id", "duckdb")
    return f"""
WITH stats AS (SELECT lang, source, count(*) AS n_d,
                      CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * {scale}) AS BIGINT)
                        AS wd
               FROM {table} GROUP BY 1, 2),
tot AS (SELECT sum(wd) AS s_tot FROM stats)
SELECT d.doc_id, d.lang, d.source
FROM {table} d JOIN stats USING (lang, source), tot
WHERE CAST(({h}) % {1 << 24} AS HUGEINT) * (CAST(s_tot AS HUGEINT) * CAST(n_d AS HUGEINT))
    < CAST({k * (1 << 24)} AS HUGEINT) * CAST(wd AS HUGEINT)
"""


def assign_split_by_cluster(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Leakage-safe S9: near-duplicate documents must never straddle
    train/valid/test — a test document whose near-dup sits in train
    leaks the answer (the split-time decontamination failure mode;
    same motivation as text.decontaminate, applied to the split
    boundary itself). Splits therefore hash the CLUSTER, not the row:
    dedup_clusters' connected components give every doc a cluster_id,
    and the standard h32 % 10 → 8/1/1 rule applied to cluster_id
    assigns each WHOLE cluster to one split. Singleton docs (their own
    cluster) keep exactly the assign_split distribution.

    Scale shape: inherits dedup_clusters' bucketed near-dup pairs +
    O(log n) star contraction; the split assignment itself is one
    narrow projection. Output: (doc_id, cluster_id, split)."""
    from tabsketchfm_spark.operators.dedup import dedup_clusters

    labels = dedup_clusters(docs, id_col, text_col, n, threshold)
    # the standard 8/1/1 rule (assign_split), keyed on cluster_id —
    # cluster_size rides along so consumers need no second window
    return assign_split(labels, "cluster_id").select(
        id_col, "cluster_id", "cluster_size", "split"
    )


def cluster_split_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Registered summary over assign_split_by_cluster: per split, the
    doc count, cluster count, and how many docs sit in multi-doc
    clusters (the rows a row-hash split would have risked leaking)."""
    s = assign_split_by_cluster(docs, id_col, text_col, n, threshold)
    return s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.count(F.when(F.col("cluster_size") > 1, 1)).alias("n_clustered_docs"),
    )


def cluster_split_counts_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> str:
    """DuckDB twin: the dedup_clusters recursive-CTE closure as a
    subquery (DuckDB scopes WITH RECURSIVE inside a derived table),
    then the identical h32(cluster_id) bucket rule."""
    from tabsketchfm_spark.operators.dedup import dedup_clusters_oracle_sql

    labels = dedup_clusters_oracle_sql(table, id_col, text_col, n, threshold)
    h = h32_sql("cluster_id", "duckdb")
    return f"""
WITH labels AS (SELECT * FROM ({labels}) l),
s AS (SELECT {id_col}, cluster_id, cluster_size,
             CASE WHEN ({h}) % 10 <= 7 THEN 'train'
                  WHEN ({h}) % 10 = 8 THEN 'valid'
                  ELSE 'test' END AS split
      FROM labels)
SELECT split, count(*) AS n_docs,
       count(DISTINCT cluster_id) AS n_clusters,
       count(CASE WHEN cluster_size > 1 THEN 1 END) AS n_clustered_docs
FROM s GROUP BY split
"""


def domain_cap(
    docs: DataFrame,
    cap: int = 10,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hard per-domain cap (the RefinedWeb/C4-style curation step that
    bounds any single domain's share of the corpus — complementary to
    domain_mixture_sample's proportional quotas): keep at most ``cap``
    documents per domain, chosen by a DETERMINISTIC uniform priority —
    ascending (h32(id), id) — so the kept set is stable across runs
    and engines, never a partition-order sample.

    Scale shape: one row_number window PARTITIONED BY domain (sorts
    within each domain's hash partition only; AQE splits skewed
    domains). Output: (doc_id, domain, keep_rank) for the kept rows.
    """
    from pyspark.sql import Window

    h = F.expr(h32_sql(id_col, "spark"))
    w = Window.partitionBy("domain").orderBy(F.col("h").asc(), F.col(id_col).asc())
    return (
        docs.select(id_col, F.col(domain_col).alias("domain"), h.alias("h"))
        # bigint: DuckDB row_number emits int64, Spark int32
        .withColumn("keep_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("keep_rank") <= cap)
        .select(id_col, "domain", "keep_rank")
    )


def domain_cap_oracle_sql(
    table: str = "documents",
    cap: int = 10,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    h = h32_sql(id_col, "duckdb")
    return f"""
WITH r AS (SELECT {id_col}, {domain_col} AS domain,
                  row_number() OVER (PARTITION BY {domain_col}
                                     ORDER BY ({h}) ASC, {id_col} ASC)
                    AS keep_rank
           FROM {table})
SELECT {id_col}, domain, keep_rank FROM r WHERE keep_rank <= {cap}
"""
