"""Exact set-similarity: Jaccard & containment over column value sets.

The reference consumes Jaccard/containment as ground-truth labels
(reference README.md:178-180, SK7 in SURVEY §2.4); here it is a
first-class operator — the exact oracle that anchors the MinHash
estimates' property tests.

Spark design: distinct value sets of both columns, full-outer joined on
the value, one aggregate row out. The only shuffle is the distinct +
join on the value key — exactly the minimum the semantics require; AQE
handles skew. For 100 TB inputs the MinHash estimate (operators/
minhash.py) is the scale path; this exact op is for labels/validation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _value_set(df: DataFrame, column: str) -> DataFrame:
    return (
        df.select(F.nullif(F.col(column).cast("string"), F.lit("")).alias("v"))
        .where(F.col("v").isNotNull())
        .distinct()
    )


def jaccard_containment(
    left_df: DataFrame,
    left: tuple[str, str],
    right_df: DataFrame,
    right: tuple[str, str],
) -> DataFrame:
    """One row: set sizes, intersection/union, Jaccard |A∩B|/|A∪B| and
    containment |A∩B|/|A| of (table,column) pairs."""
    lt, lc = left
    rt, rc = right
    a = _value_set(left_df, lc).withColumn("in_a", F.lit(1))
    b = _value_set(right_df, rc).withColumn("in_b", F.lit(1))
    j = a.join(b, "v", "full_outer")
    return j.agg(
        F.lit(lt).alias("left_table"),
        F.lit(lc).alias("left_column"),
        F.lit(rt).alias("right_table"),
        F.lit(rc).alias("right_column"),
        F.count("in_a").alias("n_left"),
        F.count("in_b").alias("n_right"),
        F.count(F.when(F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1)).alias(
            "n_inter"
        ),
        F.count(F.lit(1)).alias("n_union"),
    ).select(
        "*",
        (F.col("n_inter") / F.col("n_union")).alias("jaccard"),
        (F.col("n_inter") / F.col("n_left")).alias("containment"),
    )


def jaccard_containment_oracle_sql(left: tuple[str, str], right: tuple[str, str]) -> str:
    lt, lc = left
    rt, rc = right
    return f"""
WITH a AS (SELECT DISTINCT nullif(CAST({lc} AS VARCHAR), '') AS v FROM {lt}
           WHERE nullif(CAST({lc} AS VARCHAR), '') IS NOT NULL),
     b AS (SELECT DISTINCT nullif(CAST({rc} AS VARCHAR), '') AS v FROM {rt}
           WHERE nullif(CAST({rc} AS VARCHAR), '') IS NOT NULL),
     j AS (SELECT coalesce(a.f, 0) AS in_a, coalesce(b.f, 0) AS in_b
           FROM (SELECT v, 1 AS f FROM a) a
           FULL OUTER JOIN (SELECT v, 1 AS f FROM b) b USING (v))
SELECT '{lt}' AS left_table, '{lc}' AS left_column,
       '{rt}' AS right_table, '{rc}' AS right_column,
       count(CASE WHEN in_a = 1 THEN 1 END) AS n_left,
       count(CASE WHEN in_b = 1 THEN 1 END) AS n_right,
       count(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 END) AS n_inter,
       count(*) AS n_union,
       count(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 END) / CAST(count(*) AS DOUBLE) AS jaccard,
       count(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 END)
         / CAST(count(CASE WHEN in_a = 1 THEN 1 END) AS DOUBLE) AS containment
FROM j
"""
