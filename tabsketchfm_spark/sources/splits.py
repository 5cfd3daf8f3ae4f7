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
