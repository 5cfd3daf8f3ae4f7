"""The Parquet sketch store — the engine's materialized profile cache.

Re-designs the reference's content-addressed ``.json.bz2`` sketch
documents (S7/S8/S10, data_prep.py:150-163/281-317,
tabular_dataset.py:72-89) as ONE partitioned Parquet dataset: one row
per (table_name, aug_id, column_name) carrying the full stat+sketch
set, plus one table-level row (column_name = '') with the content
snapshot. The store IS the index (S10): predicate pushdown on
table_name/aug_id replaces the reference's filename-cache JSON.

SK5 column-shuffle augmentation (data_prep.py:148-150, 288-291) is
seeded by md5(table|aug|column) — deterministic, partition-order-free
(SURVEY §7.5 risk 6), and reproducible in SQL by any engine.

SK6 content identity (joblib.hash at data_prep.py:298) becomes an
order-insensitive table hash: bit_xor of per-row 60-bit fingerprints —
exact, distributable (one aggregation), and engine-neutral.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from tabsketchfm_spark.functions.hashing import NUM_PERM, h32_sql, h64_sql, minhash_agg_exprs
from tabsketchfm_spark.operators.melt import melt_values
from tabsketchfm_spark.operators.profile import profile_table, spark_logical_type


def aug_column_order(table_name: str, columns: list[str], aug_id: int) -> list[str]:
    """SK5: deterministic column permutation for an augmentation.
    aug_id == 0 keeps the original order (reference keeps variant 0
    unshuffled, data_prep.py:288-291)."""
    if aug_id == 0:
        return list(columns)
    return sorted(
        columns,
        key=lambda c: hashlib.md5(
            f"{table_name}|{aug_id}|{c}".encode()
        ).hexdigest(),
    )


def table_content_hash(df: DataFrame, columns: list[str]) -> DataFrame:
    """SK6: order-insensitive exact content hash — bit_xor of 60-bit
    row fingerprints. One scan, one aggregate row."""
    row_str = F.concat_ws("\x01", *[F.col(c).cast("string") for c in columns])
    return df.select(row_str.alias("row_str")).select(
        F.expr(h64_sql("row_str", "spark")).alias("h")
    ).agg(F.expr("bit_xor(h)").alias("table_hash"))


def table_content_hash_oracle_sql(table: str, columns: list[str]) -> str:
    cols = ", ".join(f"CAST({c} AS VARCHAR)" for c in columns)
    h = h64_sql("row_str", "duckdb")
    return f"""
SELECT bit_xor({h}) AS table_hash
FROM (SELECT concat_ws(chr(1), {cols}) AS row_str FROM {table}) t
"""


def column_minhash_wide(
    df: DataFrame, columns: list[str], num_perm: int = NUM_PERM
) -> DataFrame:
    """(column_name, minhash array<bigint>) for the given columns —
    SK1 in store layout (one array per column)."""
    m = melt_values(df, columns)
    h = F.expr(h32_sql("v", "spark")).alias("h")
    sigs = m.select("column_name", h).groupBy("column_name").agg(
        *minhash_agg_exprs(F.col("h"), num_perm)
    )
    return sigs.select(
        "column_name",
        F.array(*[F.col(f"mh{i}") for i in range(num_perm)]).alias("minhash_exact"),
    )


def build_sketch_rows(
    df: DataFrame,
    table_name: str,
    aug_id: int = 0,
    num_perm: int = NUM_PERM,
) -> DataFrame:
    """Full sketch rows for one (table, aug): per-column stats (A1-A8)
    + exact-value MinHash + word MinHash for strings; column order /
    col_idx follows the augmentation permutation."""
    from tabsketchfm_spark.operators.minhash import minhash_signatures

    dtypes = dict(df.dtypes)
    cols = [
        c for c in aug_column_order(table_name, df.columns, aug_id)
        if spark_logical_type(dtypes[c]) != "other"
    ]
    prof = profile_table(df, table_name, columns=cols)
    mh = column_minhash_wide(df, cols, num_perm)
    str_cols = [c for c in cols if spark_logical_type(dtypes[c]) == "string"]
    out = prof.join(mh, "column_name", "left")
    if str_cols:
        mw = (
            minhash_signatures(df, table_name, str_cols, num_perm, words=True)
            .groupBy("column_name")
            .agg(F.array_sort(F.collect_list(F.struct("perm", "sig"))).alias("ps"))
            .select(
                "column_name",
                F.expr("transform(ps, x -> x.sig)").alias("minhash_words"),
            )
        )
        out = out.join(mw, "column_name", "left")
    else:
        out = out.withColumn(
            "minhash_words", F.lit(None).cast("array<bigint>")
        )
    return out.withColumn("aug_id", F.lit(aug_id))


def build_sketch_store(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    out_path: str,
    num_augs: int = 1,
    num_perm: int = NUM_PERM,
) -> None:
    """Materialize the sketch store: every (table, aug) sketched and
    appended to one Parquet dataset partitioned by table_name (pruning
    by table = partition pruning; by aug/column = row-group predicate
    pushdown)."""
    first = True
    for name, df in tables.items():
        for aug in range(num_augs):
            rows = build_sketch_rows(df, name, aug, num_perm)
            rows.write.mode("overwrite" if first else "append").partitionBy(
                "table_name"
            ).parquet(out_path)
            first = False


def read_sketch_store(spark: SparkSession, path: str) -> DataFrame:
    """S8/S10: the store scan — also the lake index (file_name →
    sketch lookup is a filter on table_name)."""
    return spark.read.parquet(path)
