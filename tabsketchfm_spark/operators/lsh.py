"""Bucket-size capping for LSH candidate generation.

At 100 TB a hot LSH bucket — boilerplate documents sharing every
band, exactly-duplicated embeddings — still produces an O(b²) island
inside the otherwise-linear bucket equi-join. The cap bounds that:
buckets over ``cap`` members are deterministically re-split into
ceil(size/cap) sub-buckets by an md5 hash of the member id, so the
pair join runs within sub-buckets of expected size ≤ cap. Pairs
split across sub-buckets of one hot bucket are deliberately dropped —
the capped operator's contract is "pairs surfaced by this bucket
structure", same as banded LSH itself, and the DuckDB oracle mirrors
the sub-bucket assignment bit-exactly (the DF-cap-prune pattern from
the n-gram pair join). In dedup practice a hot bucket means
near-identical members, where any surviving pair still links the
cluster; the connected-components pass restores transitivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tabsketchfm_spark.functions.hashing import h32_sql


def cap_bucket_split(
    bk: DataFrame, keys: list[str], cap: int, id_col: str = "id"
) -> DataFrame:
    """(id, *keys) bucket membership → same rows plus a ``sub``
    column: 0 for buckets within the cap, hash(id) mod
    ceil(size/cap) otherwise. Join candidates on keys + ['sub'].
    Both shuffles key on the bucket id, so AQE coalesces them into
    the same exchange as the downstream pair join."""
    sizes = bk.groupBy(*keys).agg(F.count(F.lit(1)).alias("_bsz"))
    return (
        bk.join(sizes, keys)
        .withColumn(
            "_nsplit",
            F.ceil(F.col("_bsz") / F.lit(float(cap))).cast("bigint"),
        )
        .withColumn(
            "sub",
            F.pmod(
                F.expr(h32_sql(id_col, "spark")), F.col("_nsplit")
            ).cast("int"),
        )
        .drop("_bsz", "_nsplit")
    )


def cap_split_sql_duckdb(
    banded_rel: str, keys: list[str], cap: int, id_col: str = "id"
) -> str:
    """DuckDB CTE body mirroring :func:`cap_bucket_split` over a
    relation named ``banded_rel`` — SELECT the original columns plus
    the identical ``sub``."""
    ks = ", ".join(keys)
    h = h32_sql(f"b.{id_col}", "duckdb")
    return f"""SELECT b.{id_col}, {', '.join('b.' + k for k in keys)},
       CAST({h} % CAST(ceil(z.bsz / CAST({cap} AS DOUBLE)) AS BIGINT) AS INTEGER) AS sub
FROM {banded_rel} b
JOIN (SELECT {ks}, count(*) AS bsz FROM {banded_rel} GROUP BY {ks}) z USING ({ks})"""
