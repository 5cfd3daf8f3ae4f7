"""Scale-safe global ranking primitives.

A bare ``row_number() OVER (ORDER BY ...)`` sends every row to one
partition (Spark warns: "No Partition Defined for Window operation").
Fine for a 25-row candidate list, fatal for a 100 TB fact table. Two
replacements, both producing ranks identical to the single-partition
window whenever the ordering is a total order:

- ``ranked_topk``: when only the first k rows survive, sort-limit
  first — Spark plans ``orderBy().limit(k)`` as TakeOrderedAndProject
  (per-partition heaps, no global shuffle) — then window over the ≤k
  surviving rows to number them.
- ``global_rank``: when every row needs its rank, the classic
  two-phase scheme: range-repartition on the sort key, number rows
  within each range partition, and add driver-computed partition
  offsets (one tiny count-per-partition job). No partition ever holds
  more than its range share; ties across partitions are safe because
  equal keys range-partition together.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def ranked_topk(
    df: DataFrame, order: list[Column], k: int, rank_name: str = "rank"
) -> DataFrame:
    """Top-k by ``order`` with a 1-based rank column. Distributed
    TakeOrderedAndProject does the heavy cut; the global window only
    ever sees k rows."""
    top = df.orderBy(*order).limit(k)
    # the window sees at most k rows (the limit runs as
    # TakeOrderedAndProject before it). The constant partition key
    # makes that bound explicit to Spark: same single-partition
    # execution and identical ranks, but no spurious "No Partition
    # Defined" warning on a provably bounded input.
    w = Window.partitionBy(F.lit(0)).orderBy(*order)
    return top.withColumn(rank_name, F.row_number().over(w).cast("int"))


def global_rank(
    df: DataFrame,
    order: list[Column],
    rank_name: str = "rank",
    num_partitions: int | None = None,
    caches: list | None = None,
) -> DataFrame:
    """Rank EVERY row of ``df`` by ``order`` without a single-partition
    window. Triggers one small job (per-partition counts) at plan-build
    time; the input is persisted because the count pass and the final
    pass share it. Pass ``caches`` (a list) to receive the persisted
    frame — callers that materialize the result eagerly should
    unpersist it afterwards (lazy callers must leave it cached: the
    returned plan reads it)."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = (
        df.repartitionByRange(num_partitions, *order)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    if caches is not None:
        caches.append(part)
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(counts, key=lambda x: x["__pid"]):
        offsets[r["__pid"]] = acc
        acc += r["c"]
    if offsets:
        off = F.coalesce(
            F.create_map(
                *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
            )[F.col("__pid")],
            F.lit(0),
        )
    else:
        off = F.lit(0)
    w = Window.partitionBy("__pid").orderBy(*order)
    return part.withColumn(
        rank_name, (F.row_number().over(w) + off).cast("int")
    ).drop("__pid")
