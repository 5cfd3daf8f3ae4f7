"""Regression tests for the round-12 optimization-review fixes:
SQL-literal escaping, the load_table plan-memo staleness key, the
pack_sequences NULL-id contract, and the pagerank sig-cache release."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_sql_str_lit_roundtrips_metacharacter_names(spark):
    from tabsketchfm_spark.functions.sqltext import sql_ident, sql_str_lit

    weird = ["plain", "it's", "back\\slash", "a\\nb", "tick`name", "mix'\\`x"]
    for name in weird:
        lit = sql_str_lit(name)
        got = spark.sql(f"SELECT {lit} AS v").collect()[0].v
        assert got == name, f"literal round-trip broke: {name!r} -> {got!r}"
    # identifiers: select a column whose NAME contains metacharacters
    df = spark.createDataFrame([(1,)], ["x"]).select(
        F.col("x").alias("w`eird\\name")
    )
    ident = sql_ident("w`eird\\name")
    assert df.selectExpr(f"{ident} AS v").collect()[0].v == 1


def test_melt_values_handles_metacharacter_column_names(spark):
    from tabsketchfm_spark.operators.melt import melt_values

    df = spark.createDataFrame([("a", "b")], ["x", "y"]).select(
        F.col("x").alias("col'quote"), F.col("y").alias("col\\slash")
    )
    rows = {
        (r.column_name, r.v)
        for r in melt_values(df, spread=False).collect()
    }
    assert rows == {("col'quote", "a"), ("col\\slash", "b")}


def test_pack_sequences_drops_null_ids(spark):
    """NULL ids cannot be placed in the id-ordered packing; the lazy
    scheme drops them uniformly (docstring contract)."""
    from tabsketchfm_spark.operators.text import pack_sequences

    df = spark.createDataFrame(
        [(1, "one two"), (None, "ghost doc"), (2, "three")],
        "doc_id bigint, text string",
    )
    out = pack_sequences(df, id_col="doc_id", text_col="text").collect()
    ids = sorted(r.doc_id for r in out)
    assert ids == [1, 2]


def test_load_table_memo_misses_after_rewrite(spark, tmp_path):
    """A table REWRITTEN at the same path mid-session must not be served
    the stale memoized plan (mtime/size in the memo key)."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tabsketchfm_spark.sources.tables import load_table

    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "region.parquet")
    pq.write_table(pa.table({"r_regionkey": [1, 2]}), path)
    assert load_table(spark, sf_dir, "region").count() == 2
    time.sleep(0.05)  # ensure a distinct mtime even on coarse clocks
    pq.write_table(pa.table({"r_regionkey": [1, 2, 3], "extra": [0, 0, 0]}), path)
    df2 = load_table(spark, sf_dir, "region")
    assert df2.count() == 3 and "extra" in df2.columns


def test_pagerank_build_releases_signature_cache(spark, sf01):
    """table_pagerank's eager edge collect must unpersist the OPH
    signature frame it materialized — building the query must leave no
    MATERIALIZED storage blocks behind (global_rank's persist on the
    8-row rank frame is lazy, so it has no blocks at build time)."""
    from tabsketchfm_spark.plans import registry

    spark.catalog.clearCache()
    registry.queries()["k3g_table_pagerank"](spark, sf01)
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    leaked = [i.toString() for i in infos if i.numCachedPartitions() > 0]
    assert not leaked, f"materialized cache leaked at build: {leaked}"