"""S11/S12: embedding-table and search-result Parquet sinks round-trip
losslessly (the reference pickles these — extract_embeddings.py:198-199,
embedding_search.py:186-190; here they are ordinary Parquet relations)."""

from __future__ import annotations

from tabsketchfm_spark.ml.embed import extract_embeddings
from tabsketchfm_spark.operators.minhash import joinability_search_oph
from tabsketchfm_spark.operators.profile import profile_table
from tabsketchfm_spark.sources.tables import load_table


def test_embedding_table_sink_roundtrip(spark, sf001, tmp_path):
    prof = profile_table(load_table(spark, sf001, "customer"), "customer")
    emb = extract_embeddings(prof)
    out = str(tmp_path / "emb")
    emb.write.parquet(out)
    back = spark.read.parquet(out)
    orig = {(r.table_name, r.column_name, r.kind): tuple(r.vector) for r in emb.collect()}
    rt = {(r.table_name, r.column_name, r.kind): tuple(r.vector) for r in back.collect()}
    assert orig == rt


def test_search_result_sink_roundtrip(spark, sf001, tmp_path):
    from tabsketchfm_spark.plans.registry import JOIN_CANDIDATES, JOIN_QUERY

    res = joinability_search_oph(spark, sf001, JOIN_QUERY, JOIN_CANDIDATES)
    out = str(tmp_path / "results")
    res.write.parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == res.count()
    top = back.where("rank = 1").first()
    assert (top.cand_table, top.cand_column) == ("customer", "c_custkey")
