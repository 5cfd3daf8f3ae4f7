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


def test_checkpoint_roundtrip_drives_inference(tmp_path):
    """S13: the npz checkpoint sink/scan. Materialized weights round-
    trip bit-exactly (install → identical forward), the manifest hash
    rejects tampered tensors, and installed tensors genuinely DRIVE
    inference (a zeroed word table changes the states)."""
    import numpy as np
    import pytest

    from tabsketchfm_spark.ml import checkpoint as ck
    from tabsketchfm_spark.ml.reference_forward import (
        build_token_sequence,
        hidden_layer_1,
    )

    rows = [
        {"table_name": "t", "column_name": "a_key", "col_idx": 0,
         "col_type": "integer", "distinct_cnt": 3, "num_nan": 0,
         "cell_width_bytes": 4.0, "q10": 1.0, "q20": 1.0, "q30": 2.0,
         "q40": 2.0, "q50": 2.0, "q60": 3.0, "q70": 3.0, "q80": 3.0,
         "q90": 3.0, "mean_v": 2.0, "std_v": 0.8, "min_v": 1.0,
         "max_v": 3.0, "minhash": [5, 7]},
    ]
    seq = build_token_sequence(rows)
    base = hidden_layer_1(seq)

    path = str(tmp_path / "model-ckpt")
    manifest = ck.save_checkpoint(path)
    assert ck.checkpoint_exists(path)
    assert manifest["hidden"] == 32 and "emb.word" in manifest["tensors"]

    w = ck.load_checkpoint(path)
    try:
        ck.install_checkpoint(w)
        assert np.array_equal(hidden_layer_1(seq), base)  # state-dict swap is lossless
        zeroed = dict(w)
        zeroed["emb.word"] = np.zeros_like(w["emb.word"])
        ck.install_checkpoint(zeroed)
        assert not np.array_equal(hidden_layer_1(seq), base)  # weights drive inference
    finally:
        ck.clear_checkpoint()
    assert np.array_equal(hidden_layer_1(seq), base)

    # tamper → loud failure
    import numpy as _np

    bad = dict(w)
    bad["lin.value.b"] = w["lin.value.b"] + 1.0
    _np.savez_compressed(path + ".npz", **bad)
    with pytest.raises(IOError, match="hash mismatch"):
        ck.load_checkpoint(path)
