"""Reference-width evidence run (round-7 verdict item 3 / SURVEY §7.5
risk 5): drive the numpy model stack at the PUBLISHED TabSketchFM
config — hidden 768, 12 heads, 12 layers (reference
transformer_bert.py:29 bert-base defaults; pretrain.py:58,90) — on the
real Spark plumbing, and record wall time + Arrow batch sizing.

Three passes, all lake-wide:
  1. K1 serving: profile all tables → extract_embeddings at 768
     (applyInPandas per table, hidden-layer-1 pooling) — the serving
     path VERDICT asks a scale_check-style row for.
  2. K2 value-doc encoding at 768 (mapInPandas) over customer.
  3. One M5 epoch: executor-assembled frozen-encoder batches at 768
     (mlm_batches — Arrow rows carry 768-double state vectors) + one
     AdamW epoch of the MLM head on the driver at 768.

Usage: python scripts/width768_run.py [sf_dir]   (default sf0.01)
Prints one JSON line: timings, row counts, batch bytes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from tabsketchfm_spark.ml import embed as ml_embed
    from tabsketchfm_spark.ml import mlm as ml_mlm
    from tabsketchfm_spark.ml import reference_forward as rf
    from tabsketchfm_spark.ml import training as tr
    from tabsketchfm_spark.ml.train_queries import (
        PRETRAIN_TRAIN_TABLES,
        _collect_batch,
        _profiles,
    )
    from tabsketchfm_spark.operators import profile as prof
    from tabsketchfm_spark.operators.structural import value_doc
    from tabsketchfm_spark.plans.schemas import TABLE_SCHEMAS
    from tabsketchfm_spark.session import get_spark
    from tabsketchfm_spark.sources.tables import load_table

    spark = get_spark("width768", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    W = rf.REFERENCE_WIDTH
    out: dict = {"width": list(W), "sf_dir": sf}

    tables = list(TABLE_SCHEMAS)
    caches: list = []
    try:
        # ---- pass 1: K1 serving lake-wide at 768 ------------------------
        parts = [
            prof.profile_table(
                load_table(spark, sf, t), t, round_digits=4, caches=caches
            )
            for t in tables
        ]
        profile = parts[0]
        for p in parts[1:]:
            profile = profile.unionByName(p)
        t0 = time.perf_counter()
        rows = ml_embed.extract_embeddings(profile, width=W).collect()
        out["k1_serve_sec"] = round(time.perf_counter() - t0, 3)
        out["k1_rows"] = len(rows)
        dims = {len(r["vector"]) for r in rows}
        assert dims == {W[0]}, f"served vectors not {W[0]}-wide: {dims}"
        out["k1_vector_dim"] = W[0]

        # ---- pass 2: K2 value-doc encoding at 768 (mapInPandas) ---------
        vd = value_doc(
            load_table(spark, sf, "customer"),
            "customer",
            [c for c, _t in TABLE_SCHEMAS["customer"]],
        )
        t0 = time.perf_counter()
        vrows = ml_embed.value_embeddings(vd, width=W).collect()
        out["k2_value_sec"] = round(time.perf_counter() - t0, 3)
        out["k2_rows"] = len(vrows)
        assert {len(r["vector"]) for r in vrows} == {W[0]}
    finally:
        for c in caches:
            c.unpersist()

    # ---- pass 3: one M5 epoch at 768 ------------------------------------
    caches = []
    try:
        t0 = time.perf_counter()
        batches = ml_mlm.mlm_batches(
            _profiles(spark, sf, PRETRAIN_TRAIN_TABLES, caches), width=W
        )
        xt, yt = _collect_batch(batches)
        out["m5_batch_sec"] = round(time.perf_counter() - t0, 3)
        out["m5_masked_positions"] = int(xt.shape[0])
        out["m5_state_dim"] = int(xt.shape[1])
        # Arrow sizing: each batch row = one masked position carrying a
        # 768-double state (list<double>); whole-lake batch stays tiny
        out["m5_batch_bytes"] = int(xt.nbytes + yt.nbytes)
        assert xt.shape[1] == W[0]

        # driver-side head fit at the same width (word table goes
        # (30522, 768) float64 ≈ 187 MB, materialized once)
        rf.configure_width(*W)
        t0 = time.perf_counter()
        head = tr.MLMHead()
        curve = tr.fit(head, (xt, yt), (xt, yt), max_epochs=1)
        out["m5_epoch_sec"] = round(time.perf_counter() - t0, 3)
        out["m5_epoch0_loss"] = round(curve[0]["train_loss"], 6)
        out["word_table_mb"] = round(rf.word_table().nbytes / 2**20, 1)
    finally:
        for c in caches:
            c.unpersist()
        rf.configure_width(*rf.DEFAULT_WIDTH)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
