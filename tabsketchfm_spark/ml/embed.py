"""K1/K2: model-inference embedding extraction as a Spark stage.

Re-designs the reference's embedding extraction (extract_embeddings.py:
16-117): batched no-grad forward over tokenized sketches, SEP-grouped
mean pooling to column embeddings, mean over columns to the table
embedding. Here the Spark integration is the deliverable: the model
runs inside ``mapInPandas`` (Arrow batches, one model instance per
executor task via broadcast config), and pooling stays in the UDF's
numpy (cheap) while all orchestration is DataFrame-native.

The model math itself lives in ``ml/reference_forward.py``: the REAL
M1 embedding-layer forward (six-stream sum + LayerNorm, reference
transformer_bert.py:24-85) plus one M2 encoder block, with seeded
deterministic weights standing in for a trained checkpoint
(``ml/checkpoint.py`` provides the npz state-dict swap). ``_encoder``
remains the torch probe seam; ``_stub_encode`` survives only for the
K2 sentence-transformer stand-in. The embedding table schema matches
SURVEY §1.1's design: (table_name, column_name nullable, kind,
vector).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

EMBED_DIM = 32

EMBED_SCHEMA = (
    "table_name string, column_name string, kind string, vector array<float>"
)


def _stub_encode(stats: np.ndarray, name: str) -> np.ndarray:
    """Deterministic stand-in encoder: md5-seeded projection matrix
    applied to the column's stat vector. Replaced by the torch
    cross-encoder when available (see module docstring)."""
    seed = int.from_bytes(hashlib.md5(name.encode()).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    w = rng.standard_normal((EMBED_DIM, stats.shape[0]))
    v = w @ np.nan_to_num(stats, nan=0.0)
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def _encoder():
    try:  # pragma: no cover - torch absent in this environment
        import torch  # noqa: F401

        # A production build loads the finetuned TabularBert checkpoint
        # here (broadcast path) in place of the seeded weights inside
        # ml/reference_forward.py — the forward/pooling math is the
        # same (reference extract_embeddings.py find_table_col, :16-73).
        return None
    except ImportError:
        return None


def extract_embeddings(profile: DataFrame, minhash: DataFrame | None = None) -> DataFrame:
    """profile rows (one per column) → embedding table via the numpy
    reference forward (ml/reference_forward.py): the M1 six-stream
    embedding sum + LayerNorm (reference transformer_bert.py:24-85)
    fed through one M2 encoder block, pooling the HIDDEN LAYER 1
    states the reference pools (extract_embeddings.py:100,105), with
    seeded deterministic weights standing in for a checkpoint:

    - one 'column' row per column — SEP-group mean pooling,
    - one 'table' row per table — mean over all non-special tokens,
    - one 'cls' row per table — the unpooled [CLS] state,

    exactly the find_table_col contract (extract_embeddings.py:16-73,
    98-117). Grouped ``applyInPandas`` per table: one table's token
    sequence (≤ cols × ~5 tokens) is the reference's unit of work, so
    the group is bounded; lake-wide extraction distributes across
    tables. ``minhash`` optionally supplies (column_name, minhash_exact
    array) rows (sketch_store.column_minhash_wide) for the sixth
    stream; absent signatures fall back to zeros exactly like the
    reference tokenizer's missing-key path (tabular_tokenizer.py:206).
    """
    from pyspark.sql import functions as F

    from tabsketchfm_spark.session import ensure_package_on_workers

    ensure_package_on_workers(profile.sparkSession)

    src = profile
    if minhash is not None:
        # key on (table, column): lake-wide profiles repeat column
        # names across tables, and a column-only join would attach
        # wrong or duplicated signatures
        mh_cols = ["column_name"]
        if "table_name" in minhash.columns:
            mh_cols = ["table_name", "column_name"]
        src = src.join(
            F.broadcast(
                minhash.select(*mh_cols, F.col("minhash_exact").alias("_mh"))
            ),
            mh_cols,
            "left",
        )
    else:
        src = src.withColumn("_mh", F.lit(None).cast("array<bigint>"))

    def infer(pdf: pd.DataFrame) -> pd.DataFrame:
        from tabsketchfm_spark.ml.reference_forward import (
            build_token_sequence,
            find_table_col_pool,
            hidden_layer_1,
        )

        col_rows = []
        names = {}
        for _, r in pdf.iterrows():
            d = {c: r[c] for c in pdf.columns if c not in ("_mh",)}
            mh = r["_mh"]
            d["minhash"] = None if mh is None or (isinstance(mh, float) and pd.isna(mh)) else list(mh)
            col_rows.append(d)
        for ci, r in enumerate(sorted(col_rows, key=lambda d: d["col_idx"])):
            names[ci] = r["column_name"]
        table_name = col_rows[0]["table_name"]
        seq = build_token_sequence(col_rows)
        # hidden layer 1 — embedding layer + first encoder block — is
        # what the reference pools (extract_embeddings.py:100,105)
        states = hidden_layer_1(seq)
        tab, cols, cls = find_table_col_pool(seq, states)
        out = [
            (table_name, names[k], "column", v.astype(np.float32).tolist())
            for k, v in sorted(cols.items())
        ]
        out.append((table_name, None, "table", tab.astype(np.float32).tolist()))
        out.append((table_name, None, "cls", cls.astype(np.float32).tolist()))
        return pd.DataFrame(
            out, columns=["table_name", "column_name", "kind", "vector"]
        )

    return src.groupBy("table_name").applyInPandas(infer, schema=EMBED_SCHEMA)


def value_embeddings(value_docs: DataFrame) -> DataFrame:
    """K2 (reference embedding_search.py:25-42): encode each column's
    value document (first-100-unique comma-joined values — see
    operators/structural.value_doc) into a vector. The sentence
    transformer is absent here; the deterministic stub encoder hashes
    the doc (same seam as K1 — see module docstring)."""
    from tabsketchfm_spark.session import ensure_package_on_workers

    ensure_package_on_workers(value_docs.sparkSession)

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                digest = hashlib.md5(str(r.value_doc).encode()).digest()
                stats = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
                vec = _stub_encode(stats, f"val|{r.table_name}|{r.column_name}")
                rows.append((r.table_name, r.column_name, "value", vec.tolist()))
            yield pd.DataFrame(
                rows, columns=["table_name", "column_name", "kind", "vector"]
            )

    return value_docs.mapInPandas(infer, schema=EMBED_SCHEMA)


def merge_value_embeddings(
    column_embs: DataFrame, value_embs: DataFrame
) -> DataFrame:
    """K2 merge (reference embedding_search.py:69-88): concatenate each
    column's sketch embedding with its value embedding (array concat
    after an equi-join; columns without a value doc keep the sketch
    embedding alone via zero-padding)."""
    from pyspark.sql import functions as F

    c = column_embs.where(F.col("kind") == "column").select(
        "table_name", "column_name", F.col("vector").alias("cv")
    )
    v = value_embs.select(
        "table_name", "column_name", F.col("vector").alias("vv")
    )
    dim = EMBED_DIM
    zeros = F.array(*[F.lit(0.0).cast("float") for _ in range(dim)])
    return c.join(v, ["table_name", "column_name"], "left").select(
        "table_name",
        "column_name",
        F.lit("column+value").alias("kind"),
        F.concat(F.col("cv"), F.coalesce(F.col("vv"), zeros)).alias("vector"),
    )
