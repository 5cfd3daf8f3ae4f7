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
transformer_bert.py:24-85) plus the M2 encoder stack, with seeded
deterministic weights standing in for a trained checkpoint
(``ml/checkpoint.py`` provides the npz state-dict swap). ``_encoder``
remains the torch probe seam. K2's value encoder runs the SAME numpy
stack over the value-document tokens (``encode_text``) — no hash
stubs remain anywhere in the engine. The embedding table schema
matches SURVEY §1.1's design: (table_name, column_name nullable,
kind, vector).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

EMBED_DIM = 32

EMBED_SCHEMA = (
    "table_name string, column_name string, kind string, vector array<float>"
)

# token cap per value doc: attention is O(n²) and a doc is ≤100 unique
# values — 64 word tokens bound the per-column encode at a constant
VALUE_DOC_TOKEN_CAP = 64


def tokenize_value_doc(doc: str, cap: int = VALUE_DOC_TOKEN_CAP) -> list[str]:
    """Word tokens of a comma-joined value document (the
    sentence-transformer tokenizer stand-in): lowercase, split on
    commas/whitespace, first ``cap`` kept."""
    return [t for t in re.split(r"[,\s]+", str(doc).lower()) if t][:cap]


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


def extract_embeddings(
    profile: DataFrame,
    minhash: DataFrame | None = None,
    checkpoint_path: str | None = None,
    width: tuple[int, int, int] | None = None,
) -> DataFrame:
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
    stream (``checkpoint_path`` routes every executor's forward
    through a TRAINED npz checkpoint — ml/checkpoint
    ensure_checkpoint_state, once per worker, hash-verified; the
    serve-a-finetuned-model-lake-wide path); absent signatures fall
    back to zeros exactly like the
    reference tokenizer's missing-key path (tabular_tokenizer.py:206).
    ``width`` overrides (hidden, n_heads, n_layers) per executor task —
    ``reference_forward.REFERENCE_WIDTH`` serves at the published
    bert-base config (768/12/12) with the same plumbing; None pins the
    environment default so reused workers always reset.
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

        # TRAINED weights reach the executors here: install once per
        # worker process (hash-verified) — or, with no checkpoint,
        # clear any install a previous task left in this reused worker
        # (and reset/resize the model width the same way)
        from tabsketchfm_spark.ml.mlm import _ensure_task_state

        _ensure_task_state(checkpoint_path, width)

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


def value_embeddings(
    value_docs: DataFrame,
    checkpoint_path: str | None = None,
    width: tuple[int, int, int] | None = None,
) -> DataFrame:
    """K2 (reference embedding_search.py:25-42): encode each column's
    value document (first-100-unique comma-joined values — see
    operators/structural.value_doc) into a vector with the numpy
    reference forward (``reference_forward.encode_text``: word+position
    streams through the full encoder stack, mean-pooled), then z-score
    normalize exactly like the reference's ``normalize`` (lines 20-23:
    (t - mean) / population std). The sentence transformer itself is
    absent from the environment; the encoder is the engine's own model
    stack — a checkpoint drop-in upgrades it the same way it upgrades
    K1."""
    from tabsketchfm_spark.session import ensure_package_on_workers

    ensure_package_on_workers(value_docs.sparkSession)

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tabsketchfm_spark.ml.mlm import _ensure_task_state
        from tabsketchfm_spark.ml.reference_forward import encode_text

        _ensure_task_state(checkpoint_path, width)
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                vec = encode_text(tokenize_value_doc(r.value_doc))
                s = vec.std()
                if np.isfinite(s) and s > 0:  # reference normalize()
                    vec = (vec - vec.mean()) / s
                rows.append(
                    (
                        r.table_name,
                        r.column_name,
                        "value",
                        vec.astype(np.float32).tolist(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["table_name", "column_name", "kind", "vector"]
            )

    return value_docs.mapInPandas(infer, schema=EMBED_SCHEMA)


def value_znorm(value_docs: DataFrame, dim: int = 8) -> DataFrame:
    """The K2 normalization algebra as a SQL-expressible, bit-exact
    stage (reference embedding_search.py:20-23 ``normalize``: t →
    (t − mean) / population-std): tokenize each value document exactly
    like the encoder front-end (lowercase, comma/whitespace split,
    64-token cap), bag the tokens into a ``dim``-wide hash-count
    vector, and z-score it with explicit left-to-right arithmetic so
    Spark and DuckDB land on identical doubles. This is the gate for
    the normalize step the real (non-SQL) encoder output also passes
    through. Output: (table_name, column_name, z0..z{dim-1})."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.functions.hashing import h32_sql

    h = h32_sql("t", "spark")
    toks = (
        "slice(filter(split(lower(value_doc), '[,\\\\s]+'), t -> t != ''), "
        f"1, {VALUE_DOC_TOKEN_CAP})"
    )
    cs = [
        F.expr(f"size(filter({toks}, t -> {h} % {dim} = {i}))").alias(f"c{i}")
        for i in range(dim)
    ]
    base = value_docs.select("table_name", "column_name", *cs)
    mean = "(" + " + ".join(f"c{i}" for i in range(dim)) + f") / cast({dim} as double)"
    withm = base.withColumn("_m", F.expr(mean))
    var = (
        "("
        + " + ".join(f"(c{i} - _m) * (c{i} - _m)" for i in range(dim))
        + f") / cast({dim} as double)"
    )
    withv = withm.withColumn("_v", F.expr(var))
    zs = [
        F.expr(
            f"CASE WHEN _v = 0 THEN 0.0 ELSE (c{i} - _m) / sqrt(_v) END"
        ).alias(f"z{i}")
        for i in range(dim)
    ]
    return withv.select("table_name", "column_name", *zs)


def value_znorm_oracle_sql(value_doc_sql: str, dim: int = 8) -> str:
    from tabsketchfm_spark.functions.hashing import h32_sql

    h = h32_sql("t", "duckdb")
    ccols = ",\n       ".join(
        f"len(list_filter(toks, t -> {h} % {dim} = {i})) AS c{i}"
        for i in range(dim)
    )
    mean = "(" + " + ".join(f"c{i}" for i in range(dim)) + f") / CAST({dim} AS DOUBLE)"
    var = (
        "("
        + " + ".join(f"(c{i} - m) * (c{i} - m)" for i in range(dim))
        + f") / CAST({dim} AS DOUBLE)"
    )
    zcols = ",\n       ".join(
        f"CASE WHEN v = 0 THEN 0.0 ELSE (c{i} - m) / sqrt(v) END AS z{i}"
        for i in range(dim)
    )
    return f"""
WITH vd AS ({value_doc_sql}),
tok AS (SELECT table_name, column_name,
               (list_filter(string_split_regex(lower(value_doc), '[,\\s]+'),
                            t -> t != ''))[1:{VALUE_DOC_TOKEN_CAP}] AS toks
        FROM vd),
c AS (SELECT table_name, column_name,
       {ccols}
      FROM tok),
m AS (SELECT *, {mean} AS m FROM c),
v AS (SELECT *, {var} AS v FROM m)
SELECT table_name, column_name,
       {zcols}
FROM v
"""


def merge_value_embeddings(
    column_embs: DataFrame, value_embs: DataFrame, dim: int = EMBED_DIM
) -> DataFrame:
    """K2 merge (reference embedding_search.py:69-88): concatenate each
    column's sketch embedding with its value embedding (array concat
    after an equi-join; columns without a value doc keep the sketch
    embedding alone via zero-padding). ``dim`` is the value-embedding
    width the zero pad must match — pass the hidden size used at
    extraction when serving a non-default width."""
    from pyspark.sql import functions as F

    c = column_embs.where(F.col("kind") == "column").select(
        "table_name", "column_name", F.col("vector").alias("cv")
    )
    v = value_embs.select(
        "table_name", "column_name", F.col("vector").alias("vv")
    )
    zeros = F.array(*[F.lit(0.0).cast("float") for _ in range(dim)])
    return c.join(v, ["table_name", "column_name"], "left").select(
        "table_name",
        "column_name",
        F.lit("column+value").alias("kind"),
        F.concat(F.col("cv"), F.coalesce(F.col("vv"), zeros)).alias("vector"),
    )
