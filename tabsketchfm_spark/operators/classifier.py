"""Trained document-quality classifier with ORACLE-EXACT training.

The operative LLM-corpus pattern (GPT-3/LLaMA-style curation): score
every document with a CLASSIFIER trained on cheap seed labels, then
filter/sample by the score — heuristics label a seed set, the model
generalizes the judgment. The repo already has the heuristic gates
(text.gopher_rules) and oracle-exact *inference* for fixed seeded
weights (m4, m6h); this module closes the remaining gap: the TRAINING
itself is bit-reproducible cross-engine.

How: a batch perceptron over INTEGER features. Per epoch
    w  <-  w + Σ_{i misclassified} y_i · x_i      (y ∈ {+1,−1})
with integer token-bucket counts as x, so every update is an exact
integer sum — order-free, partition-order-proof, and replayable in
DuckDB as a chain of MATERIALIZED one-row weight CTEs (the
BPE/pagerank chained-replay family, extended from *inference* to
*learning*). No floats anywhere in the loop: unlike SGD+sigmoid,
there is no libm exp() to drift between engines.

Spark shape at 100 TB: ONE scan builds the (id, y, x0..xK) feature
frame (persisted; one row per doc, K+2 ints); each epoch is a single
map-side-combined aggregate over it (shuffle payload = K+1 longs) +
a driver update of K+1 weights — epochs × O(1) driver traffic, like
the BPE merge loop. Scoring is a broadcast-free literal projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tabsketchfm_spark.functions.hashing import h32_sql
from tabsketchfm_spark.operators.text import (
    _toks_duckdb,
    _toks_spark,
    gopher_parts_duckdb,
    gopher_parts_spark,
    gopher_pass_condition,
)

N_BUCKETS = 8  # hashed token-count buckets; +1 bias term
WEIGHT_CAP = 1_000_000  # sampling-weight clamp (see classifier_guided_sample)


def _label_expr_spark(text_col: str) -> str:
    """y ∈ {+1,−1} from the gopher conjunction — the SAME shared gate
    expressions text.gopher_rules uses, so a threshold tuned there
    re-labels the classifier's seed set automatically."""
    cond = gopher_pass_condition(*gopher_parts_spark(text_col))
    return f"CASE WHEN {cond} THEN 1 ELSE -1 END"


def _label_expr_duckdb() -> str:
    cond = gopher_pass_condition(*gopher_parts_duckdb())
    return f"CASE WHEN {cond} THEN 1 ELSE -1 END"


def quality_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, y, x0..xK): bias x0=1 and K hashed token-bucket counts —
    all BIGINT, one scan, no shuffle."""
    toks = _toks_spark(text_col)
    h = h32_sql("t", "spark")
    cols = [
        F.col(id_col).alias("id"),
        F.expr(_label_expr_spark(text_col)).cast("bigint").alias("y"),
        F.lit(1).cast("bigint").alias("x0"),
    ]
    for j in range(N_BUCKETS):
        cols.append(
            F.expr(f"size(filter({toks}, t -> ({h}) % {N_BUCKETS} = {j}))")
            .cast("bigint")
            .alias(f"x{j + 1}")
        )
    return df.select(*cols)


def train_quality_perceptron(
    df: DataFrame,
    epochs: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[list[int], DataFrame]:
    """Run the batch-perceptron loop; returns (weights, features) —
    features persisted (the caller scoring frame reads it; eager
    callers unpersist)."""
    feat = quality_features(df, id_col, text_col).persist()
    dim = N_BUCKETS + 1
    w = [0] * dim
    for _ in range(epochs):
        margin = sum(F.lit(int(w[j])) * F.col(f"x{j}") for j in range(dim))
        mis = F.col("y") * margin <= 0
        sums = feat.agg(
            *[
                F.sum(F.when(mis, F.col("y") * F.col(f"x{j}"))).alias(f"g{j}")
                for j in range(dim)
            ]
        ).collect()[0]
        w = [w[j] + int(sums[f"g{j}"] or 0) for j in range(dim)]
    return w, feat


def quality_perceptron_scores(
    df: DataFrame,
    epochs: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train on the corpus' own seed labels, then score every doc with
    the trained weights as literals. Output: (id, y, score, pred) —
    all exact integers, so the WHOLE train→score pipeline is bit-exact
    vs the DuckDB replay (quality_perceptron_oracle_sql)."""
    w, feat = train_quality_perceptron(df, epochs, id_col, text_col)
    dim = N_BUCKETS + 1
    score = sum(F.lit(int(w[j])) * F.col(f"x{j}") for j in range(dim))
    return feat.select(
        "id",
        "y",
        score.alias("score"),
        (score > 0).alias("pred"),
    )


def quality_perceptron_oracle_sql(
    table: str,
    epochs: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Full training REPLAY: one MATERIALIZED weight CTE per epoch,
    each folding the misclassified-sum update over the feature CTE
    (coalesce guards the no-misclassified empty aggregate — the
    NULL-poisoning lesson). Integer sums arrive as HUGEINT; cast back
    to BIGINT for dtype parity."""
    toks = _toks_duckdb(text_col)
    h = h32_sql("t", "duckdb")
    dim = N_BUCKETS + 1
    xdefs = ", ".join(
        f"CAST(len(list_filter(tk, t -> ({h}) % {N_BUCKETS} = {j})) AS BIGINT) AS x{j + 1}"
        for j in range(N_BUCKETS)
    )
    ctes = [
        f"t AS (SELECT {id_col} AS id, {toks} AS tk FROM {table})",
        f"feat AS MATERIALIZED (SELECT id, CAST({_label_expr_duckdb()} AS BIGINT) AS y, "
        f"CAST(1 AS BIGINT) AS x0, {xdefs} FROM t)",
        "w0 AS MATERIALIZED (SELECT "
        + ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(dim))
        + ")",
    ]
    for e in range(epochs):
        margin = " + ".join(f"w.w{j} * f.x{j}" for j in range(dim))
        upd = ", ".join(
            f"CAST(w.w{j} + coalesce(sum(CASE WHEN f.y * ({margin}) <= 0 "
            f"THEN f.y * f.x{j} END), 0) AS BIGINT) AS w{j}"
            for j in range(dim)
        )
        ctes.append(
            f"w{e + 1} AS MATERIALIZED (SELECT {upd} FROM feat f, w{e} w "
            + "GROUP BY "
            + ", ".join(f"w.w{j}" for j in range(dim))
            + ")"
        )
    score = " + ".join(f"w.w{j} * f.x{j}" for j in range(dim))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT f.id, f.y, CAST({score} AS BIGINT) AS score, ({score}) > 0 AS pred
FROM feat f, w{epochs} w
"""
    )


def train_quality_perceptron_py(rows: list[dict], epochs: int = 6) -> list[int]:
    """Independent driver-side fold over collected feature rows — the
    implementation-pin twin (the ExactSubstr-fold pattern): same
    integer algebra, no Spark, for the regression test."""
    dim = N_BUCKETS + 1
    w = [0] * dim
    for _ in range(epochs):
        g = [0] * dim
        for r in rows:
            x = [r[f"x{j}"] for j in range(dim)]
            if r["y"] * sum(w[j] * x[j] for j in range(dim)) <= 0:
                for j in range(dim):
                    g[j] += r["y"] * x[j]
        w = [w[j] + g[j] for j in range(dim)]
    return w


def classifier_guided_sample(
    df: DataFrame,
    k: int = 100,
    epochs: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classifier-guided corpus sampling (the DSIR/GPT-3-style step:
    sample the corpus ∝ a trained quality score, not uniformly): train
    the perceptron on the corpus' own seed labels, map each doc's
    integer score to weight min(max(score,0), WEIGHT_CAP)+1, and run
    the deterministic
    Horvitz-Thompson inclusion rule (splits.weighted_sample — pure
    integer h24·W < k·w·2^24 arithmetic). End to end — training,
    scoring, AND sampling — replays bit-exactly in DuckDB.
    Output: (id, w) for the sampled docs."""
    from tabsketchfm_spark.sources.splits import weighted_sample

    scores = quality_perceptron_scores(df, epochs, id_col, text_col)
    # clamp the margin before weighting: the raw score is an unbounded
    # integer (grows with epochs × corpus token mass), and
    # weighted_sample's int64 total-weight sum must never wrap (tw <=
    # n_docs · (WEIGHT_CAP+1): safe to ~9e12 docs; unbounded importance
    # weights are bad sampling practice anyway — one huge-margin doc
    # would swallow the whole budget)
    base = scores.select(
        "id",
        (
            F.least(F.greatest(F.col("score"), F.lit(0)), F.lit(WEIGHT_CAP))
            + F.lit(1)
        ).alias("w"),
    )
    return weighted_sample(base, F.col("w"), "id", k)


def classifier_guided_sample_oracle_sql(
    table: str,
    k: int = 100,
    epochs: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    scores = quality_perceptron_oracle_sql(table, epochs, id_col, text_col)
    h = h32_sql("id", "duckdb")
    return f"""
WITH base AS (SELECT id, least(greatest(score, 0), {WEIGHT_CAP}) + 1 AS w
              FROM ({scores}) s),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM base)
SELECT id, w FROM base, tot
WHERE CAST(({h}) % {1 << 24} AS HUGEINT) * CAST(tw AS HUGEINT)
    < CAST({k * (1 << 24)} AS HUGEINT) * CAST(w AS HUGEINT)
"""
