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


def feat_xdefs_duckdb(lam: str = "t", with_total: bool = False) -> str:
    """DuckDB projection for the integer bucket-count features
    x1..xK (+ x{K+1} = total token count for the tree grid) — the ONE
    source of truth every trained-family oracle shares with
    quality_features. ``lam`` names the list_filter lambda variable
    (the bigram oracles use a different letter for readability)."""
    h = h32_sql(lam, "duckdb")
    s = ", ".join(
        f"CAST(len(list_filter(tk, {lam} -> ({h}) % {N_BUCKETS} = {j})) AS BIGINT) AS x{j + 1}"
        for j in range(N_BUCKETS)
    )
    if with_total:
        s += f", CAST(len(tk) AS BIGINT) AS x{N_BUCKETS + 1}"
    return s


def quality_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_total: bool = False,
) -> DataFrame:
    """(id, y, x0..xK): bias x0=1 and K hashed token-bucket counts —
    all BIGINT, one scan, no shuffle. ``with_total`` appends
    x{K+1} = size(tokens) (== Σ bucket counts — the tree trainer's
    doc-length feature)."""
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
    if with_total:
        cols.append(
            F.expr(f"size({toks})").cast("bigint").alias(f"x{N_BUCKETS + 1}")
        )
    return df.select(*cols)


# trained-parameter memo keyed on the TRAIN FRAME's plan semanticHash
# + algorithm params (the kmeans _FIT_MEMO precedent, round 7): the
# analytics tests, the parity twins and the window sweep all train the
# SAME (frame, params) — and the per-epoch aggregate jobs were the
# one-session suite's dominant cost (round-7 verdict item 4; the
# model-selection/CV family alone was ~6 min of re-training). Results
# are pure functions of the frame contents and params. Plan-keyed,
# NOT content-keyed — testdata parquet is immutable per session;
# clear_train_memo() resets after any rewrite (same contract as
# kmeans.clear_fit_memo).
_TRAIN_MEMO: dict[tuple, object] = {}


def clear_train_memo() -> None:
    _TRAIN_MEMO.clear()


def _memo_train(frame: DataFrame, params: tuple, fn):
    key = (frame._jdf.semanticHash(), *params)
    hit = _TRAIN_MEMO.get(key)
    if hit is None:
        hit = _TRAIN_MEMO[key] = fn()
    return hit


def train_quality_perceptron(
    df: DataFrame,
    epochs: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[list[int], DataFrame]:
    """Run the batch-perceptron loop; returns (weights, features) —
    features persisted (the caller scoring frame reads it; eager
    callers unpersist). Weights memoized per (frame plan, params)."""
    feat = quality_features(df, id_col, text_col).persist()
    dim = N_BUCKETS + 1
    # ONE copy of the update rule: the zero-start batch trainer IS the
    # warm-start loop started from zeros (round-8 review dedup)
    w = _memo_train(
        feat,
        ("perceptron", epochs, N_BUCKETS),
        lambda: _perceptron_epochs_from(feat, [0] * dim, epochs),
    )
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


# --- persisted weight store: incremental cross-batch training --------------
#
# The store-family's SUPERVISED member (signature store → dedup,
# centroid store → clustering, weight store → classification): the
# perceptron's integer weight vector lives in a manifest-guarded
# parquet store, so each arriving batch WARM-STARTS from weights
# trained on every previous batch — batch-sequential training across
# process boundaries, the daily-crawl quality-model shape. Every
# update is the exact integer epoch sum, so the whole multi-batch
# trajectory replays bit-exactly in DuckDB (chained weight CTEs with
# an arithmetic-bucket feed — the kmeans-store pattern).

_PERC_STORE_FORMAT = "perceptron-int-weights-v1"


def _perc_manifest_path(path: str) -> str:
    from tabsketchfm_spark.sources.store_util import manifest_path

    return manifest_path(path)


def perceptron_store_read(spark, path: str) -> tuple[list[int], int]:
    """Manifest-guarded read → (weights, n_updates); loud on
    format/feature-space mismatch (weights over a different bucket
    hash would silently mis-score everything)."""
    from tabsketchfm_spark.sources.store_util import read_manifest

    m = read_manifest(path)
    if m["format"] != _PERC_STORE_FORMAT or m["n_buckets"] != N_BUCKETS:
        raise IOError(
            f"perceptron store at {path} is {m['format']} with "
            f"n_buckets={m['n_buckets']}; caller runs {_PERC_STORE_FORMAT} "
            f"n_buckets={N_BUCKETS}"
        )
    from tabsketchfm_spark.sources.store_util import read_small_parquet

    rows = read_small_parquet(f"{path}/{m['state_dir']}")
    dim = N_BUCKETS + 1
    got = {int(r["j"]): int(r["w"]) for r in rows}
    # bijection check BEFORE any indexing: a duplicate-plus-missing j
    # has the right row count but a silently zeroed coordinate, and an
    # out-of-range j must be the loud IOError, not a bare IndexError
    # (round-8 review finding)
    if len(rows) != dim or set(got) != set(range(dim)):
        raise IOError(
            f"perceptron store at {path} state is not a bijection over "
            f"weight indices 0..{dim - 1}: {sorted(int(r['j']) for r in rows)}"
        )
    return [got[j] for j in range(dim)], int(m["n_updates"])


def perceptron_store_write(
    spark, path: str, w: list[int], n_updates: int
) -> None:
    """Commit: fresh state_<n> subdir first, then an atomic manifest
    pointer flip (store_util.write_manifest — the shared contract)."""
    state_dir = f"state_{n_updates:06d}"
    # weight vector is driver-resident — direct pyarrow commit (the
    # Spark-job-per-tiny-artifact cost; see store_util.write_small_parquet)
    import pyarrow as pa

    from tabsketchfm_spark.sources.store_util import write_small_parquet

    write_small_parquet(
        f"{path}/{state_dir}",
        [(j, int(wj)) for j, wj in enumerate(w)],
        pa.schema([("j", pa.int32()), ("w", pa.int64())]),
    )
    from tabsketchfm_spark.sources.store_util import write_manifest

    write_manifest(
        path,
        {
            "format": _PERC_STORE_FORMAT,
            "n_buckets": N_BUCKETS,
            "n_updates": n_updates,
            "state_dir": state_dir,
        },
    )


def _perceptron_epochs_from(
    feat: DataFrame, w: list[int], epochs: int
) -> list[int]:
    """``epochs`` batch-perceptron epochs starting FROM ``w`` (the
    warm-start form of train_quality_perceptron's loop — one
    map-side-combined aggregate per epoch)."""
    dim = N_BUCKETS + 1
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
    return w


def perceptron_store_update(
    spark,
    batch: DataFrame,
    path: str,
    epochs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[int]:
    """One arriving batch refines the PERSISTED weights: read the
    store (cold start = the zero vector — the canonical perceptron
    init, no seed data needed), run ``epochs`` epochs on the batch
    warm-started from them, commit. Returns the new weights. The
    store's writer lease covers read→train→commit: a concurrent
    update folding from the same base weights would be silently
    dropped by whichever flip lands second."""

    def body(feat: DataFrame, w: list[int], n_updates: int) -> list[int]:
        w = _perceptron_epochs_from(feat, w, epochs)
        perceptron_store_write(spark, path, w, n_updates + 1)
        return w

    return _locked_store_training(
        spark, batch, path, "perceptron_store_update", id_col, text_col, body
    )


def _locked_store_training(
    spark, batch: DataFrame, path: str, owner: str, id_col: str,
    text_col: str, body,
):
    """ONE copy of the weight-store verbs' lease/read-or-zero/persist
    scaffold (round-11 review — the SQL side was already deduped into
    _perc_epoch_ctes; the Spark side had forked): lease BEFORE the
    persist (a lease-conflict raise must not leak an eagerly-
    registered cache entry), feature frame persisted for the body's
    multiple aggregates, store read or the canonical zero-vector cold
    start. ``body(feat, w, n_updates)`` runs the verb and commits via
    perceptron_store_write itself; its return value passes through."""
    import os

    from tabsketchfm_spark.sources.store_util import acquire_lease, release_lease

    acquire_lease(path, owner=owner)
    feat = None
    try:
        feat = quality_features(batch, id_col, text_col).persist()
        if os.path.exists(_perc_manifest_path(path)):
            w, n_updates = perceptron_store_read(spark, path)
        else:
            w, n_updates = [0] * (N_BUCKETS + 1), 0
        return body(feat, w, n_updates)
    finally:
        release_lease(path)
        if feat is not None:
            feat.unpersist()


def perceptron_store_run(
    spark,
    sf_dir: str,
    n_batches: int = 3,
    epochs: int = 2,
) -> DataFrame:
    """The registered multi-day lifecycle: split documents into
    arithmetic doc_id buckets (floor(id/W), W = max_id//n + 1 —
    closed-form membership the oracle replays), push each bucket
    through perceptron_store_update against a fresh store (every
    update re-READS the weights from disk), and emit the full weight
    trajectory: (batch, j, w) per bucket. Bit-exact vs
    perceptron_store_run_oracle_sql."""
    import shutil
    import tempfile

    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = tempfile.mkdtemp(prefix="tsfm_perc_store_")
    try:
        max_id = int(docs.agg(F.max("doc_id")).collect()[0][0])
        width = max_id // n_batches + 1
        rows = []
        for b in range(n_batches):
            batch = docs.where(F.floor(F.col("doc_id") / width) == b)
            w = perceptron_store_update(spark, batch, store, epochs)
            rows.extend((b, j, int(wj)) for j, wj in enumerate(w))
        return spark.createDataFrame(rows, "batch bigint, j int, w bigint")
    finally:
        shutil.rmtree(store, ignore_errors=True)


def perceptron_store_run_oracle_sql(
    table: str,
    n_batches: int = 3,
    epochs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Chained replay of the whole batch-sequential run: the feature
    CTE carries the arithmetic bucket, every (bucket, epoch) is one
    MATERIALIZED weight CTE folding the misclassified-sum update over
    THAT bucket's rows, warm-started from the previous bucket's final
    weights; the emission unpivots each bucket's final vector."""
    toks = _toks_duckdb(text_col)
    dim = N_BUCKETS + 1
    xdefs = feat_xdefs_duckdb()
    ctes = [
        f"t AS (SELECT {id_col} AS id, {toks} AS tk FROM {table})",
        f"feat AS MATERIALIZED (SELECT id, CAST({_label_expr_duckdb()} AS BIGINT) AS y, "
        f"CAST(1 AS BIGINT) AS x0, {xdefs} FROM t)",
        # the arithmetic bucket width, from the same whole-table max
        # (MATERIALIZED: referenced by every gradient CTE — a plain
        # CTE re-evaluates per reference, the pagerank lesson)
        f"wd AS MATERIALIZED (SELECT (max(id) // {n_batches}) + 1 AS w FROM feat)",
        "pw0_0 AS MATERIALIZED (SELECT "
        + ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(dim))
        + ")",
    ]
    prev = "pw0_0"
    emits = []
    for b in range(n_batches):
        ectes, prev = _perc_epoch_ctes(prev, b, epochs, dim)
        ctes.extend(ectes)
        emits.append(
            " UNION ALL ".join(
                f"SELECT CAST({b} AS BIGINT) AS batch, CAST({j} AS INTEGER) AS j, "
                f"CAST((SELECT w{j} FROM {prev}) AS BIGINT) AS w"
                for j in range(dim)
            )
        )
        # next bucket warm-starts from this bucket's final CTE
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(emits)


def _bucket_margin_sql(prev: str, dim: int) -> str:
    """ONE copy of the margin expression against a weight CTE."""
    return " + ".join(f"(SELECT w{j} FROM {prev}) * f.x{j}" for j in range(dim))


def _perc_epoch_ctes(
    prev: str, b: int, epochs: int, dim: int, gate: str = ""
) -> tuple[list[str], str]:
    """ONE copy of the per-(bucket, epoch) weight-CTE loop, shared by
    the run and autorefresh replays. Gradient CTE: a no-GROUP-BY
    aggregate always yields ONE row even over an EMPTY bucket (sums
    NULL → coalesce 0), so the weight chain carries through unchanged
    exactly like Spark's `int(sums[...] or 0)` — a cross-join-with-
    GROUP-BY form would yield an empty CTE there and LOSE the weights
    (empty-CTE NULL-poisoning lesson). ``gate`` is an extra AND-clause
    for the gradient rows (the gated replay zeroes an unfired bucket's
    gradients: the chain then carries the previous weights — bit-exact
    with the selector, and DuckDB never trains the dead branch, which
    it otherwise WOULD: MATERIALIZED CTEs evaluate even unreferenced).
    Returns (ctes, final_cte)."""
    ctes = []
    for e in range(epochs):
        margin = _bucket_margin_sql(prev, dim)
        gdefs = ", ".join(
            f"coalesce(sum(CASE WHEN f.y * ({margin}) <= 0 "
            f"THEN f.y * f.x{j} END), 0) AS g{j}"
            for j in range(dim)
        )
        cur = f"pw{b}_{e + 1}"
        ctes.append(
            f"gr{b}_{e + 1} AS MATERIALIZED (SELECT {gdefs} FROM feat f "
            f"WHERE f.id // (SELECT w FROM wd) = {b}{gate})"
        )
        ctes.append(
            f"{cur} AS MATERIALIZED (SELECT "
            + ", ".join(
                f"CAST(w.w{j} + g.g{j} AS BIGINT) AS w{j}" for j in range(dim)
            )
            + f" FROM {prev} w, gr{b}_{e + 1} g)"
        )
        prev = cur
    return ctes, prev


def perceptron_store_autorefresh(
    spark,
    batch: DataFrame,
    path: str,
    threshold_ppm: int,
    epochs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[bool, list[int]]:
    """Drift-gated continual learning — the model-store sibling of the
    IVF-PQ autorefresh verb: an arriving batch updates the PERSISTED
    weights only when the stored model actually MISCLASSIFIES at
    least ``threshold_ppm`` parts-per-million of it. The decision is
    exact integers (a count and a cross-product comparison), so it
    replays as a DuckDB scalar subquery and the whole gated
    trajectory stays bit-exact. A batch the current model already
    fits is SKIPPED entirely — no train epochs, no store write, so a
    redelivered well-fitted batch is a no-op (and a cold store's zero
    weights misclassify everything, y·0 <= 0, so the first batch
    always trains at any threshold <= 10^6). ONE lease wraps
    measure→train→commit (the composite-RMW lesson). Returns
    (fired, weights).

    The decision aggregate doubles as epoch 1's gradient aggregate
    (round-11 review, third pass): mis/n and the per-feature
    misclassified sums share the y·margin <= 0 predicate against the
    same stored weights, so one fused pass collects both — a fired
    batch applies the already-collected gradient and runs only
    epochs−1 further aggregates. epochs=0 keeps the symmetric
    contract: a fired batch commits unchanged weights (the oracle's
    empty epoch chain selects prev either way)."""

    def body(feat: DataFrame, w: list[int], n_updates: int):
        dim = N_BUCKETS + 1
        margin = sum(F.lit(int(w[j])) * F.col(f"x{j}") for j in range(dim))
        mis_cond = F.col("y") * margin <= 0
        row = feat.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.when(mis_cond, F.lit(1))), F.lit(0)).alias(
                "mis"
            ),
            *[
                F.sum(F.when(mis_cond, F.col("y") * F.col(f"x{j}"))).alias(
                    f"g{j}"
                )
                for j in range(dim)
            ],
        ).collect()[0]
        n, mis = int(row["n"]), int(row["mis"])
        fired = n > 0 and 1_000_000 * mis >= threshold_ppm * n
        if fired:
            if epochs > 0:
                w = [w[j] + int(row[f"g{j}"] or 0) for j in range(dim)]
                if epochs > 1:
                    w = _perceptron_epochs_from(feat, w, epochs - 1)
            perceptron_store_write(spark, path, w, n_updates + 1)
        return fired, w

    return _locked_store_training(
        spark, batch, path, "perceptron_store_autorefresh", id_col,
        text_col, body,
    )


def perceptron_store_autorefresh_run(
    spark,
    sf_dir: str,
    n_batches: int = 3,
    epochs: int = 2,
    threshold_ppm: int = 100_000,
) -> DataFrame:
    """The registered gated lifecycle: arithmetic doc_id buckets
    arrive in order; each runs the drift-gated update against the
    SAME store (every decision re-reads the weights from disk). Emits
    the full gated trajectory: (batch, fired, j, w) — the weights in
    force AFTER each batch, fired telling which batches actually
    trained. Bit-exact vs perceptron_store_autorefresh_oracle_sql."""
    import shutil
    import tempfile

    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = tempfile.mkdtemp(prefix="tsfm_perc_ar_")
    try:
        max_id = int(docs.agg(F.max("doc_id")).collect()[0][0])
        width = max_id // n_batches + 1
        rows = []
        w = [0] * (N_BUCKETS + 1)
        for b in range(n_batches):
            batch = docs.where(F.floor(F.col("doc_id") / width) == b)
            fired, w = perceptron_store_autorefresh(
                spark, batch, store, threshold_ppm, epochs
            )
            rows.extend(
                (b, bool(fired), j, int(wj)) for j, wj in enumerate(w)
            )
        return spark.createDataFrame(
            rows, "batch bigint, fired boolean, j int, w bigint"
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


def perceptron_store_autorefresh_oracle_sql(
    table: str,
    n_batches: int = 3,
    epochs: int = 2,
    threshold_ppm: int = 100_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """The gated trajectory replayed as chained CTEs with a
    data-dependent BRANCH per bucket (the IVF-PQ autorefresh pattern
    in the trained-model family): per bucket, a one-row decision CTE
    (misclassification count of the CURRENT weights over that bucket,
    HUGEINT ppm comparison), the trained chain via the shared
    epoch-CTE emitter, and a selector CTE carrying forward the
    trained or the previous weights as the trigger chose."""
    toks = _toks_duckdb(text_col)
    dim = N_BUCKETS + 1
    xdefs = feat_xdefs_duckdb()
    ctes = [
        f"t AS (SELECT {id_col} AS id, {toks} AS tk FROM {table})",
        f"feat AS MATERIALIZED (SELECT id, CAST({_label_expr_duckdb()} AS BIGINT) AS y, "
        f"CAST(1 AS BIGINT) AS x0, {xdefs} FROM t)",
        f"wd AS MATERIALIZED (SELECT (max(id) // {n_batches}) + 1 AS w FROM feat)",
        "ws_init AS MATERIALIZED (SELECT "
        + ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(dim))
        + ")",
    ]
    prev = "ws_init"
    emits = []
    for b in range(n_batches):
        margin = _bucket_margin_sql(prev, dim)
        ctes.append(
            f"dc{b} AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS n, "
            f"CAST(coalesce(sum(CASE WHEN f.y * ({margin}) <= 0 THEN 1 END), 0)"
            " AS HUGEINT) AS mis "
            f"FROM feat f WHERE f.id // (SELECT w FROM wd) = {b})"
        )
        ctes.append(
            f"tr{b} AS MATERIALIZED (SELECT (SELECT n FROM dc{b}) > 0 AND "
            f"1000000 * (SELECT mis FROM dc{b}) >= "
            f"CAST({threshold_ppm} AS HUGEINT) * (SELECT n FROM dc{b}) AS trig)"
        )
        ectes, trained = _perc_epoch_ctes(
            prev, b, epochs, dim, gate=f" AND (SELECT trig FROM tr{b})"
        )
        ctes.extend(ectes)
        sel = f"ws{b}"
        ctes.append(
            f"{sel} AS MATERIALIZED (SELECT "
            + ", ".join(
                f"CASE WHEN (SELECT trig FROM tr{b}) THEN t.w{j} "
                f"ELSE p.w{j} END AS w{j}"
                for j in range(dim)
            )
            + f" FROM {trained} t, {prev} p)"
        )
        prev = sel
        emits.append(
            " UNION ALL ".join(
                f"SELECT CAST({b} AS BIGINT) AS batch, "
                f"(SELECT trig FROM tr{b}) AS fired, "
                f"CAST({j} AS INTEGER) AS j, "
                f"CAST((SELECT w{j} FROM {prev}) AS BIGINT) AS w"
                for j in range(dim)
            )
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(emits)


def train_quality_perceptron_margin(
    df: DataFrame,
    epochs: int = 6,
    margin: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[list[int], list[int], DataFrame]:
    """MARGIN + AVERAGED batch perceptron — the two classic stability
    variants, still all-integer and oracle-replayable:

    - margin: update on y·(w·x) <= margin (not just <= 0), so nearly-
      misclassified points keep pushing the boundary (Krauth-Mézard
      margin perceptron, integer τ);
    - averaged: also return S = Σ_e w^(e), the sum of the per-epoch
      weight snapshots; sign(S·x) is the averaged-perceptron decision
      (Freund-Schapire voting, batch form — the 1/E normalization
      cancels in the sign, so S stays integer).

    Returns (w_final, w_summed, features); features persisted — eager
    callers unpersist. Weights memoized per (frame plan, params)."""
    feat = quality_features(df, id_col, text_col).persist()
    dim = N_BUCKETS + 1

    def _loop():
        w = [0] * dim
        wsum = [0] * dim
        for _ in range(epochs):
            score = sum(F.lit(int(w[j])) * F.col(f"x{j}") for j in range(dim))
            mis = F.col("y") * score <= margin
            sums = feat.agg(
                *[
                    F.sum(F.when(mis, F.col("y") * F.col(f"x{j}"))).alias(f"g{j}")
                    for j in range(dim)
                ]
            ).collect()[0]
            w = [w[j] + int(sums[f"g{j}"] or 0) for j in range(dim)]
            wsum = [wsum[j] + w[j] for j in range(dim)]
        return w, wsum

    w, wsum = _memo_train(
        feat, ("margin-perceptron", epochs, margin, N_BUCKETS), _loop
    )
    return w, wsum, feat


def quality_perceptron_margin_scores(
    df: DataFrame,
    epochs: int = 6,
    margin: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train the margin perceptron, score every doc with BOTH the
    final and the summed (averaged-decision) weights. Output:
    (id, y, score, pred, score_avg, pred_avg) — all exact integers."""
    w, wsum, feat = train_quality_perceptron_margin(
        df, epochs, margin, id_col, text_col
    )
    dim = N_BUCKETS + 1
    score = sum(F.lit(int(w[j])) * F.col(f"x{j}") for j in range(dim))
    savg = sum(F.lit(int(wsum[j])) * F.col(f"x{j}") for j in range(dim))
    return feat.select(
        "id",
        "y",
        score.alias("score"),
        (score > 0).alias("pred"),
        savg.alias("score_avg"),
        (savg > 0).alias("pred_avg"),
    )


def quality_perceptron_margin_oracle_sql(
    table: str,
    epochs: int = 6,
    margin: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Replay with the margin condition in each epoch CTE; the summed
    weights come from ONE cross join of the per-epoch one-row CTEs
    (aliased — every w{e} shares column names)."""
    toks = _toks_duckdb(text_col)
    dim = N_BUCKETS + 1
    xdefs = feat_xdefs_duckdb()
    ctes = [
        f"t AS (SELECT {id_col} AS id, {toks} AS tk FROM {table})",
        f"feat AS MATERIALIZED (SELECT id, CAST({_label_expr_duckdb()} AS BIGINT) AS y, "
        f"CAST(1 AS BIGINT) AS x0, {xdefs} FROM t)",
        "w0 AS MATERIALIZED (SELECT "
        + ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(dim))
        + ")",
    ]
    for e in range(epochs):
        score = " + ".join(f"w.w{j} * f.x{j}" for j in range(dim))
        upd = ", ".join(
            f"CAST(w.w{j} + coalesce(sum(CASE WHEN f.y * ({score}) <= {margin} "
            f"THEN f.y * f.x{j} END), 0) AS BIGINT) AS w{j}"
            for j in range(dim)
        )
        ctes.append(
            f"w{e + 1} AS MATERIALIZED (SELECT {upd} FROM feat f, w{e} w "
            + "GROUP BY "
            + ", ".join(f"w.w{j}" for j in range(dim))
            + ")"
        )
    sdefs = ", ".join(
        "CAST("
        + " + ".join(f"a{e}.w{j}" for e in range(1, epochs + 1))
        + f" AS BIGINT) AS s{j}"
        for j in range(dim)
    )
    ctes.append(
        f"ws AS MATERIALIZED (SELECT {sdefs} FROM "
        + ", ".join(f"w{e} a{e}" for e in range(1, epochs + 1))
        + ")"
    )
    score = " + ".join(f"w.w{j} * f.x{j}" for j in range(dim))
    savg = " + ".join(f"s.s{j} * f.x{j}" for j in range(dim))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT f.id, f.y, CAST({score} AS BIGINT) AS score, ({score}) > 0 AS pred,
       CAST({savg} AS BIGINT) AS score_avg, ({savg}) > 0 AS pred_avg
FROM feat f, w{epochs} w, ws s
"""
    )


def train_quality_perceptron_margin_py(
    rows: list[dict], epochs: int = 6, margin: int = 32
) -> tuple[list[int], list[int]]:
    """Independent driver-side fold — the pin twin for the margin +
    averaged trainer."""
    dim = N_BUCKETS + 1
    w = [0] * dim
    wsum = [0] * dim
    for _ in range(epochs):
        g = [0] * dim
        for r in rows:
            x = [r[f"x{j}"] for j in range(dim)]
            if r["y"] * sum(w[j] * x[j] for j in range(dim)) <= margin:
                for j in range(dim):
                    g[j] += r["y"] * x[j]
        w = [w[j] + g[j] for j in range(dim)]
        wsum = [wsum[j] + w[j] for j in range(dim)]
    return w, wsum


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
    dim = N_BUCKETS + 1
    xdefs = feat_xdefs_duckdb()
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


def _train_perceptron_on(
    train: DataFrame, epochs: int
) -> tuple[list[int], int, int]:
    """The batch-perceptron epoch loop over an (already
    filtered/persisted-upstream) feature frame; returns
    (weights, pos, neg) — the class totals ride every epoch's
    aggregate, so CV/model-selection callers get n_train and the
    majority baseline without an extra job. Memoized per
    (frame plan, epochs) — CV folds and model selection train the
    same folds repeatedly across the suite."""
    return _memo_train(
        train,
        ("perceptron-on", epochs, N_BUCKETS),
        lambda: _train_perceptron_on_impl(train, epochs),
    )


def _train_perceptron_on_impl(
    train: DataFrame, epochs: int
) -> tuple[list[int], int, int]:
    dim = N_BUCKETS + 1
    pn = [
        F.sum(F.when(F.col("y") == 1, 1)).alias("p"),
        F.sum(F.when(F.col("y") == -1, 1)).alias("n"),
    ]
    w = [0] * dim
    sums = None
    for _ in range(epochs):
        score = sum(F.lit(int(w[j])) * F.col(f"x{j}") for j in range(dim))
        mis = F.col("y") * score <= 0
        sums = train.agg(
            *[
                F.sum(F.when(mis, F.col("y") * F.col(f"x{j}"))).alias(f"g{j}")
                for j in range(dim)
            ],
            *pn,
        ).collect()[0]
        w = [w[j] + int(sums[f"g{j}"] or 0) for j in range(dim)]
    if sums is None:
        # epochs=0: baseline-only evaluation still needs the
        # train-fold p/n (they normally ride the epoch aggregates)
        sums = train.agg(*pn).collect()[0]
    return w, int(sums["p"] or 0), int(sums["n"] or 0)


def quality_perceptron_cv_scores(
    df: DataFrame,
    k: int = 3,
    epochs: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CROSS-VALIDATED evaluation of the oracle-exact trainer — the
    honest metric the train-set scores are not: deterministic fold
    assignment fold = h32(id) % k (md5-based, identical cross-engine),
    train on the other k−1 folds, count held-out hits. Every quantity
    is an integer (fold ids, weights, hit counts), so model SELECTION
    on held-out data is itself bit-reproducible in DuckDB.

    Output: one row per fold — (fold, n_train, n_test, correct_cnt,
    majority_cnt), where majority_cnt is the held-out hit count of the
    train-fold majority label (the baseline the trained model must
    beat). Spark shape: the persisted feature frame is scanned
    k·(epochs+1) times with map-side-combined aggregates — O(1) driver
    traffic per epoch, like every trainer in this family.

    The frame carries with_total=True (the x{K+1} token-total column
    the perceptron never reads): its plan then EQUALS the
    model-selection frame's, so the per-fold _train_perceptron_on memo
    is shared between this query and quality_model_selection — one
    fold training serves both (round-8 suite-cost item; the weights
    are identical either way since dim stops at x{K})."""
    feat = (
        quality_features(df, id_col, text_col, with_total=True)
        .withColumn("fold", F.expr(h32_sql("id", "spark")) % k)
        .persist()
    )
    dim = N_BUCKETS + 1
    out = []
    try:
        for f in range(k):
            w, p, n = _train_perceptron_on(feat.where(F.col("fold") != f), epochs)
            n_train = p + n
            maj = 1 if p > n else -1
            score = sum(F.lit(int(w[j])) * F.col(f"x{j}") for j in range(dim))
            pred = F.when(score > 0, 1).otherwise(-1)
            ev = (
                feat.where(F.col("fold") == f)
                .agg(
                    F.count("*").alias("n_test"),
                    F.sum(F.when(pred == F.col("y"), 1)).alias("correct"),
                    F.sum(F.when(F.col("y") == maj, 1)).alias("maj_ok"),
                )
                .collect()[0]
            )
            out.append(
                (
                    f,
                    n_train,
                    int(ev["n_test"] or 0),
                    int(ev["correct"] or 0),
                    int(ev["maj_ok"] or 0),
                )
            )
    finally:
        feat.unpersist()
    return df.sparkSession.createDataFrame(
        out, "fold bigint, n_train bigint, n_test bigint, "
        "correct_cnt bigint, majority_cnt bigint"
    )


def quality_perceptron_cv_oracle_sql(
    table: str,
    k: int = 3,
    epochs: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Per-fold training replay + a held-out count per fold, unioned.
    Robust to DEGENERATE folds, matching the Spark side's
    unconditional per-fold output row: the train-set p/n are computed
    once in w0 (epoch-invariant — also what makes epochs=0 valid) and
    carried through the chain; each epoch's gradient aggregate may be
    EMPTY (a fold holding every row) so the weight update LEFT JOINs
    it; the eval LEFT JOINs the always-one-row weight CTE onto the
    held-out rows so a zero-test fold still yields its group."""
    toks = _toks_duckdb(text_col)
    hid = h32_sql("id", "duckdb")
    dim = N_BUCKETS + 1
    xdefs = feat_xdefs_duckdb()
    ctes = [
        f"t AS (SELECT {id_col} AS id, {toks} AS tk FROM {table})",
        f"feat AS MATERIALIZED (SELECT id, CAST({_label_expr_duckdb()} AS BIGINT) AS y, "
        f"CAST(1 AS BIGINT) AS x0, {xdefs}, CAST(({hid}) % {k} AS BIGINT) AS fold FROM t)",
    ]
    evals = []
    for f in range(k):
        ctes.append(
            f"f{f}w0 AS MATERIALIZED (SELECT "
            + ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(dim))
            + f", (SELECT CAST(coalesce(sum(CASE WHEN y = 1 THEN 1 END), 0) AS BIGINT)"
            f" FROM feat WHERE fold <> {f}) AS p"
            + f", (SELECT CAST(coalesce(sum(CASE WHEN y = -1 THEN 1 END), 0) AS BIGINT)"
            f" FROM feat WHERE fold <> {f}) AS n)"
        )
        for e in range(epochs):
            score = " + ".join(f"w.w{j} * f.x{j}" for j in range(dim))
            gdefs = ", ".join(
                f"coalesce(sum(CASE WHEN f.y * ({score}) <= 0 "
                f"THEN f.y * f.x{j} END), 0) AS g{j}"
                for j in range(dim)
            )
            ctes.append(
                f"f{f}g{e} AS (SELECT {gdefs} FROM feat f, f{f}w{e} w "
                f"WHERE f.fold <> {f} GROUP BY "
                + ", ".join(f"w.w{j}" for j in range(dim))
                + ")"
            )
            upd = ", ".join(
                f"CAST(w.w{j} + coalesce(a.g{j}, 0) AS BIGINT) AS w{j}"
                for j in range(dim)
            )
            ctes.append(
                f"f{f}w{e + 1} AS MATERIALIZED (SELECT {upd}, w.p AS p, w.n AS n "
                f"FROM f{f}w{e} w LEFT JOIN f{f}g{e} a ON TRUE)"
            )
        score = " + ".join(f"w.w{j} * f.x{j}" for j in range(dim))
        evals.append(
            f"SELECT CAST({f} AS BIGINT) AS fold, "
            f"CAST(w.p + w.n AS BIGINT) AS n_train, "
            # count(f.y), not count(*): the LEFT JOIN's padding row on
            # an empty test fold must not count (y is never NULL on
            # real rows — CASE with ELSE)
            f"CAST(count(f.y) AS BIGINT) AS n_test, "
            f"CAST(coalesce(sum(CASE WHEN (CASE WHEN ({score}) > 0 THEN 1 ELSE -1 END)"
            f" = f.y THEN 1 END), 0) AS BIGINT) AS correct_cnt, "
            f"CAST(coalesce(sum(CASE WHEN f.y = (CASE WHEN w.p > w.n THEN 1 ELSE -1 END)"
            f" THEN 1 END), 0) AS BIGINT) AS majority_cnt "
            f"FROM f{f}w{epochs} w LEFT JOIN feat f ON f.fold = {f} "
            + "GROUP BY w.p, w.n, "
            + ", ".join(f"w.w{j}" for j in range(dim))
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(evals)


# --- multi-class: trained language-ID ---------------------------------------

LANGS = ("de", "en", "es", "fr", "zh")  # the lake's label space (stable per SF)
# bias-feature scale for the multi-class trainer: class thresholds on a
# count-sum axis need intercepts ~1e5 while count coordinates move by
# ±Σx per epoch — a unit bias (±n_mis/epoch) would take ~1000 epochs to
# reach them (measured); x0=64 closes the gap within the epoch budget
BIAS_SCALE = 64


def langid_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    langs: tuple[str, ...] = LANGS,
) -> DataFrame:
    """(id, y, x0..xK): bias + K hashed CHARACTER-BIGRAM bucket counts
    plus an integer class label from the lake's ``lang`` column — the
    SUPERVISED variant (real labels, not heuristic seeds). Char
    bigrams, not token hashes: languages differ in character
    statistics (CJK vs latin vs accented latin), while a uniform hash
    of whole tokens carries no class signal at K=8. Rows with labels
    outside ``langs`` are excluded (none at the gate SFs).

    ``lang_col`` may be any SQL expression producing a string class
    (a plain column name on a real lake; the registered gate uses a
    length-class CASE because the testdata's lang labels are synthetic
    decorations over one shared vocabulary — no text signal exists for
    them, so a lang-trained model provably converges to the majority
    class there; see test_langid_on_synthetic_corpus)."""
    h = h32_sql("b", "spark")
    # guard length < 2: Spark's sequence(1, 0) DESCENDS ([1, 0]),
    # which would fabricate two phantom bigrams for empty/1-char texts
    # while the DuckDB range() twin yields [] — empty docs are routine
    # on a real lake even though the gate SFs have none
    bigrams = (
        f"CASE WHEN length({text_col}) >= 2 THEN "
        f"transform(sequence(1, length({text_col}) - 1),"
        f" i -> substring({text_col}, i, 2)) "
        f"ELSE array() END"
    )
    y = F.lit(None).cast("bigint")
    for i, lg in reversed(list(enumerate(langs))):
        y = F.when(F.expr(lang_col) == lg, F.lit(i).cast("bigint")).otherwise(y)
    cols = [
        F.col(id_col).alias("id"),
        y.alias("y"),
        F.lit(BIAS_SCALE).cast("bigint").alias("x0"),
    ]
    for j in range(N_BUCKETS):
        cols.append(
            F.expr(f"size(filter({bigrams}, b -> ({h}) % {N_BUCKETS} = {j}))")
            .cast("bigint")
            .alias(f"x{j + 1}")
        )
    return df.select(*cols).where(F.col("y").isNotNull())


def _argmax_pred(scores):
    """Deterministic argmax (ties → LOWEST class index): first score
    equal to the maximum wins — the same CASE shape the oracle uses."""
    m = F.greatest(*scores)
    pred = F.lit(len(scores) - 1)
    for c in reversed(range(len(scores) - 1)):
        pred = F.when(scores[c] == m, F.lit(c)).otherwise(pred)
    return pred.cast("bigint")


def train_langid_perceptron(
    df: DataFrame,
    epochs: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    langs: tuple[str, ...] = LANGS,
) -> tuple[list[list[int]], DataFrame]:
    """Multi-class batch perceptron, all-integer like the binary one:
    per epoch, for every misclassified sample, w[y] += x and
    w[pred] -= x (Collins 2002's structured-perceptron update in its
    flat multi-class form), stabilized by POCKET selection (Gallant
    1990): the returned weights are the epoch snapshot with the FEWEST
    training misclassifications — full-batch perceptron oscillates
    (measured: final-epoch accuracy swings between majority-level and
    good across adjacent epochs), and pocket makes the outcome the
    deterministic minimum over the trajectory instead of epoch-count
    luck. Each epoch's mis count rides the same aggregate as its
    update sums (no extra pass). Returns (W[class][dim], features) —
    features persisted; eager callers unpersist. Pocket weights
    memoized per (frame plan, params) — the 20-epoch loop is one of
    the suite's heaviest repeated trainings."""
    feat = langid_features(df, id_col, text_col, lang_col, langs).persist()
    W = _memo_train(
        feat,
        ("langid-pocket", epochs, N_BUCKETS, langs),
        lambda: _train_langid_loop(feat, epochs, langs),
    )
    return W, feat


def _train_langid_loop(
    feat: DataFrame, epochs: int, langs: tuple[str, ...]
) -> list[list[int]]:
    spark = feat.sparkSession
    dim = N_BUCKETS + 1
    C = len(langs)
    # weights enter as a BROADCAST one-row frame, not literals: the
    # per-epoch plan is then IDENTICAL (only the broadcast data
    # changes), so whole-stage codegen compiles once instead of paying
    # a fresh multi-second Janino compile per epoch (measured 2.4s/
    # epoch with literal weights — the HOF-unroll compile-cost lesson)
    wschema = ", ".join(f"w{c}_{j} bigint" for c in range(C) for j in range(dim))
    W = [[0] * dim for _ in range(C)]
    pocket = None  # (mis, epoch, W) — lexicographic min = ties to earliest
    for e in range(epochs):
        wdf = spark.createDataFrame(
            [tuple(int(W[c][j]) for c in range(C) for j in range(dim))], wschema
        )
        scores = [
            sum(F.col(f"w{c}_{j}") * F.col(f"x{j}") for j in range(dim))
            for c in range(C)
        ]
        pred = _argmax_pred(scores)
        # pred computed ONCE in a projection; the aggregate's 1+C*dim
        # conditions then compare small columns instead of re-embedding
        # the C score polynomials in every sum expression
        proj = feat.crossJoin(F.broadcast(wdf)).select(
            "y", pred.alias("pred"), *[f"x{j}" for j in range(dim)]
        )
        mis = F.col("pred") != F.col("y")
        aggs = [F.sum(F.when(mis, 1)).alias("n_mis")]
        for c in range(C):
            for j in range(dim):
                aggs.append(
                    F.sum(
                        F.when(
                            mis & (F.col("y") == c), F.col(f"x{j}")
                        ).when(mis & (F.col("pred") == c), -F.col(f"x{j}"))
                    ).alias(f"g{c}_{j}")
                )
        sums = proj.agg(*aggs).collect()[0]
        n_mis = int(sums["n_mis"] or 0)
        if pocket is None or n_mis < pocket[0]:
            pocket = (n_mis, e, W)
        W = [
            [W[c][j] + int(sums[f"g{c}_{j}"] or 0) for j in range(dim)]
            for c in range(C)
        ]
    return pocket[2]


def langid_perceptron_scores(
    df: DataFrame,
    epochs: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    langs: tuple[str, ...] = LANGS,
) -> DataFrame:
    """Train on the lake's own labels, score every doc. Output:
    (id, y, pred, correct) — integers/booleans only, so the whole
    multi-class train→score pipeline replays bit-exactly in DuckDB."""
    W, feat = train_langid_perceptron(df, epochs, id_col, text_col, lang_col, langs)
    dim = N_BUCKETS + 1
    scores = [
        sum(F.lit(int(W[c][j])) * F.col(f"x{j}") for j in range(dim))
        for c in range(len(langs))
    ]
    pred = _argmax_pred(scores)
    return feat.select("id", "y", pred.alias("pred"), (pred == F.col("y")).alias("correct"))


def langid_perceptron_oracle_sql(
    table: str,
    epochs: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    langs: tuple[str, ...] = LANGS,
) -> str:
    """Per-epoch MATERIALIZED weight CTE carrying C×dim BIGINT columns;
    the argmax uses the identical first-match-of-max CASE (ties →
    lowest class index) as the Spark side. max(w) reads the single
    weight row through the aggregate (no GROUP BY over 45 columns)."""
    dim = N_BUCKETS + 1
    C = len(langs)
    ymap = " ".join(f"WHEN '{lg}' THEN {i}" for i, lg in enumerate(langs))
    lang_col = f"({lang_col})"  # expression-safe (plain names unaffected)
    bigrams = (
        f"list_transform(range(1, greatest(length({text_col}) - 1, 0) + 1),"
        f" i -> substring({text_col}, CAST(i AS INTEGER), 2))"
    )
    xdefs = feat_xdefs_duckdb("b")
    ctes = [
        f"t AS (SELECT {id_col} AS id, CASE {lang_col} {ymap} END AS yy, {bigrams} AS tk FROM {table})",
        f"feat AS MATERIALIZED (SELECT id, CAST(yy AS BIGINT) AS y, "
        f"CAST({BIAS_SCALE} AS BIGINT) AS x0, {xdefs} FROM t WHERE yy IS NOT NULL)",
        "w0 AS MATERIALIZED (SELECT "
        + ", ".join(
            f"CAST(0 AS BIGINT) AS w{c}_{j}" for c in range(C) for j in range(dim)
        )
        + ")",
    ]

    def score(c):
        return " + ".join(f"w.w{c}_{j} * f.x{j}" for j in range(dim))

    for e in range(epochs):
        sdefs = ", ".join(f"({score(c)}) AS s{c}" for c in range(C))
        mexpr = "greatest(" + ", ".join(f"s{c}" for c in range(C)) + ")"
        pcase = (
            "CASE "
            + " ".join(f"WHEN s{c} = m THEN {c}" for c in range(C - 1))
            + f" ELSE {C - 1} END"
        )
        ctes.append(
            f"p{e} AS (SELECT f.*, w.*, {sdefs}, {mexpr} AS m, {pcase} AS pred "
            f"FROM feat f, w{e} w)"
        )
        upd = ", ".join(
            f"CAST(max(w{c}_{j}) + coalesce(sum(CASE "
            f"WHEN pred <> y AND y = {c} THEN x{j} "
            f"WHEN pred <> y AND pred = {c} THEN -x{j} END), 0) AS BIGINT) AS w{c}_{j}"
            for c in range(C)
            for j in range(dim)
        )
        # mis = the error of w{e}'s model (rides the update aggregate,
        # exactly as on the Spark side)
        ctes.append(
            f"w{e + 1} AS MATERIALIZED (SELECT {upd}, "
            f"CAST(coalesce(sum(CASE WHEN pred <> y THEN 1 END), 0) AS BIGINT)"
            f" AS mis FROM p{e})"
        )
    # POCKET replay: candidate e = w{e}'s weights with w{e+1}.mis (the
    # error of w{e}'s model); lexicographic (mis, e) min = the Spark
    # side's strict-improvement pocket with ties to the earliest epoch
    wcols = ", ".join(f"w{c}_{j}" for c in range(C) for j in range(dim))
    cand = "\nUNION ALL\n".join(
        f"SELECT {e} AS e, (SELECT mis FROM w{e + 1}) AS mis, {wcols} FROM w{e}"
        for e in range(epochs)
    )
    ctes.append(f"cand AS ({cand})")
    ctes.append("pocket AS MATERIALIZED (SELECT * FROM cand ORDER BY mis, e LIMIT 1)")
    sdefs = ", ".join(f"({score(c)}) AS s{c}" for c in range(C))
    mexpr = "greatest(" + ", ".join(f"s{c}" for c in range(C)) + ")"
    pcase = (
        "CASE "
        + " ".join(f"WHEN s{c} = m THEN {c}" for c in range(C - 1))
        + f" ELSE {C - 1} END"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT id, y, CAST(pred AS BIGINT) AS pred, pred = y AS correct
FROM (SELECT f.id, f.y, {sdefs}, {mexpr} AS m, {pcase} AS pred
      FROM feat f, pocket w) q
"""
    )


def train_langid_perceptron_py(
    rows: list[dict], epochs: int = 20, n_classes: int = len(LANGS)
) -> list[list[int]]:
    """Independent python fold (pocket included) — the pin twin."""
    dim = N_BUCKETS + 1
    W = [[0] * dim for _ in range(n_classes)]
    pocket = None
    for e in range(epochs):
        G = [[0] * dim for _ in range(n_classes)]
        n_mis = 0
        for r in rows:
            x = [r[f"x{j}"] for j in range(dim)]
            s = [sum(W[c][j] * x[j] for j in range(dim)) for c in range(n_classes)]
            m = max(s)
            pred = s.index(m)  # first max = lowest class index
            y = r["y"]
            if pred != y:
                n_mis += 1
                for j in range(dim):
                    G[y][j] += x[j]
                    G[pred][j] -= x[j]
        if pocket is None or n_mis < pocket[0]:
            pocket = (n_mis, e, W)
        W = [[W[c][j] + G[c][j] for j in range(dim)] for c in range(n_classes)]
    return pocket[2]


# length-class demo target for the registered multi-class gate: the
# testdata's lang column has no text signal (synthetic decoration over
# one vocabulary), while length terciles ARE learnable from the
# bigram-bucket counts — the gate then certifies a trainer that
# demonstrably LEARNS, not one that converges to the majority class.
LENCLASS_EXPR = (
    "CASE WHEN length(text) < 216 THEN 'short' "
    "WHEN length(text) < 380 THEN 'mid' ELSE 'long' END"
)
LENCLASS_LABELS = ("long", "mid", "short")


def lenclass_perceptron_scores(df: DataFrame, epochs: int = 10) -> DataFrame:
    """The registered multi-class exemplar: train the multi-class
    perceptron on length terciles (see LENCLASS_EXPR) and score every
    doc. Same machinery as language-ID on a real lake — only the label
    expression differs. epochs=10 measured sufficient (pocket accuracy
    +0.15 over majority at sf0.01 — the analytics test's pin); 20 was
    double the training cost for the same demonstration (round-8
    suite-cost item)."""
    return langid_perceptron_scores(
        df, epochs, lang_col=LENCLASS_EXPR, langs=LENCLASS_LABELS
    )


def lenclass_perceptron_oracle_sql(table: str, epochs: int = 10) -> str:
    return langid_perceptron_oracle_sql(
        table, epochs, lang_col=LENCLASS_EXPR, langs=LENCLASS_LABELS
    )
