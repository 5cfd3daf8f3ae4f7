"""M5/M6/M7 as registered queries: Spark assembles the tensors,
the numpy Lightning-analogue (ml/training.py) fits on the driver —
the same driver/cluster split the reference uses (pytorch-lightning
on the driver, offline data prep; SURVEY §2 M11).

Everything is deterministic: masking is md5-rolled (M8), encoder
states come from the seeded forward, head init is seeded, batches are
full-batch (no shuffle order), so the training curves and metrics are
run-stable — the driver's rows-only determinism check holds.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from tabsketchfm_spark.ml import mlm as ml_mlm
from tabsketchfm_spark.ml import reference_forward as rf
from tabsketchfm_spark.ml import training as tr
from tabsketchfm_spark.operators import profile as prof
from tabsketchfm_spark.sources.tables import load_table

PRETRAIN_TRAIN_TABLES = ["customer", "supplier", "part"]
PRETRAIN_VALID_TABLES = ["orders"]

CURVE_SCHEMA = (
    "epoch int, train_loss double, valid_loss double, "
    "grad_norm double, stopped boolean"
)


def _profiles(
    spark: SparkSession, sf_dir: str, tables: list[str], caches: list | None = None
) -> DataFrame:
    profs = _lake_profiles(spark, sf_dir, tables, caches)
    out = profs[tables[0]]
    for t in tables[1:]:
        out = out.unionByName(profs[t])
    return out


def _collect_batch(batches: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Masked-position states/labels → numpy, in a deterministic order
    (table_name, pos) — collect() order is partition-dependent."""
    rows = sorted(
        batches.collect(), key=lambda r: (r["table_name"], r["pos"])
    )
    x = np.array([r["state"] for r in rows])
    y = np.array([r["label"] for r in rows], dtype=np.int64)
    return x, y


def pretrain_curve(
    spark: SparkSession,
    sf_dir: str,
    lr: float = 5e-3,
    max_epochs: int = 40,
) -> DataFrame:
    """M5: the MLM pre-training loop over lake tables — frozen-encoder
    batches assembled on executors (ml/mlm.mlm_batches), the MLM head
    fit with AdamW + grad-clip 0.5 + early stopping patience 5 (M11,
    reference pretrain.py:76-83,135-158). lr is raised from the
    reference's 2e-5 default so the few-epoch demo curve moves; the
    default lives in training.AdamW. Returns the per-epoch curve."""
    caches: list = []
    try:
        xt, yt = _collect_batch(
            ml_mlm.mlm_batches(_profiles(spark, sf_dir, PRETRAIN_TRAIN_TABLES, caches))
        )
        xv, yv = _collect_batch(
            ml_mlm.mlm_batches(_profiles(spark, sf_dir, PRETRAIN_VALID_TABLES, caches))
        )
    finally:
        # eager consumer — release the profiler persists (ADVICE r6 class)
        for c in caches:
            c.unpersist()
    head = tr.MLMHead()
    curve = tr.fit(head, (xt, yt), (xv, yv), lr=lr, max_epochs=max_epochs)
    return spark.createDataFrame(
        [
            (
                c["epoch"],
                round(c["train_loss"], 8),
                round(c["valid_loss"], 8),
                round(c["grad_norm"], 8),
                c["stopped"],
            )
            for c in curve
        ],
        CURVE_SCHEMA,
    )


def _masked_sequences(
    spark: SparkSession, sf_dir: str, tables: list[str]
) -> list[tuple[list[dict], np.ndarray]]:
    """Profiles → per-table (masked token sequence, labels) pairs, the
    full-backprop batch unit. Profile rows are tiny (one per column);
    the driver builds sequences the same deterministic way the
    executor-side mlm_batches does, so the mask rolls — and therefore
    the masked positions and epoch-0 loss — are IDENTICAL to the
    frozen-encoder path."""
    out = []
    for t in tables:
        caches: list = []
        pdf = prof.profile_table(
            load_table(spark, sf_dir, t), t, round_digits=4, caches=caches
        ).collect()
        for c in caches:  # eager consumer — release the profiler's frames
            c.unpersist()
        col_rows = [r.asDict() for r in pdf]
        seq = rf.build_token_sequence(col_rows)
        out.append(ml_mlm.apply_mask(seq))
    return out


# driver-side fit memos (the classifier _TRAIN_MEMO / kmeans _FIT_MEMO
# rationale, round-8 suite-cost item): the m5f/k1t/k4t/m6/m6t queries
# and their tests re-run IDENTICAL deterministic fits (seeded init,
# md5 rolls, full-batch epochs) several times per session. Keyed on
# the data identity (sf_dir / profile plan hashes) + hyperparameters;
# testdata is immutable per session. clear_fit_memos() resets.
_FULL_MODEL_MEMO: dict[tuple, tuple] = {}
_HEAD_MEMO: dict[tuple, tuple] = {}


def clear_fit_memos() -> None:
    _FULL_MODEL_MEMO.clear()
    _HEAD_MEMO.clear()


def _fit_full_model(
    spark: SparkSession, sf_dir: str, lr: float = 5e-3, max_epochs: int = 12
):
    """Shared assembly + full-backprop fit for the M5-complete paths:
    (model, curve). ONE definition so the registered pretrain curve
    and the served checkpoint cannot drift (same batches, dims floor,
    optimizer discipline). Memoized per (sf_dir, lr, max_epochs);
    callers treat the returned model as read-only (state_dict reads)."""
    from tabsketchfm_spark.ml.backprop import (
        MLMPretrainModel,
        sequence_position_dims,
    )

    key = (sf_dir, lr, max_epochs, rf.width_config())
    hit = _FULL_MODEL_MEMO.get(key)
    if hit is not None:
        return hit
    bt = _masked_sequences(spark, sf_dir, PRETRAIN_TRAIN_TABLES)
    bv = _masked_sequences(spark, sf_dir, PRETRAIN_VALID_TABLES)
    mc, mt = sequence_position_dims(bt + bv)
    model = MLMPretrainModel(max_col=max(mc, 64), max_tokpos=max(mt, 64))
    curve = tr.fit(model, (bt, None), (bv, None), lr=lr, max_epochs=max_epochs)
    _FULL_MODEL_MEMO[key] = (model, curve)
    return model, curve


def pretrain_curve_full(
    spark: SparkSession,
    sf_dir: str,
    lr: float = 5e-3,
    max_epochs: int = 12,
) -> DataFrame:
    """M5 COMPLETE: MLM pre-training with full-encoder backprop
    (ml/backprop.MLMPretrainModel) — every parameter trains, embedding
    tables through encoder blocks to the tied-decoder head, matching
    the reference's actual pretraining (models/tabsketchfm.py:58-65)
    rather than its freeze path. Same optimizer discipline as the
    frozen twin (AdamW + clip 0.5 + patience 5); same deterministic
    mask rolls, so epoch 0 reproduces the frozen curve's starting loss
    and every later epoch must sit strictly below it (the extra
    capacity test pins this). Returns the per-epoch curve."""
    _, curve = _fit_full_model(spark, sf_dir, lr=lr, max_epochs=max_epochs)
    return spark.createDataFrame(
        [
            (
                c["epoch"],
                round(c["train_loss"], 8),
                round(c["valid_loss"], 8),
                round(c["grad_norm"], 8),
                c["stopped"],
            )
            for c in curve
        ],
        CURVE_SCHEMA,
    )


def _train_checkpoint_extract(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str],
    max_epochs: int = 6,
) -> list:
    """Shared train → checkpoint → serve assembly: fit the
    full-backprop model, save the npz checkpoint, extract the K1
    embedding rows for ``tables`` with the trained weights installed
    per executor worker. Returns the collected embedding rows (tiny:
    cols + 2 per table)."""
    import shutil
    import tempfile

    from tabsketchfm_spark.ml import checkpoint as ck
    from tabsketchfm_spark.ml import embed as ml_embed

    model, _ = _fit_full_model(spark, sf_dir, max_epochs=max_epochs)
    tmpdir = tempfile.mkdtemp(prefix="tsfm_ck_")
    caches: list = []
    try:
        path = tmpdir + "/served"
        ck.save_checkpoint(path, model.state_dict())
        parts = [
            prof.profile_table(
                load_table(spark, sf_dir, t), t, round_digits=4, caches=caches
            )
            for t in tables
        ]
        profile = parts[0]
        for p in parts[1:]:
            profile = profile.unionByName(p)
        rows = ml_embed.extract_embeddings(
            profile, checkpoint_path=path
        ).collect()  # eager, so the caches can be released below
    finally:
        # unpersist in finally: a raise inside collect() must not leave
        # the profiler persists live (ADVICE r6 cache-leak class)
        for c in caches:
            c.unpersist()
        shutil.rmtree(tmpdir, ignore_errors=True)
    return rows


def serve_trained_embeddings(
    spark: SparkSession,
    sf_dir: str,
    table: str = "customer",
    max_epochs: int = 6,
) -> DataFrame:
    """The WHOLE loop as one query — train (full-encoder backprop) →
    checkpoint (npz + hash manifest) → serve (lake-wide extraction with
    the trained weights installed per executor worker): the
    pretrain-then-extract workflow of the reference
    (pretrain.py → extract_embeddings.py) end to end. Deterministic:
    seeded init, md5 mask rolls, full-batch epochs → identical vectors
    every run (the driver's rows-only determinism check).
    Output: the K1 embedding table for ``table`` under the trained
    checkpoint."""
    from tabsketchfm_spark.ml import embed as ml_embed

    rows = _train_checkpoint_extract(spark, sf_dir, [table], max_epochs)
    return spark.createDataFrame(rows, ml_embed.EMBED_SCHEMA)


def trained_unionability_search(
    spark: SparkSession,
    sf_dir: str,
    query_table: str = "customer",
    cand_tables: tuple[str, ...] = ("supplier", "nation", "region", "orders", "part"),
    max_epochs: int = 6,
    over_fetch: int = 30,
) -> DataFrame:
    """The reference's FULL lifecycle as one query: pretrain
    (pretrain.py) → checkpoint → extract column embeddings for the
    query and candidate tables from the TRAINED weights
    (extract_embeddings.py:119-199) → K4 union search over them
    (embedding_search.py:118-164). The candidate ranking runs through
    the same column-vote algebra whose SQL twin is oracle-exact
    (k4_column_vote_embeddings, operators/vector.column_vote_search);
    only the upstream vectors differ — served from the trained
    checkpoint instead of the fixtures table. Deterministic rows-only
    (seeded init, md5 mask rolls, full-batch epochs).
    Output: (cand_table, matched_cols, dist_sum, rank)."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.ml import embed as ml_embed
    from tabsketchfm_spark.operators.vector import column_vote_search

    rows = _train_checkpoint_extract(
        spark, sf_dir, [query_table, *cand_tables], max_epochs
    )
    emb = (
        spark.createDataFrame(rows, ml_embed.EMBED_SCHEMA)
        .where(F.col("kind") == "column")
        .select(
            F.concat_ws(".", "table_name", "column_name").alias("vec_id"),
            F.col("vector").alias("embedding"),
            F.col("table_name").alias("label"),
        )
    )
    return column_vote_search(emb, query_label=query_table, over_fetch=over_fetch)


# --- M6/M7: fine-tune table-similarity --------------------------------------

FINETUNE_TABLES = ["customer", "supplier", "orders", "part", "nation", "region"]

EVAL_SCHEMA = (
    "split string, n_pairs int, epochs_run int, final_train_loss double, "
    "final_valid_loss double, accuracy double, f1_weighted double"
)

PAIR_POOL_SCHEMA = "pair_id string, pooled array<double>, label long"


def _pair_pooled(
    profile: DataFrame,
    n_layers: int | None = None,
    checkpoint_path: str | None = None,
) -> DataFrame:
    """Per-pair cross-encoder forward: the pair's combined token
    sequence ([CLS] t1-cols... t2-cols..., the M10 concat layout)
    through the full M2 model; emits the tanh-POOLED output the M6
    head consumes (reference tabsketchfm_finetune.py:84). Input
    profile rows carry (pair_id, side, label); executors do the
    forward, one row out per pair."""
    import pandas as pd

    from tabsketchfm_spark.session import ensure_package_on_workers

    ensure_package_on_workers(profile.sparkSession)

    def pool(pdf: pd.DataFrame) -> pd.DataFrame:
        from tabsketchfm_spark.ml.mlm import _ensure_task_state
        from tabsketchfm_spark.ml.reference_forward import (
            build_token_sequence,
            model_forward,
        )

        # width=None RESETS a reused worker another task may have left
        # at a non-default width (round-8 review finding — this was the
        # one executor entry point without the declaration)
        _ensure_task_state(checkpoint_path, None)
        rows = [{c: r[c] for c in pdf.columns} for _, r in pdf.iterrows()]
        pair_id = rows[0]["pair_id"]
        label = int(rows[0]["pair_label"])
        # M10 layout: side-2 columns follow side-1 columns in one
        # sequence; col_idx offset keeps ordering and SEP groups intact
        for r in rows:
            if r["side"] == 2:
                r["col_idx"] = r["col_idx"] + 1000
        seq = build_token_sequence(rows)
        _, pooled = model_forward(seq, n_layers=n_layers)
        return pd.DataFrame(
            [(pair_id, pooled.tolist(), label)],
            columns=["pair_id", "pooled", "label"],
        )

    return profile.groupBy("pair_id").applyInPandas(pool, schema=PAIR_POOL_SCHEMA)


def _lake_profiles(
    spark: SparkSession, sf_dir: str, tables: list[str], caches: list | None = None
) -> dict[str, DataFrame]:
    """One profile frame per table, built ONCE per query — callers
    thread ``caches`` and unpersist after their eager collect (the
    ADVICE-r6 cache-leak class: profile_table persists internal frames
    that otherwise stay live for the whole session). With ``caches``
    the profile OUTPUTS (one row per column — tiny) are persisted too:
    the training queries run several separate eager actions over the
    same tables (train collect, valid collect, scoring collect), and
    without this each action re-runs the whole profile pipeline —
    exchange reuse never spans actions (2+-consumer persist rule)."""
    profs: dict[str, DataFrame] = {}
    for t in tables:
        p = prof.profile_table(
            load_table(spark, sf_dir, t), t, round_digits=4, caches=caches
        )
        if caches is not None:
            p = p.persist()
            caches.append(p)
        profs[t] = p
    return profs


def _similarity_pairs(tables: list[str]) -> list[tuple[str, str, str, int]]:
    """Deterministic similarity pairs over the lake: positives are
    self-pairs (a table against itself — the degenerate 'augmented
    copy' positive), negatives pair each table with the next one."""
    pairs = []
    for i, t in enumerate(tables):
        u = tables[(i + 1) % len(tables)]
        pairs += [(f"pos_{t}", t, t, 1), (f"neg_{t}_{u}", t, u, 0)]
    return pairs


def _pair_layout(
    profs: dict[str, DataFrame], pairs: list[tuple[str, str, str, int]]
) -> DataFrame:
    """M10 pair-layout rows from prebuilt profiles: one
    (pair_id, side, pair_label, *profile) block per pair side."""
    from pyspark.sql import functions as F

    parts = []
    for pid, t1, t2, lbl in pairs:
        for side, tt in ((1, t1), (2, t2)):
            parts.append(
                profs[tt].select(
                    F.lit(pid).alias("pair_id"),
                    F.lit(side).alias("side"),
                    F.lit(lbl).alias("pair_label"),
                    "*",
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _fit_similarity_head(
    profs: dict[str, DataFrame],
    lr: float = 0.1,
    max_epochs: int = 800,
    patience: int = 50,
    no_pretrain: bool = False,
):
    """The ONE definition of the M6 demo task — train pairs from the
    first four finetune tables, valid pairs from the last two, and the
    SEED-SENSITIVE hyperparameters (weight_decay 0 + raised
    lr/patience: the 8-pair task is ill-conditioned, separator norm
    ~76 on unit-ish tanh features, so the reference's 2e-5/patience-5
    would stop at chance level; re-tune if weight generation changes).
    Shared by finetune_eval and trained_pair_scores so the trained
    scorer can never desync from the m6 metrics it reproduces.
    Returns (head, curve, (xt, yt), (xv, yv)). Memoized per (profile
    plan hashes, hyperparameters) — the m6/m6t queries and their tests
    repeat this exact fit; callers read the head, never mutate it."""
    key = (
        tuple(sorted((t, p._jdf.semanticHash()) for t, p in profs.items())),
        lr, max_epochs, patience, no_pretrain, rf.width_config(),
    )
    hit = _HEAD_MEMO.get(key)
    if hit is not None:
        return hit
    train_t, valid_t = FINETUNE_TABLES[:4], FINETUNE_TABLES[4:]
    xt, yt, _ = _collect_pairs(
        _pair_pooled(_pair_layout(profs, _similarity_pairs(train_t)))
    )
    xv, yv, _ = _collect_pairs(
        _pair_pooled(_pair_layout(profs, _similarity_pairs(valid_t)))
    )
    head = tr.ClassificationHead(
        num_labels=2,
        problem_type="single_label_classification",
        seed=1 if no_pretrain else 0,
    )
    curve = tr.fit(
        head, (xt, yt), (xv, yv),
        lr=lr, max_epochs=max_epochs, patience=patience, weight_decay=0.0,
    )
    _HEAD_MEMO[key] = (head, curve, (xt, yt), (xv, yv))
    return head, curve, (xt, yt), (xv, yv)


def finetune_eval(
    spark: SparkSession,
    sf_dir: str,
    lr: float = 0.1,
    max_epochs: int = 800,
    patience: int = 50,
    no_pretrain: bool = False,
) -> DataFrame:
    """M6/M7: fine-tune-table-similarity with the frozen-encoder
    classification head (2 labels, single-label CE routing) and report
    the reference's metrics — accuracy + weighted F1 (compute_accuracy,
    tabsketchfm_finetune.py:176-184). Train pairs come from the first
    four tables, valid pairs from the last two. ``no_pretrain`` routes
    through the M12 re-init ablation (head re-seeded)."""
    caches: list = []
    try:
        profs = _lake_profiles(spark, sf_dir, list(FINETUNE_TABLES), caches)
        head, curve, (xt, yt), (xv, yv) = _fit_similarity_head(
            profs, lr=lr, max_epochs=max_epochs, patience=patience,
            no_pretrain=no_pretrain,
        )
        rows = []
        for split, (x, y) in (("train", (xt, yt)), ("valid", (xv, yv))):
            logits = head.logits(x)
            preds = logits.argmax(axis=1)
            acc = float(np.mean(preds == y))
            f1 = tr.weighted_f1(y, preds)
            rows.append(
                (
                    split,
                    int(len(y)),
                    len(curve),
                    round(curve[-1]["train_loss"], 8),
                    round(curve[-1]["valid_loss"], 8),
                    round(acc, 8),
                    round(f1, 8),
                )
            )
    finally:
        for c in caches:
            c.unpersist()
    return spark.createDataFrame(rows, EVAL_SCHEMA)


def _collect_pairs(pooled: DataFrame):
    rows = sorted(pooled.collect(), key=lambda r: r["pair_id"])
    x = np.array([r["pooled"] for r in rows])
    y = np.array([r["label"] for r in rows], dtype=np.int64)
    return x, y, [r["pair_id"] for r in rows]


# --- M6T: trained pair scoring lake-wide (VERDICT r6 #6) --------------------

PAIR_SCORE_SCHEMA = (
    "table_a string, table_b string, logit_0 double, logit_1 double, "
    "margin double, pred_similar boolean"
)


def trained_pair_scores(
    spark: SparkSession,
    sf_dir: str,
    query_table: str = "customer",
    cand_tables: tuple[str, ...] = ("supplier", "nation", "region", "orders", "part"),
) -> DataFrame:
    """The reference's operative finetune flow lake-wide
    (tabular_dataset.py:168-192 → tabsketchfm_finetune.py:86-107):
    score table PAIRS through the cross-encoder with a TRAINED head.

    Lifecycle, end to end: (1) fine-tune the M6 head on the
    deterministic similarity pairs (_fit_similarity_head — the SAME
    helper m6_finetune_eval runs, so data and hyperparameters are one
    definition); (2) round-trip the trained
    head through the S13 npz checkpoint (save → load, hash-verified) —
    the scoring below serves the LOADED weights, proving the
    train→checkpoint→serve loop for the head; (3) build the M10 pair
    layout for (query_table, cand) across the lake and run the
    cross-encoder forward per pair on EXECUTORS (_pair_pooled, whose
    workers go through ensure_checkpoint_state for encoder hygiene);
    (4) apply the head as pure column algebra over the pooled vectors
    — a zip_with/aggregate dot per label, the SQL-expressible stage
    whose bit-exact oracle pin is m6h_head_scores_customer.

    Deterministic rows-only (seeded init, md5 rolls, full-batch
    epochs). Output: one row per (query_table, cand) pair with both
    logits, the similarity margin, and the predicted label."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tabsketchfm_spark.ml import checkpoint as ck

    tables = list(dict.fromkeys((query_table, *cand_tables)))
    caches: list = []
    try:
        # ONE profile build serves both the head fit (its 6 finetune
        # tables) and the scoring layout — three separate profile
        # pipelines per run otherwise (review finding, round 7)
        profs = _lake_profiles(
            spark, sf_dir, list(dict.fromkeys((*FINETUNE_TABLES, *tables))), caches
        )
        head, _, _, _ = _fit_similarity_head(profs)
        tmpdir = tempfile.mkdtemp(prefix="tsfm_head_")
        try:
            ck.save_checkpoint(tmpdir + "/head", head.params)
            served = ck.load_checkpoint(tmpdir + "/head")
        finally:
            shutil.rmtree(tmpdir, ignore_errors=True)
        w, b = served["w"], served["b"]

        # (query_table × candidate) pairs only — iterating `tables`
        # here would prepend a (query, query) self-pair (round-8
        # advisory)
        pair_prof = _pair_layout(
            profs,
            [(f"{query_table}|{cand}", query_table, cand, 0) for cand in cand_tables],
        )
        # trained-head scoring as column algebra (the m6h-pinned stage)
        wk = [F.array(*[F.lit(float(v)) for v in w[k]]) for k in range(2)]

        def dot(vec, wcol):
            return F.aggregate(
                F.zip_with(vec, wcol, lambda p, q: p * q),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )

        logit0 = dot(F.col("pooled"), wk[0]) + F.lit(float(b[0]))
        logit1 = dot(F.col("pooled"), wk[1]) + F.lit(float(b[1]))
        rows = (
            _pair_pooled(pair_prof)
            .select(
                F.split("pair_id", r"\|")[0].alias("table_a"),
                F.split("pair_id", r"\|")[1].alias("table_b"),
                F.round(logit0, 8).alias("logit_0"),
                F.round(logit1, 8).alias("logit_1"),
                F.round(logit1 - logit0, 8).alias("margin"),
                (logit1 > logit0).alias("pred_similar"),
            )
            .collect()  # one row per pair — bounded by |cand_tables|
        )
    finally:
        for c in caches:
            c.unpersist()
    return spark.createDataFrame(rows, PAIR_SCORE_SCHEMA)


def head_scores_algebra(
    spark: SparkSession,
    sf_dir: str,
    table: str = "customer",
    id_col: str = "c_custkey",
) -> DataFrame:
    """The ORACLE PIN for the m6t scoring stage (the m4 pattern): the
    head's pooled_feature → Linear(H, 2) logits are pure left-to-right
    column arithmetic, identical in Spark and DuckDB. The real pooled
    vectors come from the numpy encoder (not SQL-expressible), so the
    pin feeds the SAME algebra deterministic md5-derived stand-in
    features in [-1, 1) and the SEEDED head weights as literals. The
    dot is UNROLLED left-to-right with explicit left-associated adds
    on BOTH sides — DuckDB's list_dot_product kernel is NOT ulp-stable
    against a sequential fold (measured: last-2-ulp drift on ~1% of
    rows), an explicit add chain is, in both engines.
    Output: (id, logit_0, logit_1, margin)."""
    from pyspark.sql import functions as F

    from tabsketchfm_spark.functions.hashing import h32_sql

    head = tr.ClassificationHead(
        num_labels=2, problem_type="single_label_classification", seed=0
    )
    w, b = head.params["w"], head.params["b"]
    feats = [
        F.expr(
            h32_sql(
                f"concat('m6h|', cast({id_col} as string), '|', '{i}')",
                "spark",
            )
        ).cast("double")
        / F.lit(2147483648.0)
        - F.lit(1.0)
        for i in range(rf.HIDDEN)
    ]
    df = load_table(spark, sf_dir, table).select(
        F.col(id_col).alias("id"),
        *[f.alias(f"x{i}") for i, f in enumerate(feats)],
    )

    def dot(k: int):
        acc = F.col("x0") * F.lit(float(w[k][0]))
        for i in range(1, rf.HIDDEN):
            acc = acc + F.col(f"x{i}") * F.lit(float(w[k][i]))
        return acc + F.lit(float(b[k]))

    logit0, logit1 = dot(0), dot(1)
    return df.select(
        "id",
        logit0.alias("logit_0"),
        logit1.alias("logit_1"),
        (logit1 - logit0).alias("margin"),
    )


def head_scores_algebra_oracle_sql(
    table: str = "customer", id_col: str = "c_custkey"
) -> str:
    from tabsketchfm_spark.functions.hashing import h32_sql

    head = tr.ClassificationHead(
        num_labels=2, problem_type="single_label_classification", seed=0
    )
    w, b = head.params["w"], head.params["b"]

    def lit(v: float) -> str:
        # STRING→DOUBLE cast, not a bare decimal literal: DuckDB parses
        # decimal literals as DECIMAL first and the DECIMAL→DOUBLE cast
        # double-rounds (measured: 3 of 32 head weights off by 1 ulp);
        # the string cast is a direct correctly-rounded strtod
        return f"'{float(v)!r}'::DOUBLE"

    hashes = [
        h32_sql(f"concat('m6h|', cast({id_col} as varchar), '|', '{i}')", "duckdb")
        for i in range(rf.HIDDEN)
    ]
    fcols = ",\n       ".join(
        f"({h}::DOUBLE / 2147483648.0 - 1.0) AS x{i}"
        for i, h in enumerate(hashes)
    )

    # explicit left-associated add chain — mirrors the Spark side term
    # for term (see head_scores_algebra: list_dot_product is not
    # ulp-stable against a sequential fold)
    def dotk(k: int) -> str:
        terms = " + ".join(
            f"x{i} * {lit(w[k][i])}" for i in range(rf.HIDDEN)
        )
        return f"({terms} + {lit(b[k])})"

    return f"""
WITH f AS (SELECT {id_col} AS id,
       {fcols}
       FROM {table})
SELECT id,
       {dotk(0)} AS logit_0,
       {dotk(1)} AS logit_1,
       {dotk(1)} - {dotk(0)} AS margin
FROM f
"""
