"""M3 as a Spark stage: masked-LM evaluation over lake tables.

Composes the exact pieces the reference composes (pretrain.py:
TabSketchFM -> TabularBertForMaskedLM over tokenizer batches):

- the M8 masking policy (reference tabular_tokenizer.py:82-144) —
  re-rolled here in Python from the SAME md5 rolls the registered
  `m8_mask_plan_*` query uses, so plan and application cannot drift
  (test_model_stack asserts Python == DataFrame decisions),
- the M1/M2 numpy forward (ml/reference_forward.py),
- the M3 MLM head + CrossEntropy(ignore -100)
  (reference transformer_bert.py:227-297).

Spark integration mirrors K1: one table's token sequence is the unit
of work, so `masked_lm_eval` distributes per-table via
``applyInPandas`` and emits one metrics row per table — the shape
M5's ``log_output``/``epochMetrics`` reduce to (models/tabsketchfm.py:
40-55, 62-74).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from tabsketchfm_spark.ml import reference_forward as rf

EVAL_SCHEMA = (
    "table_name string, n_tokens int, n_masked int, "
    "mlm_loss double, n_correct int, accuracy double"
)


def py_h32(s: str) -> int:
    """Python twin of functions.hashing.h32_sql: first 8 md5 hex digits
    as an integer (== int.from_bytes(digest[:4], 'big'))."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# vocab ids the random-replacement draw must avoid (reference
# create_desc_mask filters specials) — loop-invariant, built once
# the reference's random-replacement filter set (create_desc_mask):
# {SEP, CLS, PAD, UNK} — [MASK] is NOT filtered there, and a draw that
# lands on a special KEEPS the original token rather than re-rolling
_RANDOM_FILTER_WIDS = frozenset(
    rf.word_id(s) for s in ("[SEP]", "[CLS]", "[PAD]", "[UNK]")
)


def mask_actions(seq: list[dict]) -> list[str]:
    """The M8 policy over a built token sequence: per-position action in
    {'none', '[MASK]', 'random', 'keep'}. Probabilities follow the
    reference's column-run-length rule (100% if <5 tokens, 60% if <10,
    else 15%; specials never masked) with the 80/10/10 sub-roll; all
    rolls are md5(position|token) — the SAME rolls as the registered M8
    mask-plan query, so the DataFrame plan IS this function's oracle."""
    col_len: dict[int, int] = {}
    for t in seq:
        if t["col_encoding"] > 0:
            col_len[t["col_encoding"]] = max(
                col_len.get(t["col_encoding"], 0), t["token_position"]
            )
    actions = []
    for pos, t in enumerate(seq):
        if t["col_encoding"] == 0:
            actions.append("none")
            continue
        n = col_len[t["col_encoding"]]
        prob = 100 if n < 5 else (60 if n < 10 else 15)
        if py_h32(f"{pos}|{t['token']}") % 100 >= prob:
            actions.append("none")
            continue
        r2 = py_h32(f"sub|{pos}|{t['token']}") % 10
        actions.append("[MASK]" if r2 < 8 else ("random" if r2 == 8 else "keep"))
    return actions


def apply_mask(seq: list[dict]) -> tuple[list[dict], np.ndarray]:
    """(masked sequence, labels): masked positions carry the ORIGINAL
    vocab id as the label and an action-dependent input id ([MASK]
    token / deterministic random vocab id / kept id); everything else
    labels -100 (the CE ignore index). Returns a copy — the input
    sequence is untouched."""
    actions = mask_actions(seq)
    labels = np.full(len(seq), -100, dtype=np.int64)
    out = []
    for pos, (t, act) in enumerate(zip(seq, actions)):
        t = dict(t)
        wid = rf.word_id(t["token"])
        if act != "none":
            labels[pos] = wid
            if act == "[MASK]":
                t["wid"] = rf.word_id("[MASK]")
            elif act == "random":
                # reference create_desc_mask semantics: one draw; if it
                # lands on {SEP, CLS, PAD, UNK} the ORIGINAL token is
                # kept (no re-roll; [MASK] is drawable there too)
                rid = py_h32(f"rnd|{pos}|{t['token']}") % rf.VOCAB
                t["wid"] = wid if rid in _RANDOM_FILTER_WIDS else rid
            else:  # keep
                t["wid"] = wid
        out.append(t)
    return out, labels


def _ensure_task_state(checkpoint_path, width) -> None:
    """Executor-side state declaration (the reused-worker contract):
    resize to the requested width — clearing any stale override first —
    then install/clear the checkpoint. Shared by every mlm UDF."""
    from tabsketchfm_spark.ml import reference_forward as rf_mod
    from tabsketchfm_spark.ml.checkpoint import ensure_checkpoint_state

    want = tuple(width) if width else rf_mod.DEFAULT_WIDTH
    if rf_mod.width_config() != want:
        ensure_checkpoint_state(None)
        rf_mod.configure_width(*want)
    ensure_checkpoint_state(checkpoint_path)


def masked_lm_eval(
    profile: DataFrame,
    n_layers: int | None = None,
    checkpoint_path: str | None = None,
    width: tuple[int, int, int] | None = None,
) -> DataFrame:
    """Lake-wide MLM evaluation: profile rows (one per column, with a
    table_name column) → one row per table with the masked-LM loss and
    argmax accuracy at masked positions. Distribution is per table
    (bounded group: cols × ~5 tokens); the vocab-size decoder matmul
    runs only at masked positions."""
    from tabsketchfm_spark.session import ensure_package_on_workers

    ensure_package_on_workers(profile.sparkSession)

    def infer(pdf: pd.DataFrame) -> pd.DataFrame:
        from tabsketchfm_spark.ml.mlm import _ensure_task_state, apply_mask
        from tabsketchfm_spark.ml.reference_forward import (
            build_token_sequence,
            masked_lm_forward,
        )

        # serve a TRAINED checkpoint when given one; otherwise make
        # sure a reused worker is back on seeded weights + this width
        _ensure_task_state(checkpoint_path, width)
        col_rows = [
            {c: r[c] for c in pdf.columns} for _, r in pdf.iterrows()
        ]
        table_name = col_rows[0]["table_name"]
        seq = build_token_sequence(col_rows)
        masked, labels = apply_mask(seq)
        out = masked_lm_forward(masked, labels, n_layers=n_layers)
        n = out["total"]
        return pd.DataFrame(
            [
                (
                    table_name,
                    len(seq),
                    n,
                    out["loss"] if n else None,
                    out["correct"],
                    (out["correct"] / n) if n else None,
                )
            ],
            columns=[
                "table_name", "n_tokens", "n_masked",
                "mlm_loss", "n_correct", "accuracy",
            ],
        )

    return profile.groupBy("table_name").applyInPandas(infer, schema=EVAL_SCHEMA)


def mlm_training_batch(seq: list[dict], n_layers: int | None = None):
    """One table → the frozen-encoder MLM training batch: (states at
    masked positions, labels). The encoder runs ONCE per table (the
    reference's freeze path, tabsketchfm_finetune.py:26-28 — only the
    head trains); ml/training.py consumes these batches."""
    masked, labels = apply_mask(seq)
    states = rf.encoder_forward(rf.m1_forward(masked), n_layers)
    pos = [i for i in range(len(labels)) if labels[i] != -100]
    return states[pos], labels[pos]


BATCH_SCHEMA = "table_name string, pos int, state array<double>, label long"


def mlm_batches(
    profile: DataFrame,
    n_layers: int | None = None,
    checkpoint_path: str | None = None,
    width: tuple[int, int, int] | None = None,
) -> DataFrame:
    """Distributed batch assembly: profile rows → one row per MASKED
    position with its frozen encoder state and label. The expensive
    part (per-table encoder forward) runs on executors; the driver
    only collects the already-tiny masked-position states — the
    "Spark feeds preprocessed tensors" split of SURVEY §2 M11."""
    from tabsketchfm_spark.session import ensure_package_on_workers

    ensure_package_on_workers(profile.sparkSession)

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        from tabsketchfm_spark.ml.mlm import (
            _ensure_task_state,
            mlm_training_batch,
        )
        from tabsketchfm_spark.ml.reference_forward import build_token_sequence

        _ensure_task_state(checkpoint_path, width)
        col_rows = [{c: r[c] for c in pdf.columns} for _, r in pdf.iterrows()]
        table_name = col_rows[0]["table_name"]
        seq = build_token_sequence(col_rows)
        states, labels = mlm_training_batch(seq, n_layers)
        return pd.DataFrame(
            [
                (table_name, i, states[i].tolist(), int(labels[i]))
                for i in range(len(labels))
            ],
            columns=["table_name", "pos", "state", "label"],
        )

    return profile.groupBy("table_name").applyInPandas(assemble, schema=BATCH_SCHEMA)
