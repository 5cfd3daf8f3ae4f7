"""M2-M7/M11/M12: the numpy model stack.

Gradient correctness is checked against finite differences — the
strongest available oracle for training math (no torch in env to
cross-check against).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from tabsketchfm_spark.ml import mlm, reference_forward as rf, training as tr

pytestmark = pytest.mark.usefixtures()


def _demo_profile_rows(n_cols: int = 3) -> list[dict]:
    names = [
        "cust_key_id",
        "account_balance_amount_usd_total_rolling_avg_v2_x",
        "segment",
    ]
    return [
        {
            "column_name": names[i % len(names)] + ("" if i < len(names) else str(i)),
            "col_idx": i,
            "col_type": ["integer", "float", "string"][i % 3],
            **{c: float((i + 1) * (j + 1)) for j, c in enumerate(rf._STAT_COLS)},
        }
        for i in range(n_cols)
    ]


def _demo_seq():
    return rf.build_token_sequence(_demo_profile_rows())


# --- M2: full encoder + pooler ---------------------------------------------


def test_encoder_forward_stacks_layers():
    seq = _demo_seq()
    emb = rf.m1_forward(seq)
    hidden = rf.encoder_forward(emb, n_layers=3, output_hidden_states=True)
    # hidden_states tuple analogue: [embeddings, l1, l2, l3]
    assert len(hidden) == 4
    assert np.array_equal(hidden[0], emb)
    assert np.array_equal(hidden[1], rf.encoder_layer(emb, layer=0))
    # layer composition, not repetition: each step transforms the last
    assert not np.array_equal(hidden[2], hidden[1])
    # last == non-tuple call
    assert np.array_equal(hidden[3], rf.encoder_forward(emb, n_layers=3))
    # hidden_layer_1 compatibility: the K1 pooling input is hidden[1]
    assert np.allclose(hidden[1], rf.hidden_layer_1(seq))


def test_pooler_is_bounded_tanh_of_cls():
    seq = _demo_seq()
    states, pooled = rf.model_forward(seq)
    assert pooled.shape == (rf.HIDDEN,)
    assert np.all(np.abs(pooled) < 1.0)
    # pooler consumes ONLY the first token's state
    other = states.copy()
    other[1:] += 1.0
    w = rf._mat("pooler", rf.HIDDEN, rf.HIDDEN)
    b = rf._bias("pooler", rf.HIDDEN)
    assert np.allclose(pooled, np.tanh(w @ states[0] + b))


# --- M8 application + M3 ----------------------------------------------------


def test_mask_actions_match_registered_mask_plan(spark, sf01):
    """The Python mask roll (ml/mlm.mask_actions) and the registered M8
    DataFrame plan are the same policy — bit-identical decisions on a
    real table."""
    from tabsketchfm_spark.operators import profile as prof
    from tabsketchfm_spark.operators.features import mask_plan
    from tabsketchfm_spark.sources.tables import load_table

    p = prof.profile_table(
        load_table(spark, sf01, "customer"), "customer", round_digits=4
    )
    plan = {
        r["position_id"]: r["action"]
        for r in mask_plan(p).collect()
    }
    rows = [r.asDict() for r in p.collect()]
    seq = rf.build_token_sequence(rows)
    actions = mlm.mask_actions(seq)
    assert len(actions) == len(plan)
    for pos, act in enumerate(actions):
        assert act == plan[pos], f"position {pos}: {act} != {plan[pos]}"


def test_mlm_loss_near_log_vocab_at_init():
    """Untrained (seeded) weights know nothing: CE at masked positions
    must sit near log|V| (uniform-ish logits), and ignore -100."""
    seq = _demo_seq()
    masked, labels = mlm.apply_mask(seq)
    out = rf.masked_lm_forward(masked, labels)
    assert out["total"] == int((labels != -100).sum()) > 0
    assert abs(out["loss"] - math.log(rf.VOCAB)) < 1.5
    # all-ignored labels → no loss
    none = rf.masked_lm_forward(masked, np.full(len(labels), -100))
    assert none["total"] == 0 and math.isnan(none["loss"])


def test_cross_entropy_exact_on_known_logits():
    logits = np.log(np.array([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]]))
    labels = np.array([0, 1])
    loss, n = rf.cross_entropy(logits, labels)
    assert n == 2
    assert abs(loss - (-(math.log(0.7) + math.log(0.8)) / 2)) < 1e-12
    # ignore_index drops the second row
    loss1, n1 = rf.cross_entropy(logits, np.array([0, -100]))
    assert n1 == 1 and abs(loss1 + math.log(0.7)) < 1e-12


# --- M5: MLM head gradients (finite differences) ----------------------------


def test_mlm_head_gradients_match_finite_differences():
    seq = _demo_seq()
    x, y = mlm.mlm_training_batch(seq)
    head = tr.MLMHead()
    loss, grads = head.loss_and_grads(x, y)
    base, _ = head.loss_and_grads(x, y)
    assert abs(loss - base) < 1e-12  # deterministic
    eps = 1e-6
    rng = np.random.RandomState(7)
    for name in ("w", "b", "gamma", "beta", "dec_b"):
        p = head.params[name]
        flat = p.reshape(-1)
        for idx in rng.choice(flat.size, size=min(4, flat.size), replace=False):
            old = flat[idx]
            flat[idx] = old + eps
            lp, _ = head.loss_and_grads(x, y)
            flat[idx] = old - eps
            lm, _ = head.loss_and_grads(x, y)
            flat[idx] = old
            num = (lp - lm) / (2 * eps)
            ana = grads[name].reshape(-1)[idx]
            assert abs(num - ana) < 1e-5 * max(1.0, abs(num)), (
                f"{name}[{idx}]: analytic {ana} vs numeric {num}"
            )


def test_classification_head_gradients_all_three_routings():
    rng = np.random.RandomState(0)
    pooled = rng.standard_normal((6, rf.HIDDEN))
    cases = [
        (1, "regression", rng.standard_normal(6)),
        (3, "single_label_classification", np.array([0, 1, 2, 1, 0, 2])),
        (3, "multi_label_classification", (rng.rand(6, 3) > 0.5).astype(float)),
    ]
    eps = 1e-6
    for num_labels, ptype, labels in cases:
        head = tr.ClassificationHead(num_labels, problem_type=ptype)
        loss, grads = head.loss_and_grads(pooled, labels)
        assert np.isfinite(loss)
        for name in ("w", "b"):
            p = head.params[name]
            flat = p.reshape(-1)
            for idx in [0, flat.size // 2, flat.size - 1]:
                old = flat[idx]
                flat[idx] = old + eps
                lp, _ = head.loss_and_grads(pooled, labels)
                flat[idx] = old - eps
                lm, _ = head.loss_and_grads(pooled, labels)
                flat[idx] = old
                num = (lp - lm) / (2 * eps)
                ana = grads[name].reshape(-1)[idx]
                assert abs(num - ana) < 1e-5 * max(1.0, abs(num)), (
                    f"{ptype} {name}[{idx}]: {ana} vs {num}"
                )


def test_problem_type_auto_routing():
    """The reference routes by num_labels + label dtype
    (tabsketchfm_finetune.py:86-96)."""
    assert tr.ClassificationHead(1)._route(np.zeros(3)) == "regression"
    assert (
        tr.ClassificationHead(3)._route(np.zeros(3, dtype=np.int64))
        == "single_label_classification"
    )
    assert (
        tr.ClassificationHead(3)._route(np.zeros((3, 3)))
        == "multi_label_classification"
    )


# --- M11: optimizer + loop mechanics ----------------------------------------


def test_adamw_single_step_matches_hand_formula():
    p0 = np.array([1.0, -2.0])
    params = {"p": p0.copy()}
    opt = tr.AdamW(params, lr=0.1, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01)
    g = np.array([0.5, -0.25])
    opt.step({"p": g.copy()})
    # t=1: mhat = g, vhat = g^2  → update = lr*(g/(|g|+eps) + wd*p)
    expect = p0 - 0.1 * (g / (np.abs(g) + 1e-8) + 0.01 * p0)
    assert np.allclose(params["p"], expect, atol=1e-9)


def test_clip_grad_norm_global_scaling():
    grads = {"a": np.array([3.0]), "b": np.array([4.0])}
    pre = tr.clip_grad_norm(grads, max_norm=0.5)
    assert abs(pre - 5.0) < 1e-12
    total = math.sqrt(sum(float((g * g).sum()) for g in grads.values()))
    assert abs(total - 0.5) < 1e-12
    # direction preserved
    assert abs(grads["a"][0] / grads["b"][0] - 3.0 / 4.0) < 1e-12
    # under the cap: untouched
    g2 = {"a": np.array([0.1])}
    tr.clip_grad_norm(g2, 0.5)
    assert g2["a"][0] == 0.1


def test_fit_loss_decreases_and_early_stops():
    seq = _demo_seq()
    x, y = mlm.mlm_training_batch(seq)
    head = tr.MLMHead()
    curve = tr.fit(head, (x, y), (x, y), lr=5e-3, max_epochs=10)
    losses = [c["train_loss"] for c in curve]
    assert losses[-1] < losses[0]
    # early stopping: a head that cannot improve the valid loss stops
    # after exactly `patience` bad epochs
    frozen = tr.ClassificationHead(2, problem_type="single_label_classification")
    xv = np.zeros((4, rf.HIDDEN))
    yv = np.array([0, 1, 0, 1])
    # lr=0 → valid loss constant → first epoch sets best, then patience
    curve2 = tr.fit(frozen, (xv, yv), (xv, yv), lr=0.0, max_epochs=50, patience=3)
    assert curve2[-1]["stopped"] is True
    assert len(curve2) == 1 + 3


def test_m12_no_pretrain_reinit_changes_weights_not_shapes():
    a = tr.MLMHead(no_pretrain=False)
    b = tr.MLMHead(no_pretrain=True)
    assert set(a.params) == set(b.params)
    assert all(a.params[k].shape == b.params[k].shape for k in a.params)
    assert not np.allclose(a.params["w"], b.params["w"])
    from tabsketchfm_spark.ml import simple_model as sm

    wa, wb = sm.weights(), sm.weights(no_pretrain=True)
    assert wa["w1"].shape == wb["w1"].shape
    assert not np.allclose(wa["w1"], wb["w1"])


def test_epoch_metrics_known_values():
    """M5 epochMetrics (tabsketchfm.py:62-74): summed losses divided by
    the LABEL count (not the batch count), plus argmax accuracy."""
    losses = [2.0, 4.0]
    preds = np.array([1, 0, 1, 1])
    labels = np.array([1, 0, 0, 1])
    tot, acc = tr.epoch_metrics(losses, preds, labels)
    assert tot == 6.0 / 4
    assert acc == 0.75


def test_weighted_f1_matches_known_values():
    y = np.array([0, 0, 1, 1, 1])
    p = np.array([0, 1, 1, 1, 0])
    # class 0: prec 1/2 rec 1/2 f1 1/2 (w 2/5); class 1: prec 2/3 rec
    # 2/3 f1 2/3 (w 3/5) → 0.6
    assert abs(tr.weighted_f1(y, p) - 0.6) < 1e-12
    assert tr.weighted_f1(np.array([1, 1]), np.array([1, 1])) == 1.0
    # fully-inverted predictions: every class has tp=0 with fp,fn>0 →
    # per-class f1 = 2tp/(2tp+fp+fn) = 0, NOT the zero_division fill
    # (sklearn f1_score(average='weighted', zero_division=1) == 0.0 here)
    assert tr.weighted_f1(np.array([0, 1]), np.array([1, 0])) == 0.0


# --- M5 complete: full-encoder backprop -------------------------------------


def _masked_demo_batch():
    seq = _demo_seq()
    return [mlm.apply_mask(seq)]


def test_full_backprop_epoch0_matches_serving_forward():
    """MLMPretrainModel at init IS the serving forward: its loss on a
    masked batch equals rf.masked_lm_forward's bit-for-bit (weights
    reproduce the seeded scheme exactly)."""
    from tabsketchfm_spark.ml.backprop import MLMPretrainModel

    batch = _masked_demo_batch()
    masked, labels = batch[0]
    serve = rf.masked_lm_forward(masked, labels)["loss"]
    got, _ = MLMPretrainModel().loss(batch)
    assert got == serve


def test_full_backprop_gradients_match_finite_differences():
    """Central finite differences on coordinates spanning EVERY
    parameter family: attention q/k/v/o (two layers), both FFN mats,
    the value/minhash linears, all four embedding tables (incl. the
    tied word table — gradient from both tie points), and the head."""
    from tabsketchfm_spark.ml.backprop import MLMPretrainModel

    batch = _masked_demo_batch()
    masked, labels = batch[0]
    m = MLMPretrainModel()
    _, grads = m.loss_and_grads(batch)
    wid_used = masked[1].get("wid", rf.word_id(masked[1]["token"]))
    checks = [
        ("l0.q0.w", (1, 2)), ("l0.k1.w", (0, 5)), ("l0.v2.b", (3,)),
        ("l0.o.w", (4, 7)), ("l1.ffn_in.w", (10, 3)), ("l3.ffn_out.w", (2, 50)),
        ("lin.value.w", (6, 1)), ("lin.minhash.b", (9,)),
        ("emb.type", (1, 4)), ("emb.colpos", (2, 3)), ("emb.tokpos", (1, 0)),
        ("emb.word", (wid_used, 3)),
        ("mlm.w", (0, 0)), ("mlm.gamma", (5,)),
        ("mlm.dec_b", (int(labels[labels >= 0][0]),)),
    ]
    eps = 1e-6
    for name, idx in checks:
        p = m.params[name]
        orig = p[idx]
        p[idx] = orig + eps
        lp, _ = m.loss(batch)
        p[idx] = orig - eps
        lm_, _ = m.loss(batch)
        p[idx] = orig
        fd = (lp - lm_) / (2 * eps)
        an = grads[name][idx]
        assert abs(fd - an) < 1e-5 * max(1.0, abs(fd)), (name, idx, fd, an)


def test_full_backprop_beats_frozen_encoder_curve():
    """Same seed, same mask rolls, same optimizer discipline: the
    full-backprop trainer starts at the frozen path's epoch-0 loss
    (identical init) and ends strictly below it — the extra capacity
    is real, not a different problem."""
    from tabsketchfm_spark.ml.backprop import MLMPretrainModel

    seq = _demo_seq()
    batch = [mlm.apply_mask(seq)]
    x, y = mlm.mlm_training_batch(seq)

    frozen = tr.MLMHead()
    frozen_curve = tr.fit(frozen, (x, y), (x, y), lr=5e-3, max_epochs=8, patience=8)
    full = MLMPretrainModel()
    full_curve = tr.fit(full, (batch, None), (batch, None), lr=5e-3, max_epochs=8, patience=8)
    assert full_curve[0]["train_loss"] == frozen_curve[0]["train_loss"]
    assert full_curve[-1]["valid_loss"] < frozen_curve[-1]["valid_loss"]


def test_full_model_train_checkpoint_serve_loop(tmp_path):
    """The COMPLETE S13↔M5 loop: train the full model (encoder +
    embeddings + head), write every tensor to an npz checkpoint,
    install it, and the untouched serving forward reproduces the
    trained model's loss bit-for-bit — strictly below the seeded
    init's loss."""
    from tabsketchfm_spark.ml import checkpoint as ck
    from tabsketchfm_spark.ml.backprop import MLMPretrainModel

    seq = _demo_seq()
    masked, labels = mlm.apply_mask(seq)
    batch = [(masked, labels)]
    before = rf.masked_lm_forward(masked, labels)["loss"]

    m = MLMPretrainModel()
    tr.fit(m, (batch, None), (batch, None), lr=5e-3, max_epochs=6, patience=6)
    trained, _ = m.loss(batch)
    assert trained < before

    path = str(tmp_path / "full_pretrained")
    ck.save_checkpoint(path, m.state_dict())
    ck.install_checkpoint(ck.load_checkpoint(path))
    try:
        served = rf.masked_lm_forward(masked, labels)["loss"]
    finally:
        ck.clear_checkpoint()
    assert served == trained
    assert rf.masked_lm_forward(masked, labels)["loss"] == before  # override cleared


def test_state_dict_names_match_materialize_weights():
    """The backprop trainer's checkpoint-key map cannot drift from
    ml/checkpoint.materialize_weights: every state_dict key exists
    there with the SAME seeded tensor at init (position tables compare
    on the trainer's row count — materialize uses MAX_POS)."""
    from tabsketchfm_spark.ml import checkpoint as ck
    from tabsketchfm_spark.ml.backprop import MLMPretrainModel

    m = MLMPretrainModel()
    sd = m.state_dict()
    w = ck.materialize_weights()
    missing = [k for k in sd if k not in w]
    assert not missing, missing
    for k, v in sd.items():
        ref = w[k][: v.shape[0]] if w[k].ndim == v.ndim and w[k].shape != v.shape else w[k]
        assert np.array_equal(v, ref), k


def test_init_is_seeded_even_under_installed_checkpoint(tmp_path):
    """Constructing MLMPretrainModel while a (trained) checkpoint is
    installed must NOT mix override weights into the init — epoch-0
    loss stays the seeded serving loss; warm-start goes through
    load_state_dict explicitly."""
    from tabsketchfm_spark.ml import checkpoint as ck
    from tabsketchfm_spark.ml.backprop import MLMPretrainModel

    batch = _masked_demo_batch()
    masked, labels = batch[0]
    seeded_loss = rf.masked_lm_forward(masked, labels)["loss"]

    trained = MLMPretrainModel()
    tr.fit(trained, (batch, None), (batch, None), lr=5e-3, max_epochs=3, patience=3)
    ck.install_checkpoint(trained.state_dict())
    try:
        fresh = MLMPretrainModel()
    finally:
        ck.clear_checkpoint()
    got, _ = fresh.loss(batch)
    assert got == seeded_loss
    # explicit warm-start reproduces the trained model
    fresh.load_state_dict(trained.state_dict())
    assert fresh.loss(batch)[0] == trained.loss(batch)[0]


def test_ensure_checkpoint_state_rekeys_on_content_and_manual_ops(tmp_path):
    """Memoization is by CONTENT hash, not path: retraining into the
    same path re-installs; a direct install/clear resets the memo so
    ensure_checkpoint_state never early-returns against stale state."""
    from tabsketchfm_spark.ml import checkpoint as ck
    from tabsketchfm_spark.ml.backprop import MLMPretrainModel

    batch = _masked_demo_batch()
    masked, labels = batch[0]
    path = str(tmp_path / "ck")

    a = MLMPretrainModel()
    ck.save_checkpoint(path, a.state_dict())
    ck.ensure_checkpoint_state(path)
    loss_a = rf.masked_lm_forward(masked, labels)["loss"]

    tr.fit(a, (batch, None), (batch, None), lr=5e-3, max_epochs=3, patience=3)
    ck.save_checkpoint(path, a.state_dict())  # SAME path, new content
    ck.ensure_checkpoint_state(path)
    loss_b = rf.masked_lm_forward(masked, labels)["loss"]
    assert loss_b != loss_a  # re-installed despite identical path

    # manual clear desync: ensure() must re-install afterwards
    ck.clear_checkpoint()
    ck.ensure_checkpoint_state(path)
    assert rf.masked_lm_forward(masked, labels)["loss"] == loss_b
    ck.ensure_checkpoint_state(None)
    assert rf.masked_lm_forward(masked, labels)["loss"] == loss_a  # seeded again


def test_checkpoint_serves_lake_wide_extraction(spark, sf001, tmp_path):
    """The serve-a-trained-model-at-lake-scale path: a trained full
    checkpoint passed to extract_embeddings reaches the EXECUTORS
    (ensure_checkpoint_state — install_checkpoint alone is
    driver-local), changes the emitted vectors, and reproduces the
    driver-side forward under the same install. A following extraction
    WITHOUT a checkpoint must see seeded weights again (reused-worker
    hygiene)."""
    from tabsketchfm_spark.ml import checkpoint as ck
    from tabsketchfm_spark.ml import embed as ml_embed
    from tabsketchfm_spark.ml.backprop import MLMPretrainModel
    from tabsketchfm_spark.operators import profile as prof
    from tabsketchfm_spark.sources.tables import load_table

    seq = _demo_seq()
    m = MLMPretrainModel()
    tr.fit(m, ([mlm.apply_mask(seq)], None), ([mlm.apply_mask(seq)], None),
           lr=5e-3, max_epochs=3, patience=3)
    path = str(tmp_path / "served")
    ck.save_checkpoint(path, m.state_dict())

    profile = prof.profile_table(
        load_table(spark, sf001, "nation"), "nation", round_digits=4
    )
    seeded = {
        (r["column_name"], r["kind"]): tuple(r["vector"])
        for r in ml_embed.extract_embeddings(profile).collect()
    }
    served = {
        (r["column_name"], r["kind"]): tuple(r["vector"])
        for r in ml_embed.extract_embeddings(
            profile, checkpoint_path=path
        ).collect()
    }
    assert set(served) == set(seeded)
    assert served != seeded  # trained weights actually reached executors

    # driver twin under the same install
    rows = sorted(
        (r.asDict() for r in profile.collect()), key=lambda d: d["col_idx"]
    )
    for d in rows:
        d["minhash"] = None
    ck.install_checkpoint(ck.load_checkpoint(path))
    try:
        s = rf.build_token_sequence(rows)
        _, _, cls = rf.find_table_col_pool(s, rf.hidden_layer_1(s))
    finally:
        ck.clear_checkpoint()
    assert np.allclose(
        np.array(served[(None, "cls")]), cls.astype(np.float32), atol=0
    )

    # hygiene: a checkpoint-less extraction in the SAME session goes
    # back to seeded weights despite python-worker reuse
    again = {
        (r["column_name"], r["kind"]): tuple(r["vector"])
        for r in ml_embed.extract_embeddings(profile).collect()
    }
    assert again == seeded


def test_sparkfiles_handle_serves_lake_wide_extraction(spark, sf001, tmp_path):
    """The no-shared-FS cluster path: ship_checkpoint distributes the
    npz+manifest via SparkContext.addFile and returns a `sparkfiles:`
    handle; extraction through the handle is bit-identical to
    extraction through the direct path, and a following handle-less
    extraction sees seeded weights again (worker hygiene)."""
    from tabsketchfm_spark.ml import checkpoint as ck
    from tabsketchfm_spark.ml import embed as ml_embed
    from tabsketchfm_spark.ml.backprop import MLMPretrainModel
    from tabsketchfm_spark.operators import profile as prof
    from tabsketchfm_spark.sources.tables import load_table

    seq = _demo_seq()
    m = MLMPretrainModel()
    tr.fit(m, ([mlm.apply_mask(seq)], None), ([mlm.apply_mask(seq)], None),
           lr=5e-3, max_epochs=2, patience=3)
    path = str(tmp_path / "shipped")
    ck.save_checkpoint(path, m.state_dict())
    handle = ck.ship_checkpoint(spark, path)
    assert handle == ck.SPARKFILES_PREFIX + "shipped"

    profile = prof.profile_table(
        load_table(spark, sf001, "nation"), "nation", round_digits=4
    )
    def extract(cp):
        return {
            (r["column_name"], r["kind"]): tuple(r["vector"])
            for r in ml_embed.extract_embeddings(
                profile, checkpoint_path=cp
            ).collect()
        }

    direct = extract(path)
    shipped = extract(handle)
    assert shipped == direct
    assert extract(None) != direct  # hygiene: back to seeded weights


# --- K2: value encoder via the numpy stack ----------------------------------


def test_encode_text_deterministic_and_content_sensitive():
    """The K2 sentence-encoder stand-in runs the real numpy stack:
    deterministic across calls, sensitive to token content AND order
    (position stream is live), zero vector on empty input."""
    a = rf.encode_text(["acme", "global", "retail"])
    assert a.shape == (rf.HIDDEN,)
    assert np.array_equal(a, rf.encode_text(["acme", "global", "retail"]))
    assert not np.array_equal(a, rf.encode_text(["acme", "global", "wholesale"]))
    assert not np.array_equal(a, rf.encode_text(["retail", "global", "acme"]))
    assert np.array_equal(rf.encode_text([]), np.zeros(rf.HIDDEN))


def test_value_embeddings_run_encoder_and_znorm(spark, sf001):
    """value_embeddings == encode_text(tokenized doc) z-scored per the
    reference normalize() (embedding_search.py:20-23): mean 0, std 1,
    and the Spark output reproduces the local numpy computation."""
    from tabsketchfm_spark.ml import embed as ml_embed
    from tabsketchfm_spark.operators import structural as struc
    from tabsketchfm_spark.sources.tables import load_table

    cust = load_table(spark, sf001, "customer")
    vdocs = struc.value_doc(cust, "customer", ["c_mktsegment"])
    doc = vdocs.collect()[0]["value_doc"]
    got = {
        r["column_name"]: np.array(r["vector"])
        for r in ml_embed.value_embeddings(vdocs).collect()
    }
    v = got["c_mktsegment"]
    assert abs(v.mean()) < 1e-5 and abs(v.std() - 1.0) < 1e-5
    expect = rf.encode_text(ml_embed.tokenize_value_doc(doc))
    expect = (expect - expect.mean()) / expect.std()
    assert np.allclose(v, expect.astype(np.float32), atol=1e-6)


# --- M4: SimpleModel --------------------------------------------------------


def test_simple_model_spark_matches_numpy(spark, sf01):
    """The closed-form SQL forward == the verbatim torch math in numpy,
    fed by the same hash vector."""
    from tabsketchfm_spark.ml import simple_model as sm
    from tabsketchfm_spark.sources.tables import load_table

    tables = {t: load_table(spark, sf01, t) for t in sm.SIMPLE_MODEL_COLUMNS}
    out = {
        r["table_name"]: [r[f"out_{k}"] for k in range(sm.HIDDEN)]
        for r in sm.simple_model_scores(spark, tables, sm.SIMPLE_MODEL_COLUMNS).collect()
    }
    assert set(out) == set(sm.SIMPLE_MODEL_COLUMNS)
    # rebuild x in pure python/numpy from the same tokens
    w = sm.weights()
    for t, cols in sm.SIMPLE_MODEL_COLUMNS.items():
        pdf = tables[t].select(*cols).toPandas()
        counts = np.zeros(sm.N_FEATURES)
        for c in cols:
            for v in pdf[c].dropna():
                s = str(v)
                if s == "":
                    continue
                for tok in s.split():
                    h = mlm.py_h32(tok)
                    sign = -1 if (h >> 31) & 1 else 1
                    counts[h % sm.N_FEATURES] += sign
        l2 = math.sqrt(float((counts**2).sum()))
        x = np.floor(counts / l2 * 1e10 + 0.5) / 1e10  # the SQL's tie-safe quantizer
        expect = sm.forward_numpy(x, w)
        got = np.array(out[t])
        assert np.allclose(got, expect, atol=1e-9), t


# --- Spark-side M3/M5/M6 ----------------------------------------------------


def test_masked_lm_eval_rows(spark, sf01):
    from tabsketchfm_spark.plans import registry

    df = registry.queries()["m3_mlm_eval_tables"](spark, sf01)
    rows = {r["table_name"]: r for r in df.collect()}
    assert set(rows) == {"customer", "supplier", "nation"}
    for r in rows.values():
        assert r["n_masked"] > 0
        assert r["mlm_loss"] > 0
        assert 0 <= r["accuracy"] <= 1


def test_pretrain_curve_decreases(spark, sf01):
    from tabsketchfm_spark.plans import registry

    rows = registry.queries()["m5_pretrain_curve"](spark, sf01).collect()
    assert len(rows) >= 2
    assert rows[-1]["train_loss"] < rows[0]["train_loss"]
    assert all(r["grad_norm"] > 0 for r in rows)


def test_finetune_eval_learns_similarity(spark, sf01):
    from tabsketchfm_spark.plans import registry

    rows = {r["split"]: r for r in registry.queries()["m6_finetune_eval"](spark, sf01).collect()}
    assert set(rows) == {"train", "valid"}
    # the task is learnable from pooled states: train accuracy beats chance
    assert rows["train"]["accuracy"] >= 0.75
    assert 0.0 <= rows["valid"]["f1_weighted"] <= 1.0


def test_train_checkpoint_serve_loop(tmp_path):
    """The full S13↔M5↔M3 loop: fit the MLM head, write its tensors
    into an npz checkpoint, install it, and the SERVING forward
    (masked_lm_forward, which reads weights through the override) must
    reproduce the trained head's loss — strictly below the seeded
    init's loss."""
    from tabsketchfm_spark.ml import checkpoint as ck

    seq = _demo_seq()
    masked, labels = mlm.apply_mask(seq)
    before = rf.masked_lm_forward(masked, labels)["loss"]

    x, y = mlm.mlm_training_batch(seq)
    head = tr.MLMHead()
    tr.fit(head, (x, y), (x, y), lr=5e-3, max_epochs=10)
    trained_loss, _ = head.loss(x, y)

    w = ck.materialize_weights(n_layers=rf.N_LAYERS)
    w.update(tr.mlm_head_state_dict(head))
    path = str(tmp_path / "finetuned")
    ck.save_checkpoint(path, w)
    try:
        ck.install_checkpoint(ck.load_checkpoint(path))
        served = rf.masked_lm_forward(masked, labels)["loss"]
    finally:
        ck.clear_checkpoint()
    assert abs(served - trained_loss) < 1e-9  # serve == trained head
    assert served < before  # training moved the served model
    # and clearing the checkpoint restores the seeded forward
    assert abs(rf.masked_lm_forward(masked, labels)["loss"] - before) < 1e-12


# --- width seam (round-8): configure_width + per-task declaration ----------


def test_configure_width_resizes_whole_stack_and_resets():
    """The width seam must reach every consumer at CALL time — layers
    included (the n_layers defaults were once bound at import and
    silently ignored the config; round-8 review finding). Also pins
    the one-reset-constant rule: bare configure_width() restores
    DEFAULT_WIDTH exactly."""
    try:
        rf.configure_width(64, 8, 2)
        assert rf.width_config() == (64, 8, 2)
        assert rf.HEAD_DIM == 8 and rf.INTERMEDIATE == 256
        seq = rf.build_token_sequence(
            [
                {
                    "column_name": "c_name",
                    "col_idx": 0,
                    "col_type": "string",
                    **{c: 1.0 for c in rf._STAT_COLS},
                }
            ]
        )
        # n_layers=None must resolve to the CONFIGURED depth: a 2-layer
        # run differs from a 1-layer run of the same states
        states = rf.m1_forward(seq)
        full = rf.encoder_forward(states)
        assert full.shape == (len(seq), 64)
        assert not np.array_equal(full, rf.encoder_forward(states, n_layers=1))
        assert np.array_equal(full, rf.encoder_forward(states, n_layers=2))
        v = rf.encode_text(["alpha", "beta"])
        assert v.shape == (64,)
        assert np.array_equal(
            v, rf.encode_text(["alpha", "beta"], n_layers=2)
        )
    finally:
        rf.configure_width()
    assert rf.width_config() == rf.DEFAULT_WIDTH


def test_width_seam_reaches_executors_and_resets(spark, sf001):
    """masked_lm_eval at a non-default width must produce a DIFFERENT
    loss than the default run (proving hidden AND layer count reach
    the executor forward), and a following default-width run must
    match the original — the reused-worker reset contract."""
    from tabsketchfm_spark.operators import profile as prof
    from tabsketchfm_spark.sources.tables import load_table

    cust = load_table(spark, sf001, "customer")
    p = prof.profile_table(cust, "customer", round_digits=4)
    base = mlm.masked_lm_eval(p).collect()[0]["mlm_loss"]
    narrow = mlm.masked_lm_eval(p, width=(32, 4, 2)).collect()[0]["mlm_loss"]
    assert narrow != base  # layer count reached the executor forward
    wide = mlm.masked_lm_eval(p, width=(64, 8, 2)).collect()[0]["mlm_loss"]
    assert wide not in (base, narrow)  # hidden size reached it too
    again = mlm.masked_lm_eval(p).collect()[0]["mlm_loss"]
    assert again == base  # reused workers reset to DEFAULT_WIDTH


def test_checkpoint_install_refuses_width_mismatch(tmp_path):
    """A checkpoint saved at one width must fail LOUD when installed
    under another (round-8 review finding: missing layer keys would
    silently fall back to seeded weights — a half-trained forward)."""
    from tabsketchfm_spark.ml import checkpoint as ck
    from tabsketchfm_spark.ml.backprop import MLMPretrainModel

    model = MLMPretrainModel(max_col=64, max_tokpos=64)
    path = str(tmp_path / "w32")
    ck.save_checkpoint(path, model.state_dict())
    try:
        rf.configure_width(64, 8, 2)
        with pytest.raises(IOError, match="hidden"):
            ck.ensure_checkpoint_state(path)
        # full-encoder depth mismatch at SAME hidden also refuses
        rf.configure_width(32, 4, 2)
        with pytest.raises(IOError, match="layers"):
            ck.ensure_checkpoint_state(path)
    finally:
        ck.ensure_checkpoint_state(None)
        rf.configure_width()
    # back at the saved width it installs cleanly
    ck.ensure_checkpoint_state(path)
    ck.ensure_checkpoint_state(None)
