"""M5/M6/M11/M12: training — numpy, driver-side, exactly where the
reference keeps it.

The reference trains with pytorch-lightning ON THE DRIVER while data
prep is offline (SURVEY §2 M11: "stays PyTorch-Lightning; Spark feeds
preprocessed tensors"); this engine keeps the same split — Spark
assembles batches (M8 mask plans + M9 features + frozen M1/M2 encoder
states), the optimizer loop runs here in numpy.

Scope HERE is the reference's ``freeze`` path
(tabsketchfm_finetune.py:26-28): the encoder is frozen and only the
head trains — the MLM head (transform dense+gelu+LayerNorm + tied
decoder bias, M3/M5) or the classification head (pooled → linear,
M6). Gradients for those heads are closed-form below and verified
against finite differences in tests. FULL-encoder backprop (the
reference's actual pretraining, where torch autograd does the work)
lives in ml/backprop.py — hand-derived backward through every layer,
same finite-difference oracle, same AdamW/clip/fit loop below.

Pieces mirrored 1:1:
- AdamW with the reference defaults (models/tabsketchfm.py:96-102:
  lr 2e-5, betas (0.9, 0.999), eps 1e-8).
- grad-clip 0.5 by global norm + early stopping on valid_loss with
  patience 5 + seed-everything (pretrain.py:76-83,135-158; M11).
- problem-type loss routing: regression→MSE, single-label→CE,
  multi-label→BCE-with-logits (tabsketchfm_finetune.py:86-107; M6).
- epochMetrics: mean loss + argmax accuracy (tabsketchfm.py:62-74).
- ``no_pretrain`` random re-init ablation (finetune.py:143-147; M12).
"""

from __future__ import annotations

import math

import numpy as np

from tabsketchfm_spark.ml import reference_forward as rf


# (The reference's seed_everything has no analogue function here: every
# "random" choice — weights, masks, batch order — is already md5-seeded
# and deterministic by construction, so there is no global RNG to seed.)


# --- optimizer -------------------------------------------------------------


class AdamW:
    """AdamW over a dict of named numpy params (decoupled weight decay,
    bias-corrected moments — Loshchilov & Hutter 2017, the torch/HF
    formula the reference's configure_optimizers uses)."""

    def __init__(
        self,
        params: dict[str, np.ndarray],
        lr: float = 2e-5,
        betas: tuple[float, float] = (0.9, 0.999),
        eps: float = 1e-8,
        weight_decay: float = 0.01,
    ):
        self.params = params
        self.lr = lr
        self.b1, self.b2 = betas
        self.eps = eps
        self.wd = weight_decay
        self.t = 0
        self.m = {k: np.zeros_like(v) for k, v in params.items()}
        self.v = {k: np.zeros_like(v) for k, v in params.items()}

    def step(self, grads: dict[str, np.ndarray]) -> None:
        self.t += 1
        for k, p in self.params.items():
            g = grads[k]
            self.m[k] = self.b1 * self.m[k] + (1 - self.b1) * g
            self.v[k] = self.b2 * self.v[k] + (1 - self.b2) * g * g
            mhat = self.m[k] / (1 - self.b1**self.t)
            vhat = self.v[k] / (1 - self.b2**self.t)
            p -= self.lr * (mhat / (np.sqrt(vhat) + self.eps) + self.wd * p)


def clip_grad_norm(grads: dict[str, np.ndarray], max_norm: float = 0.5) -> float:
    """torch.nn.utils.clip_grad_norm_ semantics (the reference trains
    with gradient_clip_val=0.5, pretrain.py): scale ALL grads by
    max_norm/total_norm when the global L2 norm exceeds it. Returns the
    pre-clip norm."""
    total = math.sqrt(sum(float((g * g).sum()) for g in grads.values()))
    if total > max_norm and total > 0:
        scale = max_norm / total
        for g in grads.values():
            g *= scale
    return total


# --- M3/M5: MLM head (frozen encoder) --------------------------------------


class MLMHead:
    """BertOnlyMLMHead as trainable numpy params: transform dense W/b,
    LayerNorm gamma/beta, decoder bias. The decoder WEIGHT is tied to
    the (frozen) word-embedding table — only its bias trains, exactly
    the tied-weight split of the HF state dict."""

    def __init__(self, no_pretrain: bool = False, init_seed: int = 0):
        if no_pretrain:
            # M12 --no-pretrain: random re-init in a DIFFERENT seed
            # namespace — same shapes, fresh weights.
            rng = np.random.RandomState(rf._seed("reinit", init_seed))
            self.params = {
                "w": rng.standard_normal((rf.HIDDEN, rf.HIDDEN)) / math.sqrt(rf.HIDDEN),
                "b": rng.standard_normal(rf.HIDDEN) / math.sqrt(rf.HIDDEN),
                "gamma": np.ones(rf.HIDDEN),
                "beta": np.zeros(rf.HIDDEN),
                "dec_b": rng.standard_normal(rf.VOCAB) / math.sqrt(rf.VOCAB),
            }
        else:
            self.params = {
                "w": rf._mat("mlm.transform", rf.HIDDEN, rf.HIDDEN).copy(),
                "b": rf._bias("mlm.transform", rf.HIDDEN).copy(),
                "gamma": np.ones(rf.HIDDEN),
                "beta": np.zeros(rf.HIDDEN),
                "dec_b": rf._bias("mlm.decoder", rf.VOCAB).copy(),
            }
        self.E = rf.word_table()  # tied, frozen

    def _forward_parts(self, x: np.ndarray):
        p = self.params
        a = x @ p["w"].T + p["b"]
        g = rf._gelu(a)
        mu = g.mean(axis=1, keepdims=True)
        var = g.var(axis=1, keepdims=True)
        inv = 1.0 / np.sqrt(var + rf.LAYER_NORM_EPS)
        ghat = (g - mu) * inv
        y = p["gamma"] * ghat + p["beta"]
        logits = y @ self.E.T + p["dec_b"]
        return a, g, inv, ghat, y, logits

    def loss(self, x: np.ndarray, labels: np.ndarray) -> tuple[float, np.ndarray]:
        """(mean CE loss, argmax predictions) at the given (already
        masked-position-filtered) states/labels."""
        *_, logits = self._forward_parts(x)
        loss, _ = rf.cross_entropy(logits, labels)
        return loss, logits.argmax(axis=1)

    def loss_and_grads(
        self, x: np.ndarray, labels: np.ndarray
    ) -> tuple[float, dict[str, np.ndarray]]:
        p = self.params
        n, H = x.shape
        a, g, inv, ghat, y, logits = self._forward_parts(x)
        # stable softmax + CE
        mx = logits.max(axis=1, keepdims=True)
        e = np.exp(logits - mx)
        sm = e / e.sum(axis=1, keepdims=True)
        idx = np.arange(n)
        loss = float(np.mean(np.log(e.sum(axis=1)) + mx[:, 0] - logits[idx, labels]))
        dlog = sm.copy()
        dlog[idx, labels] -= 1.0
        dlog /= n
        dy = dlog @ self.E
        dgamma = (dy * ghat).sum(axis=0)
        dbeta = dy.sum(axis=0)
        dghat = dy * p["gamma"]
        # LayerNorm backward (per row, identity-affine handled above)
        dg = inv * (
            dghat
            - dghat.mean(axis=1, keepdims=True)
            - ghat * (dghat * ghat).mean(axis=1, keepdims=True)
        )
        # erf-GELU derivative: Phi(a) + a*phi(a)
        phi = np.exp(-0.5 * a * a) / math.sqrt(2.0 * math.pi)
        Phi = 0.5 * (1.0 + rf._erf(a / math.sqrt(2.0)))
        da = dg * (Phi + a * phi)
        grads = {
            "w": da.T @ x,
            "b": da.sum(axis=0),
            "gamma": dgamma,
            "beta": dbeta,
            "dec_b": dlog.sum(axis=0),
        }
        return loss, grads


def mlm_head_state_dict(head: "MLMHead") -> dict[str, np.ndarray]:
    """The trained head's tensors under their CHECKPOINT names — write
    these over materialize_weights() output and the serving forward
    (ml/reference_forward.mlm_transform / mlm_logits) picks them up via
    install_checkpoint: the train → checkpoint → serve loop."""
    p = head.params
    return {
        "mat.mlm.transform": p["w"].copy(),
        "bias.mlm.transform": p["b"].copy(),
        "mlm.ln.gamma": p["gamma"].copy(),
        "mlm.ln.beta": p["beta"].copy(),
        "bias.mlm.decoder": p["dec_b"].copy(),
    }


# --- M6: classification head (frozen encoder, pooled CLS) ------------------


class ClassificationHead:
    """SequenceClassificationForTabularBertModel's trainable tail under
    freeze=True: pooled_output → dropout (identity outside torch's
    train-mode RNG) → Linear(H, num_labels), with the reference's
    problem-type routing (tabsketchfm_finetune.py:86-107)."""

    def __init__(self, num_labels: int, problem_type: str | None = None, seed: int = 0):
        self.num_labels = num_labels
        self.problem_type = problem_type
        rng = np.random.RandomState(rf._seed("clshead", seed, num_labels))
        self.params = {
            "w": rng.standard_normal((num_labels, rf.HIDDEN)) / math.sqrt(rf.HIDDEN),
            "b": np.zeros(num_labels),
        }

    def _route(self, labels: np.ndarray) -> str:
        if self.problem_type is None:
            if self.num_labels == 1:
                self.problem_type = "regression"
            elif labels.dtype.kind in "iu":
                self.problem_type = "single_label_classification"
            else:
                self.problem_type = "multi_label_classification"
        return self.problem_type

    def logits(self, pooled: np.ndarray) -> np.ndarray:
        return pooled @ self.params["w"].T + self.params["b"]

    def loss_and_grads(
        self, pooled: np.ndarray, labels: np.ndarray
    ) -> tuple[float, dict[str, np.ndarray]]:
        z = self.logits(pooled)
        n = z.shape[0]
        route = self._route(labels)
        if route == "regression":
            pred = z[:, 0] if self.num_labels == 1 else z
            lb = labels.astype(np.float64)
            diff = pred - lb
            loss = float(np.mean(diff**2))
            dz = np.zeros_like(z)
            if self.num_labels == 1:
                dz[:, 0] = 2.0 * diff / n
            else:
                dz = 2.0 * diff / diff.size
        elif route == "single_label_classification":
            mx = z.max(axis=1, keepdims=True)
            e = np.exp(z - mx)
            sm = e / e.sum(axis=1, keepdims=True)
            idx = np.arange(n)
            loss = float(
                np.mean(np.log(e.sum(axis=1)) + mx[:, 0] - z[idx, labels])
            )
            dz = sm.copy()
            dz[idx, labels] -= 1.0
            dz /= n
        else:  # multi_label: BCEWithLogits, mean over every element
            lb = labels.astype(np.float64)
            loss = float(
                np.mean(
                    np.maximum(z, 0) - z * lb + np.log1p(np.exp(-np.abs(z)))
                )
            )
            dz = (1.0 / (1.0 + np.exp(-z)) - lb) / z.size
        return loss, {"w": dz.T @ pooled, "b": dz.sum(axis=0)}

    def loss_only(self, pooled: np.ndarray, labels: np.ndarray) -> float:
        return self.loss_and_grads(pooled, labels)[0]


# --- M11: the training loop -----------------------------------------------


def fit(
    head,
    train_batch: tuple[np.ndarray, np.ndarray],
    valid_batch: tuple[np.ndarray, np.ndarray],
    lr: float = 2e-5,
    max_epochs: int = 50,
    patience: int = 5,
    grad_clip: float = 0.5,
    weight_decay: float = 0.01,
) -> list[dict]:
    """Early-stopped AdamW loop — the Trainer(callbacks=[EarlyStopping
    (monitor='valid_loss', patience=5)], gradient_clip_val=0.5) shape
    of pretrain.py/finetune.py. Returns the per-epoch curve:
    (epoch, train_loss, valid_loss, grad_norm, stopped)."""
    opt = AdamW(head.params, lr=lr, weight_decay=weight_decay)
    xt, yt = train_batch
    xv, yv = valid_batch
    best = math.inf
    bad = 0
    curve: list[dict] = []
    for epoch in range(max_epochs):
        loss, grads = head.loss_and_grads(xt, yt)
        gnorm = clip_grad_norm(grads, grad_clip)
        opt.step(grads)
        vloss, *_ = (
            head.loss(xv, yv) if hasattr(head, "loss") else (head.loss_only(xv, yv),)
        )
        stopped = False
        if vloss < best - 1e-12:
            best = vloss
            bad = 0
        else:
            bad += 1
            stopped = bad >= patience
        curve.append(
            {
                "epoch": epoch,
                "train_loss": loss,
                "valid_loss": float(vloss),
                "grad_norm": gnorm,
                "stopped": stopped,
            }
        )
        if stopped:
            break
    return curve


def weighted_f1(labels: np.ndarray, preds: np.ndarray) -> float:
    """sklearn f1_score(average='weighted', zero_division=1) as the
    reference calls it (tabsketchfm_finetune.py:184): per-class
    F1 = 2tp / (2tp + fp + fn) weighted by true-class support. The
    zero_division fill (1.0) applies only when that denominator is 0
    (tp = fp = fn = 0 for the class); a class with tp = 0 but fp > 0
    or fn > 0 scores 0.0 — sklearn's exact behavior."""
    classes = np.unique(labels)
    total = labels.size
    out = 0.0
    for c in classes:
        tp = float(np.sum((preds == c) & (labels == c)))
        fp = float(np.sum((preds == c) & (labels != c)))
        fn = float(np.sum((preds != c) & (labels == c)))
        denom = 2 * tp + fp + fn
        f1 = 2 * tp / denom if denom > 0 else 1.0
        out += (np.sum(labels == c) / total) * f1
    return float(out)


def epoch_metrics(losses: list[float], preds: np.ndarray, labels: np.ndarray):
    """M5 epochMetrics (tabsketchfm.py:62-74): total loss averaged over
    label count + argmax accuracy."""
    tot = sum(losses) / labels.size
    acc = float(np.mean(preds == labels))
    return tot, acc
