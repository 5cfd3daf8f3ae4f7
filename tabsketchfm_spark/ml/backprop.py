"""M5 (complete): full-encoder MLM pre-training — backprop through the
WHOLE numpy stack, closing the frozen-encoder seam.

The reference's actual MLM pretraining updates every parameter —
embeddings, encoder, head — via torch autograd
(models/tabsketchfm.py:58-65, pretrain.py:135-158). ml/training.py
mirrors the reference's *freeze* path (heads only,
tabsketchfm_finetune.py:26-28); this module implements the hand-derived
backward for the rest of the stack so the pretrain loop trains
end-to-end:

- the word-embedding table (also the TIED MLM decoder weight — its
  gradient accumulates from BOTH tie points, the embedding lookup and
  the decoder matmul, exactly like tied-weight BERT),
- the type / column-position / token-position embedding tables,
- the value and minhash Linear projections (all six M1 streams),
- every encoder block: per-head Q/K/V, output projection, both
  parameter-free LayerNorms, the GELU FFN (M2),
- the MLM head (transform dense + LayerNorm affine + decoder bias, M3).

Everything is float64 numpy; gradients are verified against central
finite differences in tests/test_model_stack.py (the same oracle the
head-only path uses). Training state lives on the driver — the same
driver/cluster split as ml/training.py (SURVEY §2 M11): Spark
assembles profiles, the optimizer loop runs here.
"""

from __future__ import annotations

import math

import numpy as np

from tabsketchfm_spark.ml import reference_forward as rf

_SQ2 = math.sqrt(2.0)
_SQ2PI = math.sqrt(2.0 * math.pi)


def _ln_forward(x: np.ndarray):
    """Parameter-free LayerNorm rows (rf._layer_norm_rows) with caches."""
    mu = x.mean(axis=1, keepdims=True)
    var = x.var(axis=1, keepdims=True)
    inv = 1.0 / np.sqrt(var + rf.LAYER_NORM_EPS)
    xhat = (x - mu) * inv
    return xhat, inv


def _ln_backward(dy: np.ndarray, xhat: np.ndarray, inv: np.ndarray) -> np.ndarray:
    return inv * (
        dy
        - dy.mean(axis=1, keepdims=True)
        - xhat * (dy * xhat).mean(axis=1, keepdims=True)
    )


def _gelu_grad(a: np.ndarray) -> np.ndarray:
    """d/da erf-GELU = Phi(a) + a*phi(a)."""
    phi = np.exp(-0.5 * a * a) / _SQ2PI
    Phi = 0.5 * (1.0 + rf._erf(a / _SQ2))
    return Phi + a * phi


def sequence_position_dims(batches) -> tuple[int, int]:
    """(max_col, max_tokpos) table sizes covering every sequence in
    ``batches`` (list of (seq, labels) pairs) — pass to
    MLMPretrainModel so wide tables (many columns / long column names)
    fit the trainable position tables."""
    mc = mt = 0
    for seq, _ in batches:
        for t in seq:
            mc = max(mc, t["col_encoding"])
            mt = max(mt, t["token_position"])
    return max(mc + 1, 2), max(mt + 1, 2)


class MLMPretrainModel:
    """The full trainable stack as a flat named-param dict (the shape
    AdamW/clip/fit already consume). Initialization reproduces the
    serving forward's seeded weights bit-for-bit, so epoch-0 loss
    equals rf.masked_lm_forward's loss on the same masked batch."""

    def __init__(
        self,
        n_layers: int = rf.N_LAYERS,
        max_col: int = 64,
        max_tokpos: int = 64,
    ):
        self.n_layers = n_layers
        H, D, I = rf.HIDDEN, rf.HEAD_DIM, rf.INTERMEDIATE
        # init is ALWAYS the seeded state: an installed checkpoint
        # must not bleed into a fresh model (the word table/_emb_row/
        # _mat lookups consult rf._OVERRIDE, but the lin draws below do
        # not — mixing would silently break the epoch-0 == serving
        # invariant). Warm-start explicitly via load_state_dict().
        snap = dict(rf._OVERRIDE)
        rf._OVERRIDE.clear()
        try:
            self._init_seeded(n_layers, max_col, max_tokpos, H, D, I)
        finally:
            rf._OVERRIDE.update(snap)

    def _init_seeded(self, n_layers, max_col, max_tokpos, H, D, I):
        p: dict[str, np.ndarray] = {}
        p["emb.word"] = rf.word_table().copy()
        p["emb.type"] = np.stack(
            [rf._emb_row("type", i) for i in range(max(rf.TYPE_IDS.values()) + 1)]
        )
        p["emb.colpos"] = np.stack(
            [rf._emb_row("colpos", i) for i in range(max_col)]
        )
        p["emb.tokpos"] = np.stack(
            [rf._emb_row("tokpos", i) for i in range(max_tokpos)]
        )
        for stream in ("value", "minhash"):
            rng = rf._rng(rf._seed("lin", stream, H))
            p[f"lin.{stream}.w"] = rng.standard_normal((H, H)) / math.sqrt(H)
            p[f"lin.{stream}.b"] = rng.standard_normal(H) / math.sqrt(H)
        for l in range(n_layers):
            for h in range(rf.N_HEADS):
                for s in ("q", "k", "v"):
                    p[f"l{l}.{s}{h}.w"] = rf._mat(f"l{l}.{s}{h}", D, H).copy()
                    p[f"l{l}.{s}{h}.b"] = rf._bias(f"l{l}.{s}{h}", D).copy()
            p[f"l{l}.o.w"] = rf._mat(f"l{l}.o", H, H).copy()
            p[f"l{l}.o.b"] = rf._bias(f"l{l}.o", H).copy()
            p[f"l{l}.ffn_in.w"] = rf._mat(f"l{l}.ffn_in", I, H).copy()
            p[f"l{l}.ffn_in.b"] = rf._bias(f"l{l}.ffn_in", I).copy()
            p[f"l{l}.ffn_out.w"] = rf._mat(f"l{l}.ffn_out", H, I).copy()
            p[f"l{l}.ffn_out.b"] = rf._bias(f"l{l}.ffn_out", H).copy()
        p["mlm.w"] = rf._mat("mlm.transform", H, H).copy()
        p["mlm.b"] = rf._bias("mlm.transform", H).copy()
        p["mlm.gamma"] = np.ones(H)
        p["mlm.beta"] = np.zeros(H)
        p["mlm.dec_b"] = rf._bias("mlm.decoder", rf.VOCAB).copy()
        self.params = p

    def state_dict(self) -> dict[str, np.ndarray]:
        """Every trained tensor under its CHECKPOINT name (the keys
        rf._OVERRIDE resolves): save via ml/checkpoint, install, and
        the serving forward (rf.masked_lm_forward) reproduces this
        model's loss bit-for-bit — the FULL train → checkpoint → serve
        loop, not just the head's. Position indices beyond the trained
        table sizes fall back to SEEDED rows at serving time
        (rf._emb_row's bounds check) — size the tables with
        sequence_position_dims over everything you intend to serve."""
        return {
            ck_key: self.params[p_key].copy()
            for ck_key, p_key in self._checkpoint_key_pairs()
        }

    def load_state_dict(self, weights: dict[str, np.ndarray]) -> None:
        """Warm-start: copy checkpoint-named tensors into the trainable
        params (the inverse of state_dict; the supported way to resume
        training from an installed/saved checkpoint — __init__ is
        always the seeded state). Missing keys keep their current
        values; shape mismatches raise."""
        for ck_key, p_key in self._checkpoint_key_pairs():
            if ck_key in weights:
                w = np.asarray(weights[ck_key], dtype=np.float64)
                if w.shape != self.params[p_key].shape:
                    raise ValueError(
                        f"{ck_key}: shape {w.shape} != {self.params[p_key].shape}"
                    )
                self.params[p_key] = w.copy()

    def _checkpoint_key_pairs(self):
        """(checkpoint key, param key) for every trainable tensor —
        ONE map serves both state_dict and load_state_dict, and the
        name-parity test pins it against checkpoint.materialize_weights
        so the layouts cannot silently drift."""
        for k in ("emb.word", "emb.type", "emb.colpos", "emb.tokpos",
                  "lin.value.w", "lin.value.b",
                  "lin.minhash.w", "lin.minhash.b"):
            yield k, k
        for l in range(self.n_layers):
            for h in range(rf.N_HEADS):
                for s in ("q", "k", "v"):
                    yield f"mat.l{l}.{s}{h}", f"l{l}.{s}{h}.w"
                    yield f"bias.l{l}.{s}{h}", f"l{l}.{s}{h}.b"
            for s in ("o", "ffn_in", "ffn_out"):
                yield f"mat.l{l}.{s}", f"l{l}.{s}.w"
                yield f"bias.l{l}.{s}", f"l{l}.{s}.b"
        yield "mat.mlm.transform", "mlm.w"
        yield "bias.mlm.transform", "mlm.b"
        yield "mlm.ln.gamma", "mlm.gamma"
        yield "mlm.ln.beta", "mlm.beta"
        yield "bias.mlm.decoder", "mlm.dec_b"

    # -- per-sequence forward with caches ---------------------------------

    def _seq_inputs(self, seq: list[dict]):
        wids = np.array(
            [t.get("wid", rf.word_id(t["token"])) for t in seq], dtype=np.int64
        )
        tids = np.array([t["type_id"] for t in seq], dtype=np.int64)
        ces = np.array([t["col_encoding"] for t in seq], dtype=np.int64)
        tps = np.array([t["token_position"] for t in seq], dtype=np.int64)
        n_ce = self.params["emb.colpos"].shape[0]
        n_tp = self.params["emb.tokpos"].shape[0]
        if ces.max(initial=0) >= n_ce or tps.max(initial=0) >= n_tp:
            # the serving forward generates such rows on demand; the
            # trainable tables are fixed at init — size them from the
            # batch (sequence_position_dims) instead of crashing deep
            # in an index expression
            raise ValueError(
                f"sequence position exceeds trainable table size "
                f"(col_encoding max {int(ces.max())} vs {n_ce}, "
                f"token_position max {int(tps.max())} vs {n_tp}); "
                "construct MLMPretrainModel(max_col=..., max_tokpos=...) "
                "from sequence_position_dims(batches)"
            )
        vals = np.stack([np.asarray(t["value_vec"], dtype=np.float64) for t in seq])
        mhs = np.stack([np.asarray(t["minhash_vec"], dtype=np.float64) for t in seq])
        return wids, tids, ces, tps, vals, mhs

    def _forward_seq(self, seq: list[dict]):
        p = self.params
        wids, tids, ces, tps, vals, mhs = self._seq_inputs(seq)
        e = (
            p["emb.word"][wids]
            + p["emb.type"][tids]
            + p["emb.colpos"][ces]
            + p["emb.tokpos"][tps]
            + vals @ p["lin.value.w"].T
            + p["lin.value.b"]
            + mhs @ p["lin.minhash.w"].T
            + p["lin.minhash.b"]
        )
        x, inv0 = _ln_forward(e)
        cache = {
            "ids": (wids, tids, ces, tps),
            "vals": vals,
            "mhs": mhs,
            "x0hat": x,
            "inv0": inv0,
            "layers": [],
        }
        D = rf.HEAD_DIM
        for l in range(self.n_layers):
            lc: dict = {"x_in": x}
            ctx_parts = []
            heads = []
            for h in range(rf.N_HEADS):
                q = x @ p[f"l{l}.q{h}.w"].T + p[f"l{l}.q{h}.b"]
                k = x @ p[f"l{l}.k{h}.w"].T + p[f"l{l}.k{h}.b"]
                v = x @ p[f"l{l}.v{h}.w"].T + p[f"l{l}.v{h}.b"]
                s = (q @ k.T) / math.sqrt(D)
                s -= s.max(axis=1, keepdims=True)
                ex = np.exp(s)
                probs = ex / ex.sum(axis=1, keepdims=True)
                ctx_parts.append(probs @ v)
                heads.append((q, k, v, probs))
            lc["heads"] = heads
            ctx = np.concatenate(ctx_parts, axis=1)
            lc["ctx"] = ctx
            attn_out = ctx @ p[f"l{l}.o.w"].T + p[f"l{l}.o.b"]
            x1hat, inv1 = _ln_forward(x + attn_out)
            lc["x1hat"], lc["inv1"] = x1hat, inv1
            aff = x1hat @ p[f"l{l}.ffn_in.w"].T + p[f"l{l}.ffn_in.b"]
            gel = rf._gelu(aff)
            lc["aff"], lc["gel"] = aff, gel
            ffn = gel @ p[f"l{l}.ffn_out.w"].T + p[f"l{l}.ffn_out.b"]
            x2hat, inv2 = _ln_forward(x1hat + ffn)
            lc["x2hat"], lc["inv2"] = x2hat, inv2
            cache["layers"].append(lc)
            x = x2hat
        cache["x_final"] = x
        return cache

    def _head_forward(self, xm: np.ndarray):
        p = self.params
        a = xm @ p["mlm.w"].T + p["mlm.b"]
        g = rf._gelu(a)
        ghat, inv = _ln_forward(g)
        y = p["mlm.gamma"] * ghat + p["mlm.beta"]
        logits = y @ p["emb.word"].T + p["mlm.dec_b"]
        return a, g, ghat, inv, y, logits

    # -- public API (fit-compatible) ---------------------------------------

    def loss(self, batch, _labels=None):
        """batch: list of (masked_seq, labels) pairs (mlm.apply_mask
        output). Mean CE over every masked position across the batch.
        Returns (loss, argmax predictions) like MLMHead.loss."""
        tot, n = 0.0, 0
        preds = []
        for seq, labels in batch:
            mask = labels >= 0
            if not mask.any():
                continue
            cache = self._forward_seq(seq)
            *_, logits = self._head_forward(cache["x_final"][mask])
            lb = labels[mask]
            mx = logits.max(axis=1, keepdims=True)
            e = np.exp(logits - mx)
            tot += float(
                (np.log(e.sum(axis=1)) + mx[:, 0] - logits[np.arange(lb.size), lb]).sum()
            )
            n += lb.size
            preds.append(logits.argmax(axis=1))
        return tot / max(n, 1), (
            np.concatenate(preds) if preds else np.empty(0, dtype=np.int64)
        )

    def loss_and_grads(self, batch, _labels=None):
        p = self.params
        grads = {k: np.zeros_like(v) for k, v in p.items()}
        n_total = sum(int((labels >= 0).sum()) for _, labels in batch)
        n_total = max(n_total, 1)
        tot = 0.0
        D = rf.HEAD_DIM
        for seq, labels in batch:
            mask = labels >= 0
            if not mask.any():
                continue
            cache = self._forward_seq(seq)
            xm = cache["x_final"][mask]
            a, g, ghat, inv, y, logits = self._head_forward(xm)
            lb = labels[mask]
            idx = np.arange(lb.size)
            mx = logits.max(axis=1, keepdims=True)
            e = np.exp(logits - mx)
            sm = e / e.sum(axis=1, keepdims=True)
            tot += float(
                (np.log(e.sum(axis=1)) + mx[:, 0] - logits[idx, lb]).sum()
            )
            dlog = sm
            dlog[idx, lb] -= 1.0
            dlog /= n_total
            # decoder: logits = y @ E.T + dec_b (E tied to emb.word)
            grads["mlm.dec_b"] += dlog.sum(axis=0)
            grads["emb.word"] += dlog.T @ y
            dy = dlog @ p["emb.word"]
            grads["mlm.gamma"] += (dy * ghat).sum(axis=0)
            grads["mlm.beta"] += dy.sum(axis=0)
            dghat = dy * p["mlm.gamma"]
            dg = _ln_backward(dghat, ghat, inv)
            da = dg * _gelu_grad(a)
            grads["mlm.w"] += da.T @ xm
            grads["mlm.b"] += da.sum(axis=0)
            dxm = da @ p["mlm.w"]
            dx = np.zeros_like(cache["x_final"])
            dx[mask] = dxm
            # encoder blocks, reversed
            for l in range(self.n_layers - 1, -1, -1):
                lc = cache["layers"][l]
                dres2 = _ln_backward(dx, lc["x2hat"], lc["inv2"])
                dx1 = dres2.copy()
                dffn = dres2
                grads[f"l{l}.ffn_out.w"] += dffn.T @ lc["gel"]
                grads[f"l{l}.ffn_out.b"] += dffn.sum(axis=0)
                dgel = dffn @ p[f"l{l}.ffn_out.w"]
                daff = dgel * _gelu_grad(lc["aff"])
                grads[f"l{l}.ffn_in.w"] += daff.T @ lc["x1hat"]
                grads[f"l{l}.ffn_in.b"] += daff.sum(axis=0)
                dx1 += daff @ p[f"l{l}.ffn_in.w"]
                dres1 = _ln_backward(dx1, lc["x1hat"], lc["inv1"])
                dx = dres1.copy()  # residual into x_in
                dattn = dres1
                grads[f"l{l}.o.w"] += dattn.T @ lc["ctx"]
                grads[f"l{l}.o.b"] += dattn.sum(axis=0)
                dctx = dattn @ p[f"l{l}.o.w"]
                x_in = lc["x_in"]
                for h in range(rf.N_HEADS):
                    q, k, v, probs = lc["heads"][h]
                    dctxh = dctx[:, h * D : (h + 1) * D]
                    dP = dctxh @ v.T
                    dV = probs.T @ dctxh
                    dS = probs * (dP - (dP * probs).sum(axis=1, keepdims=True))
                    dQ = (dS @ k) / math.sqrt(D)
                    dK = (dS.T @ q) / math.sqrt(D)
                    grads[f"l{l}.q{h}.w"] += dQ.T @ x_in
                    grads[f"l{l}.q{h}.b"] += dQ.sum(axis=0)
                    grads[f"l{l}.k{h}.w"] += dK.T @ x_in
                    grads[f"l{l}.k{h}.b"] += dK.sum(axis=0)
                    grads[f"l{l}.v{h}.w"] += dV.T @ x_in
                    grads[f"l{l}.v{h}.b"] += dV.sum(axis=0)
                    dx += dQ @ p[f"l{l}.q{h}.w"]
                    dx += dK @ p[f"l{l}.k{h}.w"]
                    dx += dV @ p[f"l{l}.v{h}.w"]
            # embedding LayerNorm + six-stream scatter
            de = _ln_backward(dx, cache["x0hat"], cache["inv0"])
            wids, tids, ces, tps = cache["ids"]
            np.add.at(grads["emb.word"], wids, de)
            np.add.at(grads["emb.type"], tids, de)
            np.add.at(grads["emb.colpos"], ces, de)
            np.add.at(grads["emb.tokpos"], tps, de)
            grads["lin.value.w"] += de.T @ cache["vals"]
            grads["lin.value.b"] += de.sum(axis=0)
            grads["lin.minhash.w"] += de.T @ cache["mhs"]
            grads["lin.minhash.b"] += de.sum(axis=0)
        return tot / n_total, grads
