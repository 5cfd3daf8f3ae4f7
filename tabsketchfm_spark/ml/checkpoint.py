"""S13: model checkpoint sink/scan — without torch.

The reference trains with pytorch-lightning and persists torch
checkpoints (pretrain.py:135-158, the ModelCheckpoint callback); the
inference side then loads the state dict before extraction
(extract_embeddings.py). Here the model is the numpy reference
forward (ml/reference_forward.py), so the checkpoint is its full
tensor set, materialized from the seeded generators:

- the four embedding tables (word 30522×H, type, column-position,
  token-position — the "hijacked" BERT streams),
- the two Linear streams (value, minhash),
- every encoder-block matrix/bias (q/k/v per head, output, FFN).

Sink: one ``.npz`` (compressed) plus a JSON manifest carrying dims
and an md5 content hash over the tensor bytes — the same
content-addressed integrity idea as the sketch store's SK6. Scan:
load, verify the hash, and INSTALL the tensors so the forward
resolves weights from the checkpoint instead of the seeded
generators — the state_dict swap a torch build performs. A finetuned
build would write different tensors into the same layout; everything
downstream (extraction, pooling, search) is unchanged.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

from tabsketchfm_spark.ml import reference_forward as rf

MAX_POS = 512  # position-table sizes (config.max_position_embeddings)
N_TYPES = 5


def materialize_weights(n_layers: int = rf.N_LAYERS) -> dict[str, np.ndarray]:
    """Every tensor the forward consults, generated from the seeds —
    the model's full state dict: embedding streams, ``n_layers``
    encoder blocks (M2), the pooler, and the MLM head (M3; the decoder
    weight is the TIED word table, so only its bias is a tensor here —
    exactly HF's state-dict layout for tied weights)."""
    w: dict[str, np.ndarray] = {}
    w["emb.word"] = np.stack([rf._emb_row("word", i) for i in range(rf.VOCAB)])
    w["emb.type"] = np.stack([rf._emb_row("type", i) for i in range(N_TYPES)])
    w["emb.colpos"] = np.stack([rf._emb_row("colpos", i) for i in range(MAX_POS)])
    w["emb.tokpos"] = np.stack([rf._emb_row("tokpos", i) for i in range(MAX_POS)])
    for stream in ("value", "minhash"):
        rng = rf._rng(rf._seed("lin", stream, rf.HIDDEN))
        w[f"lin.{stream}.w"] = rng.standard_normal(
            (rf.HIDDEN, rf.HIDDEN)
        ) / np.sqrt(rf.HIDDEN)
        w[f"lin.{stream}.b"] = rng.standard_normal(rf.HIDDEN) / np.sqrt(rf.HIDDEN)
    for layer in range(n_layers):
        for h in range(rf.N_HEADS):
            for kind in ("q", "k", "v"):
                name = f"l{layer}.{kind}{h}"
                w[f"mat.{name}"] = rf._mat(name, rf.HEAD_DIM, rf.HIDDEN)
                w[f"bias.{name}"] = rf._bias(name, rf.HEAD_DIM)
        w[f"mat.l{layer}.o"] = rf._mat(f"l{layer}.o", rf.HIDDEN, rf.HIDDEN)
        w[f"bias.l{layer}.o"] = rf._bias(f"l{layer}.o", rf.HIDDEN)
        w[f"mat.l{layer}.ffn_in"] = rf._mat(
            f"l{layer}.ffn_in", rf.INTERMEDIATE, rf.HIDDEN
        )
        w[f"bias.l{layer}.ffn_in"] = rf._bias(f"l{layer}.ffn_in", rf.INTERMEDIATE)
        w[f"mat.l{layer}.ffn_out"] = rf._mat(
            f"l{layer}.ffn_out", rf.HIDDEN, rf.INTERMEDIATE
        )
        w[f"bias.l{layer}.ffn_out"] = rf._bias(f"l{layer}.ffn_out", rf.HIDDEN)
    w["mat.pooler"] = rf._mat("pooler", rf.HIDDEN, rf.HIDDEN)
    w["bias.pooler"] = rf._bias("pooler", rf.HIDDEN)
    w["mat.mlm.transform"] = rf._mat("mlm.transform", rf.HIDDEN, rf.HIDDEN)
    w["bias.mlm.transform"] = rf._bias("mlm.transform", rf.HIDDEN)
    w["mlm.ln.gamma"] = np.ones(rf.HIDDEN)
    w["mlm.ln.beta"] = np.zeros(rf.HIDDEN)
    w["bias.mlm.decoder"] = rf._bias("mlm.decoder", rf.VOCAB)
    return w


def _content_hash(w: dict[str, np.ndarray]) -> str:
    h = hashlib.md5()
    for k in sorted(w):
        h.update(k.encode())
        h.update(np.ascontiguousarray(w[k]).tobytes())
    return h.hexdigest()


def save_checkpoint(path: str, weights: dict[str, np.ndarray] | None = None) -> dict:
    """Sink: write <path>.npz + <path>.json manifest; returns the
    manifest (with the content hash — the checkpoint's identity)."""
    w = weights if weights is not None else materialize_weights()
    np.savez_compressed(path + ".npz", **w)
    manifest = {
        "hidden": rf.HIDDEN,
        "vocab": rf.VOCAB,
        "n_heads": rf.N_HEADS,
        "n_layers": sum(1 for k in w if k.startswith("mat.l") and k.endswith(".o")),
        "intermediate": rf.INTERMEDIATE,
        "tensors": {k: list(v.shape) for k, v in sorted(w.items())},
        "content_hash": _content_hash(w),
    }
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def load_checkpoint(path: str, verify: bool = True) -> dict[str, np.ndarray]:
    """Scan: load the npz, verify the manifest hash (a corrupted or
    tampered checkpoint fails loudly, never silently misinfers)."""
    with np.load(path + ".npz") as z:
        w = {k: z[k] for k in z.files}
    if verify:
        with open(path + ".json") as f:
            manifest = json.load(f)
        got = _content_hash(w)
        if got != manifest["content_hash"]:
            raise IOError(
                f"checkpoint content hash mismatch at {path}: "
                f"manifest {manifest['content_hash']}, tensors {got}"
            )
    return w


def install_checkpoint(weights: dict[str, np.ndarray]) -> None:
    """Route the forward's weight lookups through these tensors (the
    state_dict swap). Affects the current process only — workers each
    install from the broadcast path in a real deployment."""
    global _WORKER_INSTALLED
    rf._OVERRIDE.clear()
    rf._OVERRIDE.update(weights)
    _WORKER_INSTALLED = _MANUAL  # direct mutation invalidates the memo


def clear_checkpoint() -> None:
    global _WORKER_INSTALLED
    rf._OVERRIDE.clear()
    _WORKER_INSTALLED = _MANUAL


# one install per worker process per checkpoint CONTENT HASH — a
# retrained checkpoint saved to the same path re-installs (the hash
# differs), and a direct install/clear_checkpoint resets the memo to
# the _MANUAL sentinel so ensure_checkpoint_state never early-returns
# against stale state. Reused python workers share module state across
# tasks, so every executor-side forward must declare the state it
# needs — including "no checkpoint" (None), or a prior task's install
# would leak into seeded-weight queries.
_MANUAL = "<manual>"
_WORKER_INSTALLED: str | None = None


SPARKFILES_PREFIX = "sparkfiles:"


def ship_checkpoint(spark, path: str) -> str:
    """Multi-node distribution seam: push <path>.npz/.json to every
    executor via SparkContext.addFile and return a
    ``sparkfiles:<basename>`` handle usable anywhere a
    ``checkpoint_path`` goes — ensure_checkpoint_state resolves the
    handle per worker from its own SparkFiles root, so the driver's
    local checkpoint never needs a shared filesystem. One ship per
    (SparkContext, basename): Spark refuses to re-register a changed
    file under the same name, so a RETRAINED checkpoint must be saved
    to a fresh (e.g. timestamped) stem before shipping — the
    content-hash memo then re-installs it on reused workers."""
    sc = spark.sparkContext
    sc.addFile(path + ".npz")
    sc.addFile(path + ".json")
    return SPARKFILES_PREFIX + os.path.basename(path)


def _resolve_checkpoint_path(path: str) -> str:
    """A ``sparkfiles:`` handle becomes <SparkFiles root>/<basename>
    (driver and executors each resolve their own root); plain paths
    pass through (shared-FS deployments and local mode)."""
    if path.startswith(SPARKFILES_PREFIX):
        from pyspark import SparkFiles

        return os.path.join(
            SparkFiles.getRootDirectory(), path[len(SPARKFILES_PREFIX):]
        )
    return path


def ensure_checkpoint_state(path: str | None) -> None:
    """Executor-side install/clear: route the forward's lookups
    through <path>.npz (hash-verified, once per worker process per
    checkpoint content hash), or — path None — make sure NO checkpoint
    is installed. This is how a TRAINED checkpoint reaches lake-wide
    inference; install_checkpoint alone only affects the driver.
    ``path`` is either a filesystem stem visible to workers (shared
    FS) or a ``sparkfiles:`` handle from ship_checkpoint (no shared
    FS needed — each worker reads its SparkFiles copy)."""
    global _WORKER_INSTALLED
    if path is None:
        if _WORKER_INSTALLED is None:
            return
        clear_checkpoint()
        _WORKER_INSTALLED = None
        return
    path = _resolve_checkpoint_path(path)
    with open(path + ".json") as f:
        manifest = json.load(f)
    _validate_manifest_width(manifest, path)
    key = manifest["content_hash"]
    if _WORKER_INSTALLED == key:
        return
    install_checkpoint(load_checkpoint(path))
    _WORKER_INSTALLED = key


def _validate_manifest_width(manifest: dict, path: str) -> None:
    """A checkpoint trained at another model width must fail LOUD at
    install time: a hidden-size mismatch breaks every matmul, and a
    FULL-ENCODER checkpoint covering fewer layers than the configured
    depth would silently mix trained layers with seeded ones (the
    missing keys fall back to md5 weights — round-8 review finding).
    Head-only checkpoints (manifest n_layers == 0) install at any
    configured depth by design: serving them over the seeded encoder
    IS the freeze path."""
    h = manifest.get("hidden")
    if h is not None and h != rf.HIDDEN:
        raise IOError(
            f"checkpoint at {path} was saved at hidden={h}; the model "
            f"is configured at hidden={rf.HIDDEN} — "
            "configure_width() to match before installing"
        )
    nl = manifest.get("n_layers", 0)
    if nl and nl != rf.N_LAYERS:
        raise IOError(
            f"full-encoder checkpoint at {path} covers {nl} layers; the "
            f"model is configured for {rf.N_LAYERS} — installing would "
            "mix trained and seeded layers"
        )
    nh = manifest.get("n_heads")
    if nl and nh is not None and nh != rf.N_HEADS:
        raise IOError(
            f"checkpoint at {path} was saved with {nh} heads; the model "
            f"is configured for {rf.N_HEADS}"
        )


def checkpoint_exists(path: str) -> bool:
    return os.path.exists(path + ".npz") and os.path.exists(path + ".json")
