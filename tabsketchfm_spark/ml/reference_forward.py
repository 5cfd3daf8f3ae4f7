"""M1 numpy reference forward: the tabular-BERT *embedding layer* math
without torch.

Mirrors the reference's ``TabularBertEmbeddings.forward`` (reference
transformer_bert.py:24-85): six summed streams —

  1. word_embeddings(input_ids)            — wordpiece lookup
  2. token_type_embeddings(token_type_ids) — hijacked: COLUMN TYPE
  3. position_embeddings(position_ids)     — hijacked: COLUMN POSITION
  4. token_position_embeddings(...)        — token position in column
  5. value_embeddings(value_ids)           — Linear over the per-column
     stat vector (z-scored hstack of [unique, num_nan, cell_width,
     quantiles, pad], reference tabular_tokenizer.py:149-246)
  6. minhash_embeddings(minhash_vals)      — Linear over the column's
     minhash signature / 1e8 (tabular_tokenizer.py:236-246)

followed by LayerNorm (eps 1e-12; dropout is identity at inference).
Weights are DETERMINISTIC AND SEEDED — md5-derived Gaussians standing
in for a trained checkpoint (torch is absent in this environment; a
production build swaps ``_emb_row``/``_linear`` for checkpoint
tensors). Embedding rows are generated on demand per (stream, id), so
no 30k×H vocabulary table is ever materialized.

Pooling follows ``find_table_col`` (reference extract_embeddings.py:
16-73) exactly: special tokens ([CLS]/[SEP]) are masked out, the
tokens between consecutive SEPs form one column's group, column
embedding = mean of its token states, table embedding = mean over ALL
non-special token states, and the CLS state rides along unpooled.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

HIDDEN = 32  # hidden_size analogue — matches EMBED_DIM downstream
VOCAB = 30522  # bert-base-uncased vocab size (public constant)
LAYER_NORM_EPS = 1e-12
MINHASH_SCALE = 1.0e8  # reference tabular_tokenizer.py:245 min_hash/1e8

# type_dict analogue (reference tokenizer's type ids; 0 = special/other)
TYPE_IDS = {"string": 1, "integer": 2, "float": 3, "date": 4}

_STAT_COLS = [
    "distinct_cnt", "num_nan", "cell_width_bytes",
    "q10", "q20", "q30", "q40", "q50", "q60", "q70", "q80", "q90",
    "mean_v", "std_v", "min_v", "max_v",
]


def _seed(*parts) -> int:
    h = hashlib.md5("|".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:4], "big")


def _rng(seed: int) -> np.random.Generator:
    """Seeded weight generator. PCG64 initializes in ~1µs vs
    RandomState/MT19937's ~0.5ms — materializing the 30522-row word
    table dropped 16.5s → 0.1s when this switched (the per-(stream,id)
    on-demand-row design multiplies generator-init cost by VOCAB)."""
    return np.random.Generator(np.random.PCG64(seed))


# Installed checkpoint weights (ml/checkpoint.py S13 scan). When empty,
# every weight regenerates from its md5 seed; when a checkpoint is
# installed, lookups resolve against its tensors instead — the same
# swap a torch build performs with state_dict loading.
_OVERRIDE: dict[str, np.ndarray] = {}

# (hidden, n_heads, n_layers) presets: the environment default the
# whole gate suite runs at, and the reference's published config
# (transformer_bert.py:29 BertConfig defaults — bert-base: hidden 768,
# 12 heads, 12 layers; pretrain.py:58,90 seq 512 / vocab 30522)
DEFAULT_WIDTH = (32, 4, 4)
REFERENCE_WIDTH = (768, 12, 12)


def width_config() -> tuple[int, int, int]:
    return (HIDDEN, N_HEADS, N_LAYERS)


def configure_width(
    hidden: int | None = None,
    n_heads: int | None = None,
    n_layers: int | None = None,
) -> None:
    """Resize the whole numpy stack — every consumer (encoder blocks,
    MLM head, backprop, token-sequence builder) reads the module
    globals at CALL time, so one mutation re-dimensions them all; the
    lazily-materialized word table is reset (it is (VOCAB, HIDDEN)).
    No-op when already at the requested width, so it is safe to call
    per executor task (the ensure_checkpoint_state pattern — a reused
    worker left at another width by a previous task resets itself).
    Refuses to switch while a checkpoint override is installed: its
    tensors carry the OLD width and would silently mix shapes.
    Omitted arguments fall back to DEFAULT_WIDTH — the ONE reset
    constant, so configure_width() and _ensure_task_state(None) cannot
    drift apart (round-8 review finding)."""
    global HIDDEN, N_HEADS, HEAD_DIM, INTERMEDIATE, N_LAYERS, _WORD_TABLE
    if hidden is None:
        hidden = DEFAULT_WIDTH[0]
    if n_heads is None:
        n_heads = DEFAULT_WIDTH[1]
    if n_layers is None:
        n_layers = DEFAULT_WIDTH[2]
    if (HIDDEN, N_HEADS, N_LAYERS) == (hidden, n_heads, n_layers):
        return
    if hidden % n_heads:
        raise ValueError(f"hidden {hidden} not divisible by n_heads {n_heads}")
    if _OVERRIDE:
        raise RuntimeError(
            "cannot change model width while a checkpoint override is "
            "installed — clear_checkpoint()/ensure_checkpoint_state(None) first"
        )
    HIDDEN, N_HEADS, N_LAYERS = hidden, n_heads, n_layers
    HEAD_DIM = hidden // n_heads
    INTERMEDIATE = 4 * hidden
    _WORD_TABLE = None


def _emb_row(stream: str, idx: int) -> np.ndarray:
    """Deterministic embedding-table row: the (stream, id) cell of a
    virtual embedding matrix. Scaled 1/sqrt(H) so the six-stream sum
    stays O(1) before LayerNorm."""
    ovr = _OVERRIDE.get(f"emb.{stream}")
    if ovr is not None and idx < ovr.shape[0]:
        return ovr[idx]
    rng = _rng(_seed("emb", stream, idx))
    return rng.standard_normal(HIDDEN) / math.sqrt(HIDDEN)


def _linear(stream: str, x: np.ndarray) -> np.ndarray:
    """Deterministic Linear(in=|x|, out=HIDDEN): W @ x + b."""
    w = _OVERRIDE.get(f"lin.{stream}.w")
    b = _OVERRIDE.get(f"lin.{stream}.b")
    if w is None or b is None:
        rng = _rng(_seed("lin", stream, x.shape[0]))
        w = rng.standard_normal((HIDDEN, x.shape[0])) / math.sqrt(x.shape[0])
        b = rng.standard_normal(HIDDEN) / math.sqrt(HIDDEN)
    return w @ x + b


def word_id(token: str) -> int:
    """Wordpiece-vocab id proxy: md5(token) mod vocab size. A real
    checkpoint pairs ids with its own vocab file; the forward only
    needs a deterministic token → id map."""
    return _seed("wp", token) % VOCAB


def _zscore_full(vec: np.ndarray) -> np.ndarray:
    """scipy.stats.zscore analogue over the FULL padded vector
    (population std), as the reference applies it to the hstack
    including the zero padding (tabular_tokenizer.py:238-241)."""
    m = vec.mean()
    s = vec.std()
    if not np.isfinite(s) or s == 0:
        return np.zeros_like(vec)
    return (vec - m) / s


def build_token_sequence(col_rows: list[dict]) -> list[dict]:
    """Column profile rows (sorted by col_idx) → the token sequence
    [CLS, col1 name tokens, SEP, col2 name tokens, SEP, ...] with the
    per-token id streams, mirroring the M9 layout (features.py
    token_features) plus the full value/minhash vectors the scalar M9
    projection drops.

    Each col row dict carries: column_name, col_idx, col_type, the
    _STAT_COLS floats (None → 0 like the reference's nan guard), and
    optionally 'minhash' (list of signature values)."""
    seq: list[dict] = [
        {
            "token": "[CLS]", "col_encoding": 0, "token_position": 0,
            "type_id": 0, "value_vec": np.zeros(HIDDEN),
            "minhash_vec": np.zeros(HIDDEN), "special": True,
        }
    ]
    for ci, row in enumerate(sorted(col_rows, key=lambda r: r["col_idx"])):
        stats = np.array(
            [
                0.0 if row.get(c) is None or (isinstance(row.get(c), float) and math.isnan(row[c]))
                else float(row[c])
                for c in _STAT_COLS
            ]
        )
        padded = np.zeros(HIDDEN)
        padded[: len(stats)] = stats
        value_vec = _zscore_full(padded)
        mh = np.zeros(HIDDEN)
        sig = row.get("minhash") or []
        sig = np.asarray(sig, dtype=np.float64)[: HIDDEN]
        mh[: len(sig)] = sig / MINHASH_SCALE
        type_id = TYPE_IDS.get(row.get("col_type"), 0)
        name_toks = [t for t in str(row["column_name"]).split("_") if t]
        for tp, tok in enumerate(name_toks):
            seq.append(
                {
                    "token": tok, "col_encoding": ci + 1,
                    "token_position": tp + 1, "type_id": type_id,
                    "value_vec": value_vec, "minhash_vec": mh,
                    "special": False,
                }
            )
        seq.append(
            {
                "token": "[SEP]", "col_encoding": 0, "token_position": 0,
                "type_id": 0, "value_vec": np.zeros(HIDDEN),
                "minhash_vec": np.zeros(HIDDEN), "special": True,
            }
        )
    return seq


def m1_forward(seq: list[dict]) -> np.ndarray:
    """The six-stream embedding sum + LayerNorm over one token
    sequence. Returns (len(seq), HIDDEN) float64 states."""
    out = np.empty((len(seq), HIDDEN))
    for i, t in enumerate(seq):
        e = (
            # "wid" overrides the token's vocab id — how MLM masking
            # swaps [MASK]/random ids in without rewriting the token
            _emb_row("word", t.get("wid", word_id(t["token"])))
            + _emb_row("type", t["type_id"])
            + _emb_row("colpos", t["col_encoding"])
            + _emb_row("tokpos", t["token_position"])
            + _linear("value", t["value_vec"])
            + _linear("minhash", t["minhash_vec"])
        )
        out[i] = e
    # LayerNorm, gamma=1 beta=0 (identity affine — the untrained init)
    m = out.mean(axis=1, keepdims=True)
    v = out.var(axis=1, keepdims=True)
    return (out - m) / np.sqrt(v + LAYER_NORM_EPS)


def find_table_col_pool(
    seq: list[dict], states: np.ndarray
) -> tuple[np.ndarray, dict[int, np.ndarray], np.ndarray]:
    """SEP-group mean pooling per reference find_table_col
    (extract_embeddings.py:16-73): returns (table_embedding,
    {column_group: column_embedding}, cls_embedding). Column groups
    count SEPs seen AFTER the sequence start, so group k is the k-th
    profiled column (0-based)."""
    cls_embedding = states[0]
    num_sep = 0
    col_states: dict[int, list[np.ndarray]] = {}
    kept: list[np.ndarray] = []
    for i in range(len(seq)):
        t = seq[i]
        if t["special"]:
            if t["token"] == "[SEP]" and i != 0:
                num_sep += 1
            continue
        col_states.setdefault(num_sep, []).append(states[i])
        kept.append(states[i])
    table_embedding = np.mean(np.stack(kept), axis=0)
    col_embeddings = {
        k: np.mean(np.stack(v), axis=0) for k, v in col_states.items()
    }
    return table_embedding, col_embeddings, cls_embedding


# ---------------------------------------------------------------------------
# M2: one BERT encoder layer (numpy) — the reference pools HIDDEN LAYER
# 1, i.e. the output of the first transformer block, not the embedding
# layer (extract_embeddings.py:100 `hidden_states[1:]`, :105 layer 0).
# Standard public BERT layer math (Vaswani et al. 2017 / Devlin et al.
# 2018): multi-head self-attention + residual + LayerNorm, then a
# GELU FFN + residual + LayerNorm. Weights are the same seeded
# deterministic scheme as the embedding streams — a checkpoint drop-in
# replaces _mat/_bias.

N_HEADS = 4
HEAD_DIM = HIDDEN // N_HEADS
INTERMEDIATE = 4 * HIDDEN


def _mat(name: str, out_dim: int, in_dim: int) -> np.ndarray:
    ovr = _OVERRIDE.get(f"mat.{name}")
    if ovr is not None:
        return ovr
    rng = _rng(_seed("mat", name, out_dim, in_dim))
    return rng.standard_normal((out_dim, in_dim)) / math.sqrt(in_dim)


def _bias(name: str, dim: int) -> np.ndarray:
    ovr = _OVERRIDE.get(f"bias.{name}")
    if ovr is not None:
        return ovr
    rng = _rng(_seed("bias", name, dim))
    return rng.standard_normal(dim) / math.sqrt(dim)


def _layer_norm_rows(x: np.ndarray) -> np.ndarray:
    m = x.mean(axis=1, keepdims=True)
    v = x.var(axis=1, keepdims=True)
    return (x - m) / np.sqrt(v + LAYER_NORM_EPS)


_erf = np.vectorize(math.erf, otypes=[np.float64])


def _gelu(x: np.ndarray) -> np.ndarray:
    """Exact erf GELU (BERT's gelu), via math.erf — no scipy in env."""
    return 0.5 * x * (1.0 + _erf(x / math.sqrt(2.0)))


def attention_probs(states: np.ndarray, layer: int = 0) -> np.ndarray:
    """(heads, seq, seq) softmax attention rows — exposed for the
    rows-sum-to-1 property test."""
    n = states.shape[0]
    probs = np.empty((N_HEADS, n, n))
    for h in range(N_HEADS):
        q = states @ _mat(f"l{layer}.q{h}", HEAD_DIM, HIDDEN).T + _bias(
            f"l{layer}.q{h}", HEAD_DIM
        )
        k = states @ _mat(f"l{layer}.k{h}", HEAD_DIM, HIDDEN).T + _bias(
            f"l{layer}.k{h}", HEAD_DIM
        )
        scores = (q @ k.T) / math.sqrt(HEAD_DIM)
        scores -= scores.max(axis=1, keepdims=True)  # stable softmax
        e = np.exp(scores)
        probs[h] = e / e.sum(axis=1, keepdims=True)
    return probs


def encoder_layer(states: np.ndarray, layer: int = 0) -> np.ndarray:
    """One transformer block over (seq, HIDDEN) states."""
    probs = attention_probs(states, layer)
    ctx = np.concatenate(
        [
            probs[h]
            @ (
                states @ _mat(f"l{layer}.v{h}", HEAD_DIM, HIDDEN).T
                + _bias(f"l{layer}.v{h}", HEAD_DIM)
            )
            for h in range(N_HEADS)
        ],
        axis=1,
    )
    attn_out = ctx @ _mat(f"l{layer}.o", HIDDEN, HIDDEN).T + _bias(
        f"l{layer}.o", HIDDEN
    )
    x1 = _layer_norm_rows(states + attn_out)
    ffn = (
        _gelu(x1 @ _mat(f"l{layer}.ffn_in", INTERMEDIATE, HIDDEN).T
              + _bias(f"l{layer}.ffn_in", INTERMEDIATE))
        @ _mat(f"l{layer}.ffn_out", HIDDEN, INTERMEDIATE).T
        + _bias(f"l{layer}.ffn_out", HIDDEN)
    )
    return _layer_norm_rows(x1 + ffn)


def hidden_layer_1(seq: list[dict]) -> np.ndarray:
    """The states the reference actually pools: embedding layer (M1)
    fed through the first encoder block (M2)."""
    return encoder_layer(m1_forward(seq), layer=0)


# ---------------------------------------------------------------------------
# M2 (complete): the full TabularBertModel — N stacked encoder blocks +
# the BERT pooler (reference transformer_bert.py:88-224 delegates to
# BertModel's encoder/pooler; the tabular part is the embedding swap).
# N_LAYERS is the config.num_hidden_layers analogue, sized for this
# environment the way HIDDEN stands in for hidden_size.

N_LAYERS = 4


def encoder_forward(
    states: np.ndarray,
    n_layers: int | None = None,
    output_hidden_states: bool = False,
):
    """Run the embedding output through ``n_layers`` stacked blocks.

    Returns the last hidden state, or — with ``output_hidden_states``
    — the full ``hidden_states`` tuple analogue [embedding_output,
    layer1_out, ..., layerN_out] exactly as HF BertEncoder exposes it
    (the reference indexes ``hidden_states[1:]`` and pools layer 0 of
    that slice, extract_embeddings.py:100,105). ``n_layers`` None reads
    the CURRENT module config at call time — a def-time ``= N_LAYERS``
    default would freeze the import-time value and silently ignore
    configure_width (round-8 review finding)."""
    if n_layers is None:
        n_layers = N_LAYERS
    hidden = [states]
    for layer in range(n_layers):
        hidden.append(encoder_layer(hidden[-1], layer=layer))
    if output_hidden_states:
        return hidden
    return hidden[-1]


def pooler(sequence_output: np.ndarray) -> np.ndarray:
    """BertPooler: tanh(W @ first_token + b) over the [CLS] state —
    the pooled_output the M6 classification head consumes
    (reference tabsketchfm_finetune.py:84 ``outputs[1]``)."""
    cls_state = sequence_output[0]
    w = _mat("pooler", HIDDEN, HIDDEN)
    b = _bias("pooler", HIDDEN)
    return np.tanh(w @ cls_state + b)


def model_forward(seq: list[dict], n_layers: int | None = None):
    """TabularBertModel.forward with add_pooling_layer=True: returns
    (sequence_output, pooled_output)."""
    sequence_output = encoder_forward(m1_forward(seq), n_layers)
    return sequence_output, pooler(sequence_output)


def encode_text(tokens: list[str], n_layers: int | None = None) -> np.ndarray:
    """Sentence-encoder stand-in for K2 (reference embedding_search.py:
    25-42 encodes each column's value document with a
    sentence-transformer): build [CLS] t1..tn [SEP] with only the
    word-id and token-position streams live (value/minhash streams
    zero — free text has no column stats), run the SAME numpy encoder
    stack, and mean-pool the non-special final states — the standard
    sentence-transformer pooling. Returns (HIDDEN,) float64; the zero
    vector for an empty token list."""
    if not tokens:
        return np.zeros(HIDDEN)
    seq: list[dict] = [
        {
            "token": "[CLS]", "col_encoding": 0, "token_position": 0,
            "type_id": 0, "value_vec": np.zeros(HIDDEN),
            "minhash_vec": np.zeros(HIDDEN), "special": True,
        }
    ]
    for tp, tok in enumerate(tokens):
        seq.append(
            {
                "token": tok, "col_encoding": 1, "token_position": tp + 1,
                "type_id": TYPE_IDS["string"], "value_vec": np.zeros(HIDDEN),
                "minhash_vec": np.zeros(HIDDEN), "special": False,
            }
        )
    seq.append(
        {
            "token": "[SEP]", "col_encoding": 0, "token_position": 0,
            "type_id": 0, "value_vec": np.zeros(HIDDEN),
            "minhash_vec": np.zeros(HIDDEN), "special": True,
        }
    )
    states = encoder_forward(m1_forward(seq), n_layers)
    kept = np.stack([states[i] for i, t in enumerate(seq) if not t["special"]])
    return kept.mean(axis=0)


# ---------------------------------------------------------------------------
# M3: TabularBertForMaskedLM (reference transformer_bert.py:227-297) =
# TabularBertModel(add_pooling_layer=False) + BertOnlyMLMHead. The head
# is the public BERT LM head: transform (dense H->H, gelu, LayerNorm)
# then a decoder whose weight is TIED to the word-embedding table plus
# a free output bias. CrossEntropyLoss with ignore_index=-100.

_WORD_TABLE: np.ndarray | None = None


def word_table() -> np.ndarray:
    """The full (VOCAB, HIDDEN) word-embedding matrix — materialized
    lazily ONCE per process (the decoder tie makes every-logit
    computation need it; ~VOCAB*H*8 bytes, driver/executor-local)."""
    global _WORD_TABLE
    ovr = _OVERRIDE.get("emb.word")
    if ovr is not None:
        return ovr
    if _WORD_TABLE is None:
        _WORD_TABLE = np.stack([_emb_row("word", i) for i in range(VOCAB)])
    return _WORD_TABLE


def mlm_transform(states: np.ndarray) -> np.ndarray:
    """BertPredictionHeadTransform: dense + gelu + LayerNorm. The
    LayerNorm affine (gamma/beta) is identity at the seeded init but
    checkpoint-addressable — a TRAINED head (ml/training.MLMHead fits
    exactly these tensors) installs via the same state-dict swap as
    every other weight."""
    x = states @ _mat("mlm.transform", HIDDEN, HIDDEN).T + _bias(
        "mlm.transform", HIDDEN
    )
    y = _layer_norm_rows(_gelu(x))
    gamma = _OVERRIDE.get("mlm.ln.gamma")
    beta = _OVERRIDE.get("mlm.ln.beta")
    if gamma is not None:
        y = y * gamma
    if beta is not None:
        y = y + beta
    return y


def mlm_logits(states: np.ndarray, positions: list[int] | None = None) -> np.ndarray:
    """Prediction scores for the given positions (default: all). The
    decoder weight is the tied word table; bias is the head's own."""
    x = states if positions is None else states[positions]
    t = mlm_transform(x)
    return t @ word_table().T + _bias("mlm.decoder", VOCAB)


def cross_entropy(logits: np.ndarray, labels: np.ndarray) -> tuple[float, int]:
    """torch.nn.CrossEntropyLoss semantics: mean over labels != -100
    (ignore_index); returns (loss, n_counted). Log-sum-exp stabilized."""
    keep = labels != -100
    n = int(keep.sum())
    if n == 0:
        return float("nan"), 0
    lg = logits[keep]
    lb = labels[keep]
    m = lg.max(axis=1, keepdims=True)
    lse = m[:, 0] + np.log(np.exp(lg - m).sum(axis=1))
    picked = lg[np.arange(n), lb]
    return float(np.mean(lse - picked)), n


def masked_lm_forward(
    seq: list[dict], labels: np.ndarray, n_layers: int | None = None
) -> dict:
    """TabularBertForMaskedLM.forward: full-sequence logits would be
    (seq, VOCAB); only label positions contribute to the loss, so the
    decoder is evaluated just there (same loss, reference
    transformer_bert.py:290-292). Returns loss / correct / total in
    the shape M5's log_output derives (tabsketchfm.py:40-55)."""
    states = encoder_forward(m1_forward(seq), n_layers)
    pos = [i for i in range(len(labels)) if labels[i] != -100]
    logits = mlm_logits(states, pos)
    lb = labels[pos]
    loss, n = cross_entropy(logits, lb)
    correct = int((logits.argmax(axis=1) == lb).sum()) if n else 0
    return {"loss": loss, "correct": correct, "total": n}
