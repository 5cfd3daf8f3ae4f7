"""Hypothesis property tests — randomized inputs against independent
reimplementations (python folds), no Spark session needed, so the
search is cheap and wide.

Two layers are covered: the pure numpy training math (ml/training,
ml/mlm), and the DuckDB oracle SEMANTICS for operators whose contract
is easy to fold in python (CDC compaction, streaming funnel) — the
oracle is the correctness gate, so the oracle itself deserves an
independent check the parity harness cannot give it.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from tabsketchfm_spark.ml import mlm, reference_forward as rf, training as tr


@given(
    st.lists(
        st.tuples(
            st.lists(st.floats(-10, 10), min_size=4, max_size=4),
            st.integers(0, 3),
        ),
        min_size=1,
        max_size=12,
    ),
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_cross_entropy_matches_direct_softmax_and_ignores(rows, data):
    logits = np.array([r[0] for r in rows])
    labels = np.array([r[1] for r in rows], dtype=np.int64)
    ignore = data.draw(
        st.lists(st.booleans(), min_size=len(rows), max_size=len(rows))
    )
    lb = labels.copy()
    lb[np.array(ignore)] = -100
    loss, n = rf.cross_entropy(logits, lb)
    keep = [i for i in range(len(rows)) if not ignore[i]]
    assert n == len(keep)
    if not keep:
        assert math.isnan(loss)
        return
    direct = -np.mean(
        [
            math.log(
                math.exp(logits[i, labels[i]]) / np.exp(logits[i]).sum()
            )
            for i in keep
        ]
    )
    assert abs(loss - direct) < 1e-9
    assert loss >= -1e-12  # CE of a distribution is non-negative


@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.lists(st.floats(-100, 100), min_size=1, max_size=5),
        min_size=1,
    ),
    st.floats(0.01, 10.0),
)
@settings(max_examples=80, deadline=None)
def test_clip_grad_norm_properties(gdict, max_norm):
    grads = {k: np.array(v) for k, v in gdict.items()}
    orig = {k: v.copy() for k, v in grads.items()}
    pre = tr.clip_grad_norm(grads, max_norm)
    post = math.sqrt(sum(float((g * g).sum()) for g in grads.values()))
    direct = math.sqrt(sum(float((g * g).sum()) for g in orig.values()))
    assert abs(pre - direct) < 1e-9  # returns the PRE-clip norm
    assert post <= max_norm + 1e-9 or abs(post - direct) < 1e-9
    if direct > 0:
        # direction preserved: scaled copies are colinear with originals
        scale = post / direct
        for k in grads:
            assert np.allclose(grads[k], orig[k] * scale, atol=1e-9)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=40, deadline=None)
def test_apply_mask_label_contract(col_name_tokens):
    """Labels appear exactly where the action is not 'none'; the input
    id deviates from the token's own id ONLY for [MASK]/random."""
    rows = [
        {
            "column_name": "_".join(col_name_tokens),
            "col_idx": 0,
            "col_type": "string",
            **{c: None for c in rf._STAT_COLS},
        }
    ]
    seq = rf.build_token_sequence(rows)
    actions = mlm.mask_actions(seq)
    masked, labels = mlm.apply_mask(seq)
    for i, (t, act) in enumerate(zip(masked, actions)):
        own = rf.word_id(seq[i]["token"])
        if act == "none":
            assert labels[i] == -100 and "wid" not in t
        else:
            assert labels[i] == own
            if act == "keep":
                assert t["wid"] == own
            elif act == "[MASK]":
                assert t["wid"] == rf.word_id("[MASK]")
            else:
                assert 0 <= t["wid"] < rf.VOCAB
                # reference create_desc_mask semantics: one draw; a
                # draw landing on {SEP, CLS, PAD, UNK} keeps the
                # ORIGINAL token (no re-roll). The filter set is
                # HARDCODED here (not read from mlm) so an edit to the
                # implementation's set fails this test
                filter_wids = {
                    rf.word_id(s) for s in ("[SEP]", "[CLS]", "[PAD]", "[UNK]")
                }
                rid = mlm.py_h32(f"rnd|{i}|{seq[i]['token']}") % rf.VOCAB
                expect = own if rid in filter_wids else rid
                assert t["wid"] == expect
    # specials are never masked
    for t, act in zip(seq, actions):
        if t["special"]:
            assert act == "none"


EVENT_TS = st.integers(0, 20)  # narrow: ts ties MUST occur so tie-break paths are searched


@given(
    st.lists(
        st.tuples(
            EVENT_TS,
            st.integers(1, 5),  # user
            st.sampled_from(["view", "click", "signup", "error"]),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=40, deadline=None)
def test_cdc_oracle_semantics_match_python_fold(events):
    """The cdc_latest_state ORACLE (the gate itself) vs an independent
    last-writer-wins fold over random changelogs."""
    import duckdb

    from tabsketchfm_spark.operators.structural import cdc_latest_state_oracle_sql

    con = duckdb.connect()
    vals = ", ".join(
        f"({i + 1}, to_timestamp({ts}), {u}, '{et}', 1.0, NULL)"
        for i, (ts, u, et) in enumerate(events)
    )
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM (VALUES {vals}) "
        "v(event_id, ts, user_id, event_type, value, props)"
    )
    got = {
        r[0]: r[3]
        for r in con.execute(cdc_latest_state_oracle_sql()).fetchall()
    }
    fold: dict[int, tuple] = {}
    for i, (ts, u, et) in enumerate(events):
        key = (ts, i + 1)
        if u not in fold or key > fold[u][0]:
            fold[u] = (key, et)
    expect = {u: et for u, (_, et) in fold.items() if et != "error"}
    assert got == expect


@given(
    st.lists(
        st.tuples(EVENT_TS, st.integers(1, 4), st.sampled_from(["view", "click"])),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=40, deadline=None)
def test_streaming_funnel_oracle_monotone_and_matches_fold(events):
    """Funnel counts are non-increasing per step, and equal the
    first-occurrence-ordered python fold."""
    import duckdb

    from tabsketchfm_spark.streaming.profile_stream import (
        streaming_funnel_oracle_sql,
    )

    con = duckdb.connect()
    vals = ", ".join(
        f"({i + 1}, to_timestamp({ts}), {u}, '{et}', 1.0, NULL)"
        for i, (ts, u, et) in enumerate(events)
    )
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM (VALUES {vals}) "
        "v(event_id, ts, user_id, event_type, value, props)"
    )
    steps = ["view", "click"]
    rows = sorted(con.execute(streaming_funnel_oracle_sql(steps)).fetchall())
    counts = [r[2] for r in rows]
    assert counts == sorted(counts, reverse=True)  # monotone funnel
    firsts: dict[int, dict[str, int]] = {}
    for ts, u, et in events:
        d = firsts.setdefault(u, {})
        d[et] = min(d.get(et, ts), ts)
    s1 = sum(1 for d in firsts.values() if "view" in d)
    s2 = sum(
        1
        for d in firsts.values()
        if "view" in d and "click" in d and d["view"] <= d["click"]
    )
    assert counts == [s1, s2]


@given(
    st.dictionaries(
        st.text(alphabet="abc", min_size=2, max_size=5),
        st.integers(1, 20),
        min_size=1,
        max_size=8,
    ),
    st.integers(1, 4),
)
@settings(max_examples=30, deadline=None)
def test_bpe_oracle_matches_direct_python_bpe(word_counts, n_merges):
    """The BPE oracle (the gate) vs a direct python implementation of
    Sennrich-style merge learning over random tiny corpora — symbol
    lists, no string-replace tricks, so the double-space encoding and
    the greedy replace() application are independently checked."""
    import duckdb

    from tabsketchfm_spark.operators.bpe import END, bpe_learn_oracle_sql

    con = duckdb.connect()
    text = " ".join(w for w, c in sorted(word_counts.items()) for _ in range(c))
    # alphabet is [abc] — safe to inline as a literal (CREATE VIEW
    # cannot take prepared parameters)
    con.execute(
        f"CREATE VIEW documents AS SELECT 1 AS doc_id, '{text}' AS text, "
        "'en' AS lang, 's' AS source, 1 AS n_chars"
    )
    got = [
        tuple(r)
        for r in con.execute(bpe_learn_oracle_sql(n_merges=n_merges)).fetchall()
    ]
    # direct fold: words as symbol lists
    vocab = {w: (list(w) + [END], c) for w, c in word_counts.items()}
    expect = []
    for rnd in range(1, n_merges + 1):
        pc: dict[tuple, int] = {}
        for sym, c in vocab.values():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] = pc.get((sym[i], sym[i + 1]), 0) + c
        if not pc:
            break
        (s1, s2), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rnd, s1, s2, s1 + s2, c))
        for w, (sym, cw) in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == s1 and sym[i + 1] == s2:
                    out.append(s1 + s2)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            vocab[w] = (out, cw)
    assert got == expect


@given(
    st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=6),
        st.integers(1, 20),
        min_size=1,
        max_size=10,
    ),
    st.integers(1, 6),
)
@settings(max_examples=50, deadline=None)
def test_learn_merges_py_matches_direct_fold(word_counts, n_merges):
    """learn_merges_py (the driver-side schema-corpus learner behind
    the M9 subword tokenizer) vs the same direct symbol-list fold the
    oracle is pinned against — the string-replace encoding must agree
    with list-level merge semantics on arbitrary corpora, including
    1-char words and repeated-symbol runs."""
    from tabsketchfm_spark.operators.bpe import END, learn_merges_py

    got = [
        (i + 1, s1, s2, s1 + s2, c)
        for i, (s1, s2, c) in enumerate(
            learn_merges_py(sorted(word_counts.items()), n_merges)
        )
    ]
    vocab = {w: (list(w) + [END], c) for w, c in word_counts.items()}
    expect = []
    for rnd in range(1, n_merges + 1):
        pc: dict[tuple, int] = {}
        for sym, c in vocab.values():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] = pc.get((sym[i], sym[i + 1]), 0) + c
        if not pc:
            break
        (s1, s2), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rnd, s1, s2, s1 + s2, c))
        for w, (sym, cw) in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == s1 and sym[i + 1] == s2:
                    out.append(s1 + s2)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            vocab[w] = (out, cw)
    assert got == expect


def test_bpe_batch_recount_invariance(spark, sf001):
    """bpe_learn's segmentation-checkpoint batching (recount_every) is
    a pure cost knob: the merge trajectory — rounds, pairs, counts —
    is identical whether the segmentation re-materializes every merge,
    every 3, or never within the horizon. Run past one re-checkpoint
    boundary (12 merges, recount_every 3 → three re-materializations)
    so the fold-into-checkpoint path is actually exercised."""
    from tabsketchfm_spark.operators.bpe import bpe_learn

    base = [tuple(r) for r in bpe_learn(spark, sf001, n_merges=12, recount_every=12).collect()]
    batched = [tuple(r) for r in bpe_learn(spark, sf001, n_merges=12, recount_every=3).collect()]
    assert len(base) == 12
    assert batched == base


def test_bpe_oracle_survives_merge_exhaustion():
    """Regression (self-review): a corpus whose words fully merge
    before n_merges rounds left the apply-oracle's replace() with NULL
    scalar subqueries, poisoning every n_subwords. The coalesce-to-
    sentinel guard must keep later rounds as no-ops."""
    import duckdb

    from tabsketchfm_spark.operators.bpe import (
        bpe_learn_oracle_sql,
        bpe_token_counts_oracle_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 1 AS doc_id, 'ab ab ab' AS text, "
        "'en' AS lang, 's' AS source, 1 AS n_chars"
    )
    # only 2 merges exist ((a,b) then (ab,</w>)); n_merges=8 overshoots
    learn = con.execute(bpe_learn_oracle_sql(n_merges=8)).fetchall()
    assert [r[3] for r in learn] == ["ab", "ab</w>"]
    counts = con.execute(bpe_token_counts_oracle_sql(n_merges=8)).fetchall()
    assert counts == [(1, 3, 3)]  # one fused symbol per word, not NULL


@given(
    st.lists(  # docs as token lists over a tiny alphabet → collisions guaranteed
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    st.integers(2, 4),
)
@settings(max_examples=40, deadline=None)
def test_exact_substring_oracle_matches_direct_python(doc_tokens, k):
    """The ExactSubstr ORACLE vs an independent python fold over random
    tiny corpora: duplicated k-gram detection (>=2 occurrences anywhere,
    within-doc repeats included), covered-position union, and the
    ordered rebuild must all agree."""
    import duckdb

    from tabsketchfm_spark.operators.text import exact_substring_dedup_oracle_sql

    con = duckdb.connect()
    rows = ", ".join(
        f"({i}, '{' '.join(toks)}')" for i, toks in enumerate(doc_tokens)
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {rows}) v(doc_id, text)"
    )
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            exact_substring_dedup_oracle_sql("documents", k=k)
        ).fetchall()
    }
    # direct fold
    from collections import Counter

    grams: Counter = Counter()
    for toks in doc_tokens:
        for s in range(len(toks) - k + 1):
            grams[tuple(toks[s : s + k])] += 1
    expect = {}
    for i, toks in enumerate(doc_tokens):
        covered = set()
        for s in range(len(toks) - k + 1):
            if grams[tuple(toks[s : s + k])] >= 2:
                covered.update(range(s, s + k))
        kept = [t for p, t in enumerate(toks) if p not in covered]
        expect[i] = (len(toks), len(covered), " ".join(kept))
    assert got == expect


@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    st.integers(2, 4),
)
@settings(max_examples=40, deadline=None)
def test_exact_substring_keepfirst_oracle_matches_direct_python(doc_tokens, k):
    """The KEEP-ONE-COPY variant's oracle vs an independent fold: the
    per-gram corpus-first occurrence (smallest (doc, start)) keeps its
    span; only later occurrences' positions are removed."""
    import duckdb

    from tabsketchfm_spark.operators.text import exact_substring_dedup_oracle_sql

    con = duckdb.connect()
    rows = ", ".join(
        f"({i}, '{' '.join(toks)}')" for i, toks in enumerate(doc_tokens)
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {rows}) v(doc_id, text)"
    )
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            exact_substring_dedup_oracle_sql("documents", k=k, keep_first=True)
        ).fetchall()
    }
    occs: dict[tuple, list[tuple[int, int]]] = {}
    for i, toks in enumerate(doc_tokens):
        for s in range(len(toks) - k + 1):
            occs.setdefault(tuple(toks[s : s + k]), []).append((i, s))
    covered_by_doc: dict[int, set] = {}
    for g, lst in occs.items():
        if len(lst) < 2:
            continue
        for i, s in sorted(lst)[1:]:  # all but the corpus-first
            covered_by_doc.setdefault(i, set()).update(range(s, s + k))
    expect = {}
    for i, toks in enumerate(doc_tokens):
        covered = covered_by_doc.get(i, set())
        kept = [t for p, t in enumerate(toks) if p not in covered]
        expect[i] = (len(toks), len(covered), " ".join(kept))
    assert got == expect


@given(
    st.lists(  # docs as char strings over a tiny alphabet
        st.text(alphabet="abcd", min_size=0, max_size=16),
        min_size=1,
        max_size=8,
    ),
    st.integers(2, 5),
)
@settings(max_examples=40, deadline=None)
def test_exact_substring_chars_oracle_matches_direct_python(doc_texts, k):
    """The CHAR-granularity ExactSubstr oracle vs an independent python
    fold: duplicated k-char substring detection (within-doc repeats
    included), covered-offset union, and the character-level rebuild
    must all agree."""
    import duckdb

    from tabsketchfm_spark.operators.text import (
        exact_substring_dedup_chars_oracle_sql,
    )

    con = duckdb.connect()
    rows = ", ".join(f"({i}, '{txt}')" for i, txt in enumerate(doc_texts))
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {rows}) v(doc_id, text)"
    )
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            exact_substring_dedup_chars_oracle_sql("documents", k=k)
        ).fetchall()
    }
    from collections import Counter

    grams: Counter = Counter()
    for txt in doc_texts:
        for s in range(len(txt) - k + 1):
            grams[txt[s : s + k]] += 1
    expect = {}
    for i, txt in enumerate(doc_texts):
        covered = set()
        for s in range(len(txt) - k + 1):
            if grams[txt[s : s + k]] >= 2:
                covered.update(range(s, s + k))
        kept = "".join(c for p, c in enumerate(txt) if p not in covered)
        expect[i] = (len(txt), len(covered), kept)
    assert got == expect
