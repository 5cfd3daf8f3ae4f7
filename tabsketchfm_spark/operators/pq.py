"""Product quantization (PQ) — compressed-domain ANN with ORACLE-EXACT
training, encoding and search.

PQ (Jégou et al. 2011, the FAISS workhorse) splits each vector into S
subvectors and learns a small k-means codebook PER SUBSPACE; a vector
is then stored as S small codeword ids, and search ranks candidates by
the ASYMMETRIC DISTANCE (ADC): the query keeps its full vector, every
candidate contributes only its codes, and the distance is a sum of S
codebook lookups. The candidate side of the search never touches the
original vectors — the scale story is S bytes per vector instead of
4·dim.

This implementation rides the integer-exact Lloyd's machinery
(operators/kmeans.py): unit vectors quantized to the 1024 grid, the
per-subspace codebooks trained with the same smallest-id init /
integer-comparable assignment / floor-div centroid update — so
codebook training, vector encoding AND the ADC ranking all replay
bit-for-bit in DuckDB. All S subspace fits advance in ONE aggregate
job per round (the subvectors ride a persisted posexplode frame,
grouped by (subspace, cell)).

Honest caveat, measured: the synthetic embeddings are near-orthogonal
(no low-dimensional structure), so ADC recall against exact cosine is
modest — the property test pins it above the random-ranking baseline,
not at production levels. The algebra and the plan shape are the
point; recall quality is a property of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tabsketchfm_spark.operators.kmeans import (
    SCALE,
    _B_SQL,
    _b_exprs,
    _base_ctes,
    _bk_col,
    _cents_frame,
    _kmeans_ctes,
    _nearest_cells_int,
    _quantized,
    _ranked_cells_sql,
    _seed_vectors,
)

S_SUB = 8  # subspaces
D_SUB = 8  # dims per subspace (S_SUB * D_SUB = embedding dim)
K_PQ = 8  # codewords per subspace
ITERS_PQ = 3

# memoized codebooks, same contract as kmeans._FIT_MEMO: plan-keyed,
# NOT content-keyed — a rewrite behind an already-fitted path must
# call clear_pq_memo() (kmeans.clear_fit_memo's sibling)
_PQ_MEMO: dict[tuple, dict[tuple[int, int], list[int]]] = {}


def clear_pq_memo() -> None:
    """Clears BOTH PQ-family memos — the residual codebooks depend on
    the coarse fit, so a partial clear could pair fresh centroids with
    codebooks trained in the old residual domain."""
    _PQ_MEMO.clear()
    _IVFPQ_MEMO.clear()


# kmeans.clear_fit_memo() is the documented reset-after-rewrite call;
# cascade it here so one call restores full coherence (the codebooks
# train against those fits)
from tabsketchfm_spark.operators import kmeans as _km_mod

_km_mod._DEPENDENT_MEMO_CLEARS.append(clear_pq_memo)


def _dot_lit(col: str, base: int, vec: list[int]) -> str:
    """Integer dot of the 0-based Spark slice ``col[base..base+D_SUB)``
    with a literal codeword — HOF form, NOT unrolled: the
    K_PQ × S_SUB expression fan-out (512 terms) blows whole-stage
    codegen past Janino's 64 KB method limit (measured: every PQ plan
    fell back to interpreted mode after a multi-second failed
    compile), while the interpreted HOF wins outright below ~10^7 rows
    (functions/vector.py's measured trade-off)."""
    lits = ", ".join(f"cast({v} as bigint)" for v in vec)
    return (
        f"aggregate(zip_with(slice({col}, {base + 1}, {D_SUB}), "
        f"array({lits}), (x, y) -> x * y), "
        "cast(0 as bigint), (acc, x) -> acc + x)"
    )


def _b_lit(s: int, vec: list[int], col: str = "qv") -> str:
    """The comparable B = m·m − 2·(q_s·m) for subspace ``s`` against a
    literal codeword, read off the FULL ``col`` vector column."""
    mm = sum(v * v for v in vec)
    return f"cast({mm} as bigint) - 2 * ({_dot_lit(col, s * D_SUB, vec)})"


def _cb_case_terms(
    cb: dict[tuple[int, int], list[int]], col: str, code_prefix: str = "c"
) -> list[str]:
    """ONE copy of the per-subspace ADC codebook lookup (shared by the
    search tail and the reconstruction-error scan): for each subspace
    s, a CASE over the stored code column ``{code_prefix}{s}`` yielding
    |m|² − 2·(col_s·m) for that code's codeword."""
    terms = []
    for s in range(S_SUB):
        branches = " ".join(
            f"WHEN {c} THEN {_b_lit(s, cb[(s, c)], col)}" for c in range(K_PQ)
        )
        terms.append(f"(CASE {code_prefix}{s} {branches} END)")
    return terms


def pq_fit(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> dict[tuple[int, int], list[int]]:
    """{(s, c): codeword} — all S_SUB codebooks trained together, one
    aggregate job per Lloyd round over the exploded (id, s, qs)
    frame."""
    key = (
        emb._jdf.semanticHash(),
        id_col,
        vec_col,
        S_SUB,
        D_SUB,
        K_PQ,
        ITERS_PQ,
        SCALE,
    )
    hit = _PQ_MEMO.get(key)
    if hit is not None:
        return hit
    m = pq_fit_frame(_quantized(emb, id_col, vec_col))
    _PQ_MEMO[key] = m
    return m


def pq_fit_frame(q: DataFrame) -> dict[tuple[int, int], list[int]]:
    """The frame-level trainer: ``q`` is any (id, qv) integer-vector
    frame (the raw quantized vectors for plain PQ; coarse-cell
    RESIDUALS for IVF-PQ). Not memoized — wrappers own their keys."""
    seeds = _seed_vectors(q, K_PQ)
    m = {
        (s, c): seeds[c][s * D_SUB : (s + 1) * D_SUB]
        for s in range(S_SUB)
        for c in range(K_PQ)
    }
    sub = (
        f"transform(sequence(0, {S_SUB - 1}), "
        f"s -> transform(sequence(0, {D_SUB - 1}), i -> qv[s * {D_SUB} + i]))"
    )
    ex = q.select(
        "id", F.posexplode(F.expr(sub)).alias("s", "qs")
    ).persist()
    try:
        for _ in range(ITERS_PQ):
            bcols = []
            for c in range(K_PQ):
                branches = " ".join(
                    f"WHEN {s} THEN cast({sum(v * v for v in m[(s, c)])} as bigint)"
                    f" - 2 * ({_dot_lit('qs', 0, m[(s, c)])})"
                    for s in range(S_SUB)
                )
                bcols.append(F.expr(f"CASE s {branches} END").alias(f"b{c}"))
            proj = ex.select("s", "qs", *bcols)
            rows = (
                proj.select("s", _bk_col(K_PQ).alias("bk"), "qs")
                .groupBy("s", "bk")
                .agg(
                    F.count("*").alias("c"),
                    *[
                        F.sum(F.element_at("qs", i + 1)).alias(f"s{i}")
                        for i in range(D_SUB)
                    ],
                )
                .collect()
            )
            new = dict(m)  # empty codeword keeps its previous centroid
            for r in rows:
                c = int(r["c"])
                new[(int(r["s"]), int(r["bk"]))] = [
                    (2 * int(r[f"s{i}"]) + c) // (2 * c) for i in range(D_SUB)
                ]
            m = new
    finally:
        ex.unpersist()
    return m


def _code_cols(m: dict[tuple[int, int], list[int]]) -> list[F.Column]:
    """One argmin code column per subspace, expression-only over the
    unexploded qv (ties → smallest codeword id)."""
    out = []
    for s in range(S_SUB):
        bs = [F.expr(_b_lit(s, m[(s, c)])) for c in range(K_PQ)]
        out.append(_bk_col(K_PQ, bs).cast("int").alias(f"code{s}"))
    return out


def pq_codes(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, codes): each vector encoded as S_SUB codeword ids — a
    LAZY expression-only projection against the fitted codebooks.
    Bit-exact vs pq_codes_oracle_sql."""
    m = pq_fit(emb, id_col, vec_col)
    return (
        _quantized(emb, id_col, vec_col)
        .select("id", *_code_cols(m))
        .select(
            F.col("id").alias("vec_id"),
            F.array(*[F.col(f"code{s}") for s in range(S_SUB)]).alias("codes"),
        )
    )


def pq_adc_topk(
    emb: DataFrame,
    query_ids_max: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC search: queries keep their full quantized vector, candidates
    contribute ONLY their codes; the approximate distance is the sum of
    S_SUB codebook terms (the q·q constant drops inside the per-query
    ranking). Integer throughout → bit-exact vs the oracle. Output:
    (q_id, rank, cand_id, adc)."""
    m = pq_fit(emb, id_col, vec_col)
    cands = pq_codes(emb, id_col, vec_col).select(
        F.col("vec_id").alias("cand_id"),
        *[
            F.element_at("codes", s + 1).alias(f"c{s}")
            for s in range(S_SUB)
        ],
    )
    queries = (
        _quantized(emb, id_col, vec_col)
        .where(F.col("id") < query_ids_max)
        .select(F.col("id").alias("q_id"), "qv")
    )
    # candidates stream; the tiny query side broadcasts — each pair's
    # distance reads the candidate's S codes and the query's vector,
    # never the candidate's vector (the PQ memory story)
    terms = []
    for s in range(S_SUB):
        branches = " ".join(
            f"WHEN {c} THEN {_b_lit(s, m[(s, c)])}" for c in range(K_PQ)
        )
        terms.append(f"(CASE c{s} {branches} END)")
    adc = F.expr(" + ".join(terms))
    pairs = cands.crossJoin(F.broadcast(queries)).where(
        F.col("cand_id") != F.col("q_id")
    )
    scored = pairs.select("q_id", "cand_id", adc.alias("adc"))
    w = Window.partitionBy("q_id").orderBy(F.asc("adc"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "cand_id", "adc")
    )


# --- IVF-PQ: coarse trained cells + PQ on integer residuals -----------------
#
# The full FAISS composition: the integer k-means quantizer
# (operators/kmeans.py) partitions the lake into coarse cells; each
# vector's RESIDUAL against its cell centroid — still integer, the
# grid is closed under subtraction — is PQ-encoded; a query probes its
# n_probe nearest cells and ranks candidates by the residual-domain
# ADC. Candidates contribute (cell, S codes): the index never stores
# vectors. All training, encoding and ranking stay integer →
# bit-exact DuckDB replay.

N_PROBE_IVFPQ = 3

_IVFPQ_MEMO: dict[tuple, dict[tuple[int, int], list[int]]] = {}


def clear_ivfpq_memo() -> None:
    _IVFPQ_MEMO.clear()


def _cell_qv_cols_q(q, mc):
    """(id, qv, cell) off an ALREADY-QUANTIZED frame — the seam that
    lets a verb holding a persisted quantized corpus (the re-encode
    path) reuse it instead of re-scanning the lake."""
    return q.select("id", "qv", *_b_exprs(mc)).select(
        "id", "qv", _bk_col(len(mc)).cast("int").alias("cell")
    )


def _cell_qv_cols(emb, mc, id_col, vec_col):
    """(id, qv, cell): expression-only coarse assignment KEEPING the
    quantized vector (kmeans._assigned_cols drops it)."""
    return _cell_qv_cols_q(_quantized(emb, id_col, vec_col), mc)


def _residual_col(mc: dict[int, list[int]]) -> F.Column:
    """rv = qv − m_coarse[cell] as a CASE chain over cell literals."""
    expr = None
    for cid in sorted(mc):
        arr = ", ".join(f"cast({v} as bigint)" for v in mc[cid])
        sub = f"zip_with(qv, array({arr}), (x, y) -> x - y)"
        expr = (
            F.when(F.col("cell") == cid, F.expr(sub))
            if expr is None
            else expr.when(F.col("cell") == cid, F.expr(sub))
        )
    return expr


def ivfpq_fit(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> tuple[dict[int, list[int]], dict[tuple[int, int], list[int]]]:
    """(coarse centroids, residual codebooks). The coarse fit is the
    shared kmeans._fit memo; the residual codebooks train on the
    (id, residual) frame and memoize under their own key."""
    from tabsketchfm_spark.operators.kmeans import N_CELLS, N_ITERS, _fit

    mc = _fit(emb, N_CELLS, N_ITERS, S_SUB * D_SUB, id_col, vec_col)
    key = (
        emb._jdf.semanticHash(),
        id_col,
        vec_col,
        "ivfpq",
        # the residual codebooks depend on the COARSE fit too — a
        # changed coarse configuration must invalidate them
        N_CELLS,
        N_ITERS,
        S_SUB,
        D_SUB,
        K_PQ,
        ITERS_PQ,
        SCALE,
    )
    cb = _IVFPQ_MEMO.get(key)
    if cb is None:
        rf = _cell_qv_cols(emb, mc, id_col, vec_col).select(
            "id", _residual_col(mc).alias("qv")
        )
        cb = pq_fit_frame(rf)
        _IVFPQ_MEMO[key] = cb
    return mc, cb


def ivfpq_adc_topk(
    emb: DataFrame,
    query_ids_max: int,
    k: int = 10,
    n_probe: int = N_PROBE_IVFPQ,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ search: candidates carry (cell, codes) only; the query
    probes its n_probe nearest coarse cells, forms its residual
    against EACH probed centroid, and ranks same-cell candidates by
    the exact integer ADC (residual self-dot + per-subspace codebook
    terms). Output: (q_id, rank, cand_id, adc)."""
    mc, cb = ivfpq_fit(emb, id_col, vec_col)
    cands = _ivfpq_cands(emb, mc, cb, id_col, vec_col)
    return _ivfpq_search_tail(
        cands, emb, mc, cb, query_ids_max, k, n_probe, id_col, vec_col
    )


def _cands_from_q(q, mc, cb) -> DataFrame:
    """Encode an ALREADY-QUANTIZED frame as (cand_id, cell,
    c0..c{S-1}) — _ivfpq_cands minus the quantize scan, for verbs
    that hold a persisted quantized corpus."""
    return (
        _cell_qv_cols_q(q, mc)
        .select(
            F.col("id").alias("cand_id"),
            "cell",
            _residual_col(mc).alias("qv"),
        )
        .select("cand_id", "cell", *_code_cols(cb))
        .select(
            "cand_id",
            "cell",
            *[F.col(f"code{s}").alias(f"c{s}") for s in range(S_SUB)],
        )
    )


def _ivfpq_cands(emb, mc, cb, id_col, vec_col) -> DataFrame:
    """The INDEX DATA: every corpus vector encoded as (cand_id, cell,
    c0..c{S-1}) — coarse cell + residual PQ codes, expression-only."""
    return _cands_from_q(_quantized(emb, id_col, vec_col), mc, cb)


def _ivfpq_search_tail(
    cands, emb, mc, cb, query_ids_max, k, n_probe, id_col, vec_col
) -> DataFrame:
    """The serve-time plan over an encoded candidate frame — shared by
    the fit-and-search query and the stored-index serve (identical
    algebra, so one oracle gates both)."""
    probes = _nearest_cells_int(
        _quantized(emb, id_col, vec_col).where(F.col("id") < query_ids_max),
        _cents_frame(emb.sparkSession, mc),
        n_probe,
        keep=("qv", "cm"),
    ).select(
        F.col("id").alias("q_id"),
        "cell",
        F.expr("zip_with(qv, cm, (x, y) -> x - y)").alias("rq"),
    )
    rr = (
        "aggregate(zip_with(rq, rq, (x, y) -> x * y), cast(0 as bigint),"
        " (acc, x) -> acc + x)"
    )
    adc = F.expr(f"({rr}) + " + " + ".join(_cb_case_terms(cb, "rq")))
    pairs = cands.join(F.broadcast(probes), "cell").where(
        F.col("cand_id") != F.col("q_id")
    )
    scored = pairs.select("q_id", "cand_id", adc.alias("adc"))
    w2 = Window.partitionBy("q_id").orderBy(F.asc("adc"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "cand_id", "adc")
    )


# --- persisted IVF-PQ index: build → persist → serve ------------------------
#
# The compressed-ANN index as a real ARTIFACT (the FAISS write_index /
# read_index lifecycle): coarse centroids, residual codebooks AND the
# encoded corpus land in a manifest-guarded parquet store; serving
# reads codes back and never touches the raw corpus vectors again
# (only the query side scans embeddings). The stored artifacts are
# exact integers, so served search == fit-and-search bit-for-bit and
# the SAME DuckDB oracle gates both.
#
# FAMILY CONTRACT — ids are IMMUTABLE: a vector id always names the
# same embedding (the FAISS model: an update is delete + add under a
# NEW id). Append's left_anti guard treats a seen id as already
# absorbed, and re-encode's verbatim-copy path classifies by (cell,
# centroid) alone — both would serve STALE codes for an id whose
# vector silently changed. Contrast the signature store, whose
# content IS mutable per doc and therefore uses FULL-ROW guards and
# last-seen-wins compaction (round-9). Mutating a vector under its
# existing id violates this store's contract everywhere, not just in
# one verb.

_ANN_INDEX_FORMAT = "ivfpq-int-index-v1"


def _index_manifest_path(path: str) -> str:
    from tabsketchfm_spark.sources.store_util import manifest_path

    return manifest_path(path)


def _index_params() -> dict:
    from tabsketchfm_spark.operators.kmeans import N_CELLS, N_ITERS

    return {
        "n_cells": N_CELLS,
        "n_iters": N_ITERS,
        "s_sub": S_SUB,
        "d_sub": D_SUB,
        "k_pq": K_PQ,
        "iters_pq": ITERS_PQ,
        "scale": SCALE,
    }


def save_ivfpq_index(
    spark,
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build + persist: fit (memo-shared with the in-memory queries),
    write centroids (cid, m), codebooks (s, c, m) and the encoded
    corpus codes (cand_id, cell, c0..c{S-1} — executor-side write, the
    index's data plane) into a FRESH generation subdir, then flip the
    manifest pointer atomically. A rebuild into an existing path that
    crashes mid-write must leave the previous generation live — an
    in-place rewrite under a constant manifest would serve torn
    mixed-generation artifacts that still pass the guard (round-8
    review finding)."""
    from tabsketchfm_spark.sources.store_util import writer_lease

    # the fit is store-independent; only the write/flip/GC section is
    # the writer-exclusive critical region
    mc, cb = ivfpq_fit(emb, id_col, vec_col)
    with writer_lease(path, owner="save_ivfpq_index"):
        _commit_generation(
            spark, path, _ivfpq_cands(emb, mc, cb, id_col, vec_col), mc, cb
        )


# base-store templates: one deterministic build per (session, corpus
# plan, index params), byte-copied per consumer — the lifecycle
# composites (registered rows, parity tests) each need their OWN
# mutable store, and before this cache each paid the full Spark build
# chain for an identical starting state (round-11 verdict item 1)
import threading as _threading

_BASE_STORE_TEMPLATES: dict[tuple, str] = {}
_TEMPLATE_BUILD_LOCK = _threading.Lock()  # one build per key, ever


def save_ivfpq_index_cached(
    spark,
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """save_ivfpq_index for DETERMINISTIC base builds into FRESH
    target dirs: the first call per (application, corpus plan, index
    params) builds normally into a private template dir; every later
    call byte-copies the committed artifacts into ``path``. The build
    is a pure function of the corpus frame (integer fits, seeded
    init, deterministic encode), so the copy is indistinguishable
    from a fresh build — same manifest, same generation layout.
    Application-id keyed (the round-10 memo rule); cleanup atexit;
    callers mutate only their copy. Plan-keyed like the fit memos, so
    it shares their IMMUTABLE-INPUT contract: rewriting the
    underlying files in-session and re-calling with the same plan
    serves the stale template (call clear_pq_memo / a fresh path for
    regenerated data — testdata lakes never change in-session).

    A target that ALREADY holds a manifest delegates to the direct
    ``save_ivfpq_index`` — the copy path has neither the
    foreign-store guard nor the fresh-generation atomic-flip
    protocol, so rebuild-over-existing-store semantics (refusal for
    other families, keep-previous-generation for ivfpq) must come
    from the guarded writer (review finding: a bare copytree would
    silently overwrite a mistyped signature store's manifest and the
    next commit would GC its generations)."""
    import atexit
    import os
    import shutil
    import tempfile

    from tabsketchfm_spark.sources.store_util import (
        manifest_exists,
        writer_lease,
    )

    if manifest_exists(path):
        save_ivfpq_index(spark, emb, path, id_col, vec_col)
        return
    key = (
        spark.sparkContext.applicationId,
        emb._jdf.semanticHash(),
        id_col,
        vec_col,
        tuple(sorted(_index_params().items())),
    )
    with _TEMPLATE_BUILD_LOCK:
        tpl = _BASE_STORE_TEMPLATES.get(key)
        if tpl is None or not os.path.isdir(tpl):
            tpl = tempfile.mkdtemp(prefix="tsfm_ivfpq_tpl_")
            try:
                save_ivfpq_index(spark, emb, tpl, id_col, vec_col)
            except BaseException:
                shutil.rmtree(tpl, ignore_errors=True)  # no half-built leak
                raise
            _BASE_STORE_TEMPLATES[key] = tpl
            atexit.register(shutil.rmtree, tpl, ignore_errors=True)
    # lease the (fresh) target for the copy window — a concurrent
    # writer to the same destination must conflict loudly, same as on
    # the direct path
    with writer_lease(path, owner="save_ivfpq_index_cached"):
        shutil.copytree(
            tpl,
            path,
            dirs_exist_ok=True,
            ignore=shutil.ignore_patterns("_writer.lease"),
        )


def _commit_generation(spark, path: str, codes_df: DataFrame, mc, cb) -> None:
    """Write (codes, centroids, codebooks) into a FRESH generation
    subdir, flip the manifest pointer, then GC superseded generations —
    the shared full-rebuild commit (save and re-encode). Caller holds
    the writer lease. GC runs AFTER the flip succeeds (round-8 advice:
    repeated rebuilds into a long-lived store leaked every old gen
    dir); the immediately previous generation is kept for crash
    recovery — a reader that resolved the old manifest just before the
    flip may still be scanning it; everything older is unreachable."""
    import os
    import shutil
    import uuid

    from tabsketchfm_spark.sources.store_util import read_manifest, write_manifest

    gen = f"gen_{uuid.uuid4().hex[:12]}"
    gc_enabled = True
    try:
        old_manifest = read_manifest(path)
    except FileNotFoundError:
        old_manifest = None  # fresh store: nothing to keep or sweep
    except Exception:
        # CORRUPT manifest (unreadable/unparseable): the foreign-store
        # guard and the keep-previous-generation rule below both need
        # the manifest's pointers, so with them gone the GC has no safe
        # basis — a corrupt SIGNATURE store at a mistyped path would
        # lose every gen_* dir, and a corrupt ivfpq store's live
        # generation would be swept out from under concurrent readers.
        # Rebuild proceeds (the sanctioned recovery path) but keeps ALL
        # existing gen_* dirs; the next healthy commit GCs them
        # (round-11 ADVICE — mirrors the signature-store sweep's
        # never-delete-on-corrupt rule).
        old_manifest = None
        gc_enabled = False
    if (
        old_manifest is not None
        and old_manifest.get("format") != _ANN_INDEX_FORMAT
    ):
        # a PARSEABLE manifest of another store family means a mistyped
        # path — proceeding would overwrite that store's manifest AND
        # the gen-GC below would delete its generation dirs (signature
        # stores use gen_<uuid> too). Same class as the cluster_store
        # re-init guard (ADVICE r10); geometry changes within THIS
        # format are a legitimate rebuild and pass.
        raise IOError(
            f"store at {path} is {old_manifest.get('format')!r}, not an "
            "ivfpq index — refusing to rebuild over it"
        )
    prev_gen = old_manifest.get("data_dir") if old_manifest else None
    # codes are the executor-side data plane (corpus-sized) — Spark
    # write; centroids/codebooks are driver-resident k/64-row dicts —
    # direct pyarrow commit (a Spark job per tiny artifact cost ~1s of
    # scheduler round-trip PER COMMIT, several per lifecycle verb and
    # per streaming micro-batch; round-12 suite/window latency work)
    import pyarrow as pa

    from tabsketchfm_spark.sources.store_util import write_small_parquet

    codes_df.write.mode("overwrite").parquet(f"{path}/{gen}/codes")
    write_small_parquet(
        f"{path}/{gen}/centroids",
        [(cid, mc[cid]) for cid in sorted(mc)],
        pa.schema([("cid", pa.int32()), ("m", pa.list_(pa.int64()))]),
    )
    write_small_parquet(
        f"{path}/{gen}/codebooks",
        [(s, c, cb[(s, c)]) for s, c in sorted(cb)],
        pa.schema(
            [("s", pa.int32()), ("c", pa.int32()), ("m", pa.list_(pa.int64()))]
        ),
    )
    write_manifest(
        path, {"format": _ANN_INDEX_FORMAT, "data_dir": gen, **_index_params()}
    )
    if not gc_enabled:
        return
    keep = {gen, prev_gen}
    for d in os.listdir(path):
        if d.startswith("gen_") and d not in keep:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)


def _read_index_manifest(path: str) -> tuple[dict, str, list[str], list[str]]:
    """Validated manifest read shared by EVERY store entry point (load,
    append, compact): loud IOError on a format/parameter mismatch —
    pointing any of them at a different store_util store or a
    geometry-mismatched index must never silently no-op. Returns
    (manifest, gen, code_dirs, retired_code_dirs)."""
    from tabsketchfm_spark.sources.store_util import read_manifest

    m = read_manifest(path)
    chk = dict(m)
    gen = chk.pop("data_dir", None)
    code_dirs = chk.pop("code_dirs", ["codes"])
    retired = chk.pop("retired_code_dirs", [])
    want = {"format": _ANN_INDEX_FORMAT, **_index_params()}
    if chk != want or not gen:
        raise IOError(
            f"ivfpq index at {path} was built as {chk} (data_dir={gen}); "
            f"this build expects {want}"
        )
    return m, gen, code_dirs, retired


def load_ivfpq_index(spark, path: str):
    """(mc, cb, codes_frame) from a saved index; loud on any parameter
    mismatch — centroids trained under another grid/codebook geometry
    would silently mis-rank every query. All artifact reads go through
    the manifest's generation pointer; the codes frame is the UNION of
    the base build and every appended delta dir (``code_dirs``)."""
    from tabsketchfm_spark.sources.store_util import read_small_parquet

    _m, gen, code_dirs, _retired = _read_index_manifest(path)
    # quantizer artifacts are driver-resident state — direct pyarrow
    # read (two Spark collect jobs per load were pure scheduler cost;
    # the reader accepts legacy Spark-written part layouts unchanged)
    mc = {
        int(r["cid"]): [int(v) for v in r["m"]]
        for r in read_small_parquet(f"{path}/{gen}/centroids")
    }
    cb = {
        (int(r["s"]), int(r["c"])): [int(v) for v in r["m"]]
        for r in read_small_parquet(f"{path}/{gen}/codebooks")
    }
    codes = spark.read.parquet(*[f"{path}/{gen}/{d}" for d in code_dirs])
    return mc, cb, codes


def ivfpq_store_append(
    spark,
    path: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Index MAINTENANCE: absorb a delta batch WITHOUT retraining —
    the other half of the drift story (ivfpq_index_drift decides WHEN
    to rebuild; until then, appends keep the index serving the full
    lake). Append = encode with the STORED quantizers (exact, no
    approximation is introduced beyond the quantizers themselves):
    delta codes land in a fresh ``codes_delta_<uuid>`` dir inside the
    live generation, then the manifest's ``code_dirs`` list flips
    atomically. A crash before the flip leaves an unreferenced dir,
    never a torn read; serving scans the code-dir union and still
    never touches corpus vectors. Work scales with the delta (plus one
    single-column scan of the stored ids for the already-present
    guard: a RETRIED batch — crash between the parquet write and the
    manifest flip, then re-append — must not double-encode an id, or
    the serving union scores it twice and drift double-counts it).
    Writer-exclusive via the store lease: the manifest code_dirs RMW
    is where two concurrent appends would lose one delta."""
    from tabsketchfm_spark.sources.store_util import writer_lease

    with writer_lease(path, owner="ivfpq_store_append", require_store=True):
        mc, cb, codes = load_ivfpq_index(spark, path)  # validates params
        _append_locked(
            spark, path, _ivfpq_cands(delta, mc, cb, id_col, vec_col), codes
        )


def _append_locked(
    spark, path: str, cands: DataFrame, codes: DataFrame,
    guarded: bool = False,
) -> None:
    """The append write section — caller holds the writer lease and
    supplies the encoded delta ``cands`` plus the current stored
    ``codes`` frame (so a composite verb encodes the delta ONCE and
    keeps one lease across its whole read-modify-write sequence).
    ``guarded=True`` when the caller already left_anti-filtered the
    retried-batch duplicates (the composite measures its drift on
    exactly that slice — re-filtering would re-scan the stored ids)."""
    import uuid

    from tabsketchfm_spark.sources.store_util import write_manifest

    m, gen, code_dirs, _retired = _read_index_manifest(path)
    sub = f"codes_delta_{uuid.uuid4().hex[:12]}"
    fresh = (
        cands
        if guarded
        else cands.join(codes.select("cand_id"), "cand_id", "left_anti")
    )
    fresh.write.mode("overwrite").parquet(f"{path}/{gen}/{sub}")
    m["code_dirs"] = code_dirs + [sub]
    write_manifest(path, m)


def _validated_gen_dir(path: str, gen: str) -> str:
    from tabsketchfm_spark.sources.store_util import safe_subdir

    gen_dir = safe_subdir(path, gen, "gen_")
    if gen_dir is None:
        raise IOError(
            f"index store at {path} has a malformed data_dir "
            f"{gen!r} in its manifest — refusing maintenance"
        )
    return gen_dir


def _sweep_retired_code_dirs(gen_dir: str, dirs: list[str]) -> None:
    """Deferred one-cycle GC, shared by compact and delete: the
    previous cycle's retired dirs (their readers are gone by now) and
    any code dir referenced by NEITHER list (a maintenance call that
    crashed before its flip — under the lease, never a live concurrent
    append). Every manifest-recorded name is PATH-VALIDATED and
    checked against the live list before the rmtree — a corrupt
    manifest ('..', absolute, nested, or a retired entry aliasing a
    live dir) must never delete live data or escape the store: the
    loop walks ACTUAL listdir entries — always bare child names — and
    deletes only codes-prefixed dirs absent from the live list, so a
    corrupt retired value simply never matches anything (the retired
    list itself needs no separate pass — every on-disk retired dir is
    by definition a listdir entry this loop covers)."""
    import os
    import shutil

    referenced = set(dirs)
    for e in os.listdir(gen_dir):
        if (
            e.startswith("codes")
            and e not in referenced
            and os.path.isdir(f"{gen_dir}/{e}")
        ):
            shutil.rmtree(f"{gen_dir}/{e}", ignore_errors=True)


def ivfpq_store_compact(spark, path: str) -> None:
    """Merge the appended code dirs into ONE: a store absorbing a
    daily delta grows a code_dirs entry per batch, and every serve
    scans the whole list — compaction reads the union, rewrites it
    into a fresh dir inside the live generation, flips
    code_dirs=[new] atomically (the signature-store compaction's
    sibling; no TTL rule here — codes never expire, they are
    superseded by retrain). The stored integers are copied verbatim,
    so every serve/drift oracle is unaffected.

    GC is DEFERRED one cycle (the store family's concurrent-reader
    invariant, same as save_ivfpq_index keeping the previous
    generation): the retired dirs are recorded in the manifest as
    ``retired_code_dirs`` and deleted on the NEXT maintenance call —
    a serve that resolved the old list just before the flip can
    finish its scan. Every call also sweeps unreferenced code dirs
    (orphans from a maintenance call that crashed before its flip),
    so no crash window leaks permanently.

    WRITER-EXCLUSIVE via the store lease (manifest flips are
    read-modify-write, and the orphan sweep would delete a concurrent
    append's not-yet-flipped delta dir — the lease serializes both).
    Concurrent READERS remain safe without any lease — the deferred
    GC exists exactly for them."""
    import uuid

    from tabsketchfm_spark.sources.store_util import write_manifest, writer_lease

    with writer_lease(path, owner="ivfpq_store_compact", require_store=True):
        m, gen, dirs, retired = _read_index_manifest(path)
        gen_dir = _validated_gen_dir(path, gen)
        _sweep_retired_code_dirs(gen_dir, dirs)
        if len(dirs) <= 1:
            if retired:
                write_manifest(path, {**m, "retired_code_dirs": []})
            return
        codes = spark.read.parquet(*[f"{gen_dir}/{d}" for d in dirs])
        sub = f"codes_{uuid.uuid4().hex[:12]}"
        codes.write.mode("overwrite").parquet(f"{gen_dir}/{sub}")
        write_manifest(
            path, {**m, "code_dirs": [sub], "retired_code_dirs": dirs}
        )


def ivfpq_store_delete(spark, path: str, delete_pred: str) -> None:
    """Remove vectors from the persisted index WITHOUT retraining —
    the store family's missing lifecycle verb (append absorbs arriving
    docs; deletion is what aged-out crawls and GDPR erasure need; the
    FAISS analogue is remove_ids). Read the code-dir union, keep rows
    NOT matching ``delete_pred`` (a predicate over ``cand_id``),
    rewrite the survivors verbatim into a fresh code dir, flip
    ``code_dirs=[new]`` atomically. Quantizers are untouched and the
    surviving integers are copied bit-for-bit, so the full-encode
    oracle restricted to survivors gates the store exactly, and every
    serve after the delete simply stops seeing the deleted ids (their
    codes are physically gone after the deferred GC cycle — the
    erasure story, not a tombstone mask). Also an implicit compaction
    (one dir afterwards). Deferred one-cycle GC + writer lease, the
    compaction pattern; idempotent (re-running the same delete keeps
    an already-filtered set unchanged)."""
    import uuid

    from tabsketchfm_spark.sources.store_util import write_manifest, writer_lease

    with writer_lease(path, owner="ivfpq_store_delete", require_store=True):
        m, gen, dirs, retired = _read_index_manifest(path)
        gen_dir = _validated_gen_dir(path, gen)
        # previous cycle's retired dirs + pre-flip orphans go now
        # (their readers are gone); THIS cycle's dirs are retired
        # below and survive until the next maintenance call
        _sweep_retired_code_dirs(gen_dir, dirs)
        codes = spark.read.parquet(*[f"{gen_dir}/{d}" for d in dirs])
        survivors = codes.where(f"NOT ({delete_pred})")
        sub = f"codes_{uuid.uuid4().hex[:12]}"
        survivors.write.mode("overwrite").parquet(f"{gen_dir}/{sub}")
        write_manifest(
            path,
            {**m, "code_dirs": [sub], "retired_code_dirs": dirs},
        )


def ivfpq_store_delete_oracle_sql(
    table: str, keep_sql: str, bounded_mod: int | None = 17
) -> str:
    """ivfpq_store_delete's twin: the FULL-corpus encode replay
    (fit + residual codes, _corpus_encode_ctes) restricted to the
    surviving ids — deletion copies integers verbatim, so survivors
    must match the full encode bit-for-bit. ``keep_sql`` is the keep
    predicate over ``cand_id``."""
    ctes, _cfinal, _rcents, rcodes = _corpus_encode_ctes(table)
    ctes.append(f"allcodes AS MATERIALIZED ({_codes_pivot_sql(rcodes)})")
    ctes.append(
        f"fullcodes AS MATERIALIZED (SELECT * FROM allcodes WHERE {keep_sql})"
    )
    if bounded_mod is None:
        return "WITH " + ",\n".join(ctes) + "\nSELECT * FROM fullcodes\n"
    return "WITH " + ",\n".join(ctes) + _bounded_codes_tail("fullcodes", bounded_mod)


REENCODE_ITERS = 2


def warm_start_centroids(
    emb: DataFrame,
    mc_old: dict[int, list[int]],
    extra_iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, list[int]]:
    """``extra_iters`` more integer Lloyd rounds over the CURRENT
    corpus, seeded from the stored centroids — per round the same
    algebra as the cold fit (kmeans.cell_aggregate assignment +
    floor-div half-up update; an empty cell keeps its previous
    centroid), so the DuckDB replay is the unchanged round CTE with
    the init SELECT overridden to the stored centroids."""
    from tabsketchfm_spark.operators.kmeans import _lloyd_centroids

    mc = {cid: list(v) for cid, v in mc_old.items()}
    if extra_iters <= 0:
        return mc
    q = _quantized(emb, id_col, vec_col).persist()
    try:
        return _lloyd_centroids(
            q, len(mc), extra_iters, S_SUB * D_SUB, init=mc
        )
    finally:
        q.unpersist()


def _decode_codes(
    codes: DataFrame,
    mc: dict[int, list[int]],
    cb: dict[tuple[int, int], list[int]],
) -> DataFrame:
    """(id, qv): EXACT integer reconstruction of encoded vectors —
    qv_rec = centroid[cell] + concat_s codebook[(s, c_s)]. Pure
    expression (two map-literal lookups + one zip_with; no join, no
    shuffle): centroids and codebooks are driver-side dicts already.
    The reconstruction lives on the same integer grid as the encode
    inputs (the grid is closed under addition), so downstream integer
    algebra — warm Lloyd rounds, assignment, residual re-encode — is
    bit-exact over it."""

    def arr(v: list[int]) -> str:
        return "array(" + ", ".join(f"{int(x)}L" for x in v) + ")"

    mc_map = (
        "map(" + ", ".join(f"{cid}, {arr(mc[cid])}" for cid in sorted(mc)) + ")"
    )
    parts = []
    for s in range(S_SUB):
        cbs = {c: cb[(ss, c)] for (ss, c) in cb if ss == s}
        m = (
            "map(" + ", ".join(f"{c}, {arr(cbs[c])}" for c in sorted(cbs)) + ")"
        )
        parts.append(f"element_at({m}, c{s})")
    expr = (
        f"zip_with(element_at({mc_map}, cell), "
        f"concat({', '.join(parts)}), (x, y) -> x + y)"
    )
    return codes.select(
        F.col("cand_id").alias("id"), F.expr(expr).alias("qv")
    )


def ivfpq_decode_stored(spark, path: str) -> DataFrame:
    """Reconstruct every indexed vector from the persisted codes alone
    — (id, qv) on the integer grid, never touching the raw corpus
    (the FAISS reconstruct_n analogue). Exact integer arithmetic;
    reconstruction error vs the ORIGINAL vectors is whatever the
    quantizers lost (ivfpq_reconstruction_error measures it)."""
    mc, cb, codes = load_ivfpq_index(spark, path)
    return _decode_codes(codes, mc, cb)


def ivfpq_store_reencode(
    spark,
    path: str,
    emb: DataFrame | None,
    extra_iters: int = REENCODE_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Index maintenance, the REBUILD half made incremental (the
    store family's last missing verb: append absorbs, delete forgets,
    re-encode RETARGETS after drift says rebuild — the FAISS analogue
    is retraining the coarse quantizer and re-adding). A cold
    ``save_ivfpq_index`` refits everything from scratch; this verb
    instead warm-starts the coarse centroids FROM THE STORE with
    ``extra_iters`` integer Lloyd rounds over the current corpus,
    keeps the residual codebooks FROZEN, and PQ-re-encodes ONLY the
    vectors whose coarse geometry changed: a stored code depends on
    nothing but (vector, its cell's centroid, codebooks), so every
    vector whose new cell id equals its stored cell AND whose centroid
    didn't move keeps its stored codes bit-for-bit — those rows are
    copied verbatim, never re-encoded. Work: one cheap expression-only
    (id, cell) projection over the corpus (unavoidable — assignment is
    global), the expensive S×K codeword encode only over the stale
    subset. At a converged store (a re-run with unchanged corpus and
    centroids at their Lloyd fixpoint) everything copies.

    Corpus contract: the result is exactly the encode of ``emb`` under
    (warm centroids, frozen codebooks) — stored ids absent from
    ``emb`` are dropped (re-encode resyncs the index to the corpus it
    is given), new ids are encoded fresh. The verbatim-copy proof
    leans on the FAMILY'S immutable-id contract (see the section
    comment above): a vector mutated under its existing id would keep
    its stale codes here exactly as append would skip it — updates
    arrive as delete + add under a new id. Commits as a FULL fresh
    generation (centroids moved, so the old generation's artifacts are
    inconsistent with the new ones) via the shared commit helper:
    atomic pointer flip, previous generation kept one cycle for
    concurrent readers. Writer-exclusive via the store lease."""
    from tabsketchfm_spark.sources.store_util import writer_lease

    with writer_lease(path, owner="ivfpq_store_reencode", require_store=True):
        mc_old, cb, codes_old = load_ivfpq_index(spark, path)
        # emb=None: the autorefresh twin's store-derived corpus
        # default — retarget over the exact integer reconstructions of
        # the stored codes (the index IS the caller's only copy);
        # equal to the explicit-corpus call exactly when the codes
        # reconstruct the lake exactly. NOT idempotent at nonzero
        # quantization error: each store-derived resync re-quantizes
        # the PREVIOUS call's reconstructions, so error compounds
        # across repeated corpus-less maintenance — a periodic loop
        # should pass the real corpus when it has one (review finding;
        # same caveat on the autorefresh default)
        _reencode_locked(
            spark, path, emb, extra_iters, id_col, vec_col, mc_old, cb,
            codes_old,
            pre_quantized=(
                _decode_codes(codes_old, mc_old, cb) if emb is None else None
            ),
        )


def _reencode_locked(
    spark,
    path: str,
    emb: DataFrame | None,
    extra_iters: int,
    id_col: str,
    vec_col: str,
    mc_old: dict[int, list[int]],
    cb: dict[tuple[int, int], list[int]],
    codes_old: DataFrame,
    pre_quantized: DataFrame | None = None,
) -> None:
    """The re-encode work section — caller holds the writer lease and
    supplies the loaded store artifacts (so a composite verb keeps ONE
    lease across its whole read-modify-write sequence and never loads
    the index twice). The corpus quantizes ONCE: the persisted frame
    feeds the warm Lloyd rounds, the new assignment AND the stale-
    subset encode (round-11 review — the verb's hot path is corpus
    scans). ``pre_quantized`` supplies an ALREADY-GRID (id, qv) frame
    instead of ``emb`` (the store-derived decoded corpus): every
    downstream consumer — Lloyd, assignment, residual encode — reads
    only (id, qv)."""
    from tabsketchfm_spark.operators.kmeans import _lloyd_centroids

    q = (
        pre_quantized if pre_quantized is not None
        else _quantized(emb, id_col, vec_col)
    ).persist()
    joined = None
    try:
        # loud floor guard: a resync is DESTRUCTIVE (the committed
        # generation replaces the stored codes, and the old one is
        # GC'd a cycle later) — an accidentally-empty corpus (wrong
        # filter, stale view, delta passed as corpus by mistake) must
        # never silently erase the index. Intentional shrinks pass a
        # real survivor frame; there is no legitimate empty resync.
        if q.limit(1).count() == 0:
            raise ValueError(
                "ivfpq re-encode: empty corpus — refusing to resync "
                "the index to nothing (this would erase every stored "
                "code); pass the full post-append corpus frame"
            )
        mc = (
            _lloyd_centroids(q, len(mc_old), extra_iters, S_SUB * D_SUB,
                             init=mc_old)
            if extra_iters > 0
            else {cid: list(v) for cid, v in mc_old.items()}
        )
        moved = sorted(cid for cid in mc if mc[cid] != mc_old[cid])
        asg = q.select("id", *_b_exprs(mc)).select(
            "id", _bk_col(len(mc)).cast("int").alias("cell")
        )
        joined = asg.join(
            codes_old.withColumnRenamed("cand_id", "id").withColumnRenamed(
                "cell", "old_cell"
            ),
            "id",
            "left",
        ).persist()  # two consumers: the copied rows and the stale ids
        moved_lit = (
            F.col("cell").isin([int(c) for c in moved])
            if moved
            else F.lit(False)
        )
        stale = (
            F.col("old_cell").isNull()
            | (F.col("cell") != F.col("old_cell"))
            | moved_lit
        )
        copied = joined.where(~stale).select(
            F.col("id").alias("cand_id"),
            "cell",
            *[F.col(f"c{s}") for s in range(S_SUB)],
        )
        stale_ids = joined.where(stale).select("id")
        fresh = _cands_from_q(q.join(stale_ids, "id", "left_semi"), mc, cb)
        _commit_generation(spark, path, copied.unionByName(fresh), mc, cb)
    finally:
        if joined is not None:
            joined.unpersist()
        q.unpersist()


def ivfpq_store_reencode_oracle_sql(
    table: str,
    boundary: int,
    extra_iters: int = REENCODE_ITERS,
    bounded_mod: int | None = 17,
) -> str:
    """Re-encode's twin: the incremental result must equal the FULL
    encode of the corpus under (warm-started centroids, frozen
    codebooks) — codes depend only on (vector, its centroid,
    codebooks), so copied rows are bit-equal by construction, and a
    copy/stale misclassification, a missed stale vector, or a
    quietly-retrained codebook all land in the position-weighted code
    checksums. Replay: cold coarse fit + frozen residual codebooks on
    the BUILD slice (id < ``boundary``), ``extra_iters`` warm Lloyd
    rounds over ALL points seeded from the build centroids, then every
    point assigned + residual-encoded against the WARM centroids with
    the frozen codebooks. (What was appended between build and
    re-encode is irrelevant to the final state — the resync contract.)"""
    from tabsketchfm_spark.operators.kmeans import N_CELLS, N_ITERS

    dim = S_SUB * D_SUB
    ctes = _base_ctes(table, dim)
    ctes.append(
        f"cpts AS MATERIALIZED (SELECT * FROM pts WHERE id < {boundary})"
    )
    kctes, cfinal = _kmeans_ctes(
        table, N_CELLS, N_ITERS, dim, base=False, pts="cpts"
    )
    ctes.extend(kctes)
    # frozen codebooks: trained on the BUILD slice's residuals against
    # the BUILD centroids — exactly what the store holds
    ctes.extend(_residual_ctes(cfinal, "cpts", "acell0", "rfit"))
    pctes, rcents, _fit_codes = _pq_ctes(
        table, src="rfit", tag="r", base=False, emit_codes=False
    )
    ctes.extend(pctes)
    # warm-start rounds over the CURRENT corpus, seeded from the build
    # centroids — the unchanged Lloyd round CTE, init overridden
    wctes, wfinal = _kmeans_ctes(
        table,
        N_CELLS,
        extra_iters,
        dim,
        prefix="w",
        base=False,
        pts="pts",
        init_sql=f"SELECT cid, m FROM {cfinal}",
    )
    ctes.extend(wctes)
    ctes.extend(_residual_ctes(wfinal, "pts", "acell", "rpts"))
    ctes.append(_explode_sub_cte("wexq", "rpts"))
    ctes.append(_codes_assign_cte("wcodes_long", "wexq", rcents))
    full = _codes_pivot_sql("wcodes_long")
    if bounded_mod is None:
        return "WITH " + ",\n".join(ctes) + "\n" + full + "\n"
    ctes.append(f"fullcodes AS MATERIALIZED ({full})")
    return "WITH " + ",\n".join(ctes) + _bounded_codes_tail(
        "fullcodes", bounded_mod
    )


def coarse_drift_ppm(cells) -> tuple[int, int, int]:
    """The coarse-cell L1 drift statistic from the (s = -1) rows of
    ivfpq_index_drift, in EXACT integers (python bigints — no float
    between the counts and the decision): returns (C, D, S) where
    C/D are corpus/delta totals and S = Σ|delta_cnt·C − corpus_cnt·D|,
    so the normalized L1 distance is S/(C·D) and the ppm comparison
    `10^6·S >= threshold_ppm·C·D` is overflow-free on both engines
    (python bigint here, HUGEINT in the replay)."""
    C = sum(int(r["corpus_cnt"]) for r in cells)
    D = sum(int(r["delta_cnt"]) for r in cells)
    S = sum(
        abs(int(r["delta_cnt"]) * C - int(r["corpus_cnt"]) * D) for r in cells
    )
    return C, D, S


def ivfpq_store_autorefresh(
    spark,
    path: str,
    delta: DataFrame,
    corpus: DataFrame | None,
    threshold_ppm: int,
    extra_iters: int = REENCODE_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> bool:
    """The maintenance loop CLOSED: measure the arriving delta's
    coarse-cell drift against the stored distribution, ABSORB the
    delta (append, frozen quantizers), and — iff the normalized L1
    drift is at least ``threshold_ppm`` parts-per-million — RETARGET
    the index (warm re-encode over ``corpus``, the post-append lake).
    The decision itself is exact integer arithmetic over one
    N_CELLS-row collect, so the whole branch is replayable as a
    DuckDB scalar subquery and the composite stays oracle-gated on
    EITHER path. Returns whether the retarget fired. Empty delta or
    empty store never triggers (0 ≥ 0 would otherwise fire
    spuriously).

    ONE writer lease wraps the whole measure→absorb→retarget sequence
    (round-11 review): the composite is a multi-step store RMW, and
    per-step leases would let a concurrent writer commit BETWEEN the
    append and the re-encode — the re-encode resyncs to ``corpus`` and
    would silently erase that commit with no lease conflict. The index
    loads once and the delta encodes once (the drift counts and the
    appended rows share one persisted frame).

    RETRY IDEMPOTENCE (round-11 review, second pass): the drift is
    measured on the NOT-YET-STORED slice of the delta (the same
    left_anti guard the append uses) — an at-least-once redelivered
    batch measures D = 0, triggers nothing and appends nothing, so a
    crash-and-redeliver can never flip the decision the first delivery
    took. A D = 0 batch (empty, or fully duplicate) also skips the
    append entirely: the designed zero-row micro-batches of a streamed
    feed must not grow code_dirs by one empty dir each. Registered
    deltas are disjoint new-id batches, where the guarded and raw
    distributions coincide — the oracle's ddist replays exactly that
    contract.

    ``corpus=None`` (round-11 verdict item 5) derives the retarget
    corpus FROM THE STORE: the post-append codes are decoded back to
    the integer grid (``_decode_codes`` — exact integer arithmetic)
    and the warm re-encode runs over those reconstructions — for
    callers without the lake frame at hand (the index IS their only
    copy). Equal to the explicit-corpus call exactly when the codes
    reconstruct the lake exactly (zero quantization error — pinned by
    test); otherwise the retarget trains on reconstructions, the
    memory-bounded path, still deterministic and store-consistent —
    but NOT idempotent across repeated corpus-less calls: each one
    re-quantizes the previous call's reconstructions, so quantization
    error compounds; a periodic maintenance loop should pass the real
    corpus when it has one. Registered parity rows pass the corpus
    explicitly — their oracle replays the lake-corpus branch."""
    from tabsketchfm_spark.sources.store_util import writer_lease

    with writer_lease(path, owner="ivfpq_store_autorefresh", require_store=True):
        mc, cb, codes = load_ivfpq_index(spark, path)
        fresh = (
            _ivfpq_cands(delta, mc, cb, id_col, vec_col)
            .join(codes.select("cand_id"), "cand_id", "left_anti")
            .persist()
        )
        try:
            # loud intra-batch uniqueness (round-11 ADVICE): the
            # left_anti guard only covers ids ALREADY stored — a delta
            # carrying the same vec_id twice would be double-counted in
            # the drift decision and appended twice (duplicate cand_ids
            # then double-scored by serving). Enforce the documented
            # disjoint-batch contract the way the family's other
            # preconditions are enforced: one global aggregate, fail
            # before any decision or write. Global (not per-cell):
            # duplicate ids with DIFFERENT vectors can land in
            # different cells.
            ur = fresh.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("cand_id").alias("nd"),
            ).collect()[0]
            if int(ur["n"]) != int(ur["nd"]):
                raise ValueError(
                    "ivfpq_store_autorefresh: delta batch carries "
                    f"{int(ur['n']) - int(ur['nd'])} duplicate vec_id "
                    "row(s) — batches must be id-disjoint (dedup the "
                    "delta before the maintenance call)"
                )
            ccnt = {
                int(r["cell"]): int(r["n"])
                for r in codes.groupBy("cell")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            dcnt = {
                int(r["cell"]): int(r["n"])
                for r in fresh.groupBy("cell")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            # the spine is every coarse cell; absent counts are zeros —
            # identical to ivfpq_index_drift's s = -1 rows, which only
            # materialize (cell) keys with a nonzero side (zero terms
            # contribute nothing to S)
            cells = [
                {"corpus_cnt": ccnt.get(cid, 0), "delta_cnt": dcnt.get(cid, 0)}
                for cid in sorted(mc)
            ]
            C, D, S = coarse_drift_ppm(cells)
            trig = C > 0 and D > 0 and 1_000_000 * S >= threshold_ppm * C * D
            if D > 0:
                _append_locked(spark, path, fresh, codes, guarded=True)
        finally:
            fresh.unpersist()
        if trig:
            # re-read ONLY the codes frame under the SAME lease (it
            # must now include the just-appended dir — the copy base
            # of the re-encode); mc/cb are unchanged by an append, so
            # re-collecting them would be two redundant driver jobs
            _m2, gen2, code_dirs2, _r2 = _read_index_manifest(path)
            codes2 = spark.read.parquet(
                *[f"{path}/{gen2}/{d}" for d in code_dirs2]
            )
            _reencode_locked(
                spark, path, corpus, extra_iters, id_col, vec_col,
                mc, cb, codes2,
                pre_quantized=(
                    _decode_codes(codes2, mc, cb) if corpus is None else None
                ),
            )
    return trig


def _drift_decision_ctes(
    tag: str, corpus_cells: str, delta_cells: str, threshold_ppm: int
) -> tuple[list[str], str]:
    """ONE copy of the exact-integer drift-decision SQL (round-7
    SQL-drift rule; the batch composite and every streamed batch share
    it): coarse-cell count distributions of ``corpus_cells`` vs
    ``delta_cells`` (both (id, cell) CTEs) over the shared ``spine``
    of cell ids, then the ppm trigger as a one-row CTE. HUGEINT
    products — counts × counts overflow BIGINT at lake scale. Returns
    (ctes, decision_cte); SELECT trig FROM <decision_cte>."""
    cd, dd = f"{tag}cdist", f"{tag}ddist"
    tt, dec = f"{tag}tots", f"{tag}decision"
    ctes = [
        f"{cd} AS MATERIALIZED (SELECT sp.cell, coalesce(t.cnt, 0) AS c "
        f"FROM spine sp LEFT JOIN (SELECT cell, count(*) AS cnt FROM "
        f"{corpus_cells} GROUP BY cell) t ON t.cell = sp.cell)",
        f"{dd} AS MATERIALIZED (SELECT sp.cell, coalesce(t.cnt, 0) AS c "
        f"FROM spine sp LEFT JOIN (SELECT cell, count(*) AS cnt FROM "
        f"{delta_cells} GROUP BY cell) t ON t.cell = sp.cell)",
        f"{tt} AS MATERIALIZED (SELECT (SELECT sum(c) FROM {cd}) AS tc, "
        f"(SELECT sum(c) FROM {dd}) AS td)",
        f"{dec} AS MATERIALIZED (SELECT "
        f"(SELECT tc FROM {tt}) > 0 AND (SELECT td FROM {tt}) > 0 AND "
        f"1000000 * (SELECT sum(abs(CAST(d.c AS HUGEINT) * (SELECT tc FROM {tt})"
        f" - CAST(c2.c AS HUGEINT) * (SELECT td FROM {tt}))) "
        f"FROM {cd} c2 JOIN {dd} d USING (cell)) >= "
        f"CAST({threshold_ppm} AS HUGEINT) * (SELECT tc FROM {tt}) * "
        f"(SELECT td FROM {tt}) AS trig)",
    ]
    return ctes, dec


def ivfpq_store_autorefresh_oracle_sql(
    table: str,
    boundary: int,
    threshold_ppm: int,
    extra_iters: int = REENCODE_ITERS,
    bounded_mod: int | None = 17,
) -> str:
    """Autorefresh's twin — the DATA-DEPENDENT branch replayed in SQL
    (the BPE/pagerank scalar-subquery pattern): build-slice fit +
    frozen codebooks, the coarse-cell distributions of the build slice
    vs the delta (both assigned against the BUILD centroids — the
    stored codes at decision time), the exact-integer ppm trigger as a
    one-row ``decision`` CTE, and BOTH branch encodes (frozen
    append-equivalent vs warm re-encode) with the final SELECT picking
    the branch the trigger chose. Any divergence — a wrong decision, a
    branch applied to the wrong corpus, a quietly-retrained codebook —
    lands in the code checksums."""
    from tabsketchfm_spark.operators.kmeans import N_CELLS, N_ITERS

    dim = S_SUB * D_SUB
    ctes = _base_ctes(table, dim)
    ctes.append(
        f"cpts AS MATERIALIZED (SELECT * FROM pts WHERE id < {boundary})"
    )
    kctes, cfinal = _kmeans_ctes(
        table, N_CELLS, N_ITERS, dim, base=False, pts="cpts"
    )
    ctes.extend(kctes)
    ctes.extend(_residual_ctes(cfinal, "cpts", "acell0", "rfit"))
    pctes, rcents, _fit_codes = _pq_ctes(
        table, src="rfit", tag="r", base=False, emit_codes=False
    )
    ctes.extend(pctes)
    # the decision: coarse-cell L1 between build slice and delta,
    # exact integers (HUGEINT products — counts × counts overflow
    # BIGINT at lake scale)
    ctes.append(
        f"dpts AS MATERIALIZED (SELECT * FROM pts WHERE id >= {boundary})"
    )
    ctes.append(
        "dcell AS MATERIALIZED (SELECT id, cid AS cell FROM ("
        f"{_ranked_cells_sql(cfinal, pts='dpts')}) z WHERE rn = 1)"
    )
    ctes.append(f"spine AS (SELECT DISTINCT cid AS cell FROM {cfinal})")
    dctes, dec = _drift_decision_ctes("", "acell0", "dcell", threshold_ppm)
    ctes.extend(dctes)
    # each branch's point source is GATED by the trigger scalar, so
    # the dead branch's whole encode chain runs over zero rows —
    # DuckDB evaluates every MATERIALIZED CTE whether referenced in
    # the surviving SELECT arm or not (round-11 review, final pass);
    # the live branch is untouched, so bit-exactness holds
    ctes.append(
        f"pts_f AS (SELECT * FROM pts WHERE NOT (SELECT trig FROM {dec}))"
    )
    ctes.append(
        f"pts_w AS (SELECT * FROM pts WHERE (SELECT trig FROM {dec}))"
    )
    # frozen branch: append-equivalent — every point encoded against
    # the BUILD geometry
    ctes.extend(_residual_ctes(cfinal, "pts_f", "facell", "frpts"))
    ctes.append(_explode_sub_cte("fexq", "frpts"))
    ctes.append(_codes_assign_cte("fcodes_long", "fexq", rcents))
    ctes.append(
        f"fcodes AS MATERIALIZED ({_codes_pivot_sql('fcodes_long', acell='facell')})"
    )
    # warm branch: the re-encode replay — extra Lloyd rounds over all
    # points seeded from the build centroids, frozen codebooks (an
    # unfired run's empty round input keeps the init centroids via
    # the empty-cell carry rule, and its encode source is empty)
    wctes, wfinal = _kmeans_ctes(
        table,
        N_CELLS,
        extra_iters,
        dim,
        prefix="w",
        base=False,
        pts="pts_w",
        init_sql=f"SELECT cid, m FROM {cfinal}",
    )
    ctes.extend(wctes)
    ctes.extend(_residual_ctes(wfinal, "pts_w", "acell", "rpts"))
    ctes.append(_explode_sub_cte("wexq", "rpts"))
    ctes.append(_codes_assign_cte("wcodes_long", "wexq", rcents))
    ctes.append(
        f"wcodes AS MATERIALIZED ({_codes_pivot_sql('wcodes_long', acell='acell')})"
    )
    full = (
        f"SELECT * FROM wcodes WHERE (SELECT trig FROM {dec}) "
        f"UNION ALL SELECT * FROM fcodes WHERE NOT (SELECT trig FROM {dec})"
    )
    if bounded_mod is None:
        return "WITH " + ",\n".join(ctes) + "\n" + full + "\n"
    ctes.append(f"fullcodes AS MATERIALIZED ({full})")
    return "WITH " + ",\n".join(ctes) + _bounded_codes_tail(
        "fullcodes", bounded_mod
    )


def streaming_ivfpq_autorefresh_oracle_sql(
    table: str,
    boundary: int,
    n_batches: int,
    threshold_ppm: int,
    extra_iters: int = 1,
    bounded_mod: int | None = 17,
) -> str:
    """The STREAMED maintenance loop's twin — the whole decision/
    centroid trajectory replayed as chained CTEs (the mini-batch
    k-means pattern extended to a BRANCHING state): per micro-batch b
    (arithmetic id bucket over the delta — width a scalar CTE from the
    data), the stored corpus so far and the batch are both assigned
    under the CURRENT centroid state, the exact-integer ppm decision
    fires or not, and the next state is the warm-round centroids where
    it fired, the previous state where it didn't — a data-dependent
    branch at EVERY batch, each replayed with scalar subqueries. The
    final stored code set needs only ONE uniform encode: centroids
    change only at a retarget — which re-encodes everything — while
    appends encode under the current state, so whatever path the
    decisions took, stored codes == encode(corpus, final state,
    frozen codebooks)."""
    from tabsketchfm_spark.operators.kmeans import N_CELLS, N_ITERS

    dim = S_SUB * D_SUB
    ctes = _base_ctes(table, dim)
    ctes.append(
        f"cpts AS MATERIALIZED (SELECT * FROM pts WHERE id < {boundary})"
    )
    kctes, cfinal = _kmeans_ctes(
        table, N_CELLS, N_ITERS, dim, base=False, pts="cpts"
    )
    ctes.extend(kctes)
    ctes.extend(_residual_ctes(cfinal, "cpts", "acell0", "rfit"))
    pctes, rcents, _fit_codes = _pq_ctes(
        table, src="rfit", tag="r", base=False, emit_codes=False
    )
    ctes.extend(pctes)
    # bucket width from the RAW table (the Spark side computes it from
    # raw ids too — the quantized frame's degenerate-vector filter
    # must not shift the bucket boundaries between the engines)
    ctes.append(
        f"wd AS MATERIALIZED (SELECT (max({table}.vec_id) - {boundary}) "
        f"// {n_batches} + 1 AS w FROM {table} "
        f"WHERE {table}.vec_id >= {boundary})"
    )
    ctes.append(f"spine AS (SELECT DISTINCT cid AS cell FROM {cfinal})")
    state = cfinal
    for b in range(n_batches):
        lo = f"({boundary} + {b} * (SELECT w FROM wd))"
        hi = f"({boundary} + {b + 1} * (SELECT w FROM wd))"
        ctes.append(
            f"bp{b} AS MATERIALIZED (SELECT * FROM pts "
            f"WHERE id >= {lo} AND id < {hi})"
        )
        ctes.append(
            f"sp{b} AS MATERIALIZED (SELECT * FROM pts WHERE id < {lo})"
        )
        ctes.append(
            f"bc{b} AS MATERIALIZED (SELECT id, cid AS cell FROM ("
            f"{_ranked_cells_sql(state, pts=f'bp{b}')}) z WHERE rn = 1)"
        )
        ctes.append(
            f"sc{b} AS MATERIALIZED (SELECT id, cid AS cell FROM ("
            f"{_ranked_cells_sql(state, pts=f'sp{b}')}) z WHERE rn = 1)"
        )
        dctes, dec = _drift_decision_ctes(
            f"b{b}_", f"sc{b}", f"bc{b}", threshold_ppm
        )
        ctes.extend(dctes)
        # warm rounds gated by THIS batch's trigger: an unfired batch
        # feeds the rounds zero rows, the empty-cell carry keeps the
        # init centroids, and the selector picks the previous state
        # anyway — bit-exact, and the dead branch costs nothing
        # (round-11 review, final pass)
        wctes, wfin = _kmeans_ctes(
            table,
            N_CELLS,
            extra_iters,
            dim,
            prefix=f"wb{b}_",
            base=False,
            pts=(
                f"(SELECT * FROM pts WHERE id < {hi} "
                f"AND (SELECT trig FROM {dec}))"
            ),
            init_sql=f"SELECT cid, m FROM {state}",
        )
        ctes.extend(wctes)
        ctes.append(
            f"st{b} AS MATERIALIZED ("
            f"SELECT * FROM {wfin} WHERE (SELECT trig FROM {dec}) "
            f"UNION ALL SELECT * FROM {state} "
            f"WHERE NOT (SELECT trig FROM {dec}))"
        )
        state = f"st{b}"
    ctes.extend(_residual_ctes(state, "pts", "facell", "frpts"))
    ctes.append(_explode_sub_cte("fexq", "frpts"))
    ctes.append(_codes_assign_cte("fcodes_long", "fexq", rcents))
    full = _codes_pivot_sql("fcodes_long", acell="facell")
    if bounded_mod is None:
        return "WITH " + ",\n".join(ctes) + "\n" + full + "\n"
    ctes.append(f"fullcodes AS MATERIALIZED ({full})")
    return "WITH " + ",\n".join(ctes) + _bounded_codes_tail(
        "fullcodes", bounded_mod
    )


def ivfpq_stored_topk(
    spark,
    store_path: str,
    emb: DataFrame,
    query_ids_max: int,
    k: int = 10,
    n_probe: int = N_PROBE_IVFPQ,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve from the PERSISTED index: candidate codes come off the
    store's parquet scan (the corpus vectors are never read), queries
    quantize from ``emb`` and probe as usual. Identical algebra to
    ivfpq_adc_topk — the stored integers ARE the fitted ones — so
    ivfpq_adc_topk_oracle_sql gates this bit-exactly too."""
    mc, cb, codes = load_ivfpq_index(spark, store_path)
    return _ivfpq_search_tail(
        codes, emb, mc, cb, query_ids_max, k, n_probe, id_col, vec_col
    )


def ivfpq_reconstruction_error(
    spark,
    store_path: str,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Index QUALITY: per-subspace total squared quantization error of
    ``emb`` against the STORED quantizers and STORED codes — the
    standard ANN index-staleness metric (drift counts how the
    distribution moved; this measures how badly the frozen codebooks
    now fit the vectors, which can degrade even when cell counts look
    stable). err(id, s) = |rq_s|² − 2·rq_s·m(code_s) + |m(code_s)|²,
    all integers on the grid → oracle-exact. One pass over the vectors
    LEFT-joined to the stored codes (an offline maintenance scan —
    serving still never reads vectors); a vector NOT in the index is
    encoded on the fly with the frozen codebooks instead of being
    silently dropped — the un-indexed lake is exactly where staleness
    shows first, and a fresh frozen-quantizer encode equals what an
    append would store (round-9 review finding; pinned by the
    append-equivalence test). For INDEXED vectors both the residual
    cell and the codes are the STORED ones (coalesce(stored, fresh)),
    so the metric measures the stored representation even if a
    vector was mutated since indexing; the fresh-cell/fresh-code
    expressions sit in coalesce's second slot and only evaluate on
    rows the stored side left null — no per-row double encode on the
    common path. Output: (s, n, err_sum)."""
    mc, cb, codes = load_ivfpq_index(spark, store_path)
    base = _cell_qv_cols(emb, mc, id_col, vec_col)  # id, qv, cell (fresh)
    j0 = base.join(
        codes.withColumnRenamed("cell", "stored_cell"),
        base["id"] == codes["cand_id"],
        "left",
    ).select(
        "qv",
        F.coalesce(F.col("stored_cell"), F.col("cell")).alias("cell"),
        *[F.col(f"c{s}") for s in range(S_SUB)],
    )
    j = j0.select(
        _residual_col(mc).alias("rq"),
        *[F.col(f"c{s}") for s in range(S_SUB)],
    ).select(
        "rq",
        *[
            F.coalesce(
                F.col(f"c{s}"),
                _bk_col(
                    K_PQ,
                    [F.expr(_b_lit(s, cb[(s, c)], "rq")) for c in range(K_PQ)],
                ).cast("int"),
            ).alias(f"k{s}")
            for s in range(S_SUB)
        ],
    )
    terms = []
    cases = _cb_case_terms(cb, "rq", code_prefix="k")
    for s in range(S_SUB):
        self_dot = (
            f"aggregate(zip_with(slice(rq, {s * D_SUB + 1}, {D_SUB}), "
            f"slice(rq, {s * D_SUB + 1}, {D_SUB}), (x, y) -> x * y), "
            "cast(0 as bigint), (acc, x) -> acc + x)"
        )
        terms.append(F.expr(f"({self_dot}) + {cases[s]}").alias(f"e{s}"))
    errs = j.select(*terms).select(
        F.posexplode(F.array(*[F.col(f"e{s}") for s in range(S_SUB)])).alias(
            "s", "err"
        )
    )
    return errs.groupBy("s").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("err").cast("bigint").alias("err_sum"),
    ).select(F.col("s").cast("int").alias("s"), "n", "err_sum")


def ivfpq_reconstruction_error_oracle_sql(table: str) -> str:
    """Replay: the shared full-corpus encode scaffold, then the same
    integer error algebra per (id, subspace) summed per subspace.

    GATE CONTRACT: this replay fits AND encodes on the full ``table``,
    so it covers the registered case (store built on the same corpus
    it measures); for a store built on a subset, the operator's
    on-the-fly encode branch is gated by the append-equivalence test
    (stored-after-append == fresh-encode by construction), not by this
    SQL. The per-term BIGINT cast matters: DuckDB sums DOUBLEs in
    DOUBLE and rounds past 2^53 on a large corpus, while the
    cast-per-term sum promotes to HUGEINT and stays exact (the
    kmeans SSE oracle's documented rule)."""
    ctes, _cfinal, rcents, rcodes = _corpus_encode_ctes(table)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(cl.s AS INTEGER) AS s, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(
         list_dot_product(sub.rs::DOUBLE[], sub.rs::DOUBLE[])
         - 2 * list_dot_product(sub.rs::DOUBLE[], ct.m::DOUBLE[])
         + list_dot_product(ct.m::DOUBLE[], ct.m::DOUBLE[])
       AS BIGINT)) AS BIGINT) AS err_sum
FROM {rcodes} cl
JOIN {rcents} ct ON ct.s = cl.s AND ct.cid = cl.cid
JOIN (SELECT p.id, q.s,
             list_transform(generate_series(1, {D_SUB}),
                            i -> p.qv[q.s * {D_SUB} + i]) AS rs
      FROM rpts p CROSS JOIN
           (SELECT unnest(generate_series(0, {S_SUB - 1})) AS s) q) sub
  ON sub.id = cl.id AND sub.s = cl.s
GROUP BY cl.s
"""
    )


def ivfpq_index_drift(
    spark,
    store_path: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Index MAINTENANCE: the retrain trigger. Encode an arriving
    delta batch with the STORED quantizers and compare its coarse-cell
    and per-subspace code distributions against the stored corpus
    codes — a delta that no longer falls where the index was trained
    (cells emptying/ballooning, codewords going cold) is the signal to
    rebuild. Output: one integer-count row per (s, code) —
    s = -1 carries the coarse-cell distribution, s in [0, S) the
    subspace codebooks — (s, code, corpus_cnt, delta_cnt); exact
    integers, so the whole diagnostic is oracle-gated. Scale shape:
    the corpus side is an aggregate over the stored codes parquet
    (never the corpus vectors), the delta side an expression-only
    encode + the same bounded aggregate."""
    mc, cb, codes = load_ivfpq_index(spark, store_path)
    dcands = _ivfpq_cands(delta, mc, cb, id_col, vec_col)

    def dist(frame, alias):
        ex = frame.select(
            F.posexplode(
                F.array(*[F.col(f"c{s}") for s in range(S_SUB)])
            ).alias("s", "code")
        ).unionByName(
            frame.select(F.lit(-1).alias("s"), F.col("cell").alias("code"))
        )
        return ex.groupBy("s", "code").agg(
            F.count("*").cast("bigint").alias(alias)
        )

    z = F.lit(0).cast("bigint")
    return (
        dist(codes, "corpus_cnt")
        .join(dist(dcands, "delta_cnt"), ["s", "code"], "full_outer")
        .select(
            F.col("s").cast("int").alias("s"),
            F.col("code").cast("int").alias("code"),
            F.coalesce("corpus_cnt", z).alias("corpus_cnt"),
            F.coalesce("delta_cnt", z).alias("delta_cnt"),
        )
    )


def ivfpq_index_drift_oracle_sql(
    table: str, delta_pred: str = "id % 5 = 0"
) -> str:
    """Replay: the full IVF-PQ encode of the corpus (coarse fit,
    residuals, 8 codebooks — the shared scaffolds), then conditional
    counts with the delta predicate over the SAME ids.

    GATE CONTRACT (round-8 advice): this oracle covers ONLY deltas
    that are a subset of the stored corpus — ``delta_pred`` selects
    from the corpus ids, so every (s, code) group the delta produces
    is already present on the corpus side and the LEFT JOIN replay is
    complete. The Spark operator is more general: its full_outer join
    also emits (s, code, corpus_cnt=0, delta_cnt>0) rows for an
    EXTERNAL delta whose codes never occur in the corpus. Gating a
    non-subset delta with this oracle would silently miss those rows;
    such a run needs a delta-side branch added here first."""
    ctes, _cfinal, _rcents, rcodes = _corpus_encode_ctes(table)
    ctes.append(
        f"dlt AS MATERIALIZED (SELECT id FROM pts WHERE {delta_pred})"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(-1 AS INTEGER) AS s, CAST(a.cell AS INTEGER) AS code,
       CAST(count(*) AS BIGINT) AS corpus_cnt,
       CAST(coalesce(sum(CASE WHEN d.id IS NOT NULL THEN 1 END), 0) AS BIGINT)
         AS delta_cnt
FROM acell a LEFT JOIN dlt d USING (id) GROUP BY a.cell
UNION ALL
SELECT CAST(r.s AS INTEGER), CAST(r.cid AS INTEGER),
       CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(CASE WHEN d.id IS NOT NULL THEN 1 END), 0) AS BIGINT)
FROM {rcodes} r LEFT JOIN dlt d USING (id) GROUP BY r.s, r.cid
"""
    )


# --- DuckDB replay -----------------------------------------------------------


def _explode_sub_cte(name: str, src: str) -> str:
    """ONE copy of the subspace-explode SQL: (id, s, qs) rows off an
    (id, qv) source — DuckDB lists are 1-based, so subspace s covers
    qv[s*D+1 .. s*D+D]."""
    return (
        f"{name} AS MATERIALIZED (SELECT p.id, sub.s, "
        f"list_transform(generate_series(1, {D_SUB}), "
        f"i -> p.qv[sub.s * {D_SUB} + i]) AS qs "
        f"FROM {src} p CROSS JOIN (SELECT unnest(generate_series(0, {S_SUB - 1}))"
        " AS s) sub)"
    )


def _codes_assign_cte(name: str, enc: str, cents: str) -> str:
    """ONE copy of the codeword-argmin SQL: every (id, s, qs) row of
    ``enc`` assigned its nearest codeword of ``cents`` (ties →
    smallest codeword id) — shared by the fit replay and the
    encode-against-frozen-codebooks path."""
    return (
        f"{name} AS MATERIALIZED (SELECT id, s, cid FROM ("
        "SELECT p.id, p.s, c.cid, row_number() OVER (PARTITION BY p.id, p.s "
        "ORDER BY list_dot_product(c.m::DOUBLE[], c.m::DOUBLE[])"
        " - 2 * list_dot_product(p.qs::DOUBLE[], c.m::DOUBLE[]), c.cid) AS rn "
        f"FROM {enc} p JOIN {cents} c ON c.s = p.s) z WHERE rn = 1)"
    )


def _pq_ctes(
    table: str,
    src: str = "pts",
    tag: str = "",
    base: bool = True,
    encode_src: str | None = None,
    emit_codes: bool = True,
) -> tuple[list[str], str, str]:
    """Shared oracle scaffolding: the exploded (id, s, qs) frame, one
    prefixed fit replay per subspace, and the unioned
    codebook/assignment CTEs — ONE copy of the PQ-encode replay,
    retargetable at any (id, qv) source (``src='pts'`` for plain PQ,
    ``src='rpts'``/``tag='r'`` for IVF-PQ's residual domain; ``tag``
    prefixes every emitted CTE name). ``encode_src`` splits the two
    roles when they differ (the store-append gate: codebooks FIT on
    the corpus that built the index, codes assigned to corpus AND
    delta). ``emit_codes=False`` for callers that only need the
    codebooks (the re-encode/autorefresh replays encode against a
    DIFFERENT centroid state later): DuckDB evaluates even an
    unreferenced MATERIALIZED CTE, so emitting the fit-src assignment
    would be pure wasted work (round-11 review, verified
    empirically). Returns (ctes, cents, codes) — cents: (s, cid, m);
    codes: (id, s, cid), name unset when not emitted."""
    dim = S_SUB * D_SUB
    ctes = _base_ctes(table, dim) if base else []
    ex, cents, codes = f"{tag}ex", f"{tag}cents_long", f"{tag}codes_long"
    ctes.append(_explode_sub_cte(ex, src))
    enc = ex
    if encode_src is not None:
        enc = f"{tag}exq"
        ctes.append(_explode_sub_cte(enc, encode_src))
    ctes.append(
        f"{tag}sdims AS (SELECT unnest(generate_series(1, {D_SUB})) AS i)"
    )
    for s in range(S_SUB):
        # ONE copy of the Lloyd-round SQL: the kmeans replay retargeted
        # at this subspace's rows of the exploded frame
        kctes, _ = _kmeans_ctes(
            table,
            K_PQ,
            ITERS_PQ,
            D_SUB,
            prefix=f"{tag}s{s}_",
            base=False,
            pts=f"(SELECT * FROM {ex} WHERE s = {s})",
            vec="qs",
            dims=f"{tag}sdims",
            with_u=False,
        )
        ctes.extend(kctes)
    ctes.append(
        f"{cents} AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT {s} AS s, cid, m FROM {tag}s{s}_c{ITERS_PQ}"
            for s in range(S_SUB)
        )
        + ")"
    )
    if emit_codes:
        ctes.append(_codes_assign_cte(codes, enc, cents))
    return ctes, cents, codes


def _residual_ctes(
    cents: str, pts_src: str, acell_name: str, rpts_name: str
) -> list[str]:
    """ONE copy of the assign-and-residual SQL (round-7 SQL-drift
    rule): every row of ``pts_src`` gets its nearest cell of ``cents``
    (ties → smallest cell id) and the integer residual against that
    centroid — shared by the frozen-fit scaffold and the re-encode
    replay (which assigns against two DIFFERENT centroid sets)."""
    dim = S_SUB * D_SUB
    return [
        f"{acell_name} AS MATERIALIZED (SELECT id, cid AS cell FROM ("
        f"{_ranked_cells_sql(cents, pts=pts_src)}) z WHERE rn = 1)",
        f"{rpts_name} AS MATERIALIZED (SELECT p.id, "
        f"list_transform(generate_series(1, {dim}), i -> p.qv[i] - c.m[i]) AS qv "
        f"FROM {pts_src} p JOIN {acell_name} a ON a.id = p.id "
        f"JOIN {cents} c ON c.cid = a.cell)",
    ]


def _frozen_fit_ctes(
    table: str,
    boundary: int,
    cand_pts: str = "pts",
    extra_ctes: list[str] | None = None,
) -> tuple[list[str], str, str, str]:
    """ONE copy of the frozen-quantizer replay shared by the append
    and RAG-composite gates (the round-7 SQL-copy-paste lesson):
    coarse fit + residual codebooks trained on the BUILD corpus only
    (id < ``boundary`` — new vectors arrive with new ids, so the
    dense 0..k-1 init ids stay on the corpus side), then every row of
    ``cand_pts`` (default: all vectors) assigned a cell and
    residual-encoded against those FROZEN quantizers. ``extra_ctes``
    are spliced in before the assignment so callers can define the
    candidate source. Returns (ctes, cfinal, rcents, rcodes)."""
    from tabsketchfm_spark.operators.kmeans import N_CELLS, N_ITERS

    dim = S_SUB * D_SUB
    ctes = _base_ctes(table, dim)
    ctes.append(
        f"cpts AS MATERIALIZED (SELECT * FROM pts WHERE id < {boundary})"
    )
    kctes, cfinal = _kmeans_ctes(
        table, N_CELLS, N_ITERS, dim, base=False, pts="cpts"
    )
    ctes.extend(kctes)
    ctes.extend(extra_ctes or [])
    ctes.extend(_residual_ctes(cfinal, cand_pts, "acell", "rpts"))
    ctes.append(
        f"rfit AS MATERIALIZED (SELECT * FROM rpts WHERE id < {boundary})"
    )
    pctes, rcents, rcodes = _pq_ctes(
        table, src="rfit", tag="r", base=False, encode_src="rpts"
    )
    ctes.extend(pctes)
    return ctes, cfinal, rcents, rcodes


def _codes_pivot_sql(rcodes: str, acell: str = "acell") -> str:
    """ONE copy of the stored-code-set pivot (round-7 SQL-drift rule):
    (cand_id, cell, c0..c{S-1}) off the long-form residual codes CTE
    joined to the cell assignment ``acell`` — shared by the append,
    delete, re-encode and autorefresh oracles."""
    code_cols = ",\n  ".join(
        f"CAST(max(CASE WHEN r.s = {s} THEN r.cid END) AS INTEGER) AS c{s}"
        for s in range(S_SUB)
    )
    return f"""SELECT r.id AS cand_id, CAST(a.cell AS INTEGER) AS cell,
  {code_cols}
FROM {rcodes} r JOIN {acell} a USING (id)
GROUP BY r.id, a.cell"""


def _bounded_codes_tail(src: str, mod: int) -> str:
    """bounded_codes_gate's SQL tail over a full-codes CTE — the
    position-weighted code checksum spelled out ONCE."""
    from tabsketchfm_spark.functions.gates import bounded_tail_sql

    code_sum = " + ".join(f"{s + 1} * c{s}" for s in range(S_SUB))
    return bounded_tail_sql(
        src, "cand_id", {"cell": "cell", "codes": code_sum}, mod
    )


def bounded_codes_gate(codes: DataFrame, mod: int = 17) -> DataFrame:
    """Bounded gate over a stored code set — sampled slice + plain
    and ID-WEIGHTED checksums (functions/gates.py). The code checksum
    weights each subspace by its position (1*c0 + 2*c1 + ...), so a
    within-row subspace swap perturbs it too, not only cross-row
    defects. Catches: retrained (non-frozen) quantizers, a missing
    code dir, double-encoded retried batches, swapped rows/codes."""
    from tabsketchfm_spark.functions.gates import bounded_slice_gate

    code_sum = None
    for s in range(S_SUB):
        c = F.col(f"c{s}").cast("long") * (s + 1)
        code_sum = c if code_sum is None else code_sum + c
    return bounded_slice_gate(
        codes,
        "cand_id",
        {"cell": F.col("cell").cast("long"), "codes": code_sum},
        mod,
    )


def ivfpq_store_append_oracle_sql(
    table: str, boundary: int, bounded_mod: int | None = None
) -> str:
    """Replay of the appended store's FULL code set via the shared
    frozen-fit scaffold. Gates both halves of the append: the delta
    encode used the stored quantizers, and serving reads the code-dir
    union. With ``bounded_mod``, mirrors bounded_codes_gate via the
    shared scaffold in functions/gates.py."""
    ctes, _cfinal, _rcents, rcodes = _frozen_fit_ctes(table, boundary)
    full = _codes_pivot_sql(rcodes)
    if bounded_mod is None:
        return "WITH " + ",\n".join(ctes) + "\n" + full + "\n"
    ctes.append(f"fullcodes AS MATERIALIZED ({full})")
    return "WITH " + ",\n".join(ctes) + _bounded_codes_tail("fullcodes", bounded_mod)


def pq_codes_oracle_sql(table: str) -> str:
    ctes, _, codes = _pq_ctes(table)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT id AS vec_id, list(CAST(cid AS INTEGER) ORDER BY s) AS codes
FROM {codes} GROUP BY id
"""
    )


def _corpus_encode_ctes(table: str) -> tuple[list[str], str, str, str]:
    """ONE copy of the FULL-corpus IVF-PQ encode replay (coarse fit,
    per-vector integer residuals, the residual-codebook fits, every
    vector's (cell, code) assignment) — shared by the search, drift
    and reconstruction-error oracles; _frozen_fit_ctes is the
    corpus-subset-fit sibling. Returns (ctes, cfinal, rcents,
    rcodes)."""
    from tabsketchfm_spark.operators.kmeans import N_CELLS, N_ITERS

    dim = S_SUB * D_SUB
    ctes, cfinal = _kmeans_ctes(table, N_CELLS, N_ITERS, dim)
    ctes.append(
        "acell AS MATERIALIZED (SELECT id, cid AS cell FROM ("
        f"{_ranked_cells_sql(cfinal)}) z WHERE rn = 1)"
    )
    ctes.append(
        "rpts AS MATERIALIZED (SELECT p.id, "
        f"list_transform(generate_series(1, {dim}), i -> p.qv[i] - c.m[i]) AS qv "
        f"FROM pts p JOIN acell a ON a.id = p.id JOIN {cfinal} c ON c.cid = a.cell)"
    )
    pctes, rcents, rcodes = _pq_ctes(table, src="rpts", tag="r", base=False)
    ctes.extend(pctes)
    return ctes, cfinal, rcents, rcodes


def _adc_tail_sql(
    ctes: list[str],
    cfinal: str,
    rcents: str,
    rcodes: str,
    query_ids_max: int,
    k: int,
    n_probe: int,
) -> str:
    """ONE copy of the serve-side replay tail (query cell-probing with
    per-cell residuals + the ADC scored/ranked SELECT) — shared by the
    fit-and-search and RAG-composite oracles, mirroring how the Spark
    side shares _ivfpq_search_tail."""
    dim = S_SUB * D_SUB
    ctes.append(
        "qprobe AS MATERIALIZED (SELECT id AS q_id, cid AS cell, "
        f"list_transform(generate_series(1, {dim}), i -> qv[i] - m[i]) AS rq "
        "FROM (SELECT p.id, p.qv, c.cid, c.m, row_number() OVER ("
        f"PARTITION BY p.id ORDER BY {_B_SQL}, c.cid) AS rn "
        f"FROM pts p CROSS JOIN {cfinal} c WHERE p.id < {query_ids_max}) z "
        f"WHERE rn <= {n_probe})"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
scored AS (
  SELECT q.q_id, a.id AS cand_id,
         CAST(min(list_dot_product(q.rq::DOUBLE[], q.rq::DOUBLE[]))
              + sum(list_dot_product(ct.m::DOUBLE[], ct.m::DOUBLE[])
                    - 2 * list_dot_product(
                        list_transform(generate_series(1, {D_SUB}),
                                       i -> q.rq[cl.s * {D_SUB} + i])::DOUBLE[],
                        ct.m::DOUBLE[])) AS BIGINT) AS adc
  FROM qprobe q
  JOIN acell a ON a.cell = q.cell AND a.id <> q.q_id
  JOIN {rcodes} cl ON cl.id = a.id
  JOIN {rcents} ct ON ct.s = cl.s AND ct.cid = cl.cid
  GROUP BY q.q_id, a.id),
ranked AS (
  SELECT q_id, cand_id, adc,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, cand_id)
              AS INTEGER) AS rank
  FROM scored)
SELECT q_id, rank, cand_id, adc FROM ranked WHERE rank <= {k}
"""
    )


def ivfpq_adc_topk_oracle_sql(
    table: str,
    query_ids_max: int,
    k: int = 10,
    n_probe: int = N_PROBE_IVFPQ,
) -> str:
    """Full IVF-PQ replay: the shared full-corpus encode scaffold plus
    the shared probe/ADC tail — one WITH, every quantity integer."""
    ctes, cfinal, rcents, rcodes = _corpus_encode_ctes(table)
    return _adc_tail_sql(ctes, cfinal, rcents, rcodes, query_ids_max, k, n_probe)


def pipeline_rag_topk_oracle_sql(
    emb_table: str,
    surv_sql: str,
    boundary: int,
    query_ids_max: int,
    k: int = 10,
    n_probe: int = N_PROBE_IVFPQ,
) -> str:
    """The RAG-corpus composite's replay: the shared frozen-fit
    scaffold (quantizers fit on the existing lake, id < ``boundary``)
    with a curation-restricted candidate set — serving corpus = base ∪
    (curated ∩ id >= boundary), survivors from ``surv_sql`` (a
    self-contained id subquery — text.curation_survivor_ids_sql) —
    plus the shared probe/ADC tail."""
    ctes, cfinal, rcents, rcodes = _frozen_fit_ctes(
        emb_table,
        boundary,
        cand_pts="cand0",
        extra_ctes=[
            f"surv AS MATERIALIZED (SELECT id FROM {surv_sql} sv)",
            "cand0 AS MATERIALIZED (SELECT p.* FROM pts p LEFT JOIN surv v "
            f"USING (id) WHERE p.id < {boundary} OR v.id IS NOT NULL)",
        ],
    )
    return _adc_tail_sql(ctes, cfinal, rcents, rcodes, query_ids_max, k, n_probe)


def pq_adc_topk_oracle_sql(table: str, query_ids_max: int, k: int = 10) -> str:
    ctes, cents, codes = _pq_ctes(table)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
qrs AS MATERIALIZED (SELECT id AS q_id, qv FROM pts WHERE id < {query_ids_max}),
scored AS (
  SELECT q.q_id, cl.id AS cand_id,
         CAST(sum(list_dot_product(ct.m::DOUBLE[], ct.m::DOUBLE[])
              - 2 * list_dot_product(
                  list_transform(generate_series(1, {D_SUB}),
                                 i -> q.qv[cl.s * {D_SUB} + i])::DOUBLE[],
                  ct.m::DOUBLE[])) AS BIGINT) AS adc
  FROM qrs q
  JOIN {codes} cl ON cl.id <> q.q_id
  JOIN {cents} ct ON ct.s = cl.s AND ct.cid = cl.cid
  GROUP BY q.q_id, cl.id),
ranked AS (
  SELECT q_id, cand_id, adc,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, cand_id)
              AS INTEGER) AS rank
  FROM scored)
SELECT q_id, rank, cand_id, adc FROM ranked WHERE rank <= {k}
"""
    )
