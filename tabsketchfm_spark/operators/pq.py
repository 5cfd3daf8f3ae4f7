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
    _base_ctes,
    _bk_col,
    _kmeans_ctes,
    _quantized,
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
    _PQ_MEMO.clear()


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


def _b_lit(s: int, vec: list[int]) -> str:
    """The comparable B = m·m − 2·(q_s·m) for subspace ``s`` against a
    literal codeword, read off the FULL qv column."""
    mm = sum(v * v for v in vec)
    return f"cast({mm} as bigint) - 2 * ({_dot_lit('qv', s * D_SUB, vec)})"


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
    q = _quantized(emb, id_col, vec_col)
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
    _PQ_MEMO[key] = m
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


# --- DuckDB replay -----------------------------------------------------------


def _pq_ctes(table: str) -> tuple[list[str], str, str]:
    """Shared oracle scaffolding: un/pts prefix, the exploded
    (id, s, qs) frame, one prefixed fit replay per subspace, and the
    unioned codebook/assignment CTEs. Returns (ctes, cents_long,
    codes_long) — cents_long: (s, cid, m); codes_long: (id, s, cid)."""
    dim = S_SUB * D_SUB
    ctes = _base_ctes(table, dim)
    # DuckDB lists are 1-based: subspace s covers qv[s*D+1 .. s*D+D]
    ctes.append(
        "ex AS MATERIALIZED (SELECT p.id, sub.s, "
        f"list_transform(generate_series(1, {D_SUB}), "
        f"i -> p.qv[sub.s * {D_SUB} + i]) AS qs "
        f"FROM pts p CROSS JOIN (SELECT unnest(generate_series(0, {S_SUB - 1}))"
        " AS s) sub)"
    )
    ctes.append(
        f"sdims AS (SELECT unnest(generate_series(1, {D_SUB})) AS i)"
    )
    for s in range(S_SUB):
        # ONE copy of the Lloyd-round SQL: the kmeans replay retargeted
        # at this subspace's rows of the exploded frame
        kctes, _ = _kmeans_ctes(
            table,
            K_PQ,
            ITERS_PQ,
            D_SUB,
            prefix=f"s{s}_",
            base=False,
            pts=f"(SELECT * FROM ex WHERE s = {s})",
            vec="qs",
            dims="sdims",
            with_u=False,
        )
        ctes.extend(kctes)
    ctes.append(
        "cents_long AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT {s} AS s, cid, m FROM s{s}_c{ITERS_PQ}"
            for s in range(S_SUB)
        )
        + ")"
    )
    ctes.append(
        "codes_long AS MATERIALIZED (SELECT id, s, cid FROM ("
        "SELECT p.id, p.s, c.cid, row_number() OVER (PARTITION BY p.id, p.s "
        "ORDER BY list_dot_product(c.m::DOUBLE[], c.m::DOUBLE[])"
        " - 2 * list_dot_product(p.qs::DOUBLE[], c.m::DOUBLE[]), c.cid) AS rn "
        "FROM ex p JOIN cents_long c ON c.s = p.s) z WHERE rn = 1)"
    )
    return ctes, "cents_long", "codes_long"


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
