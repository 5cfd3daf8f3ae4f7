"""Trained decision tree with ORACLE-EXACT training (integer splits).

Second trained-model family after the perceptron (operators/
classifier.py): a depth-2 decision tree over the SAME integer
token-bucket features and gopher seed labels, trained by exact
misclassification-count minimization. Every quantity in the trainer is
an integer COUNT — split scores, tie-breaks, leaf majorities — so the
whole train→score pipeline replays bit-exactly in DuckDB (the
chained-replay family: BPE, pagerank, perceptron epochs, now tree
induction). Unlike gini/entropy splitting there is no ratio or libm
call anywhere: the split criterion is

    cost(j, t) = min(posL, negL) + min(posR, negR)

(the tree's training error if both sides became majority leaves),
minimized over a FIXED threshold grid with deterministic ties →
lexicographically smallest (cost, feature, threshold). CART supports
misclassification-count splitting; the fixed grid keeps the candidate
set schema-bounded and oracle-mirrorable (data-derived thresholds
would make the candidate set data-sized).

Spark shape at 100 TB: ONE scan builds the persisted integer feature
frame; each tree LEVEL is a single map-side-combined aggregate over it
(pass 1: root candidate counts; pass 2: both child nodes' candidate
counts + leaf majorities ride the same aggregate), so depth-2 training
is exactly 2 aggregate jobs + O(grid) driver arithmetic — epochs ×
O(1) driver traffic like the perceptron/BPE loops. Scoring is a
literal nested-CASE projection (no join, no shuffle).

Reference seam: the reference trains its quality judgment as a torch
classifier head (tabsketchfm_finetune.py); this module is the
engine-native counterpart whose TRAINING is itself part of the
verified surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tabsketchfm_spark.operators.classifier import (
    N_BUCKETS,
    _label_expr_duckdb,
    feat_xdefs_duckdb,
    quality_features,
)
from tabsketchfm_spark.functions.hashing import h32_sql
from tabsketchfm_spark.operators.text import _toks_duckdb

# fixed split-threshold grid (token-bucket counts are small integers:
# ~tokens/N_BUCKETS per bucket; the doubling tail reaches the total-
# token-count feature's range on long docs)
THRESHOLDS = (0, 1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96)
# x1..xK bucket counts + x{K+1} = total token count (the standard
# doc-length quality feature; x0 is the perceptron bias, not split-able)
FEATURES = tuple(range(1, N_BUCKETS + 2))

# deterministic fallback split for an EMPTY child node (possible when
# the root split isolates one side; ties in the argmin can also pick a
# degenerate split): both engines emit (first feature, first threshold,
# all-zero counts) so the leaf CASEs stay well-defined and identical
_EMPTY = (FEATURES[0], THRESHOLDS[0], 0, 0, 0, 0)

# shared oracle-SQL scaffolding (one source of truth for the full and
# the CV tree oracles plus the booster — a grid/argmin/feature-read
# change must land everywhere at once or parity breaks)
_GRID_SQL = ", ".join(f"({j}, {t})" for j in FEATURES for t in THRESHOLDS)
_EMPTY_SQL = (
    f"SELECT {_EMPTY[0]} AS j, {_EMPTY[1]} AS t, 0 AS pl, 0 AS nl, 0 AS p, 0 AS n"
)


def _xread(alias: str) -> str:
    """CASE-dispatched feature read ``f.x{alias.j}`` — the chosen
    feature index is data, so the column access must be a CASE chain."""
    return (
        f"CASE {alias}.j " + " ".join(f"WHEN {j} THEN f.x{j}" for j in FEATURES) + " END"
    )


def _spred(alias: str) -> str:
    """One stump's ±pol SQL prediction, feature read dispatched through
    the CASE chain — the ONE source of truth for every oracle that
    replays a stump vote (full boost, boost CV, model selection)."""
    return f"CASE WHEN {_xread(alias)} <= {alias}.t THEN {alias}.pol ELSE -{alias}.pol END"


def _boost_vote(stumps: list[tuple[int, int, int]]):
    """The ensemble's Spark-side majority-vote column — shared by the
    full-corpus scorer, the CV evaluator and model selection so a
    polarity/tie-break change lands everywhere at once."""
    return sum(
        F.when(F.col(f"x{j}") <= t, pol).otherwise(-pol) for j, t, pol in stumps
    )


def _best_sql(cand: str, flt: str) -> str:
    """Argmin CTE body: ORDER BY cost, j, t LIMIT 1 (the Spark
    driver's lexicographic rule) with the deterministic empty-node
    fallback unioned in."""
    return (
        f"(SELECT j, t, pl, nl, p, n FROM {cand} WHERE {flt} "
        "ORDER BY least(pl, nl) + least(p - pl, n - nl), j, t LIMIT 1) "
        f"UNION ALL "
        f"{_EMPTY_SQL} WHERE NOT EXISTS (SELECT 1 FROM {cand} WHERE {flt})"
    )


def tree_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The perceptron's integer feature frame + x{K+1} = total token
    count (== Σ bucket counts, since the hash buckets partition the
    token list — computed directly as size(tokens))."""
    return quality_features(df, id_col, text_col, with_total=True)


def _argmin_split(rows):
    """rows: iterable of (j, t, posL, negL, pos, neg) — returns the
    (cost, j, t)-lexicographic minimum row, the SAME order the oracle's
    ORDER BY cost, j, t LIMIT 1 uses."""
    best = None
    for j, t, pl, nl, p, n in rows:
        cost = min(pl, nl) + min(p - pl, n - nl)
        key = (cost, j, t)
        if best is None or key < best[0]:
            best = (key, (j, t, pl, nl, p, n))
    return _EMPTY if best is None else best[1]


def _leaf_pred(pos: int, neg: int) -> int:
    """Majority leaf; ties → −1 (both engines use pos > neg)."""
    return 1 if pos > neg else -1


def train_quality_tree(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[dict, DataFrame]:
    """Two aggregate passes over the persisted feature frame:
    pass 1 picks the root split, pass 2 picks BOTH child splits and
    their leaf counts in one job. Returns (tree, features); tree =
    {root: (j, t), left/right: (j, t), leaves: [pred × 4]} with leaf
    order (L-left, L-right, R-left, R-right). Features persisted —
    eager callers unpersist."""
    feat = tree_features(df, id_col, text_col).persist()
    tree, _, _ = _induce_tree(feat)
    return tree, feat


def _induce_tree(feat: DataFrame) -> tuple[dict, int, int]:
    """The two-pass induction over an (already filtered/persisted)
    feature frame; returns (tree, root_pos, root_neg) — the root
    totals ride pass 1, so CV gets n_train and the majority baseline
    without an extra job. Memoized per frame plan (classifier
    _TRAIN_MEMO): CV, model selection and the parity twins induce the
    same folds repeatedly across the suite."""
    from tabsketchfm_spark.operators.classifier import _memo_train

    return _memo_train(
        feat,
        ("tree2", tuple(FEATURES), tuple(THRESHOLDS)),
        lambda: _induce_tree_impl(feat),
    )


def _induce_tree_impl(feat: DataFrame) -> tuple[dict, int, int]:

    def _counts(side=None, prefix=""):
        """One wide aggregate: per grid pair, pos/neg counts left of the
        threshold plus node totals; ``side`` restricts to a child node."""
        aggs = []
        node = side if side is not None else F.lit(True)
        for j in FEATURES:
            for t in THRESHOLDS:
                left = node & (F.col(f"x{j}") <= t)
                aggs.append(
                    F.sum(F.when(left & (F.col("y") == 1), 1)).alias(
                        f"{prefix}pl_{j}_{t}"
                    )
                )
                aggs.append(
                    F.sum(F.when(left & (F.col("y") == -1), 1)).alias(
                        f"{prefix}nl_{j}_{t}"
                    )
                )
        aggs.append(F.sum(F.when(node & (F.col("y") == 1), 1)).alias(f"{prefix}p"))
        aggs.append(F.sum(F.when(node & (F.col("y") == -1), 1)).alias(f"{prefix}n"))
        return aggs

    def _rows(r, prefix=""):
        p = int(r[prefix + "p"] or 0)
        n = int(r[prefix + "n"] or 0)
        return [
            (
                j,
                t,
                int(r[f"{prefix}pl_{j}_{t}"] or 0),
                int(r[f"{prefix}nl_{j}_{t}"] or 0),
                p,
                n,
            )
            for j in FEATURES
            for t in THRESHOLDS
        ]

    r0 = feat.agg(*_counts()).collect()[0]
    root_p, root_n = int(r0["p"] or 0), int(r0["n"] or 0)
    j0, t0, *_ = _argmin_split(_rows(r0))

    # pass 2: both children in ONE aggregate (aliases prefixed per side)
    sideL = F.col(f"x{j0}") <= t0
    r1 = feat.agg(*_counts(sideL, "L_"), *_counts(~sideL, "R_")).collect()[0]

    jl, tl, pll, nll, pL, nL = _argmin_split(_rows(r1, "L_")) if int(r1["L_p"] or 0) + int(r1["L_n"] or 0) > 0 else _EMPTY
    jr, tr, plr, nlr, pR, nR = _argmin_split(_rows(r1, "R_")) if int(r1["R_p"] or 0) + int(r1["R_n"] or 0) > 0 else _EMPTY

    tree = {
        "root": (j0, t0),
        "left": (jl, tl),
        "right": (jr, tr),
        "leaves": [
            _leaf_pred(pll, nll),
            _leaf_pred(pL - pll, nL - nll),
            _leaf_pred(plr, nlr),
            _leaf_pred(pR - plr, nR - nlr),
        ],
    }
    return tree, root_p, root_n


def _tree_cols(tree: dict):
    """(leaf, pred) literal columns for a trained tree — the scoring
    projection both the full-corpus query and the CV held-out evals
    build from the driver-side tree dict."""
    j0, t0 = tree["root"]
    jl, tl = tree["left"]
    jr, tr = tree["right"]
    leaf = (
        F.when((F.col(f"x{j0}") <= t0) & (F.col(f"x{jl}") <= tl), 0)
        .when(F.col(f"x{j0}") <= t0, 1)
        .when(F.col(f"x{jr}") <= tr, 2)
        .otherwise(3)
        .cast("bigint")
    )
    pred = F.lit(None).cast("bigint")
    for i in reversed(range(4)):
        pred = F.when(leaf == i, F.lit(tree["leaves"][i]).cast("bigint")).otherwise(pred)
    return leaf, pred


def quality_tree_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Train the depth-2 tree on the corpus' own gopher seed labels,
    then score every doc through the trained splits as a literal
    nested-CASE projection. Output: (id, y, leaf, pred, correct) — all
    integers/booleans, bit-exact vs quality_tree_oracle_sql."""
    tree, feat = train_quality_tree(df, id_col, text_col)
    leaf, pred = _tree_cols(tree)
    return feat.select(
        "id",
        "y",
        leaf.alias("leaf"),
        pred.alias("pred"),
        (pred == F.col("y")).alias("correct"),
    )


def quality_tree_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """Full tree-induction REPLAY. The candidate counts use the
    grid-cross-join shape (feat × (feature, threshold) VALUES list,
    GROUP BY pair) — clearer SQL than 160 wide aggregates and exactly
    the same integers; argmin = ORDER BY cost, j, t LIMIT 1 (the Spark
    driver's lexicographic rule). Child selections filter on the root
    pair through a CASE-dispatched feature read (the chosen feature
    index is data, so the column access must be a CASE chain). Empty
    child nodes fall back to the same deterministic _EMPTY row."""
    toks = _toks_duckdb(text_col)
    xdefs = feat_xdefs_duckdb(with_total=True)
    grid = _GRID_SQL
    xcase = _xread("g")
    _best = _best_sql
    # the root-feature read inside cand1 dispatches on b0.j the same way
    b0case = _xread("b0")
    blcase = _xread("bl")
    brcase = _xread("br")
    return f"""
WITH t AS (SELECT {id_col} AS id, {toks} AS tk FROM {table}),
feat AS MATERIALIZED (SELECT id, CAST({_label_expr_duckdb()} AS BIGINT) AS y,
                             {xdefs} FROM t),
grid AS (SELECT * FROM (VALUES {grid}) g(j, t)),
cand0 AS MATERIALIZED (
  SELECT g.j, g.t,
         coalesce(sum(CASE WHEN f.y = 1  AND {xcase} <= g.t THEN 1 END), 0) AS pl,
         coalesce(sum(CASE WHEN f.y = -1 AND {xcase} <= g.t THEN 1 END), 0) AS nl,
         coalesce(sum(CASE WHEN f.y = 1  THEN 1 END), 0) AS p,
         coalesce(sum(CASE WHEN f.y = -1 THEN 1 END), 0) AS n
  FROM feat f CROSS JOIN grid g GROUP BY g.j, g.t),
best0 AS MATERIALIZED ({_best("cand0", "TRUE")}),
cand1 AS MATERIALIZED (
  SELECT CASE WHEN {b0case} <= b0.t THEN 0 ELSE 1 END AS side, g.j, g.t,
         coalesce(sum(CASE WHEN f.y = 1  AND {xcase} <= g.t THEN 1 END), 0) AS pl,
         coalesce(sum(CASE WHEN f.y = -1 AND {xcase} <= g.t THEN 1 END), 0) AS nl,
         coalesce(sum(CASE WHEN f.y = 1  THEN 1 END), 0) AS p,
         coalesce(sum(CASE WHEN f.y = -1 THEN 1 END), 0) AS n
  FROM feat f CROSS JOIN grid g, best0 b0
  GROUP BY 1, g.j, g.t),
bestL AS MATERIALIZED ({_best("cand1", "side = 0")}),
bestR AS MATERIALIZED ({_best("cand1", "side = 1")}),
leaves AS MATERIALIZED (
  SELECT CASE WHEN bl.pl       > bl.nl       THEN 1 ELSE -1 END AS p0,
         CASE WHEN bl.p - bl.pl > bl.n - bl.nl THEN 1 ELSE -1 END AS p1,
         CASE WHEN br.pl       > br.nl       THEN 1 ELSE -1 END AS p2,
         CASE WHEN br.p - br.pl > br.n - br.nl THEN 1 ELSE -1 END AS p3
  FROM bestL bl, bestR br)
SELECT id, y, leaf,
       CAST(CASE leaf WHEN 0 THEN lv.p0 WHEN 1 THEN lv.p1
                      WHEN 2 THEN lv.p2 ELSE lv.p3 END AS BIGINT) AS pred,
       CASE leaf WHEN 0 THEN lv.p0 WHEN 1 THEN lv.p1
                 WHEN 2 THEN lv.p2 ELSE lv.p3 END = y AS correct
FROM (SELECT f.id, f.y,
             CAST(CASE WHEN {b0case} <= b0.t THEN
                    CASE WHEN {blcase} <= bl.t THEN 0 ELSE 1 END
                  ELSE
                    CASE WHEN {brcase} <= br.t THEN 2 ELSE 3 END
                  END AS BIGINT) AS leaf
      FROM feat f, best0 b0, bestL bl, bestR br) q, leaves lv
"""


def quality_tree_cv_scores(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CROSS-VALIDATED tree evaluation — the held-out twin of
    quality_tree_scores, same contract as the perceptron CV
    (classifier.quality_perceptron_cv_scores): deterministic md5 fold
    split fold = h32(id) % k, per-fold induction on the other k−1
    folds (2 aggregate jobs each via _induce_tree), held-out integer
    hit counts vs the train-fold majority baseline. Output: one row
    per fold — (fold, n_train, n_test, correct_cnt, majority_cnt).
    Every selected split, leaf and count is an integer, so the
    held-out numbers replay bit-exactly in DuckDB."""
    feat = (
        tree_features(df, id_col, text_col)
        .withColumn("fold", F.expr(h32_sql("id", "spark")) % k)
        .persist()
    )
    out = []
    try:
        for f in range(k):
            tree, p, n = _induce_tree(feat.where(F.col("fold") != f))
            maj = 1 if p > n else -1
            _, pred = _tree_cols(tree)
            ev = (
                feat.where(F.col("fold") == f)
                .agg(
                    F.count("*").alias("n_test"),
                    F.sum(F.when(pred == F.col("y"), 1)).alias("correct"),
                    F.sum(F.when(F.col("y") == maj, 1)).alias("maj_ok"),
                )
                .collect()[0]
            )
            out.append(
                (
                    f,
                    p + n,
                    int(ev["n_test"] or 0),
                    int(ev["correct"] or 0),
                    int(ev["maj_ok"] or 0),
                )
            )
    finally:
        feat.unpersist()
    return df.sparkSession.createDataFrame(
        out, "fold bigint, n_train bigint, n_test bigint, "
        "correct_cnt bigint, majority_cnt bigint"
    )


def quality_tree_cv_oracle_sql(
    table: str,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Per-fold tree-induction replay: each fold gets its own
    cand0/best0/cand1/bestL/bestR/leaves CTE chain (the full-oracle
    shape filtered to fold <> f), then a held-out eval SELECT over
    fold = f rows; folds unioned. n_train rides best0's node totals
    as a scalar subquery (best0 always holds exactly one row — the
    argmin or the deterministic empty fallback)."""
    toks = _toks_duckdb(text_col)
    hid = h32_sql("id", "duckdb")
    xdefs = feat_xdefs_duckdb(with_total=True)
    grid = _GRID_SQL
    xcase = _xread("g")
    _best = _best_sql
    b0case = _xread("b0")
    blcase = _xread("bl")
    brcase = _xread("br")
    ctes = [
        f"t AS (SELECT {id_col} AS id, {toks} AS tk FROM {table})",
        f"feat AS MATERIALIZED (SELECT id, CAST({_label_expr_duckdb()} AS BIGINT) AS y, "
        f"{xdefs}, CAST(({hid}) % {k} AS BIGINT) AS fold FROM t)",
        f"grid AS (SELECT * FROM (VALUES {grid}) g(j, t))",
    ]
    evals = []
    for f in range(k):
        s = f"f{f}_"
        ctes.append(
            f"{s}cand0 AS MATERIALIZED (SELECT g.j, g.t, "
            f"coalesce(sum(CASE WHEN f.y = 1  AND {xcase} <= g.t THEN 1 END), 0) AS pl, "
            f"coalesce(sum(CASE WHEN f.y = -1 AND {xcase} <= g.t THEN 1 END), 0) AS nl, "
            f"coalesce(sum(CASE WHEN f.y = 1  THEN 1 END), 0) AS p, "
            f"coalesce(sum(CASE WHEN f.y = -1 THEN 1 END), 0) AS n "
            f"FROM feat f CROSS JOIN grid g WHERE f.fold <> {f} GROUP BY g.j, g.t)"
        )
        ctes.append(f"{s}best0 AS MATERIALIZED ({_best(s + 'cand0', 'TRUE')})")
        ctes.append(
            f"{s}cand1 AS MATERIALIZED ("
            f"SELECT CASE WHEN {b0case} <= b0.t THEN 0 ELSE 1 END AS side, g.j, g.t, "
            f"coalesce(sum(CASE WHEN f.y = 1  AND {xcase} <= g.t THEN 1 END), 0) AS pl, "
            f"coalesce(sum(CASE WHEN f.y = -1 AND {xcase} <= g.t THEN 1 END), 0) AS nl, "
            f"coalesce(sum(CASE WHEN f.y = 1  THEN 1 END), 0) AS p, "
            f"coalesce(sum(CASE WHEN f.y = -1 THEN 1 END), 0) AS n "
            f"FROM feat f CROSS JOIN grid g, {s}best0 b0 "
            f"WHERE f.fold <> {f} GROUP BY 1, g.j, g.t)"
        )
        ctes.append(f"{s}bestL AS MATERIALIZED ({_best(s + 'cand1', 'side = 0')})")
        ctes.append(f"{s}bestR AS MATERIALIZED ({_best(s + 'cand1', 'side = 1')})")
        ctes.append(
            f"{s}leaves AS MATERIALIZED ("
            f"SELECT CASE WHEN bl.pl       > bl.nl       THEN 1 ELSE -1 END AS p0, "
            f"CASE WHEN bl.p - bl.pl > bl.n - bl.nl THEN 1 ELSE -1 END AS p1, "
            f"CASE WHEN br.pl       > br.nl       THEN 1 ELSE -1 END AS p2, "
            f"CASE WHEN br.p - br.pl > br.n - br.nl THEN 1 ELSE -1 END AS p3 "
            f"FROM {s}bestL bl, {s}bestR br)"
        )
        evals.append(
            f"SELECT CAST({f} AS BIGINT) AS fold, "
            f"(SELECT CAST(p + n AS BIGINT) FROM {s}best0) AS n_train, "
            f"CAST(count(*) AS BIGINT) AS n_test, "
            f"CAST(coalesce(sum(CASE WHEN pred = y THEN 1 END), 0) AS BIGINT) AS correct_cnt, "
            f"CAST(coalesce(sum(CASE WHEN y = maj THEN 1 END), 0) AS BIGINT) AS majority_cnt "
            f"FROM (SELECT f.y, "
            f"CASE (CASE WHEN {b0case} <= b0.t THEN "
            f"CASE WHEN {blcase} <= bl.t THEN 0 ELSE 1 END ELSE "
            f"CASE WHEN {brcase} <= br.t THEN 2 ELSE 3 END END) "
            f"WHEN 0 THEN lv.p0 WHEN 1 THEN lv.p1 WHEN 2 THEN lv.p2 ELSE lv.p3 END AS pred, "
            f"CASE WHEN b0.p > b0.n THEN 1 ELSE -1 END AS maj "
            f"FROM feat f, {s}best0 b0, {s}bestL bl, {s}bestR br, {s}leaves lv "
            f"WHERE f.fold = {f}) q"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(evals)


# --- integer boosting-by-majority -------------------------------------------
#
# AdaBoost's multiplicative reweighting with the factor fixed at 2:
# every sample's weight DOUBLES each time the current stump misreads it
# (w_i = 2^mistakes — Littlestone-Warmuth multiplicative weights), and
# each round picks the decision stump (feature, threshold, polarity)
# minimizing the WEIGHTED misclassification count. Because the factor
# is an integer, every weight and every weighted error is an exact
# integer — the whole ensemble induction replays bit-exactly in DuckDB
# as chained stump CTEs, like the perceptron epochs and the tree
# levels. The final classifier is the unweighted MAJORITY VOTE of the
# stumps (odd T → no vote ties).
#
# Overflow bound: weights ≤ 2^T, weighted sums ≤ 2^T · n_docs — at
# T=11 that is 2048·n, int64-safe to ~4.5e15 docs. Raising T toward
# ~40 needs the same HUGEINT-oracle care as the money sums.

BOOST_ROUNDS = 11


def _stump_pred(r: dict, j: int, t: int, pol: int) -> int:
    return pol if r[f"x{j}"] <= t else -pol


def train_quality_boost(
    df: DataFrame,
    rounds: int = BOOST_ROUNDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[list[tuple[int, int, int]], DataFrame]:
    """T rounds × ONE weighted candidate-count aggregate each: round r
    projects w = Π_{q<r} (2 if stump_q wrong else 1) from the previous
    stumps as literals, sums w over the wrong-side rows per grid pair
    (map-side combined, shuffle payload = |grid|+1 longs), and the
    driver picks the (err, j, t, pol)-lexicographic minimum (polarity
    −1 wins exact ties, matching the oracle's ORDER BY). Returns
    (stumps, features); features persisted — eager callers unpersist."""
    feat = tree_features(df, id_col, text_col).persist()
    stumps, _, _ = _induce_boost(feat, rounds)
    return stumps, feat


def _induce_boost(
    feat: DataFrame, rounds: int
) -> tuple[list[tuple[int, int, int]], int, int]:
    """The round loop over an (already filtered/persisted) feature
    frame; returns (stumps, pos, neg) — the node's class totals ride
    the last round's aggregate, so CV gets n_train and the majority
    baseline without an extra job. Memoized per (frame plan, rounds)
    — the classifier-family suite-cost rationale."""
    if rounds < 1:
        raise ValueError("boosting needs at least one stump round")
    from tabsketchfm_spark.operators.classifier import _memo_train

    return _memo_train(
        feat,
        ("boost", rounds, tuple(FEATURES), tuple(THRESHOLDS)),
        lambda: _induce_boost_impl(feat, rounds),
    )


def _induce_boost_impl(
    feat: DataFrame, rounds: int
) -> tuple[list[tuple[int, int, int]], int, int]:
    spark = feat.sparkSession
    stumps: list[tuple[int, int, int]] = []
    # stumps enter as a BROADCAST one-row frame with T fixed slots
    # (j_q, t_q, pol_q, act_q), not literals: the per-round plan is
    # then IDENTICAL (only broadcast data changes), so whole-stage
    # codegen compiles ONCE instead of a fresh multi-second Janino
    # compile per round on the growing weight product (measured
    # 38.6s → 5.7s for 11 rounds at sf0.01 — the langid lesson)
    sschema = ", ".join(
        f"j_{q} bigint, t_{q} bigint, pol_{q} bigint, act_{q} bigint"
        for q in range(rounds)
    )
    w = F.lit(1).cast("bigint")
    for q in range(rounds):
        xq = F.lit(None).cast("bigint")
        for j in reversed(FEATURES):
            xq = F.when(F.col(f"j_{q}") == j, F.col(f"x{j}")).otherwise(xq)
        pred = F.when(xq <= F.col(f"t_{q}"), F.col(f"pol_{q}")).otherwise(
            -F.col(f"pol_{q}")
        )
        w = w * (
            F.when(F.col(f"act_{q}") == 0, 1)
            .when(pred != F.col("y"), 2)
            .otherwise(1)
        )
    # w computed ONCE in a projection; the aggregate's 1+|grid| sums
    # then read a small column instead of each re-embedding the
    # T-slot weight product (langid's proj pattern — inlining w into
    # 127 sum expressions blew the codegen heap)
    aggs = [
        F.sum(F.col("w")).alias("wt"),
        # UNWEIGHTED class totals ride every round (CV reads them off
        # the last one — n_train + majority baseline at no extra job)
        F.sum(F.when(F.col("y") == 1, 1)).alias("p"),
        F.sum(F.when(F.col("y") == -1, 1)).alias("n"),
    ]
    for j in FEATURES:
        for t in THRESHOLDS:
            pred_pos = F.when(F.col(f"x{j}") <= t, 1).otherwise(-1)
            aggs.append(
                F.sum(F.when(pred_pos != F.col("y"), F.col("w"))).alias(f"e_{j}_{t}")
            )
    for _ in range(rounds):
        slot = []
        for q in range(rounds):
            j, t, pol = stumps[q] if q < len(stumps) else (FEATURES[0], 0, 1)
            slot += [j, t, pol, 1 if q < len(stumps) else 0]
        sdf = spark.createDataFrame([tuple(slot)], sschema)
        proj = feat.crossJoin(F.broadcast(sdf)).select(
            "y", *[f"x{j}" for j in FEATURES], w.alias("w")
        )
        r = proj.agg(*aggs).collect()[0]
        wt = int(r["wt"] or 0)
        best = None
        for j in FEATURES:
            for t in THRESHOLDS:
                epos = int(r[f"e_{j}_{t}"] or 0)
                for pol, err in ((1, epos), (-1, wt - epos)):
                    key = (err, j, t, pol)
                    if best is None or key < best:
                        best = key
        stumps.append((best[1], best[2], best[3]))
    # the rounds < 1 guard makes the loop run at least once, so r is
    # always bound (rounds=0 is deliberately NOT supported here —
    # unlike the perceptron's epochs=0 baseline path)
    return stumps, int(r["p"] or 0), int(r["n"] or 0)


def quality_boost_scores(
    df: DataFrame,
    rounds: int = BOOST_ROUNDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train the stump ensemble on the corpus' own gopher seed labels,
    then score every doc with the majority vote as a literal
    projection. Output: (id, y, vote, pred, correct) — exact integers,
    bit-exact vs quality_boost_oracle_sql."""
    stumps, feat = train_quality_boost(df, rounds, id_col, text_col)
    vote = _boost_vote(stumps).cast("bigint")
    return feat.select(
        "id",
        "y",
        vote.alias("vote"),
        (vote > 0).alias("pred"),
        ((vote > 0) == (F.col("y") == 1)).alias("correct"),
    )


def quality_boost_oracle_sql(
    table: str,
    rounds: int = BOOST_ROUNDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Ensemble-induction REPLAY: round r's candidate CTE cross-joins
    the grid AND the r−1 previous one-row stump CTEs (the weight
    product dispatches each stump's feature read through a CASE chain);
    each stump CTE is the two-polarity argmin ORDER BY err, j, t, pol
    LIMIT 1 — the driver's exact lexicographic rule."""
    if rounds < 1:
        raise ValueError("boosting needs at least one stump round")
    toks = _toks_duckdb(text_col)
    xdefs = feat_xdefs_duckdb(with_total=True)
    grid = _GRID_SQL
    xcase = _xread("g")
    spred = _spred

    ctes = [
        f"t AS (SELECT {id_col} AS id, {toks} AS tk FROM {table})",
        f"feat AS MATERIALIZED (SELECT id, CAST({_label_expr_duckdb()} AS BIGINT) AS y,"
        f" {xdefs} FROM t)",
        f"grid AS (SELECT * FROM (VALUES {grid}) g(j, t))",
    ]
    for r in range(1, rounds + 1):
        prev = [f"s{q}" for q in range(1, r)]
        wexpr = " * ".join(
            [f"CASE WHEN {spred(a)} <> f.y THEN 2 ELSE 1 END" for a in prev]
        ) or "1"
        joins = "".join(f", {a} {a}" for a in prev)
        ctes.append(
            # MATERIALIZED: s{r} reads cand{r} in BOTH polarity
            # branches — a plain CTE re-evaluates the weighted
            # feat×grid aggregate per reference (the pagerank lesson)
            f"cand{r} AS MATERIALIZED (SELECT g.j, g.t, "
            f"coalesce(sum(CASE WHEN (CASE WHEN {xcase} <= g.t THEN 1 ELSE -1 END)"
            f" <> f.y THEN CAST({wexpr} AS BIGINT) END), 0) AS epos, "
            f"sum(CAST({wexpr} AS BIGINT)) AS wt "
            f"FROM feat f CROSS JOIN grid g{joins} GROUP BY g.j, g.t)"
        )
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT j, t, pol FROM "
            f"(SELECT j, t, 1 AS pol, epos AS err FROM cand{r} "
            f"UNION ALL SELECT j, t, -1, wt - epos FROM cand{r}) c "
            f"ORDER BY err, j, t, pol LIMIT 1)"
        )
    vote = " + ".join(spred(f"s{r}") for r in range(1, rounds + 1))
    joins = "".join(f", s{r} s{r}" for r in range(1, rounds + 1))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT f.id, f.y, CAST({vote} AS BIGINT) AS vote, ({vote}) > 0 AS pred,
       (({vote}) > 0) = (f.y = 1) AS correct
FROM feat f{joins}
"""
    )


def quality_boost_cv_scores(
    df: DataFrame,
    k: int = 3,
    rounds: int = BOOST_ROUNDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CROSS-VALIDATED booster evaluation — same contract as the
    perceptron/tree CVs: md5 fold split, per-fold ensemble induction
    (rounds × one weighted aggregate via _induce_boost), held-out
    integer hit counts vs the train-fold majority baseline. Output:
    (fold, n_train, n_test, correct_cnt, majority_cnt)."""
    feat = (
        tree_features(df, id_col, text_col)
        .withColumn("fold", F.expr(h32_sql("id", "spark")) % k)
        .persist()
    )
    out = []
    try:
        for f in range(k):
            stumps, p, n = _induce_boost(feat.where(F.col("fold") != f), rounds)
            maj = 1 if p > n else -1
            hit = (_boost_vote(stumps) > 0) == (F.col("y") == 1)
            ev = (
                feat.where(F.col("fold") == f)
                .agg(
                    F.count("*").alias("n_test"),
                    F.sum(F.when(hit, 1)).alias("correct"),
                    F.sum(F.when(F.col("y") == maj, 1)).alias("maj_ok"),
                )
                .collect()[0]
            )
            out.append(
                (
                    f,
                    p + n,
                    int(ev["n_test"] or 0),
                    int(ev["correct"] or 0),
                    int(ev["maj_ok"] or 0),
                )
            )
    finally:
        feat.unpersist()
    return df.sparkSession.createDataFrame(
        out, "fold bigint, n_train bigint, n_test bigint, "
        "correct_cnt bigint, majority_cnt bigint"
    )


def quality_boost_cv_oracle_sql(
    table: str,
    k: int = 3,
    rounds: int = BOOST_ROUNDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Per-fold ensemble-induction replay (the quality_boost chained
    stump CTEs filtered to fold <> f) + a held-out eval per fold.
    Degenerate-fold-safe like the perceptron CV oracle: the train-set
    p/n come from an ungrouped aggregate CTE (always one row), each
    stump CTE unions a deterministic fallback (FEATURES[0],
    THRESHOLDS[0], pol −1 — exactly the Spark driver's argmin over an
    all-zero aggregate row), and the eval LEFT JOINs the one-row state
    onto the held-out rows."""
    if rounds < 1:
        raise ValueError("boosting needs at least one stump round")
    toks = _toks_duckdb(text_col)
    hid = h32_sql("id", "duckdb")
    xdefs = feat_xdefs_duckdb(with_total=True)
    xcase = _xread("g")
    spred = _spred

    ctes = [
        f"t AS (SELECT {id_col} AS id, {toks} AS tk FROM {table})",
        f"feat AS MATERIALIZED (SELECT id, CAST({_label_expr_duckdb()} AS BIGINT) AS y,"
        f" {xdefs}, CAST(({hid}) % {k} AS BIGINT) AS fold FROM t)",
        f"grid AS (SELECT * FROM (VALUES {_GRID_SQL}) g(j, t))",
    ]
    evals = []
    for f in range(k):
        s = f"f{f}_"
        ctes.append(
            f"{s}pn AS MATERIALIZED (SELECT "
            f"CAST(coalesce(sum(CASE WHEN y = 1 THEN 1 END), 0) AS BIGINT) AS p, "
            f"CAST(coalesce(sum(CASE WHEN y = -1 THEN 1 END), 0) AS BIGINT) AS n "
            f"FROM feat WHERE fold <> {f})"
        )
        for r in range(1, rounds + 1):
            prev = [f"{s}s{q}" for q in range(1, r)]
            wexpr = " * ".join(
                [f"CASE WHEN {spred(a)} <> f.y THEN 2 ELSE 1 END" for a in prev]
            ) or "1"
            joins = "".join(f", {a} {a}" for a in prev)
            ctes.append(
                f"{s}cand{r} AS MATERIALIZED (SELECT g.j, g.t, "
                f"coalesce(sum(CASE WHEN (CASE WHEN {xcase} <= g.t THEN 1 ELSE -1 END)"
                f" <> f.y THEN CAST({wexpr} AS BIGINT) END), 0) AS epos, "
                f"sum(CAST({wexpr} AS BIGINT)) AS wt "
                f"FROM feat f CROSS JOIN grid g{joins} "
                f"WHERE f.fold <> {f} GROUP BY g.j, g.t)"
            )
            ctes.append(
                f"{s}s{r} AS MATERIALIZED ((SELECT j, t, pol FROM "
                f"(SELECT j, t, 1 AS pol, epos AS err FROM {s}cand{r} "
                f"UNION ALL SELECT j, t, -1, wt - epos FROM {s}cand{r}) c "
                f"ORDER BY err, j, t, pol LIMIT 1) "
                f"UNION ALL SELECT {FEATURES[0]} AS j, {THRESHOLDS[0]} AS t, -1 AS pol "
                f"WHERE NOT EXISTS (SELECT 1 FROM {s}cand{r}))"
            )
        vote = " + ".join(spred(f"{s}s{r}") for r in range(1, rounds + 1))
        joins = "".join(f", {s}s{r} {s}s{r}" for r in range(1, rounds + 1))
        evals.append(
            f"SELECT CAST({f} AS BIGINT) AS fold, "
            f"CAST(w.p + w.n AS BIGINT) AS n_train, "
            f"CAST(count(f.y) AS BIGINT) AS n_test, "
            f"CAST(coalesce(sum(CASE WHEN (({vote}) > 0) = (f.y = 1) THEN 1 END), 0)"
            f" AS BIGINT) AS correct_cnt, "
            f"CAST(coalesce(sum(CASE WHEN f.y = (CASE WHEN w.p > w.n THEN 1 ELSE -1 END)"
            f" THEN 1 END), 0) AS BIGINT) AS majority_cnt "
            f"FROM {s}pn w{joins} LEFT JOIN feat f ON f.fold = {f} "
            f"GROUP BY w.p, w.n"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(evals)


# --- oracle-exact model selection -------------------------------------------

FAMILIES = ("boost", "majority", "perceptron", "tree")


def quality_model_selection(
    df: DataFrame,
    k: int = 3,
    epochs: int = 6,
    rounds: int = BOOST_ROUNDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ORACLE-EXACT MODEL SELECTION — the capstone of the trained
    families: train all three (perceptron, tree, boost) per CV fold on
    ONE shared persisted feature frame, score every family plus the
    majority baseline on the held-out fold in ONE aggregate, and pick
    the winner by total held-out hits (tie → lexicographically
    smallest family name). Every quantity in training, evaluation AND
    the selection rule is an integer, so the whole train→evaluate→
    select workflow replays bit-exactly in DuckDB — the reference's
    "train and keep the best model" loop as a verifiable lake query.

    Output: one row per family — (family, heldout_correct, n_test,
    selected)."""
    from tabsketchfm_spark.operators.classifier import _train_perceptron_on

    feat = (
        tree_features(df, id_col, text_col)
        .withColumn("fold", F.expr(h32_sql("id", "spark")) % k)
        .persist()
    )
    dim = N_BUCKETS + 1
    tot = {fam: 0 for fam in FAMILIES}
    n_test_total = 0
    try:
        for f in range(k):
            train = feat.where(F.col("fold") != f)
            w, p, n = _train_perceptron_on(train, epochs)
            tree, _, _ = _induce_tree(train)
            stumps, _, _ = _induce_boost(train, rounds)
            maj = 1 if p > n else -1
            pscore = sum(F.lit(int(w[j])) * F.col(f"x{j}") for j in range(dim))
            ppred = F.when(pscore > 0, 1).otherwise(-1)
            _, tpred = _tree_cols(tree)
            vote = _boost_vote(stumps)
            ev = (
                feat.where(F.col("fold") == f)
                .agg(
                    F.count("*").alias("nt"),
                    F.sum(F.when(ppred == F.col("y"), 1)).alias("perceptron"),
                    F.sum(F.when(tpred == F.col("y"), 1)).alias("tree"),
                    F.sum(
                        F.when((vote > 0) == (F.col("y") == 1), 1)
                    ).alias("boost"),
                    F.sum(F.when(F.col("y") == maj, 1)).alias("majority"),
                )
                .collect()[0]
            )
            n_test_total += int(ev["nt"] or 0)
            for fam in FAMILIES:
                tot[fam] += int(ev[fam] or 0)
    finally:
        feat.unpersist()
    best = max(tot.values())
    winner = min(fam for fam in FAMILIES if tot[fam] == best)
    rows = [(fam, tot[fam], n_test_total, fam == winner) for fam in FAMILIES]
    return df.sparkSession.createDataFrame(
        rows, "family string, heldout_correct bigint, n_test bigint, "
        "selected boolean"
    )


def quality_model_selection_oracle_sql(
    table: str,
    k: int = 3,
    epochs: int = 6,
    rounds: int = BOOST_ROUNDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Wraps the three per-family CV replays as subqueries (each is a
    self-contained WITH), sums their held-out hits, and applies the
    SAME argmax-with-lexicographic-tie rule. The majority baseline and
    n_test ride the perceptron CV's rows (all three CVs share the fold
    split and labels, so the numbers are identical by construction)."""
    if rounds < 1:
        raise ValueError("boosting needs at least one stump round")
    from tabsketchfm_spark.operators.classifier import (
        quality_perceptron_cv_oracle_sql,
    )

    perc = quality_perceptron_cv_oracle_sql(table, k, epochs, id_col, text_col)
    tre = quality_tree_cv_oracle_sql(table, k, id_col, text_col)
    boo = quality_boost_cv_oracle_sql(table, k, rounds, id_col, text_col)
    return f"""
WITH perc AS MATERIALIZED (SELECT sum(correct_cnt) AS c, sum(n_test) AS nt,
                                  sum(majority_cnt) AS m FROM ({perc}) q),
tre AS MATERIALIZED (SELECT sum(correct_cnt) AS c FROM ({tre}) q),
boo AS MATERIALIZED (SELECT sum(correct_cnt) AS c FROM ({boo}) q),
fam AS MATERIALIZED (
  SELECT 'boost' AS family, c FROM boo
  UNION ALL SELECT 'majority', m FROM perc
  UNION ALL SELECT 'perceptron', c FROM perc
  UNION ALL SELECT 'tree', c FROM tre),
win AS (SELECT min(family) AS wf FROM fam WHERE c = (SELECT max(c) FROM fam))
SELECT family, CAST(c AS BIGINT) AS heldout_correct,
       (SELECT CAST(nt AS BIGINT) FROM perc) AS n_test,
       family = (SELECT wf FROM win) AS selected
FROM fam
"""


def train_quality_boost_py(
    rows: list[dict], rounds: int = BOOST_ROUNDS
) -> list[tuple[int, int, int]]:
    """Independent driver-side fold — the pin twin for the booster."""
    w = [1] * len(rows)
    stumps = []
    for _ in range(rounds):
        wt = sum(w)
        best = None
        for j in FEATURES:
            for t in THRESHOLDS:
                epos = sum(
                    w[i]
                    for i, r in enumerate(rows)
                    if (1 if r[f"x{j}"] <= t else -1) != r["y"]
                )
                for pol, err in ((1, epos), (-1, wt - epos)):
                    key = (err, j, t, pol)
                    if best is None or key < best:
                        best = key
        j, t, pol = best[1], best[2], best[3]
        stumps.append((j, t, pol))
        for i, r in enumerate(rows):
            if _stump_pred(r, j, t, pol) != r["y"]:
                w[i] *= 2
    return stumps


def train_quality_tree_py(rows: list[dict]) -> dict:
    """Independent driver-side fold over collected feature rows — the
    implementation-pin twin: same integer split search, no Spark."""

    def counts(sub):
        out = []
        p = sum(1 for r in sub if r["y"] == 1)
        n = len(sub) - p
        for j in FEATURES:
            for t in THRESHOLDS:
                pl = sum(1 for r in sub if r[f"x{j}"] <= t and r["y"] == 1)
                nl = sum(1 for r in sub if r[f"x{j}"] <= t and r["y"] == -1)
                out.append((j, t, pl, nl, p, n))
        return out

    j0, t0, *_ = _argmin_split(counts(rows))
    L = [r for r in rows if r[f"x{j0}"] <= t0]
    R = [r for r in rows if r[f"x{j0}"] > t0]
    jl, tl, pll, nll, pL, nL = _argmin_split(counts(L)) if L else _EMPTY
    jr, tr, plr, nlr, pR, nR = _argmin_split(counts(R)) if R else _EMPTY
    return {
        "root": (j0, t0),
        "left": (jl, tl),
        "right": (jr, tr),
        "leaves": [
            _leaf_pred(pll, nll),
            _leaf_pred(pL - pll, nL - nll),
            _leaf_pred(plr, nlr),
            _leaf_pred(pR - plr, nR - nlr),
        ],
    }
