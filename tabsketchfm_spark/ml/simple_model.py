"""M4: the reference's SimpleModel baseline — 2-layer MLP over the
table's hashing vector (reference SimpleModel.py:3-15: Linear(hash_
input_size, hidden) → ReLU → Linear(hidden, hidden); fed by the SK4
hashing vectorizer, selected when config.task_specific_params is
falsy, tabsketchfm_finetune.py:21-25).

Spark-first twist: with fixed (seeded) weights the whole forward is a
CLOSED-FORM column expression — per-table signed token counts (exact
integers), L2 normalization, then the two linear layers unrolled as
literal arithmetic. No UDF, no driver math: the entire network runs
inside whole-stage codegen, and the identical expression text runs in
DuckDB, making this a bit-exact ORACLE-CHECKED neural forward.

Staged projections (counts → x → hidden → out) keep each expression
small; Spark's CollapseProject leaves multiply-referenced non-cheap
expressions staged, and codegen's subexpression elimination covers the
rest. Floating-point determinism: every sum here is over LITERAL terms
evaluated left-to-right (never a data-order-dependent float
aggregation), so Spark and DuckDB produce identical doubles.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from tabsketchfm_spark.functions.hashing import h32_sql
from tabsketchfm_spark.ml.reference_forward import _seed

N_FEATURES = 16  # hash_input_size for the registered query
HIDDEN = 8  # config.hidden_size analogue for the MLP


def weights(
    n_features: int = N_FEATURES, hidden: int = HIDDEN, no_pretrain: bool = False
) -> dict[str, np.ndarray]:
    """Seeded state dict for the two Linear layers. ``no_pretrain``
    re-inits in a different namespace (M12 --no-pretrain ablation,
    finetune.py:143-147) — same shapes, fresh weights."""
    ns = "simple.reinit" if no_pretrain else "simple"
    r1 = np.random.RandomState(_seed(ns, "l1", n_features, hidden))
    r2 = np.random.RandomState(_seed(ns, "l2", hidden))
    return {
        "w1": r1.standard_normal((hidden, n_features)) / math.sqrt(n_features),
        "b1": r1.standard_normal(hidden) / math.sqrt(hidden),
        "w2": r2.standard_normal((hidden, hidden)) / math.sqrt(hidden),
        "b2": r2.standard_normal(hidden) / math.sqrt(hidden),
    }


def forward_numpy(x: np.ndarray, w: dict[str, np.ndarray]) -> np.ndarray:
    """The torch forward, verbatim math: linear1 → ReLU → linear2."""
    h = np.maximum(x @ w["w1"].T + w["b1"], 0.0)
    return h @ w["w2"].T + w["b2"]


def _lit(v: float) -> str:
    # %.17e round-trips float64 exactly and the exponent form parses as
    # DOUBLE in BOTH engines (a bare 0.5 is DECIMAL in Spark SQL)
    return f"{v:.17e}"


def _affine(wrow: np.ndarray, b: float, terms: list[str]) -> str:
    """b + Σ w_i * term_i, written left-to-right — both engines
    evaluate the literal chain in this exact order."""
    s = _lit(float(b))
    for wi, t in zip(wrow, terms):
        s = f"({s} + {_lit(float(wi))} * {t})"
    return s


def _stage_exprs(
    n_features: int, hidden: int, w: dict[str, np.ndarray]
) -> tuple[str, list[str], list[str], list[str]]:
    """(l2_expr over c_i, x exprs over counts, hidden exprs over x,
    out exprs over h) — dialect-neutral SQL fragments."""
    sq = " + ".join(f"(c{i} * c{i})" for i in range(n_features))
    l2 = f"sqrt(cast({sq} as double))"
    # tie-safe quantizer: round() ties differ (Spark HALF_UP vs DuckDB
    # HALF_EVEN); floor(x*1e10 + 0.5) is the same IEEE ops — hence the
    # same value — in both engines for any sign (floor is toward -inf
    # in both, so negative signed-hash counts stay bit-identical too)
    xs = [
        f"(floor(cast(c{i} as double) / l2 * 1e10 + 0.5) / 1e10)"
        for i in range(n_features)
    ]
    hs = [
        f"greatest({_affine(w['w1'][j], w['b1'][j], [f'x{i}' for i in range(n_features)])}, cast(0.0 as double))"
        for j in range(hidden)
    ]
    outs = [
        _affine(w["w2"][k], w["b2"][k], [f"h{j}" for j in range(hidden)])
        for k in range(hidden)
    ]
    return l2, xs, hs, outs


def simple_model_scores(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    columns: dict[str, list[str]],
    n_features: int = N_FEATURES,
    hidden: int = HIDDEN,
    no_pretrain: bool = False,
) -> DataFrame:
    """One output row per table: (table_name, out_0..out_{hidden-1}) =
    SimpleModel(hashing_vector(table)). The vectorizer is SK4's exact
    pipeline (melt → whitespace tokens → signed h32 % n_features →
    summed signs → L2 norm) at MLP width."""
    from tabsketchfm_spark.operators.melt import melt_values

    w = weights(n_features, hidden, no_pretrain)
    l2, xs, hs, outs = _stage_exprs(n_features, hidden, w)
    parts = []
    for name, df in tables.items():
        m = melt_values(df, columns[name], spread=False)
        tok = m.select(F.explode(F.split("v", r"\s+")).alias("t")).where(
            F.col("t") != ""
        )
        h = F.expr(h32_sql("t", "spark"))
        signed = tok.select(
            (h % n_features).cast("int").alias("fi"),
            F.when((F.shiftright(h, 31).bitwiseAND(F.lit(1))) == 1, -1)
            .otherwise(1)
            .alias("sign"),
        )
        counts = signed.agg(
            *[
                F.coalesce(
                    F.sum(F.when(F.col("fi") == i, F.col("sign"))), F.lit(0)
                ).alias(f"c{i}")
                for i in range(n_features)
            ]
        )
        row = (
            counts.withColumn("l2", F.expr(l2))
            .select(
                F.lit(name).alias("table_name"),
                *[F.expr(x).alias(f"x{i}") for i, x in enumerate(xs)],
            )
            .select(
                "table_name",
                *[F.expr(hh).alias(f"h{j}") for j, hh in enumerate(hs)],
            )
            .select(
                "table_name",
                *[F.expr(o).alias(f"out_{k}") for k, o in enumerate(outs)],
            )
        )
        parts.append(row)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def simple_model_oracle_sql(
    columns: dict[str, list[str]],
    n_features: int = N_FEATURES,
    hidden: int = HIDDEN,
    no_pretrain: bool = False,
) -> str:
    """DuckDB mirror: the SAME staged expression text over the same
    signed-count pipeline, one CTE chain per table, UNION ALL."""
    w = weights(n_features, hidden, no_pretrain)
    l2, xs, hs, outs = _stage_exprs(n_features, hidden, w)
    h = h32_sql("t", "duckdb")
    selects = []
    for name, cols in columns.items():
        vals = " UNION ALL ".join(
            f"SELECT nullif(CAST({c} AS VARCHAR), '') AS v FROM {name}"
            for c in cols
        )
        csel = ", ".join(
            f"coalesce(sum(CASE WHEN fi = {i} THEN sign END), 0) AS c{i}"
            for i in range(n_features)
        )
        xsel = ", ".join(f"{x} AS x{i}" for i, x in enumerate(xs))
        hsel = ", ".join(f"{hh} AS h{j}" for j, hh in enumerate(hs))
        osel = ", ".join(f"{o} AS out_{k}" for k, o in enumerate(outs))
        selects.append(
            f"""
SELECT '{name}' AS table_name, {osel} FROM (
  SELECT {hsel} FROM (
    SELECT {xsel} FROM (
      SELECT *, {l2} AS l2 FROM (
        SELECT {csel} FROM (
          SELECT CAST(h % {n_features} AS INTEGER) AS fi,
                 CASE WHEN (h >> 31) & 1 = 1 THEN -1 ELSE 1 END AS sign
          FROM (SELECT {h} AS h
                FROM (SELECT unnest(string_split_regex(v, '\\s+')) AS t
                      FROM ({vals}) vals WHERE v IS NOT NULL) toks
                WHERE t <> '') hs0) sg) cnts) withl2) xv) hv"""
        )
    return " UNION ALL ".join(selects)


SIMPLE_MODEL_COLUMNS = {
    "part": ["p_name", "p_type"],
    "supplier": ["s_name", "s_nationkey"],
    "customer": ["c_name", "c_mktsegment"],
}
