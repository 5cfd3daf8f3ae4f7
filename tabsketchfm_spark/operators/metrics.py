"""A12: evaluation-metric aggregates (reference tabsketchfm_finetune.py:
163-182 — accuracy, weighted F1, R², Pearson r) as pure SQL aggregates.

The reference collects step outputs to the driver and calls sklearn /
scipy; here the same metrics are single-pass grouped aggregations —
the distributed form a 100 TB evaluation run needs. Predictions are
deterministic derived columns (this engine trains no model — see
ml/embed.py), so the metric VALUES are oracle-checkable; plug real
prediction columns in unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def classification_metrics(emb: DataFrame) -> DataFrame:
    """Accuracy + weighted F1 over (label, pred) where pred is the
    deterministic stand-in ``vec_id % 10``. One pass builds the
    confusion counts; F1 combines per-class precision/recall weighted
    by support (sklearn 'weighted' average).
    Output: one row (n, accuracy, f1_weighted)."""
    d = emb.select(
        F.col("label").cast("int").alias("y"),
        (F.col("vec_id") % 10).cast("int").alias("p"),
    )
    per_class = d.groupBy("y").agg(F.count(F.lit(1)).alias("support"))
    tp = d.where(F.col("y") == F.col("p")).groupBy("y").agg(
        F.count(F.lit(1)).alias("tp")
    )
    pred_cnt = d.groupBy(F.col("p").alias("y")).agg(F.count(F.lit(1)).alias("pred_n"))
    cls = (
        per_class.join(tp, "y", "left")
        .join(pred_cnt, "y", "left")
        .select(
            "y",
            "support",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("pred_n", F.lit(0)).alias("pred_n"),
        )
        .select(
            "y",
            "support",
            "tp",
            (F.col("tp") / F.greatest("pred_n", F.lit(1))).alias("prec"),
            (F.col("tp") / F.col("support")).alias("rec"),
        )
        .select(
            "y",
            "support",
            "tp",
            F.when(
                (F.col("prec") + F.col("rec")) > 0,
                2 * F.col("prec") * F.col("rec") / (F.col("prec") + F.col("rec")),
            )
            .otherwise(0.0)
            .alias("f1"),
        )
    )
    return cls.agg(
        F.sum("support").alias("n"),
        F.round(F.sum("tp") / F.sum("support"), 6).alias("accuracy"),
        F.round(
            F.sum(F.col("f1") * F.col("support")) / F.sum("support"), 6
        ).alias("f1_weighted"),
    )


def classification_metrics_oracle_sql(table: str) -> str:
    return f"""
WITH d AS (SELECT CAST(label AS INTEGER) AS y,
                  CAST(vec_id % 10 AS INTEGER) AS p FROM {table}),
sup AS (SELECT y, count(*) AS support FROM d GROUP BY y),
tp AS (SELECT y, count(*) AS tp FROM d WHERE y = p GROUP BY y),
pc AS (SELECT p AS y, count(*) AS pred_n FROM d GROUP BY p),
cls AS (SELECT s.y, s.support, coalesce(tp.tp, 0) AS tp,
               coalesce(tp.tp, 0) / CAST(greatest(coalesce(pc.pred_n, 0), 1) AS DOUBLE) AS prec,
               coalesce(tp.tp, 0) / CAST(s.support AS DOUBLE) AS rec
        FROM sup s LEFT JOIN tp ON s.y = tp.y LEFT JOIN pc ON s.y = pc.y),
f AS (SELECT y, support, tp,
             CASE WHEN prec + rec > 0 THEN 2 * prec * rec / (prec + rec)
                  ELSE 0.0 END AS f1
      FROM cls)
SELECT CAST(sum(support) AS BIGINT) AS n,
       round(sum(tp) / CAST(sum(support) AS DOUBLE), 6) AS accuracy,
       round(sum(f1 * support) / sum(support), 6) AS f1_weighted
FROM f
"""


def regression_metrics(events: DataFrame) -> DataFrame:
    """R² + Pearson r between ``value`` and a deterministic stand-in
    prediction (value's rank-free proxy: user_id-seeded shift). R² =
    1 - SS_res/SS_tot; Pearson via the corr aggregate.
    Output: one row (n, r2, pearson_r)."""
    # all moments from exact decimal sums (partition-order-free — same
    # hardening as the profiler): ss_res = Syy - 2Spy + Spp,
    # ss_tot = Syy - Sy²/n, r via the product-moment formula
    d = events.select(
        F.col("value").cast("decimal(19,6)").alias("y"),
        (F.col("value") + (F.col("user_id") % 7) - 3)
        .cast("decimal(19,6)")
        .alias("p"),
    ).where(F.col("y").isNotNull())
    agg = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("p").cast("double").alias("sp"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("p") * F.col("p")).cast("double").alias("spp"),
        F.sum(F.col("y") * F.col("p")).cast("double").alias("spy"),
    )
    ss_res = F.col("syy") - 2 * F.col("spy") + F.col("spp")
    ss_tot = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    r = (F.col("n") * F.col("spy") - F.col("sp") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("spp") - F.col("sp") * F.col("sp"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select(
        "n",
        F.round(1 - ss_res / ss_tot, 6).alias("r2"),
        F.round(r, 6).alias("pearson_r"),
    )


def regression_metrics_oracle_sql(table: str) -> str:
    return f"""
WITH d AS (SELECT CAST(value AS DECIMAL(19,6)) AS y,
                  CAST(value + (user_id % 7) - 3 AS DECIMAL(19,6)) AS p
           FROM {table} WHERE value IS NOT NULL),
a AS (SELECT count(*) AS n,
             CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(p) AS DOUBLE) AS sp,
             CAST(sum(y * y) AS DOUBLE) AS syy, CAST(sum(p * p) AS DOUBLE) AS spp,
             CAST(sum(y * p) AS DOUBLE) AS spy
      FROM d)
SELECT n,
       round(1 - (syy - 2 * spy + spp) / (syy - sy * sy / n), 6) AS r2,
       round((n * spy - sp * sy)
             / (sqrt(n * spp - sp * sp) * sqrt(n * syy - sy * sy)), 6) AS pearson_r
FROM a
"""


NAME_REQUESTS = ["customer", "orders.csv", "lineitem.csv", "no_such.csv"]


def name_repair(spark, sf_dir: str) -> DataFrame:
    """P9 (reference tabular_dataset.py:254-258): resolve requested
    file names against the lake index, retrying with the '.csv' stem
    stripped — coalesce over two join attempts.
    Output: (requested, resolved nullable)."""
    from tabsketchfm_spark.operators.structural import lake_index

    idx = lake_index(spark, sf_dir).select(F.col("table_name").alias("t"))
    req = spark.createDataFrame([(r,) for r in NAME_REQUESTS], "requested string")
    exact = req.join(
        F.broadcast(idx), F.col("requested") == F.col("t"), "left"
    ).select("requested", F.col("t").alias("exact_hit"))
    stem = exact.withColumn(
        "stem", F.regexp_replace("requested", r"\.csv$", "")
    ).join(
        F.broadcast(idx.withColumnRenamed("t", "t2")),
        F.col("stem") == F.col("t2"),
        "left",
    )
    return stem.select(
        "requested",
        F.coalesce("exact_hit", "t2").alias("resolved"),
    )


def name_repair_oracle_sql() -> str:
    from tabsketchfm_spark.operators.structural import lake_index_oracle_sql

    vals = ", ".join(f"('{r}')" for r in NAME_REQUESTS)
    return f"""
WITH idx AS ({lake_index_oracle_sql()}),
req(requested) AS (VALUES {vals})
SELECT requested,
       coalesce((SELECT table_name FROM idx WHERE table_name = requested),
                (SELECT table_name FROM idx
                 WHERE table_name = regexp_replace(requested, '\\.csv$', ''))) AS resolved
FROM req
"""


def drift_monitor(
    events: DataFrame,
    strata_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Distribution-drift monitor: split the stream at its median
    event time, compare per-stratum frequency between the halves with
    a chi-square-style statistic (p−q)²/(p+q) — the pipeline guardrail
    that catches a category silently vanishing from the feed. The
    stat avoids ln() (PSI/KL) on purpose: libm log differs at the
    last ulp across engines, squared-difference arithmetic doesn't.

    The split point stays declarative (single-row aggregate
    crossJoined back, no driver collect). Exact percentile is the
    correctness-gate form; at 100 TB swap in approx_percentile or the
    profiler's two-phase cumulative-count quantile — the comparison
    logic is unchanged. Output: (stratum, p_a, p_b, drift_contrib).
    """
    ep = F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1000000.0)
    med = events.agg(F.percentile(ep, F.lit(0.5)).alias("m"))
    halves = events.crossJoin(F.broadcast(med)).select(
        F.col(strata_col).alias("stratum"),
        F.when(ep < F.col("m"), 0).otherwise(1).alias("half"),
    )
    cnt = halves.groupBy("stratum", "half").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("half").agg(F.sum("n").alias("t"))
    props = (
        cnt.join(tot, "half")
        .groupBy("stratum")
        .agg(
            F.max(F.when(F.col("half") == 0, F.col("n") / F.col("t"))).alias("p_a"),
            F.max(F.when(F.col("half") == 1, F.col("n") / F.col("t"))).alias("p_b"),
        )
    )
    diff = F.col("p_a") - F.col("p_b")
    return props.select(
        "stratum",
        F.round("p_a", 9).alias("p_a"),
        F.round("p_b", 9).alias("p_b"),
        F.round(diff * diff / (F.col("p_a") + F.col("p_b")), 9).alias(
            "drift_contrib"
        ),
    )


def drift_monitor_oracle_sql(
    table: str = "events",
    strata_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    return f"""
WITH med AS (
  SELECT quantile_cont(epoch({ts_col}), 0.5) AS m FROM {table}),
halves AS (
  SELECT {strata_col} AS stratum,
         CASE WHEN epoch({ts_col}) < (SELECT m FROM med) THEN 0 ELSE 1 END AS half
  FROM {table}),
cnt AS (
  SELECT stratum, half, count(*) AS n FROM halves GROUP BY 1, 2),
tot AS (SELECT half, sum(n) AS t FROM cnt GROUP BY 1),
props AS (
  SELECT c.stratum,
         max(CASE WHEN c.half = 0 THEN CAST(c.n AS DOUBLE) / t.t END) AS p_a,
         max(CASE WHEN c.half = 1 THEN CAST(c.n AS DOUBLE) / t.t END) AS p_b
  FROM cnt c JOIN tot t ON c.half = t.half GROUP BY 1)
SELECT stratum, round(p_a, 9) AS p_a, round(p_b, 9) AS p_b,
       round((p_a - p_b) * (p_a - p_b) / (p_a + p_b), 9) AS drift_contrib
FROM props
"""
