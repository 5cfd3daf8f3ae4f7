"""Per-column profiling aggregates — the reference's sketch-stats core.

Re-designs reference ``preprocess_cols`` (data_prep.py:188-279): null
count A1, exact distinct A2, mean cell width A3, decile quantiles A4,
mean A5, guarded population-std A6, min/max A7, assembled 13-slot
quantile vector A8, row count A9 (SURVEY §2.3).

Spark design: ONE wide aggregation pass per table — every stat for every
column is an aggregate expression in a single ``df.agg(...)``, so the
table is scanned once, partials combine map-side, and only a single
row crosses the shuffle regardless of table size. The one-row result is
then re-stacked to one row per column (driver-free ``explode`` of
structs). At 100 TB this is the optimal shape: no melt, no per-column
jobs, no second scan. Exact ``percentile`` can be swapped for
``percentile_approx`` via ``approx=True`` for cluster-scale runs.

Documented divergences from the reference (SURVEY §7.5 risk 3): '' is
normalized to NULL before counting (data_prep.py:202-208), distinct is
over non-null values, width is avg UTF-8 byte length (not numpy
itemsize), std is population std with the reference's ``unique>2``
guard (data_prep.py:238-241).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DECILES = [i / 10.0 for i in range(1, 10)]

_NUMERIC = {"integer", "float"}


def spark_logical_type(spark_dtype: str) -> str:
    d = spark_dtype.lower()
    if d in ("tinyint", "smallint", "int", "bigint"):
        return "integer"
    if d in ("float", "double") or d.startswith("decimal"):
        return "float"
    if d in ("timestamp", "date", "timestamp_ntz"):
        return "date"
    if d == "string":
        return "string"
    return "other"


def profile_table(
    df: DataFrame,
    table_name: str,
    columns: list[str] | None = None,
    approx: bool = False,
    round_digits: int | None = None,
) -> DataFrame:
    """One row per column: the full A1-A9 stat set.

    Output schema: table_name, column_name, col_idx, col_type, row_cnt,
    num_nan, distinct_cnt, cell_width_bytes, q10..q90, mean_v, std_v,
    min_v, max_v (numeric/date stats NULL for strings and vice versa;
    date columns are measured on the epoch-seconds axis).
    """
    dtypes = dict(df.dtypes)
    columns = columns or [c for c in df.columns if spark_logical_type(dtypes[c]) != "other"]

    # Two single-pass aggregations instead of one: mixing N countDistinct
    # exprs with heavy ordered aggs (percentile) makes Catalyst expand the
    # input N+1× and re-evaluate the non-distinct aggs over the expanded
    # stream (measured 12× slower at sf0.1). Distinct counts get their own
    # pass; both are map-side-combined single-shuffle jobs, and the two
    # one-row results are crossJoined (free).
    aggs: list = [F.count(F.lit(1)).alias("row_cnt")]
    distinct_aggs: list = []
    metas: list[tuple[str, int, str]] = []
    for idx, c in enumerate(columns):
        lt = spark_logical_type(dtypes[c])
        metas.append((c, idx, lt))
        p = f"c{idx}__"
        col = F.col(c)
        if lt == "string":
            norm = F.nullif(col, F.lit(""))
            distinct_aggs.append(F.countDistinct(norm).alias(p + "distinct_cnt"))
            aggs += [
                F.count(F.when(norm.isNull(), 1)).alias(p + "num_nan"),
                F.avg(F.octet_length(norm)).alias(p + "width"),
            ]
        else:
            if lt == "date":
                # epoch-seconds axis, exact: micros are integral so the
                # /1e6 double division matches DuckDB's epoch() bit-for-bit
                d = dtypes[c]
                if d == "date":
                    v = (F.unix_date(col) * F.lit(86400)).cast("double")
                else:
                    v = F.unix_micros(col.cast("timestamp")) / F.lit(1000000.0)
            else:
                v = col.cast("double")
            if approx:
                q = F.percentile_approx(v, F.array(*[F.lit(x) for x in DECILES]))
            else:
                q = F.percentile(v, F.array(*[F.lit(x) for x in DECILES]))
            distinct_aggs.append(F.countDistinct(col).alias(p + "distinct_cnt"))
            # mean/std from EXACT decimal sums — float aggregate merges
            # are partition-order dependent, so avg()/stddev_pop() can
            # differ at the last ulp between runs (and from the oracle)
            # depending on parallelism. sum(decimal) is exact, hence
            # order-free; the double arithmetic after it is identical
            # in both engines. decimal(18,6) covers epoch seconds and
            # every fixture domain; x² fits decimal(38,12).
            d = v.cast("decimal(18,6)")
            aggs += [
                F.count(F.when(col.isNull(), 1)).alias(p + "num_nan"),
                q.alias(p + "q"),
                F.count(v).alias(p + "n_val"),
                F.sum(d).cast("double").alias(p + "sum"),
                F.sum(d * d).cast("double").alias(p + "sumsq"),
                F.min(v).alias(p + "min"),
                F.max(v).alias(p + "max"),
            ]

    one = df.agg(*aggs).crossJoin(df.agg(*distinct_aggs))

    def rnd(col):
        return F.round(col, round_digits) if round_digits is not None else col

    structs = []
    for c, idx, lt in metas:
        p = f"c{idx}__"
        null_d = F.lit(None).cast("double")
        if lt == "string":
            fields = {
                "num_nan": F.col(p + "num_nan"),
                "distinct_cnt": F.col(p + "distinct_cnt"),
                "cell_width_bytes": rnd(F.col(p + "width")),
                **{f"q{int(x * 100)}": null_d for x in DECILES},
                "mean_v": null_d,
                "std_v": null_d,
                "min_v": null_d,
                "max_v": null_d,
            }
        else:
            mean = F.col(p + "sum") / F.col(p + "n_val")
            var = F.greatest(
                F.col(p + "sumsq") / F.col(p + "n_val") - mean * mean, F.lit(0.0)
            )
            fields = {
                "num_nan": F.col(p + "num_nan"),
                "distinct_cnt": F.col(p + "distinct_cnt"),
                "cell_width_bytes": null_d,
                **{
                    f"q{int(x * 100)}": rnd(F.col(p + "q")[i])
                    for i, x in enumerate(DECILES)
                },
                "mean_v": rnd(mean),
                # std guard mirrors reference data_prep.py:238-241
                "std_v": rnd(
                    F.when(F.col(p + "distinct_cnt") > 2, F.sqrt(var))
                    .otherwise(F.lit(0.0))
                ),
                "min_v": rnd(F.col(p + "min")),
                "max_v": rnd(F.col(p + "max")),
            }
        structs.append(
            F.struct(
                F.lit(table_name).alias("table_name"),
                F.lit(c).alias("column_name"),
                F.lit(idx).alias("col_idx"),
                F.lit(lt).alias("col_type"),
                F.col("row_cnt").alias("row_cnt"),
                *[v.alias(k) for k, v in fields.items()],
            )
        )

    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def profile_oracle_sql(
    table: str,
    schema: list[tuple[str, str]],
    round_digits: int | None = None,
) -> str:
    """DuckDB SQL computing the identical profile (UNION ALL per column)."""

    def rnd(e: str) -> str:
        return f"round({e}, {round_digits})" if round_digits is not None else e

    deciles_sql = ", ".join(str(x) for x in DECILES)
    parts = []
    cols = [(c, lt) for c, lt in schema if lt in ("string", "integer", "float", "date")]
    for idx, (c, lt) in enumerate(cols):
        null_qs = ", ".join(
            f"CAST(NULL AS DOUBLE) AS q{int(x * 100)}" for x in DECILES
        )
        if lt == "string":
            stats = f"""
              count(CASE WHEN nullif({c}, '') IS NULL THEN 1 END) AS num_nan,
              count(DISTINCT nullif({c}, '')) AS distinct_cnt,
              {rnd(f"avg(strlen(nullif({c}, '')))")} AS cell_width_bytes,
              {null_qs},
              CAST(NULL AS DOUBLE) AS mean_v, CAST(NULL AS DOUBLE) AS std_v,
              CAST(NULL AS DOUBLE) AS min_v, CAST(NULL AS DOUBLE) AS max_v"""
        else:
            v = f"epoch({c})" if lt == "date" else f"CAST({c} AS DOUBLE)"
            # (19,6): int128-backed in DuckDB so d*d doesn't overflow the
            # int64 multiply; Spark keeps (18,6) whose product (37,12)
            # stays under the 38 cap — both sums are exact, values equal
            d = f"CAST({v} AS DECIMAL(19,6))"
            qs = ", ".join(
                rnd(f"quantile_cont({v}, {x})") + f" AS q{int(x * 100)}"
                for x in DECILES
            )
            mean = f"(CAST(sum({d}) AS DOUBLE) / count({v}))"
            var = (
                f"greatest(CAST(sum({d} * {d}) AS DOUBLE) / count({v})"
                f" - {mean} * {mean}, 0.0)"
            )
            stats = f"""
              count(CASE WHEN {c} IS NULL THEN 1 END) AS num_nan,
              count(DISTINCT {c}) AS distinct_cnt,
              CAST(NULL AS DOUBLE) AS cell_width_bytes,
              {qs},
              {rnd(mean)} AS mean_v,
              {rnd(f"CASE WHEN count(DISTINCT {c}) > 2 THEN sqrt({var}) ELSE 0.0 END")} AS std_v,
              {rnd(f"min({v})")} AS min_v, {rnd(f"max({v})")} AS max_v"""
        parts.append(
            f"""SELECT '{table}' AS table_name, '{c}' AS column_name,
              {idx} AS col_idx, '{lt}' AS col_type, count(*) AS row_cnt,{stats}
            FROM {table}"""
        )
    return "\nUNION ALL\n".join(parts)
