"""Wide→long reshaping: one (column_name, value) row per cell.

The reference iterates per column over pandas Series (data_prep.py:192);
the Spark-native equivalent for value-level ops (MinHash, set-similarity)
is a melt via ``explode(array(struct...))`` — a single table scan with no
shuffle; the downstream aggregate's map-side combine collapses the
amplified rows before anything crosses the network.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tabsketchfm_spark.functions.sqltext import sql_ident, sql_str_lit


def melt_values(
    df: DataFrame, columns: list[str] | None = None, spread: bool = True
) -> DataFrame:
    """Return (column_name string, v string) rows; '' is normalized to
    NULL first (P3, reference data_prep.py:202) and NULLs are dropped
    (P4, data_prep.py:207 — cleaner semantics per SURVEY §1.2).

    ``spread=False`` skips the parallelism-raising repartition: cheap
    consumers (one hash per row + a grouped MIN, e.g. OPH) finish faster
    single-task than they would paying an extra round-robin shuffle —
    keep the spread only for expression-heavy downstreams (k-perm
    MinHash, set-sim, shingle explodes)."""
    from tabsketchfm_spark.sources.tables import spread as _spread

    columns = columns or df.columns
    # one parsed SQL string instead of a Column tree per cell: the
    # struct-per-column builders cost 5+ py4j round trips each, and
    # melt runs once per lake table in the sketch queries
    items = ", ".join(
        "named_struct('column_name', {lit}, 'v', "
        "nullif(CAST({ident} AS STRING), ''))".format(
            lit=sql_str_lit(c), ident=sql_ident(c)
        )
        for c in columns
    )
    # spread: the explode amplifies rows |columns|-fold and feeds
    # heavy downstream expressions (MinHash, set-sim) — it must not
    # run single-task just because the source is one row group
    src = _spread(df) if spread else df
    return src.selectExpr(f"inline(array({items}))").where("v IS NOT NULL")
