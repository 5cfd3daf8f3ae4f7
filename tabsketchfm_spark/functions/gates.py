"""Corpus-size-independent gate projections (round-9 verdict item 4,
hardened by round-10 review): registered store-lifecycle gates must
never collect O(corpus) rows on the driver, but the bounded projection
must still catch the defect classes the full-row collect caught.

ONE implementation (round-7 SQL-copy-paste-drift rule) shared by the
label, assignment and code gates and their DuckDB twins:

- a deterministic sampled id slice (``id % mod = 0``) keeps row-level
  exactness on ~1/mod of the corpus;
- every row carries GLOBAL integer checksums: the row count, the sum
  of ids, plain sums of the value columns, and an ID-WEIGHTED sum
  ``sum(id * value)`` per value column. The weighted sum is what
  closes the swap blind spot: plain sums are invariant under
  exchanging values between two out-of-slice rows (exactly the shape
  a misaligned join produces), while ``sum(id*v)`` changes for every
  single-row defect AND every pairwise swap of unequal values
  (``i*vi + j*vj != i*vj + j*vi`` whenever ``i != j`` and
  ``vi != vj``). Higher-order permutations that conserve every
  weighted sum exist in principle but do not correspond to any
  single-bug shape; the sampled slice still covers them at 1/mod.

All sums are integer → bit-exact across engines. DuckDB integer sums
are HUGEINT, so the SQL twin casts to BIGINT; at gate scale (test SFs)
the weighted sums stay far under 2^63 — a deployment with 1e9-scale
ids would need the HUGEINT kept un-cast on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bounded_slice_gate(
    df: DataFrame,
    id_col: str,
    values: dict[str, Column],
    mod: int,
) -> DataFrame:
    """The Spark half: sampled slice + checksums. ``values`` maps a
    checksum-name suffix to the (already long-cast) value expression;
    each contributes ``sum_<name>`` and the weighted ``sum_w<name>``."""
    aggs = [F.count(F.lit(1)).alias("n_total"), F.sum(id_col).alias("sum_id")]
    for name, expr in values.items():
        aggs.append(F.sum(expr).alias(f"sum_{name}"))
        aggs.append(F.sum(F.col(id_col) * expr).alias(f"sum_w{name}"))
    tot = df.agg(*aggs)
    return df.where(F.col(id_col) % mod == 0).crossJoin(F.broadcast(tot))


def bounded_tail_sql(
    src: str,
    id_col: str,
    values: dict[str, str],
    mod: int,
) -> str:
    """The DuckDB half, as a tail to splice after a CTE chain whose
    last CTE ``src`` holds the full rows: the ``tot`` CTE plus the
    final sampled-slice select. ``values`` maps the same checksum
    names to SQL value expressions over ``src``'s columns."""
    sums = [
        "CAST(count(*) AS BIGINT) AS n_total",
        f"CAST(sum({id_col}) AS BIGINT) AS sum_id",
    ]
    cols = ["n_total", "sum_id"]
    for name, expr in values.items():
        sums.append(f"CAST(sum({expr}) AS BIGINT) AS sum_{name}")
        sums.append(f"CAST(sum({id_col} * ({expr})) AS BIGINT) AS sum_w{name}")
        cols.extend([f"sum_{name}", f"sum_w{name}"])
    tot = ",\n       ".join(sums)
    proj = ", ".join(f"t.{c}" for c in cols)
    return f""",
tot AS (SELECT {tot} FROM {src})
SELECT f.*, {proj}
FROM {src} f, tot t WHERE f.{id_col} % {mod} = 0
"""
