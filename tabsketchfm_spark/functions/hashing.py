"""Cross-engine deterministic hashing + MinHash permutation family.

The reference sketches columns with ``datasketch.MinHash`` (num_perm=100,
xxhash32, seed 0 — reference data_prep.py:31-32,263-274). Bit-exact
reproduction of datasketch's Mersenne-prime permutation scheme in pure SQL
is impractical (SURVEY §7.5 risk 1); instead this engine defines its own
MinHash family with the same statistical guarantees, built ONLY from
primitives that Apache Spark and DuckDB evaluate identically:

  h32(v)  = first 8 hex digits of md5(cast(v as string)), as a bigint
  slot_i  = min over values of ((a_i * h32 + b_i) mod P),  P = 4294967311

with (a_i, b_i) derived from the permutation index by a fixed integer
formula (no RNG), so the DuckDB oracle can regenerate them in SQL.
Everything stays inside whole-stage codegen on the Spark side — no UDFs.

Overflow safety: h32 < 2^32, a_i < 2^31  ⇒  a_i*h32 + b_i < 2^63.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

NUM_PERM = 100
MINHASH_PRIME = 4294967311  # smallest prime > 2^32
_A_MULT = 2654435761  # Knuth multiplicative-hash constant
_B_MULT = 40503
_MERSENNE31 = 2147483647


def minhash_perm_params(num_perm: int = NUM_PERM) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for each permutation — closed-form, so the
    same numbers are derivable inside a SQL oracle (see perms_cte_duckdb)."""
    return [
        (
            (_A_MULT * (i + 1)) % _MERSENNE31 + 1,
            (_B_MULT * (i + 1) + 7) % _MERSENNE31,
        )
        for i in range(num_perm)
    ]


def perms_cte_duckdb(num_perm: int = NUM_PERM) -> str:
    """DuckDB CTE body producing (i, a, b) rows matching minhash_perm_params."""
    return (
        f"SELECT i, ({_A_MULT}*(i+1)) % {_MERSENNE31} + 1 AS a, "
        f"({_B_MULT}*(i+1)+7) % {_MERSENNE31} AS b "
        f"FROM generate_series(0, {num_perm - 1}) t(i)"
    )


def h32_sql(expr: str, dialect: str) -> str:
    """32-bit md5-prefix hash of the stringified value, identical in both
    engines (verified: md5 hex + base-16 parse agree bit-for-bit)."""
    if dialect == "spark":
        return f"cast(conv(substring(md5(cast({expr} as string)),1,8),16,10) as bigint)"
    if dialect == "duckdb":
        return f"(('0x' || substring(md5(cast({expr} as varchar)),1,8))::BIGINT)"
    raise ValueError(dialect)


def h64_sql(expr: str, dialect: str) -> str:
    """60-bit md5-prefix hash (15 hex digits — fits signed 64) for
    fingerprints / exact-dedup keys where 32 bits would collide."""
    if dialect == "spark":
        return f"cast(conv(substring(md5(cast({expr} as string)),1,15),16,10) as bigint)"
    if dialect == "duckdb":
        return f"(('0x' || substring(md5(cast({expr} as varchar)),1,15))::BIGINT)"
    raise ValueError(dialect)


def minhash_agg_exprs(h: Column, num_perm: int = NUM_PERM) -> list[Column]:
    """num_perm MIN-aggregate expressions over a precomputed h32 column.

    Used as ``df.groupBy(keys).agg(*minhash_agg_exprs(h))`` — ONE scan,
    map-side partial aggregation, and only num_perm longs per group cross
    the shuffle. This is the scale path (vs. exploding values × perms,
    which would shuffle 100× the data).
    """
    out = []
    for i, (a, b) in enumerate(minhash_perm_params(num_perm)):
        out.append(
            F.min((F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh{i}")
        )
    return out


def minhash_agg_sql(h_col: str = "h", num_perm: int = NUM_PERM) -> list[str]:
    """SQL-string twins of ``minhash_agg_exprs`` over a NAMED h column,
    for bulk parsing via ``F.expr`` — the Column builder costs ~7 py4j
    round trips per slot, which at 100 slots per sketch dominated every
    sketch query's BUILD time (OPTIMIZATION_r12.md). Trees are
    node-identical to the Column version."""
    return [
        f"min(({a} * `{h_col}` + {b}) % {MINHASH_PRIME}) AS mh{i}"
        for i, (a, b) in enumerate(minhash_perm_params(num_perm))
    ]


def minhash_struct_sql(value_expr: str, dialect: str, num_perm: int = NUM_PERM) -> list[str]:
    """Spark/DuckDB SQL snippets 'min(...) AS mh{i}' over a value expression."""
    h = h32_sql(value_expr, dialect)
    return [
        f"min(({a} * {h} + {b}) % {MINHASH_PRIME}) AS mh{i}"
        for i, (a, b) in enumerate(minhash_perm_params(num_perm))
    ]
