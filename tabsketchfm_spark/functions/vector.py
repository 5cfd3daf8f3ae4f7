"""Vector column expressions: cosine similarity, z-score normalization.

Used by the embedding-space search operators (reference
embedding_search.py:99-111 uses sklearn cosine k-NN; SURVEY §2.8). The
dot/norm sums run left-to-right over the array in BOTH Spark
(``aggregate``) and DuckDB (``list_dot_product`` on DOUBLE[]), which
makes cosine bit-identical across engines — verified empirically — so
ranking by cosine needs no rounding tolerance.
"""

from __future__ import annotations


def dot_sql(a: str, b: str, dim: int | None = None) -> str:
    """Spark SQL dot product of two array<double> columns.

    With ``dim`` the sum is unrolled into explicit element products,
    which stays inside whole-stage codegen (the HOF form is interpreted
    per element). Trade-off measured at 64 dims: unrolling adds seconds
    of Janino compile time, so it only pays off beyond ~10^7 pairs —
    the default HOF form wins on small inputs. Both forms add
    left-to-right, so the result is bit-identical either way (and to
    DuckDB's list_dot_product).
    """
    if dim is not None:
        return "(" + " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(dim)) + ")"
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, x) -> acc + x)"
    )


def norm_sql(a: str, dim: int | None = None) -> str:
    if dim is not None:
        return "sqrt(" + " + ".join(f"{a}[{i}] * {a}[{i}]" for i in range(dim)) + ")"
    return f"sqrt(aggregate({a}, cast(0.0 as double), (acc, x) -> acc + x * x))"


def cosine_sql(a: str, b: str, dim: int | None = None) -> str:
    return (
        f"({dot_sql(a, b, dim)}) / (({norm_sql(a, dim)}) * ({norm_sql(b, dim)}))"
    )


def cosine_sql_duckdb(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


# Pairwise cosine ops should pre-normalize each side ONCE (norms
# recomputed per pair are 2/3 of the cosine work) and then take dot
# products only. The norm must be a plain projected column — embedding
# it inside the transform lambda re-evaluates it per element. See
# operators/vector.py `_unit` for the two-step pattern.


def zscore_sql(a: str) -> str:
    """Z-score normalize an array<double> (reference
    tabular_tokenizer.py:231-234 / embedding_search.py:20-23)."""
    n = f"cast(size({a}) as double)"
    mean = f"(aggregate({a}, cast(0.0 as double), (acc, x) -> acc + x) / {n})"
    var = (
        f"(aggregate({a}, cast(0.0 as double), "
        f"(acc, x) -> acc + (x - {mean}) * (x - {mean})) / {n})"
    )
    return f"transform({a}, x -> (x - {mean}) / sqrt({var}))"
