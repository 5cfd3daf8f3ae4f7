"""Vector column expressions: cosine similarity, z-score normalization.

Used by the embedding-space search operators (reference
embedding_search.py:99-111 uses sklearn cosine k-NN; SURVEY §2.8). The
dot/norm sums run left-to-right over the array in BOTH Spark
(``aggregate``) and DuckDB (``list_dot_product`` on DOUBLE[]), which
makes cosine bit-identical across engines — verified empirically — so
ranking by cosine needs no rounding tolerance.
"""

from __future__ import annotations


def dot_sql(a: str, b: str) -> str:
    """Spark SQL dot product of two array<double> columns."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, x) -> acc + x)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt(aggregate({a}, cast(0.0 as double), (acc, x) -> acc + x * x))"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)}) / (({norm_sql(a)}) * ({norm_sql(b)}))"


def cosine_sql_duckdb(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


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
