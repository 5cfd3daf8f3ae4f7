"""Static logical schemas of the test lake (TESTDATA.md / FIXTURES.md).

Logical types follow the reference's 4-type system (reference
data_prep.py:45-49, SURVEY §1.2): string | integer | float | date.
``array`` marks vector columns (north-star extension tables).
Used to generate the per-column DuckDB oracle SQL.
"""

from __future__ import annotations

TABLE_SCHEMAS: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "integer"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "integer"),
        ("n_name", "string"),
        ("n_regionkey", "integer"),
    ],
    "customer": [
        ("c_custkey", "integer"),
        ("c_name", "string"),
        ("c_nationkey", "integer"),
        ("c_acctbal", "float"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "integer"),
        ("s_name", "string"),
        ("s_nationkey", "integer"),
        ("s_acctbal", "float"),
    ],
    "part": [
        ("p_partkey", "integer"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "integer"),
        ("p_retailprice", "float"),
    ],
    "orders": [
        ("o_orderkey", "integer"),
        ("o_custkey", "integer"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "float"),
        ("o_orderdate", "date"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "integer"),
        ("l_partkey", "integer"),
        ("l_suppkey", "integer"),
        ("l_linenumber", "integer"),
        ("l_quantity", "float"),
        ("l_extendedprice", "float"),
        ("l_discount", "float"),
        ("l_tax", "float"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "date"),
    ],
    "events": [
        ("event_id", "integer"),
        ("ts", "date"),
        ("user_id", "integer"),
        ("event_type", "string"),
        ("value", "float"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "integer"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "integer"),
    ],
    "embeddings": [
        ("vec_id", "integer"),
        ("embedding", "array"),
        ("label", "integer"),
    ],
}
