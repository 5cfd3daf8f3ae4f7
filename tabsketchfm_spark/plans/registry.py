"""Named query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 is registered here as a
(spark_query, duckdb_oracle_sql) pair. Keys are prefixed with the SURVEY
operator id they cover (e.g. ``a1a8_profile_customer`` covers A1-A8).
``__spark_entry__.py`` re-exports these.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tabsketchfm_spark.operators import minhash as mh
from tabsketchfm_spark.operators import profile as prof
from tabsketchfm_spark.operators import setsim
from tabsketchfm_spark.plans.schemas import TABLE_SCHEMAS
from tabsketchfm_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def _register(name: str, fn: QueryFn, oracle: str | None) -> None:
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


# --- A1-A9: profiling (SURVEY §2.3) -----------------------------------------

_PROFILE_TABLES = ["customer", "orders", "lineitem", "part", "events", "documents"]


def _mk_profile(table: str) -> QueryFn:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return prof.profile_table(
            load_table(spark, sf_dir, table), table, round_digits=4
        )

    return q


for _t in _PROFILE_TABLES:
    _register(
        f"a1a8_profile_{_t}",
        _mk_profile(_t),
        prof.profile_oracle_sql(_t, TABLE_SCHEMAS[_t], round_digits=4),
    )


# --- SK7: exact Jaccard / containment (SURVEY §2.4) -------------------------

_SETSIM_PAIRS = [
    (("orders", "o_custkey"), ("customer", "c_custkey")),
    (("lineitem", "l_orderkey"), ("orders", "o_orderkey")),
    (("supplier", "s_nationkey"), ("customer", "c_nationkey")),
    (("part", "p_partkey"), ("lineitem", "l_partkey")),
]


def _mk_setsim(left: tuple[str, str], right: tuple[str, str]) -> QueryFn:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        ldf = load_table(spark, sf_dir, left[0])
        rdf = load_table(spark, sf_dir, right[0])
        return setsim.jaccard_containment(ldf, left, rdf, right)

    return q


for _l, _r in _SETSIM_PAIRS:
    _register(
        f"sk7_setsim_{_l[1]}_{_r[1]}",
        _mk_setsim(_l, _r),
        setsim.jaccard_containment_oracle_sql(_l, _r),
    )


# --- SK1/SK2: MinHash signatures (SURVEY §2.4) ------------------------------


def _mk_minhash(table: str, cols: list[str], words: bool) -> QueryFn:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return mh.minhash_signatures(
            load_table(spark, sf_dir, table), table, cols, words=words
        )

    return q


_register(
    "sk1_minhash_orders_keys",
    _mk_minhash("orders", ["o_custkey", "o_orderstatus"], words=False),
    mh.minhash_signatures_oracle_sql("orders", ["o_custkey", "o_orderstatus"]),
)
_register(
    "sk2_minhash_words_part",
    _mk_minhash("part", ["p_name", "p_type"], words=True),
    mh.minhash_signatures_oracle_sql("part", ["p_name", "p_type"], words=True),
)


# --- Flagship: joinability search (SURVEY §7.3; J4/K3/T2/T4) ----------------

JOIN_QUERY = ("orders", "o_custkey")
JOIN_CANDIDATES: list[tuple[str, list[str]]] = [
    ("customer", ["c_custkey", "c_nationkey"]),
    ("orders", ["o_orderkey"]),
    ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
    ("supplier", ["s_suppkey", "s_nationkey"]),
    ("part", ["p_partkey", "p_size"]),
    ("nation", ["n_nationkey", "n_regionkey"]),
    ("region", ["r_regionkey"]),
    ("events", ["user_id"]),
]


def _joinability(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mh.joinability_search(spark, sf_dir, JOIN_QUERY, JOIN_CANDIDATES)


_register(
    "k3_joinability_o_custkey",
    _joinability,
    mh.joinability_oracle_sql(JOIN_QUERY, JOIN_CANDIDATES),
)


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
