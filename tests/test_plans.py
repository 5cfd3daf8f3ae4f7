"""Physical-plan quality assertions: the optimizations the engine
depends on at 100 TB must actually appear in the executed plans."""

from __future__ import annotations

from tabsketchfm_spark.operators.setsim import jaccard_containment
from tabsketchfm_spark.operators.minhash import joinability_search_oph
from tabsketchfm_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_setsim_prunes_to_single_column(spark, sf01):
    """Column pruning must reach the parquet scan: a set-similarity
    query over one column per side reads exactly that column."""
    orders = load_table(spark, sf01, "orders")
    cust = load_table(spark, sf01, "customer")
    p = _plan(
        jaccard_containment(
            orders, ("orders", "o_custkey"), cust, ("customer", "c_custkey")
        )
    )
    assert "ReadSchema: struct<o_custkey:bigint>" in p
    assert "ReadSchema: struct<c_custkey:bigint>" in p


def test_joinability_broadcasts_query_side(spark, sf01):
    """The tiny query-signature relation must broadcast — candidate
    sketches never shuffle for the comparison."""
    from tabsketchfm_spark.plans.registry import JOIN_CANDIDATES, JOIN_QUERY

    p = _plan(joinability_search_oph(spark, sf01, JOIN_QUERY, JOIN_CANDIDATES))
    assert "BroadcastHashJoin" in p


def test_filter_pushdown_reaches_scan(spark, sf01):
    """A status filter must appear as a parquet PushedFilters entry."""
    orders = load_table(spark, sf01, "orders").where("o_orderstatus = 'F'")
    p = _plan(orders.select("o_orderkey"))
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]" in p
