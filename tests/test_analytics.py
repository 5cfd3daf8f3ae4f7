"""Multi-join analytics: broadcast planning + Bloom pruning semantics."""

from __future__ import annotations

from tabsketchfm_spark.operators.analytics import bloom_prejoin_count, shipping_priority


def test_bloom_prejoin_superset_and_tight(spark, sf01):
    r = bloom_prejoin_count(spark, sf01).first()
    assert r.bloom_pruned_cnt >= r.exact_cnt  # no false negatives
    assert r.fp_overhead <= 0.02, r.fp_overhead  # fp rate within budget


def test_q3_broadcasts_dimension(spark, sf01):
    plan = (
        shipping_priority(spark, sf01)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
