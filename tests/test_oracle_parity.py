"""Every registered query must match its DuckDB oracle at sf0.01 —
a local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from tabsketchfm_spark.plans import registry
from tests.oracle_util import assert_match, built_query, run_oracle

_NAMES = sorted(registry.queries().keys())


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(spark, sf01, name):
    oracles = registry.oracle_sql()
    # shared build cache: the plan guard re-analyzes the same frames
    sdf = built_query(spark, sf01, name)
    if name not in oracles:
        assert sdf.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    opdf = run_oracle(oracles[name], sf01)
    assert_match(sdf, opdf, name)
