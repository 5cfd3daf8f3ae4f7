from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tabsketchfm_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf001():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01():
    return "/root/testdata/sf0.01"


_BUILT_QUERIES: dict = {}


def built_query(spark, sf_dir: str, name: str):
    """Session-wide registered-query BUILD cache (r9 verdict suite-
    budget item): the parity sweep and the registry-wide plan guard
    each analyze every registered query — sharing the built DataFrame
    halves the Catalyst/py4j analysis cost. Safe because DataFrames
    are immutable plan holders and both consumers want the same
    (name, sf) plan; NOT for the determinism test, whose claim is two
    independent RUNS, and harmless for eager queries (build == run
    once; the cached local result is what both consumers check).
    Cache-substitution side effects (persist registration is eager)
    only DECREASE vs the status quo of building twice."""
    key = (name, sf_dir)
    if key not in _BUILT_QUERIES:
        from tabsketchfm_spark.plans import registry

        _BUILT_QUERIES[key] = registry.queries()[name](spark, sf_dir)
    return _BUILT_QUERIES[key]
