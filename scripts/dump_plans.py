"""Dump .explain('formatted') for named registered queries to files.

Usage: python scripts/dump_plans.py OUTDIR SUFFIX [NAME ...]
With no names, dumps every bench.py HEADLINE query.
Writes OUTDIR/<name>_<SUFFIX>.txt. Lazy queries are plan-built only;
NOTE: eager builders (k3g pagerank, store-lifecycle rows, training
loops) run their Spark jobs at build time — dumping those "plans"
executes them (and store-backed ones mutate their tmp stores).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tabsketchfm_spark.plans import registry
from tabsketchfm_spark.session import get_spark


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans", ui=False)
    qs = registry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
