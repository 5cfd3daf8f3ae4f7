"""Time individual registered queries in isolation with the noop sink.

Usage: python scripts/qtime.py NAME [NAME ...] [--n 3] [--sf DIR] [--explain]

Prints per-run walls and the median; with --explain also writes
``.explain('formatted')`` to stdout. Meant for optimization-round
measurement loops; the driver-contract bench stays in bench.py.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tabsketchfm_spark.plans import registry
from tabsketchfm_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", action="store_true")
    args = ap.parse_args()

    spark = get_spark("qtime", ui=True)
    qs = registry.queries()
    from pyspark.sql import functions as F
    from tabsketchfm_spark.sources.tables import load_table

    (
        load_table(spark, args.sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")))
        .write.mode("overwrite").format("noop").save()
    )
    spark.catalog.clearCache()

    for name in args.names:
        if args.explain:
            df = qs[name](spark, args.sf)
            print(f"===== EXPLAIN {name} =====")
            df.explain("formatted")
            spark.catalog.clearCache()
        runs = []
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        s = sorted(runs)
        med = (
            s[len(s) // 2]
            if len(s) % 2
            else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        )
        print(f"QTIME {name}: median={med:.3f}s runs={[round(r,3) for r in runs]}")
    spark.stop()


if __name__ == "__main__":
    main()
