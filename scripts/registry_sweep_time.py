"""Time every registered query (build + noop execution, no oracle) at a
given SF and print the sorted slow tail.

Usage: python scripts/registry_sweep_time.py [sf_dir] [NAME ...]

Optimization-round instrument (guide §1): finds where the registry's
wall time concentrates so per-family work targets evidence, not guesses.
Each query runs ONCE (cold) — lifecycle rows build their own stores in
tmp dirs exactly as the driver's correctness pass would. Results are
written to a timestamp-free JSON under /tmp; copy it into plans/r12/
deliberately (an automatic write there clobbered the committed round
evidence once).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tabsketchfm_spark.plans import registry
from tabsketchfm_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[2:] if not a.startswith("--")]
    spark = get_spark("registry_sweep_time", ui=False)
    qs = registry.queries()
    from pyspark.sql import functions as F
    from tabsketchfm_spark.sources.tables import load_table

    # warm-up: scan + agg + shuffle + codegen (same as bench.py)
    (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")))
        .write.mode("overwrite").format("noop").save()
    )
    spark.catalog.clearCache()

    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # record, keep sweeping
            errs[name] = f"{type(e).__name__}: {e}"[:200]
        spark.catalog.clearCache()
    total = round(sum(times.values()), 2)
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{t:8.2f}s  {name}")
    print(f"TOTAL {total}s over {len(times)} queries; {len(errs)} errors")
    if errs:
        print(json.dumps(errs, indent=1))
    out = "/tmp/registry_sweep_times.json"
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "total_sec": total, "times": times,
                   "errors": errs}, f, indent=1, sort_keys=True)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
