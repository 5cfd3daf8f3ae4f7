"""Per-stage profile for named registered queries (default: the three
queries the round-5 driver bench showed drifting with zero code changes).

For each query: one untimed warm-up run, then N profiled runs. Each
profiled run records wall time plus, from the Spark UI REST API, the
stages it actually executed: stage count, shuffle read/write bytes,
input bytes, executor run time and GC time summed over those stages.

Stage count / shuffle bytes / input bytes are *plan* properties — they
are identical run-to-run for the same code and data. If those match
across runs (and across rounds) while wall time swings, the wall-time
delta is environment (CPU contention, GC, page cache), not a plan
change. That is the evidence contract from VERDICT r5 next-round #1;
since round 9 bench.py embeds the same fingerprint per headline query
in BENCH_r*.json itself (tabsketchfm_spark/plans/stagefp.py is the
shared probe).

Usage: python scripts/stage_profile.py [query ...]
Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tabsketchfm_spark.plans import registry
from tabsketchfm_spark.plans.stagefp import METRIC_KEYS, stages, stages_stable
from tabsketchfm_spark.session import get_spark

DRIFTED = [
    "dedup_clusters_documents",
    "text_pack_sequences",
    "scale_salted_join_revenue",
]


def profile(names: list[str], runs: int = 3) -> None:
    spark = get_spark("stage_profile", ui=True)
    base = "http://localhost:" + spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    app_id = spark.sparkContext.applicationId
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = registry.queries()

    for name in names:
        fn = qs[name]
        # warm-up: JIT, parquet footer cache, codegen compile
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        results = []
        for _ in range(runs):
            before = stages(base, app_id)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            spark.catalog.clearCache()
            after = stages_stable(base, app_id, before)
            new = [s for k, s in after.items() if k not in before]
            rec = {"wall_sec": round(wall, 3), "n_stages": len(new)}
            for out_key, api_key in METRIC_KEYS.items():
                total = sum(s.get(api_key, 0) for s in new)
                if out_key.endswith("_mb"):
                    rec[out_key] = round(total / 1e6, 2)
                else:
                    rec[out_key] = total
            results.append(rec)
        print(json.dumps({"query": name, "sf_dir": sf_dir, "runs": results}))
    spark.stop()


if __name__ == "__main__":
    profile(sys.argv[1:] or DRIFTED)
