"""Per-stage timeline breakdown for one registered query.

Usage: python scripts/stage_breakdown.py NAME [--warm N]

Runs the query (after N warm-up runs, default 1) and prints every
stage the run executed: wall window (first task launch → completion),
executor run time, task count, shuffle/input bytes — plus the gaps
between consecutive stage windows (driver/AQE wave latency). This is
the empirical side of guide §1.1: decide whether a query's wall goes
to compute, shuffle, or scheduling before touching the plan.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tabsketchfm_spark.plans import registry
from tabsketchfm_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    warm = 1
    if "--warm" in sys.argv:
        warm = int(sys.argv[sys.argv.index("--warm") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stage_breakdown", ui=True)
    ui = "http://localhost:" + spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    app = spark.sparkContext.applicationId
    qs = registry.queries()
    for _ in range(warm):
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()

    def fetch():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
            return json.load(r)

    before = {s["stageId"] for s in fetch()}
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    time.sleep(1.0)
    stages = [s for s in fetch() if s["stageId"] not in before]
    stages.sort(key=lambda s: s.get("firstTaskLaunchedTime", ""))
    print(f"QUERY {name}: wall={wall:.3f}s  n_stages={len(stages)}")
    prev_end = None
    total_window = 0.0
    for s in stages:
        sub = s.get("firstTaskLaunchedTime")
        end = s.get("completionTime")

        def ts(x):
            from datetime import datetime

            return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

        dur = ts(end) - ts(sub) if sub and end else 0.0
        gap = ts(sub) - prev_end if prev_end and sub else 0.0
        prev_end = ts(end) if end else prev_end
        total_window += dur
        print(
            f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
            f"win={dur:6.3f}s gap={gap:6.3f}s "
            f"exec={s.get('executorRunTime',0)/1000:7.3f}s "
            f"in={s.get('inputBytes',0)/2**20:7.2f}MB "
            f"sr={s.get('shuffleReadBytes',0)/2**20:6.2f}MB "
            f"sw={s.get('shuffleWriteBytes',0)/2**20:6.2f}MB  "
            f"{s.get('name','')[:60]}"
        )
    print(f"  sum stage windows: {total_window:.3f}s (wall {wall:.3f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
