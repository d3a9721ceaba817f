#!/usr/bin/env python
"""Benchmark harness: times the engine's headline queries (bench-flagged
QuerySpecs) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion with a noop sink (full plan runs,
nothing collected to the driver — the honest cluster-style measurement;
count() would let Spark prune the plan). One warm-up of the smallest query
absorbs session/JIT startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from findb_spark.registry import all_specs
    from findb_spark.session import get_spark

    spark = get_spark(app_name="findb_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = [s for s in all_specs().values() if s.bench]
    specs.sort(key=lambda s: s.name)

    # warm-up: JIT/codegen/session init on a tiny plan
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for spec in specs:
        df = spec.fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[spec.name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
