#!/usr/bin/env python
"""Per-job wall-clock timeline for one bench query (round-14 forensics).

Runs a bench-flagged query to the noop sink N times in one session and,
for each run, prints the REST job timeline (submission/completion per
job, the gaps between jobs, and the residual wall not covered by any
job) plus the driver-side phase split: fn() construction, Catalyst
analysis+optimization+physical planning (executedPlan materialization),
and execution.  This attributes the wall of latency-bound queries
(guide §1/§7.3) without guessing.

Usage: python scripts/job_timeline.py <query> [n_runs] [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def jobs_snapshot(spark) -> list[dict]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/jobs", timeout=30
    ) as r:
        return json.load(r)


def stages_for(spark, ids) -> dict:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    out = {}
    for sid in ids:
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/{sid}", timeout=30
            ) as r:
                for att in json.load(r):
                    out[sid] = {
                        "name": att.get("name", "")[:60],
                        "tasks": att.get("numCompleteTasks"),
                        "runMs": att.get("executorRunTime"),
                        "cpuMs": (att.get("executorCpuTime") or 0) // 1_000_000,
                        "gcMs": att.get("jvmGcTime"),
                        "inBytes": att.get("inputBytes"),
                    }
        except Exception:  # noqa: BLE001
            pass
    return out


def main() -> int:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from findb_spark.registry import registration_order_specs
    from findb_spark.session import get_spark, load_table

    spark = get_spark(
        app_name="job_timeline",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4048"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spec = registration_order_specs()[name]

    # same warm-up + schema-cache priming as bench.py
    import os

    from pyspark.sql import functions as F

    warm = spark.range(1000)
    warm.selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    warm.selectExpr(
        "id", "sum(id) over (partition by id % 7 order by id) s"
    ).write.format("noop").mode("overwrite").save()
    warm.join(F.broadcast(spark.range(10)), "id").write.format("noop").mode(
        "overwrite"
    ).save()
    warm.mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            load_table(spark, sf_dir, t)

    for i in range(n_runs):
        before_ids = {j["jobId"] for j in jobs_snapshot(spark)}
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t1 = time.perf_counter()
        # Catalyst: analysis + optimization + physical planning, no execution
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        time.sleep(0.3)  # let the listener bus settle
        jobs = [
            j for j in jobs_snapshot(spark) if j["jobId"] not in before_ids
        ]
        jobs.sort(key=lambda j: j["jobId"])
        spans = []
        for j in jobs:
            sub = j.get("submissionTime", "")
            comp = j.get("completionTime", "")
            spans.append(
                {
                    "job": j["jobId"],
                    "sub": sub[11:23],
                    "comp": comp[11:23],
                    "stages": sorted(j.get("stageIds", [])),
                    "desc": (j.get("description") or j.get("name", ""))[:60],
                }
            )
        print(
            f"== run {i}: fn={t1 - t0:.3f}s catalyst={t2 - t1:.3f}s "
            f"exec={t3 - t2:.3f}s total={t3 - t0:.3f}s jobs={len(jobs)}"
        )
        for s in spans:
            print(f"   job {s['job']:>4} {s['sub']} -> {s['comp']} "
                  f"stages={s['stages']} {s['desc']}")
        all_stages = sorted({s for j in jobs for s in j.get("stageIds", [])})
        st = stages_for(spark, all_stages)
        for sid in all_stages:
            if sid in st:
                d = st[sid]
                print(
                    f"   stage {sid:>4} tasks={d['tasks']} run={d['runMs']}ms "
                    f"cpu={d['cpuMs']}ms gc={d['gcMs']}ms in={d['inBytes']} "
                    f"{d['name']}"
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
