#!/usr/bin/env python
"""Measured evidence for the distributed-rank rewrite (round 12).

Times the builtin unpartitioned window (``NTILE(4) OVER (ORDER BY k
DESC, pk)``) against ``ops.rank.global_ntile`` on a JVM-generated
per-customer-shaped relation, at a dimension size where the builtin's
single-task sort is visible (default 50M keys ~ a few-hundred-SF
customer dimension).  Usage: ``python scripts/rank_smoke.py [n_rows]``.

``--mode running_sum`` (round 13, RANK_r13 evidence) times the
running-sum form instead — the shape under ``pareto_part_revenue``,
``orders_abc_xyz`` and (since round 13) ``stats_ks_test``'s ECDF:
builtin ``SUM(v) OVER (ORDER BY k, pk ROWS UNBOUNDED PRECEDING)`` vs
``ops.rank.global_running_sum`` — same deterministic-sample equality
witness.

Prints one JSON line with walls and REST stage metrics (peak memory,
spill, task counts) for each variant, plus a bit-equality check on a
deterministic sample so the speed comparison is also a correctness
witness.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from findb_spark.metrics import metrics_delta, settled_stages_snapshot  # noqa: E402
from findb_spark.ops.rank import global_ntile  # noqa: E402
from findb_spark.session import get_spark  # noqa: E402


def main() -> None:
    # argparse (round 14, advisor): the hand-rolled loop only supported
    # the '=' form — '--mode running_sum' left the value in positional
    # args and crashed on int('running_sum'), while a bare '--mode' or an
    # unknown value silently selected running_sum
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=("ntile", "running_sum"), default="ntile")
    ap.add_argument("n_rows", nargs="?", type=int, default=50_000_000)
    ns = ap.parse_args()
    mode, n = ns.mode, ns.n_rows
    spark = get_spark(
        app_name="rank_smoke",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # per-customer-shaped relation: unique pk, heavy-tailed spend key
    dim = spark.range(n).select(
        F.col("id").alias("pk"),
        ((F.col("id") * 2654435761) % 1_000_000_007).alias("k"),
    )
    sink = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731
    sink(dim)  # warm codegen + range generation

    out: dict = {"n_rows": n, "mode": mode}
    if mode == "running_sum":
        from findb_spark.ops.rank import global_running_sum

        # value column: bounded ints so 200M-row prefix sums stay far
        # inside int64 (max ~2e8 * 1e3 = 2e11)
        dimv = dim.withColumn("v", (F.col("k") % 1000).cast("bigint"))
        wrs = Window.orderBy(F.col("k").asc(), F.col("pk").asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        variants = {
            "builtin_single_partition": lambda: dimv.select(
                "pk", F.sum("v").over(wrs).alias("band")
            ),
            "ops_rank_global_running_sum": lambda: global_running_sum(
                dimv, "k", ["pk"], value="v", out="band"
            ).select("pk", "band"),
        }
    else:
        w = Window.orderBy(F.col("k").desc(), F.col("pk").asc())
        variants = {
            "builtin_single_partition": lambda: dim.select(
                "pk", F.ntile(4).over(w).alias("band")
            ),
            "ops_rank_global_ntile": lambda: global_ntile(
                dim, 4, "k", ["pk"], descending=True
            ).select("pk", "band"),
        }
    for name, build in variants.items():
        before, _ = settled_stages_snapshot(spark)
        t0 = time.monotonic()
        sink(build())
        wall = round(time.monotonic() - t0, 3)
        after, _ = settled_stages_snapshot(spark)
        out[name] = {"wall_s": wall, "metrics": metrics_delta(before, after)}

    # correctness witness: bands agree on a deterministic 1e-5 sample
    names = list(variants)
    a = variants[names[0]]().where(F.col("pk") % 100_000 == 7)
    b = variants[names[1]]().where(F.col("pk") % 100_000 == 7)
    mismatch = (
        a.alias("a")
        .join(b.alias("b"), "pk")
        .where("a.band <> b.band")
        .count()
    )
    sample_n = a.count()
    out["sample_checked"] = sample_n
    out["sample_mismatches"] = mismatch
    print(json.dumps(out))


if __name__ == "__main__":
    main()
