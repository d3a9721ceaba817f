"""Physical-plan shape tests — the 100 TB design contract, pinned.

The reference's efficiency property is "seek + proportional scan, never a
full-table pass" (golden pages_read counts, file.rs:699-710). The Spark
equivalents are plan properties, asserted here so a regression in layout,
filter placement, or join strategy fails CI rather than silently turning
into a 100x slowdown at cluster scale:

- as-of queries: predicate pushdown to the parquet scan (asset equality +
  date bounds in PushedFilters) and column pruning (ReadSchema);
- star joins: dimension sides broadcast (no shuffle of the fact table for
  the join), no SortMergeJoin at fixture scale;
- as-of dedup: partial (map-side) max_by aggregation, bounded exchanges.
"""

from __future__ import annotations

import contextlib
import io

from findb_spark.registry import all_specs

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = all_specs()[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_asof_range_pushdown_and_pruning(spark):
    p = _plan(spark, "asof_range")
    # asset equality + derivation date bounds reach the parquet scan
    assert "EqualTo(l_partkey,1)" in p
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_shipdate" in p
    # column pruning: the scan reads only the 4 derivation columns
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert read_schema.split("struct<", 1)[1].count(":") == 4, read_schema


def test_star_join_broadcasts_dimensions(spark):
    p = _plan(spark, "q5_region_revenue")
    assert p.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in p


def test_asof_dedup_is_partial_aggregatable(spark):
    """max_by combines map-side: the shuffle moves at most one row per
    (asset, date) per map partition, not every revision."""
    p = _plan(spark, "asof_snapshot_all_assets")
    assert "partial_max_by" in p
    # one aggregation exchange (plan text mentions each node once in the
    # tree and once in details)
    assert p.count("Exchange") <= 2


def test_batched_asof_broadcasts_queries(spark):
    p = _plan(spark, "asof_batch")
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "partial_max_by" in p


def test_q9_single_fact_scan_all_dims_broadcast(spark):
    """Q9's five-way join: lineitem scanned once, every dimension broadcast
    except the orders equi-join (orders ~ fact-sized, left to AQE)."""
    p = _plan(spark, "q9_product_profit")
    locations = [l for l in p.splitlines() if "Location:" in l]
    assert sum("lineitem" in l for l in locations) == 1, locations
    assert p.count("BroadcastHashJoin") >= 3
    # the part filter is pushed to the part scan, not evaluated post-join
    assert "StringContains(p_name,widget)" in p


def test_q21_semi_anti_join_strategy(spark):
    """EXISTS/NOT EXISTS decorrelation: planned as semi + anti joins (no
    cartesian fallback despite the non-equi l_suppkey <> predicate)."""
    p = _plan(spark, "q21_sole_return_supplier")
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_simhash_pairs_is_banded_not_all_pairs(spark):
    """The registered SimHash query must be the banded scale path: the
    self-join is an equi-join on (band_id, band key) — never a cartesian /
    nested-loop all-pairs `doc_id < doc_id` comparison (which is O(n^2)
    at corpus scale)."""
    p = _plan(spark, "dedup_simhash_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # an equi-join on the band key exists (hash or sort-merge, AQE's pick)
    assert "Join" in p


def test_ivf_codebook_is_fixed_size(spark):
    """IVF centroid selection compiles to TakeOrderedAndProject (bounded
    K rows), not a global sort — and the assignment side broadcasts it."""
    p = _plan(spark, "vec_ann_ivf")
    assert "TakeOrderedAndProject" in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_ohlc_single_shuffle_for_window_and_agg(spark):
    """Window tag + groupBy on the same (asset_id, month) key: the window's
    exchange must be reused — exactly one shuffle over the prices rows."""
    p = _plan(spark, "ts_ohlc_bars")
    n_exchanges = p.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, p  # asc + desc window sorts share partitioning


def test_contamination_broadcasts_eval_shingles(spark):
    """The benchmark shingle set must be the broadcast side — the corpus
    scan joins an in-memory hash set, zero corpus shuffle for the probe."""
    p = _plan(spark, "text_contamination")
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p


def test_merge_is_single_full_outer_join(spark):
    """MERGE plans exactly one join (full outer on the merge keys) — the
    minimal shuffle shape for arbitrary-overlap upsert."""
    p = _plan(spark, "merge_upsert_orders")
    assert p.count("SortMergeJoin FullOuter") + p.count("ShuffledHashJoin FullOuter") == 1


def test_quantize_reads_only_needed_columns(spark):
    """Column pruning must reach the embeddings scan: the quantization
    query touches embedding+label, never vec_id."""
    p = _plan(spark, "vec_quantize_int8")
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "embedding" in read_schema and "label" in read_schema
    assert "vec_id" not in read_schema


def test_pack_sequences_window_is_sharded(spark):
    """The packing window must partition by shard (no global
    single-partition sort at any corpus size)."""
    p = _plan(spark, "text_pack_sequences")
    assert "shard" in p
    # a global window would show an Exchange SinglePartition before the sort
    assert "SinglePartition" not in p


def test_dq_audit_row_rules_single_scan(spark):
    """All row rules fold into ONE scan-aggregate of orders; only the
    uniqueness and FK branches add scans (3 total, not one per rule)."""
    p = _plan(spark, "dq_orders_audit")
    # each scan appears twice in formatted output (tree + details):
    # row-rules scan + uniqueness scan + FK fact scan + FK dim scan = 4
    assert p.count("Scan parquet") <= 8, p.count("Scan parquet")
    # FK check broadcasts the dimension (customer) for the orphan join
    assert "BroadcastHashJoin" in p


def test_snapshot_diff_is_single_join_per_snapshot_pair(spark):
    """The changelog derivation is ONE join of old vs new (plus the merge
    that builds 'new') — no window, no extra exchanges beyond the joins."""
    p = _plan(spark, "snapshot_diff_orders")
    assert "Window" not in p


def test_semantic_dedup_no_cartesian(spark):
    """Within-cluster pairing is an equi-join on the cluster id; the only
    cartesian allowed is the tiny broadcast codebook assignment."""
    p = _plan(spark, "dedup_semantic")
    assert "CartesianProduct" not in p


def test_transition_matrix_single_user_shuffle(spark):
    """The lag window shuffles once on user_id; the probability window
    runs over the tiny aggregated matrix."""
    p = _plan(spark, "events_type_transitions")
    # one scan == two mentions (tree + details)
    assert p.count("Scan parquet") == 2


def test_winsorize_broadcasts_cuts_no_fact_shuffle_join(spark):
    """The per-group percentile cut table broadcasts; the fact table is
    never shuffled for the join."""
    p = _plan(spark, "winsorize_revenue")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_corr_matrix_single_date_shuffle(spark):
    """The pairwise correlation self-join shuffles on date; no cartesian."""
    p = _plan(spark, "corr_matrix_assets")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_chunk_dedup_no_cartesian_single_pair_of_scans(spark):
    """Chunk-level dedup is an inverted-index equi-join on the chunk key:
    never a cartesian, and only the two corpus scans (chunk side + df
    side) the shape requires."""
    p = _plan(spark, "dedup_chunk_exact")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_token_rarity_broadcasts_corpus_total(spark):
    """The 1-row corpus-size relation joins by broadcast; the token table
    is never shuffled for it."""
    p = _plan(spark, "text_token_rarity")
    assert "CartesianProduct" not in p


def test_ivf_pq_scores_via_cluster_equijoin(spark):
    """IVF-PQ's scored relation joins on the cluster id — the whole point
    of the coarse quantizer is that no cross join over the corpus exists
    anywhere in the plan."""
    p = _plan(spark, "vec_ivf_pq")
    assert "CartesianProduct" not in p


def test_pretrain_mix_broadcasts_weight_table(spark):
    """Per-source mixture weights (|sources| rows) broadcast onto the
    corpus scan; the gate is a filter, not a shuffle."""
    p = _plan(spark, "pipeline_pretrain_mix")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_cms_sketch_builds_in_one_token_scan(spark):
    """The count-min sketch cells must come from ONE pass over the token
    relation (posexplode of the d hash columns), not a d-way union that
    re-scans documents d times.  The whole query therefore holds exactly
    TWO parquet scans: one for the exact top-20 probe set, one for the
    sketch cells."""
    import re

    p = _plan(spark, "text_heavy_hitters_cms")
    scans = re.findall(r"^\(\d+\) Scan parquet", p, flags=re.M)
    assert len(scans) == 2, f"expected 2 parquet scans, got {len(scans)}:\n{p}"


def test_triangles_join_on_wedge_keys_not_ids(spark):
    """Degree orientation pin: the triangle plan joins oriented wedges
    (src / v / w keys) — no 3-way self-join keyed on raw doc ids, and the
    closing join is an equi-join (hash-partitionable), never a cross."""
    import re

    p = _plan(spark, "dedup_pair_triangles")
    assert "CartesianProduct" not in p
    # the only cross joins are the two 1-row aggregate combiners
    # (formatted explain mentions each node twice: tree + details)
    nl = re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", p, flags=re.M)
    assert len(nl) <= 2, f"unexpected non-equi joins: {len(nl)}"


def test_pq_adc_minimal_plan_shape(spark):
    """The re-architected PQ pipeline's contract: the corpus side is
    NARROW — ONE parquet scan total (encode; the per-query ADC tables are
    computed driver-side from a bounded 3-row collect since round 13 and
    ride in as a broadcast literal relation, so no second in-plan scan),
    and the ONLY hash exchange in the whole query is the per-query
    ranking window.  No sort-merge join, no corpus shuffle, no 64x
    crossJoin fan-out."""
    import re

    p = _plan(spark, "vec_pq_adc")
    scans = re.findall(r"^\(\d+\) Scan parquet", p, flags=re.M)
    assert len(scans) == 1, f"expected 1 parquet scan, got {len(scans)}"
    ex = re.findall(r"^\(\d+\) Exchange", p, flags=re.M)
    assert len(ex) == 1, f"expected 1 exchange (ranking window), got {len(ex)}"
    # the luts side is the driver-built literal relation — a true
    # LocalRelation (zero tasks, no Python-RDD evaluation; see
    # session.local_relation_df), broadcast
    assert "LocalTableScan" in p and "BroadcastExchange" in p
    assert "Scan ExistingRDD" not in p
    assert "hashpartitioning(query_id" in p
    assert "SortMergeJoin" not in p


def test_pq_corpus_pass_has_no_interpreted_normalization(spark):
    """The fused Arrow encode contract: the corpus pass is ONE
    MapInPandas stage fed raw embeddings — the interpreted JVM
    ``transform()`` normalization lambda (measured costlier than the
    whole encode) must not appear upstream of it.  The query/LUT side
    (3 rows) may still normalize JVM-side."""
    import re

    p = _plan(spark, "vec_pq_adc")
    maps = re.findall(r"^\(\d+\) MapInPandas", p, flags=re.M)
    assert len(maps) == 1, f"expected 1 Arrow encode stage, got {len(maps)}"
    # locate the MapInPandas node's input subtree: raw scan -> project ->
    # MapInPandas with no transform(...) in between.  formatted explain
    # lists node details after the tree; assert the encode input columns
    # are the raw ones, not a computed nv
    m = re.search(r"\(\d+\) MapInPandas[^\n]*\n(?:.*\n)*?Input \[2\]: \[(.*?)\]", p)
    assert m, "MapInPandas node details not found"
    assert "embedding" in m.group(1) and "nv" not in m.group(1), m.group(1)


def test_market_basket_no_self_join(spark):
    """Pair generation is basket-local (explode of in-array combinations)
    — no order-key self-join, no cartesian; the only non-equi join is
    the 1-row broadcast of the order-count aggregate."""
    import re

    p = _plan(spark, "orders_market_basket")
    assert "CartesianProduct" not in p
    nl = re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", p, flags=re.M)
    assert len(nl) <= 1
    scans = re.findall(r"^\(\d+\) Scan parquet", p, flags=re.M)
    assert len(scans) <= 4, f"self-join shape crept back: {len(scans)} scans"


def test_attribution_single_user_sort_no_range_join(spark):
    """The conversion assignment is a reverse-cumulative-sum window, not
    a time-range self-join: no cartesian/nested-loop anywhere, and the
    only exchanges are the two user_id branch shuffles + the final
    channel aggregation."""
    import re

    p = _plan(spark, "events_attribution")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    ex = re.findall(r"^\(\d+\) Exchange", p, flags=re.M)
    assert len(ex) <= 3, f"expected <=3 exchanges, got {len(ex)}"


def test_retention_no_cartesian_and_bounded_shape(spark):
    import re

    p = _plan(spark, "events_retention_cohorts")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    ex = re.findall(r"^\(\d+\) Exchange", p, flags=re.M)
    assert len(ex) <= 6


def test_substring_runs_no_pairwise_expansion(spark):
    """The substring-dedup profile must stay linear in corpus tokens: the
    duplicated-window decision is a hash-occurrence equi-join, never any
    pairwise doc x doc form — no cartesian/nested-loop node anywhere, and
    the whole query touches the documents parquet exactly once (the
    flagged relation is persisted and reused by both aggregates)."""
    import re

    p = _plan(spark, "dedup_substring_runs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    scans = re.findall(r"^\(\d+\) Scan parquet", p, flags=re.M)
    assert len(scans) == 1, f"expected 1 parquet scan, got {len(scans)}:\n{p}"


def test_new_sketch_and_audit_plans_stay_linear(spark):
    """Round-4-close additions: no pairwise/cartesian form anywhere, and
    parquet scan counts pinned at their audited values (a regression to
    per-branch rescans or a nested-loop join fails here before it turns
    into a 100x slowdown at scale). The one BroadcastNestedLoopJoin in
    the silhouette plan is the 64-row broadcast codebook cross join —
    bounded by construction."""
    import re

    expected_scans = {
        "dedup_cdc_chunks": 2,          # chunk agg + chunk-df branches
        "events_hll_exact_registers": 2,  # registers + exact ground truth
        "events_kmv_sketch_setops": 4,  # sketch/union + exact ground truth
        "pii_kanonymity": 1,            # single scan-aggregate
        "vec_cluster_silhouette": 2,    # corpus + codebook pick
    }
    for name, n_scans in expected_scans.items():
        p = _plan(spark, name)
        assert "CartesianProduct" not in p, name
        scans = len(re.findall(r"^\(\d+\) Scan parquet", p, flags=re.M))
        assert scans <= n_scans, f"{name}: {scans} scans (pinned {n_scans})"
        bnlj = len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", p, flags=re.M))
        assert bnlj <= (1 if name == "vec_cluster_silhouette" else 0), name


def test_salted_join_keeps_salt_in_join_keys(spark):
    """skew_salted_join's contract: the salt column participates in the
    equi-join keys (so a hot key's rows spread across salt buckets when
    the join shuffles).  At fixture scale Catalyst rightly BROADCASTS
    the 400-row exploded dim — the optimal plan, salting inert but
    harmless; on a dim too big to broadcast the same code becomes the
    salted shuffle join.  What must never regress: the salt in the keys
    and no cartesian."""
    p = _plan(spark, "skew_salted_join")
    assert "_salt" in p
    assert "Join" in p
    assert "CartesianProduct" not in p


def test_sweep_line_preaggregates_before_window(spark):
    """lineitem_transit_peak: the running sum must consume the per-(flag,
    day) NET deltas (a bounded relation), not raw boundary rows — one
    partial-aggregatable groupBy between the union and the window."""
    p = _plan(spark, "lineitem_transit_peak")
    assert "HashAggregate" in p
    assert "Window" in p
    # no join anywhere: sweep is union + agg + window
    assert "Join" not in p


def test_mannwhitney_no_global_row_sort(spark):
    """stats_mannwhitney ranks on the value-grouped relation: the plan
    must not globally sort fact rows (no Exchange rangepartitioning of
    the lineitem scan before an aggregate)."""
    p = _plan(spark, "stats_mannwhitney")
    # fact rows reach a partial-aggregatable groupBy; the prefix-sum
    # window runs on the value-level relation (a SinglePartition
    # exchange of ~|distinct quantities| rows) — a global row sort would
    # show up as a rangepartitioning exchange of the scan
    assert "Exchange rangepartitioning" not in p
    assert "HashAggregate" in p


def test_histogram_quantiles_broadcasts_targets(spark):
    """stats_histogram_quantiles: the rank-interpolation join is a
    broadcast of the 5-row target relation against the bucket grid —
    never a shuffle of anything fact-sized."""
    p = _plan(spark, "stats_histogram_quantiles")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_momentum_backtest_single_asset_shuffle(spark):
    """ts_momentum_backtest: asset-partitioned windows reuse one shuffle;
    selection/portfolio stages run on the months-sized relation."""
    p = _plan(spark, "ts_momentum_backtest")
    assert "Window" in p
    # monthly close -> signal lag share the asset_id partitioning: at
    # most one exchange on asset_id-containing keys plus the small
    # month-level exchanges
    assert p.count("Exchange hashpartitioning(asset_id") <= 2


def test_kendall_pair_joins_are_equi_not_cartesian(spark):
    p = _plan(spark, "stats_kendall_tau")
    assert "CartesianProduct" not in p
    # month alignment + time-pair ordering both plan as hash/merge joins
    assert "Join" in p


def test_power_iteration_normalizers_broadcast(spark):
    # the final normalization joins a 1-row aggregate: must be a broadcast
    # nested-loop with the single-row side, never a cartesian of the data
    p = _plan(spark, "vec_power_iteration")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p


def test_boxblur_is_two_arrow_stages(spark):
    # attach payload + convolve: exactly two Python/Arrow map stages,
    # no per-row Python UDF anywhere
    p = _plan(spark, "multimodal_image_boxblur")
    # formatted explain lists each node twice (tree + details): "(N) Map…"
    assert p.count(") MapInPandas") == 2
    assert "BatchEvalPython" not in p


def test_centroid_drift_single_explode_equi_join(spark):
    p = _plan(spark, "vec_centroid_drift")
    assert "CartesianProduct" not in p
    # the exploded (label, half, dim) relation feeds per-group aggregation
    assert "Generate" in p


def test_kn_bigram_single_doc_shuffle_then_pair_aggs(spark):
    p = _plan(spark, "text_kneser_ney_bigram")
    assert "CartesianProduct" not in p
    # the 1-row bigram-total side joins as broadcast
    assert "BroadcastNestedLoopJoin" in p


def test_real_codec_queries_single_scan_no_shuffle(spark):
    """The codec roundtrips (PNG / mu-law / JPEG) are pure Arrow-batch
    maps: exactly one parquet scan, zero exchanges — the plan property
    that makes them embarrassingly parallel at any corpus size (work
    scales with input splits, no shuffle to bottleneck)."""
    import re

    for name in (
        "multimodal_png_decode",
        "multimodal_mulaw_roundtrip",
        "multimodal_jpeg_roundtrip",
    ):
        p = _plan(spark, name)
        scans = re.findall(r"^\(\d+\) Scan parquet", p, flags=re.M)
        assert len(scans) == 1, (name, len(scans))
        assert "Exchange" not in p, name


# --- never_broadcast merge-pin ratchet (round-9 verdict item 1) -------------
#
# The round-9 256x scale campaign found Catalyst broadcasting corpus-
# proportional join sides (Generate fan-out is un-modeled in sizeInBytes:
# a ~3 GiB exploded relation estimated at "37 MB"), a mid-scale OOM class
# fixed by plans/broadcast.py:never_broadcast merge pins at 30 call sites.
# Nothing previously ASSERTED those hints hold — a refactor dropping one
# would pass every gate at test scale and silently re-open the OOM window.
#
# The ratchet: the merge hint survives in the ANALYZED logical plan as
# `ResolvedHint (strategy=merge)` (the optimizer consumes it into the Join
# node afterwards, and caching/persist substitution happens later still,
# so the analyzed count is deterministic and cache-immune).  Expected
# counts below were measured by sweeping every registered query at
# sf0.001; dropping ANY pin site lowers the count of at least one query
# here.  Iterative builders (pair_triangles, clustering_coeff) inherit
# the pin once per unrolled round — their counts are large but
# deterministic on the frozen fixture.
_MERGE_PIN_EXPECT = {
    "text_tfidf_top_terms": 1,
    "text_contamination": 1,
    "text_bigram_novelty": 1,
    "text_token_rarity": 1,
    "text_unigram_surprisal": 1,
    "text_kneser_ney_bigram": 2,
    "text_rake_keywords": 2,
    "text_boilerplate_spans": 1,
    "pipeline_corpus_curation": 2,
    "source_quality_profile": 1,
    "dedup_ngram_jaccard": 2,
    "dedup_jaccard_prefix": 4,
    "dedup_containment": 2,
    "dedup_minhash_lsh": 4,
    "dedup_simhash_pairs": 2,
    "dedup_clusters_star": 8,
    "dedup_lsh_incremental": 3,
    "dedup_fused": 4,
    "dedup_chunk_exact": 1,
    "dedup_minhash_calibration": 4,
    # The two large counts are DERIVABLE, not arbitrary (round-10 verdict
    # item 4): the analyzed plan INLINES the 4-pin minhash_lsh_pairs
    # subtree `e` at every reference, and triangles_oriented(e) references
    # its edge input 15x — deg unions e twice (2), the orientation join
    # e ⋈ deg ⋈ deg makes 1+2+2 = 5 (= o, the oriented set), and
    # closed = (w1=o) ⋈ (w2=o) ⋈ o = 15.
    #   dedup_pair_triangles: e-copies = n_edges agg (1) + triangle-count
    #   agg over tri (15) + node-participation union of 3 tri copies (45)
    #   = 61; 61 x 4 pins = 244.
    "dedup_pair_triangles": 244,
    # round-13: the single-pass doc side removed the per_doc⋈runs stitch
    # join and the second flagged consumer outright (ops/dedup.py) — the
    # one remaining join (pos ⋈ occ on the window hash) keeps its pin
    "dedup_substring_runs": 1,
    "dedup_cdc_chunks": 1,
    "dedup_split_leakage": 4,
    "dedup_threshold_sweep": 4,
    "dedup_lsh_precision_recall": 12,
    #   graph_clustering_coeff: e-copies = degree union (2) + node_t's
    #   union of 3 tri copies (45) = 47; 47 x 4 pins = 188.
    "graph_clustering_coeff": 188,
}


import pytest as _pytest


@_pytest.mark.parametrize(
    "name", sorted(_MERGE_PIN_EXPECT), ids=lambda n: n
)
def test_never_broadcast_merge_pins_hold(spark, name):
    df = all_specs()[name].fn(spark, SF_DIR)
    qe = df._jdf.queryExecution()
    hints = qe.analyzed().toString().count("strategy=merge")
    assert hints >= _MERGE_PIN_EXPECT[name], (
        f"{name}: {hints} merge hints in the analyzed plan, expected >= "
        f"{_MERGE_PIN_EXPECT[name]} — a never_broadcast pin was dropped "
        "(plans/broadcast.py): this re-opens the 256x Generate-fan-out "
        "broadcast-OOM window"
    )
    # physical confirmation: at fixture scale every side is tiny, so the
    # pinned joins plan as SortMergeJoin ONLY because the hint forces it —
    # without it Catalyst broadcasts (exactly the mid-scale hazard)
    phys = qe.executedPlan().toString()
    assert phys.count("SortMergeJoin") >= 1, name
