"""Query registry — single source of truth for the driver contract.

Every engine capability is declared once as a :class:`QuerySpec`:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are SQL-expressible) a DuckDB oracle SQL string computing the
same result over the same parquet tables. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry, so the two dicts can
never drift apart.

Parity rules (driver compares row count + schema + order-insensitive value
hash, CORRECTNESS_r{N}.json):

- alias every computed column identically on both sides;
- money-style aggregates go through DECIMAL(18,2) sums cast back to DOUBLE
  — exact and order-independent, so Spark and DuckDB agree bit-for-bit
  regardless of partitioning/accumulation order (a raw double sum over 600k
  rows carries ~1e-5 absolute error that WOULD flip a hash);
- ratio-style outputs are rounded to a fixed small scale on both sides;
- every top-k has a total deterministic ORDER BY (unique tiebreaker column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None
    category: str
    description: str = ""
    #: queries worth timing in bench.py
    bench: bool = field(default=False)


_SPECS: dict[str, QuerySpec] = {}

#: Names surfaced FIRST by :func:`all_specs` (then the rest in registration
#: order).  The external correctness harness checks a bounded prefix of the
#: spec dict per round, so the prefix should hold the queries whose hard
#: verification signal is most valuable right now: the LLM-data-pipeline
#: operators (dedup / vector / text / events / multimodal / UDF), the
#: remaining unverified time-series tail, the two queries whose oracles were
#: reworked for canonicalizer compatibility (pivot_status / array_agg_orders),
#: and the start of the TPC-H completion suite.  Core as-of / relational /
#: window queries already carry green rows from the previous round and rotate
#: behind.  Names not yet registered are ignored, so this list never breaks
#: registration.
#:
#: ROUND-6 ROTATION PLAN (build _CHECK_FIRST from this when round 5's
#: correctness lands): 66 queries registered past the round-5 window await
#: first driver rows — the 31 listed in SURVEY's round-5 status plus the 35
#: round-5-continuation additions (stats_mannwhitney,
#: stats_histogram_quantiles, lineitem_transit_peak, skew_salted_join,
#: ts_cusum_changepoint, events_attribution_ushape, roundtrip_ivm_delta,
#: graph_clustering_coeff, ts_momentum_backtest, roundtrip_stream_watermark,
#: multimodal_image_resize, events_l28_histogram, ts_pairs_spread,
#: graph_source_modularity, text_bpe_train_rounds, text_readability_ari,
#: part_supplier_hhi, dq_duplicate_orders, stats_anova_f,
#: events_time_in_state, roundtrip_hive_partition_pruning,
#: roundtrip_vacuum_retention, pit_feature_join, dedup_split_leakage,
#: roundtrip_stream_stateful, orders_seasonal_naive_mae,
#: roundtrip_bloom_manifest, ts_cvar_expected_shortfall, pii_tcloseness,
#: roundtrip_manifest_incremental, customer_segment_migration,
#: ts_portfolio_turnover, dq_referential_integrity — all pre-validated at
#: sf0.001 AND sf0.01 this session, with the whole registry additionally
#: re-verified at sf0.01).
#: That exceeds one 50-slot window: round 6 should take the 31 + the 19
#: continuation entries that gate new ENGINE mechanisms (the 8 roundtrips
#: incl. ivm/watermark/stateful/bloom/vacuum/pruning, skew_salted_join,
#: text_bpe_train_rounds, pit_feature_join, multimodal_image_resize,
#: dedup_split_leakage first), and roll the remainder + headline
#: re-confirmations to round 7.
#:
#: SESSION-3 ADDITIONS (also pre-validated at sf0.001 AND sf0.01; never
#: driver-checked): 20 more — engine mechanisms first for round 6 if
#: slots allow (roundtrip_dynamic_overwrite, roundtrip_stream_restart,
#: roundtrip_occ_commit, roundtrip_shallow_clone, vec_power_iteration,
#: graph_label_propagation, graph_bfs_contamination,
#: multimodal_image_boxblur, sql_pivot_syntax, events_markov_stationary),
#: analytics to round 7 (text_kneser_ney_bigram, text_rake_keywords,
#: stats_kendall_tau, stats_spearman, stats_theil_sen,
#: ts_amihud_illiquidity, stats_cramers_v, orders_abc_xyz,
#: vec_centroid_drift, orders_repeat_purchase_curve).
#:
#: ROUND-5 ROTATION: CORRECTNESS_r04 landed 50/50 green, so every query
#: registered before round 5 carries a driver hard-signal row EXCEPT the 5
#: registered after the round-4 window filled — they lead this prefix.  Next
#: come 8 re-confirmation slots for the bench-flagged headline queries whose
#: only green rows date from r1 (asof_join_shifted, dedup_minhash_lsh,
#: dedup_ngram_jaccard, dedup_simhash_pairs, events_tumbling_hourly,
#: vec_ann_lsh, vec_cosine_topk, ts_moving_avg — four rounds of engine
#: evolution sit between those rows and today's code).  The remaining 37
#: slots are the round-5 additions: advanced finance analytics (Bollinger /
#: rolling beta / MACD / autocorr / seasonality / cross-sectional z /
#: bitemporal diff), statistical tests (Welch t, chi-squared, Benford,
#: distributed-rank Gini, Simpson diversity, windowed distinct, bitmap
#: months, explicit Bloom semi-join), corpus LM analytics (surprisal, Zipf,
#: hapax, trigram diversity, cross-source dups, bigram coverage), events
#: product analytics (exact DAU/WAU, time-to-convert, 2nd-order Markov,
#: cohort LTV, churn), vector analytics (kNN graph, MMR rerank, LSH recall
#: curve, norm profile), dup-graph structure (2-core peel, neighbor
#: Jaccard, cluster histogram), privacy/DQ (l-diversity, freshness SLA),
#: and two new source/sink hard signals (versioned time travel,
#: CSV quoting quirks).  5 + 8 + 37 = the 50-slot window exactly; after it
#: lands, every registered query again carries a driver row.
_CHECK_FIRST: tuple[str, ...] = (
    # ---- 5 queries registered after the round-4 window filled (first
    # driver rows due this round) ----
    "roundtrip_stream_enrich",
    "pii_kanonymity",
    "vec_cluster_silhouette",
    "events_hll_exact_registers",
    "events_kmv_sketch_setops",
    # ---- headline re-confirmation rows: bench-flagged queries whose only
    # green rows date from r1 (current code differs by 4 rounds of engine
    # evolution; a recent row per headline keeps the bench trustworthy) ----
    "asof_join_shifted",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "events_tumbling_hourly",
    "vec_ann_lsh",
    "vec_cosine_topk",
    "ts_moving_avg",
    # ---- the 37 round-5 additions (never driver-checked by definition):
    # finance analytics, statistical tests, corpus LM analytics, events
    # product analytics, vector analytics, dup-graph structure, privacy/DQ,
    # versioned time travel + CSV quirks roundtrips ----
    "ts_bollinger",
    "ts_rolling_beta",
    "ts_autocorr",
    "ts_macd",
    "ts_seasonality_dow",
    "ts_zscore_xsection",
    "asof_bitemporal_diff",
    "stats_welch_ttest",
    "stats_chi2_independence",
    "stats_benford",
    "stats_gini_revenue",
    "stats_simpson_diversity",
    "window_rolling_distinct",
    "bitmap_active_months",
    "bloom_prefilter_join",
    "text_unigram_surprisal",
    "text_zipf_slope",
    "text_hapax_ratio",
    "text_trigram_diversity",
    "dedup_cross_source",
    "text_bigram_coverage",
    "events_dau_wau",
    "events_time_to_convert",
    "events_markov2",
    "events_cohort_ltv",
    "events_churn_inactive",
    "vec_knn_graph",
    "vec_mmr_rerank",
    "vec_lsh_recall_curve",
    "vec_norm_profile",
    "graph_kcore",
    "graph_neighbor_jaccard",
    "dedup_cluster_stats",
    "pii_ldiversity",
    "dq_freshness_lag",
    "roundtrip_time_travel",
    "roundtrip_csv_quirks",
)


def register(
    name: str,
    sql: str | None,
    category: str,
    description: str = "",
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _SPECS:
            raise ValueError(f"duplicate query spec: {name}")
        _SPECS[name] = QuerySpec(name, fn, sql, category, description, bench)
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """All registered specs (importing the query modules as a side effect).

    Order: ``_CHECK_FIRST`` names first, then the rest in registration order.
    """
    import findb_spark.queries  # noqa: F401  (registers everything)

    out = {n: _SPECS[n] for n in _CHECK_FIRST if n in _SPECS}
    out.update(_SPECS)
    return out
