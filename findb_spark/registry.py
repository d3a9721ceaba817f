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
#: ROUND-3 ROTATION (executing the plan written in round 2): the round-2
#: window landed green on its whole 50-query prefix except the 4 events
#: queries whose oracles typed as DuckDB HUGEINT (now cast to BIGINT and
#: lint-guarded in findb_spark.oracle.lint_oracle_types).  This prefix is
#: exactly: those 4 fixed queries + text_pack_sequences (confirmation rows
#: for the fix) + 45 of the 53 queries that have never carried a driver
#: correctness row, prioritized per the plan (TPC-H q9..q22, MERGE/SCD2,
#: DQ/PII/CDC, the round-2 dedup/vector additions, recursive SQL, as-of
#: variants, multimodal codecs, text/pipeline additions).  Deferred to the
#: round-4 window (fits in one final window with room to spare):
#: customer_rfm, winsorize_revenue, robust_mad, pareto_part_revenue,
#: corr_matrix_assets, ts_drawdown, ts_ewma — robust-stats/time-series
#: queries whose siblings (stats_corr, ts_linreg_slope, ts_cross_rank,
#: ts_ohlc_bars) already carry green rows.
#:
#: ROUND-4 ROTATION PLAN: once CORRECTNESS_r03 lands green for this
#: prefix, rebuild it as: the 7 deferred names above + the 15 round-3
#: additions (roundtrip_csv_ingest, roundtrip_findb_db,
#: roundtrip_stream_tumbling, roundtrip_stream_sessionize,
#: roundtrip_zorder_layout, roundtrip_compact_layout,
#: roundtrip_manifest_pruned_read, roundtrip_incremental_bars,
#: roundtrip_bucketed_join, roundtrip_multiformat_ingest,
#: roundtrip_textlog_ingest, dedup_chunk_exact, dedup_select_canonical,
#: text_token_rarity, corpus_mixture_weights, vec_pq_adc, vec_pq_search,
#: vec_ivf_pq, pipeline_pretrain_mix, text_heavy_hitters_cms,
#: text_bpe_merge_candidates, events_variant_extract,
#: sql_udf_acct_band, vec_truncated_topk, roundtrip_findb_db_asof,
#: roundtrip_schema_evolution, dedup_minhash_calibration,
#: dq_documents_audit, events_sliding_hourly, dedup_pair_triangles) + any red round-3 rows kept for confirmation —
#: ~38 names, leaving ~12 free slots for round-4 additions.  After that
#: window every registered query will carry a driver hard-signal row.
_CHECK_FIRST: tuple[str, ...] = (
    # HUGEINT-fix confirmation rows (red in r2 -> cast AS BIGINT this round)
    "events_json_extract",
    "events_sessionize",
    "events_funnel_pivot",
    "events_funnel_conversion",
    "text_pack_sequences",  # latent HUGEINT (pack_id), fixed pre-emptively
    # TPC-H completion tail (never driver-checked)
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_classes",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q17_small_qty_revenue",
    "q20_excess_shippers",
    "q21_sole_return_supplier",
    "q22_idle_customers",
    # MERGE / SCD2 / CDC / validation layer (O10-O12 hard signal)
    "merge_upsert_orders",
    "scd2_price_intervals",
    "snapshot_diff_orders",
    "dq_orders_audit",
    "pii_scrub_names",
    # round-2 dedup additions
    "dedup_semantic",
    "dedup_fused",
    "dedup_containment",
    "dedup_clusters_star",
    "dedup_lsh_incremental",
    "dedup_clusters_semantic",
    # round-2 vector additions
    "vec_ivf_kmeans",
    "vec_ann_lsh_multiprobe",
    "vec_quantize_int8",
    # as-of variants + recursive SQL front end
    "asof_join_forward",
    "asof_join_tolerance",
    "sql_recursive_rollup",
    # real-codec multimodal (formula oracles)
    "multimodal_ppm_decode",
    "multimodal_audio_features",
    # text / sampling round-2 additions
    "text_contamination",
    "text_boilerplate_spans",
    "text_bigram_novelty",
    "sample_weighted",
    # events tail
    "events_type_transitions",
    "events_json_keys",
    "events_value_histogram",
    "events_hll_rollup",
    "events_funnel_timeout",
    # pipeline / curation layer
    "pipeline_corpus_curation",
    "source_quality_profile",
    "source_pagerank",
    # profiling / relational tail
    "stats_profile_lineitem",
    "string_agg_statuses",
    "unpivot_lineitem_measures",
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
