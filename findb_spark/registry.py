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
#: ROUND-4 ROTATION (executing the plan written in round 3): CORRECTNESS_r03
#: landed 49/50 green (the 50th is the rows-only HLL sketch, no oracle by
#: design), so this prefix is now exactly the 37 registered queries that
#: have never carried a driver correctness row — all 13 source/sink
#: roundtrips (certifying O1-O4/O14 end-to-end, incl. the literal `.db`
#: B+tree format in both directions), the 7 deferred robust-stats /
#: time-series queries, the PQ/IVF-PQ ANN family, the remaining dedup /
#: text / pipeline / events / UDF / DQ tail — then the 13 queries ADDED this
#: round (chunking, run-lengths, key-skew profile, retention cohorts,
#: attribution, MAD anomaly monitor, market basket, PQ recall dial, session
#: paths, substring-run dedup, streaming dedup + stream-stream join
#: roundtrips, content-defined chunking dedup — filling the 50-slot window
#: exactly), then re-confirmation slots for the most load-bearing
#: headline queries whose only green rows date from r1 (this round also
#: touches two headline queries directly: dedup_pair_triangles gained
#: degree orientation, text_heavy_hitters_cms a single-pass sketch build).
#: After this window every query registered BEFORE round 4 carries a
#: driver hard-signal row and every round-4 addition gets its first one;
#: the names past the driver's 50-slot window (the re-confirmation tail)
#: plus the remaining headline re-confirmations (asof_join_shifted,
#: dedup_minhash_lsh, dedup_ngram_jaccard, dedup_simhash_pairs,
#: events_tumbling_hourly, vec_ann_lsh, vec_cosine_topk, ts_moving_avg)
#: rotate through the round-5 prefix alongside round-5 additions.
_CHECK_FIRST: tuple[str, ...] = (
    # ---- the 37 never-driver-checked queries ----
    # source/sink roundtrip certification suite (O1-O4/O14)
    "roundtrip_csv_ingest",
    "roundtrip_multiformat_ingest",
    "roundtrip_textlog_ingest",
    "roundtrip_zorder_layout",
    "roundtrip_compact_layout",
    "roundtrip_bucketed_join",
    "roundtrip_findb_db",
    "roundtrip_findb_db_asof",
    "roundtrip_manifest_pruned_read",
    "roundtrip_incremental_bars",
    "roundtrip_schema_evolution",
    "roundtrip_stream_tumbling",
    "roundtrip_stream_sessionize",
    # robust stats / time-series (deferred from round 3 by plan)
    "customer_rfm",
    "winsorize_revenue",
    "robust_mad",
    "pareto_part_revenue",
    "corr_matrix_assets",
    "ts_drawdown",
    "ts_ewma",
    # PQ / IVF-PQ ANN family + Matryoshka truncation
    "vec_pq_adc",
    "vec_pq_search",
    "vec_ivf_pq",
    "vec_truncated_topk",
    # dedup tail
    "dedup_chunk_exact",
    "dedup_select_canonical",
    "dedup_minhash_calibration",
    "dedup_pair_triangles",
    # text tail (CMS sketch, BPE training stats, rarity)
    "text_token_rarity",
    "text_heavy_hitters_cms",
    "text_bpe_merge_candidates",
    # pipeline / corpus mixing
    "corpus_mixture_weights",
    "pipeline_pretrain_mix",
    # events / UDF / DQ tail
    "events_sliding_hourly",
    "events_variant_extract",
    "sql_udf_acct_band",
    "dq_documents_audit",
    # ---- the 9 round-4 additions (never driver-checked by definition) ----
    "text_chunk_windows",
    "events_run_lengths",
    "stats_key_skew",
    "events_retention_cohorts",
    "events_attribution",
    "events_anomaly_mad",
    "orders_market_basket",
    "vec_pq_recall",
    "events_session_paths",
    "dedup_substring_runs",
    "roundtrip_stream_dedup",
    "roundtrip_stream_join",
    "dedup_cdc_chunks",
    # ---- headline re-confirmation rows (bench-flagged, last green r1;
    # names past the driver's 50-slot window roll to the round-5 prefix
    # with the rest of the headline set) ----
    "asof_range",
    "asof_batch",
    "dedup_clusters",
    "dedup_jaccard_prefix",
    # ---- round-5 prefix head: registered after the round-4 window
    # filled; first driver rows due next round ----
    "roundtrip_stream_enrich",
    "pii_kanonymity",
    "vec_cluster_silhouette",
    "events_hll_exact_registers",
    "events_kmv_sketch_setops",
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
