"""Query-spec modules; importing this package registers every spec."""

from findb_spark.queries import (  # noqa: F401
    asof_queries,
    relational,
    timeseries,
    events_queries,
    text_queries,
    dedup_queries,
    vector_queries,
    multimodal_queries,
    udf_queries,
    tpch_suite,
    merge_queries,
    pipeline_queries,
    quality_queries,
    roundtrip_queries,
    finance_analytics,
    stats_queries,
    corpus_queries,
    events_analytics,
    vector_analytics,
    graph_quality_queries,
)
