"""CSV ingestion with datetime normalization (reference O1 + O2).

Replicates the reference's ETL pipeline (``file.rs:591-604`` headerless
4-column CSV scan; ``scripts/convert-datetimes.py:22-35`` ISO date ->
yyyymmdd int, ISO timestamp -> epoch seconds) as a single declarative read —
the casts run JVM-side inside whole-stage codegen, and malformed rows go to
a quarantine column instead of panicking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructField, StructType, StringType

RAW_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("date", StringType()),
        StructField("ts", StringType()),
        StructField("value", StringType()),
    ]
)


def _normalize(raw: DataFrame, drop_malformed: bool) -> DataFrame:
    """Shared normalization: string fields (possibly ISO dates/timestamps or
    already-normalized digit strings) -> canonical prices schema, with
    try_cast quarantine instead of ANSI throw."""
    date_col = (
        F.when(
            F.col("date").rlike(r"^\d+$"), F.expr("try_cast(date AS INT)")
        ).otherwise(
            F.date_format(F.expr("try_cast(date AS DATE)"), "yyyyMMdd").cast("int")
        )
    )
    ts_col = (
        F.when(F.col("ts").rlike(r"^\d+$"), F.expr("try_cast(ts AS BIGINT)"))
        .otherwise(
            F.unix_timestamp(F.expr("try_to_timestamp(ts)")).cast("bigint")
        )
    )
    out = raw.select(
        F.expr("try_cast(asset_id AS BIGINT)").alias("asset_id"),
        date_col.alias("date"),
        ts_col.alias("ts"),
        F.expr("try_cast(value AS DOUBLE)").alias("value"),
    )
    if drop_malformed:
        out = out.where(
            F.col("asset_id").isNotNull()
            & F.col("date").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
    return out


def ingest_json(
    spark: SparkSession, path: str, drop_malformed: bool = True
) -> DataFrame:
    """Read newline-delimited JSON records with fields
    ``asset_id/date/ts/value`` (same normalization contract as
    `ingest_csv`). The explicit all-string schema defers typing to the
    same try_cast quarantine — a malformed record yields NULLs, never an
    executor exception."""
    raw = spark.read.schema(RAW_SCHEMA).json(path)
    return _normalize(raw, drop_malformed)


def ingest_csv(
    spark: SparkSession, path: str, drop_malformed: bool = True
) -> DataFrame:
    """Read headerless ``asset_id,date,timestamp,value`` CSV where date/ts may
    be ISO strings (pre-conversion form) or already-normalized ints, and
    produce the canonical prices schema (FIXTURES.md §A1).

    Normalization (mirrors convert-datetimes.py):
    - date: 'YYYY-MM-DD' -> int yyyymmdd; digit strings pass through
    - ts:   ISO timestamp -> epoch seconds; digit strings pass through

    All casts are ``try_cast`` (ANSI-safe): malformed fields become NULL, and
    rows with any NULL key field are dropped when ``drop_malformed`` (the
    reference panics instead, file.rs:597-602 — at 100 TB a single bad row
    must not kill the load).
    """
    raw = spark.read.csv(path, schema=RAW_SCHEMA, header=False)
    return _normalize(raw, drop_malformed)


def ingest_orc(
    spark: SparkSession, path: str, drop_malformed: bool = True
) -> DataFrame:
    """Read ORC files carrying the raw ``asset_id/date/ts/value`` columns
    (any ORC-representable types — normalized through the same try_cast
    quarantine as the CSV/JSON paths, so a malformed field NULLs out
    instead of throwing under ANSI mode)."""
    raw = spark.read.orc(path).select(
        F.col("asset_id").cast("string"),
        F.col("date").cast("string"),
        F.col("ts").cast("string"),
        F.col("value").cast("string"),
    )
    return _normalize(raw, drop_malformed)


def ingest_binary(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Ingest raw media/blob files through Spark's built-in ``binaryFile``
    source: one row per file with (path, modificationTime, length,
    content: binary) — the raw-asset entry point of the multimodal
    pipeline (findb_spark.ops.multimodal consumes the ``content`` bytes).

    Scale notes: the source is splittable BY FILE (one task per file), so
    millions of small assets parallelize naturally; pair with
    ``spark.sql.files.maxPartitionBytes`` / ``binaryFile`` packing so a
    few multi-GB videos don't straggle a stage. Filters on path/length
    push down to the file index (no content read for pruned files) —
    predicate-prune first, decode later."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def ingest_text_log(
    spark: SparkSession,
    path: str,
    pattern: str,
    fields: dict[str, str],
    drop_malformed: bool = True,
) -> DataFrame:
    """Parse unstructured text lines (``spark.read.text``) into typed
    columns with one regex: field i comes from capture group i+1 of
    ``pattern``, typed via ``try_cast`` (ANSI-safe — a malformed line
    NULLs out instead of killing the executor, matching the CSV/JSON
    quarantine contract).

    The whole parse is a codegen projection over a splittable text scan —
    the standard log-ingestion entry at any scale. ``fields`` maps column
    name -> Spark SQL type in group order."""
    raw = spark.read.text(path)
    # regexp_extract returns '' (not NULL) when the pattern does not match;
    # for string-typed fields try_cast('') passes through, so a garbage
    # line would survive as a row of empty strings. nullif('') restores
    # the NULLs-out contract for every field type (a genuinely-empty
    # optional capture group also reads as NULL — documented semantics).
    cols = [
        F.nullif(F.regexp_extract(F.col("value"), pattern, i + 1), F.lit(""))
        .try_cast(t)
        .alias(name)
        for i, (name, t) in enumerate(fields.items())
    ]
    if drop_malformed:
        # Quarantine on WHOLE-PATTERN match, not per-field null-ness: a
        # legitimately-empty optional capture group (e.g. `(\w*)`) NULLs a
        # string field via the nullif above, and a per-field gate would
        # silently drop that valid line along with genuine garbage.  A
        # line either matches the line shape (kept, NULLs allowed where
        # captures are empty or casts fail) or doesn't (dropped).
        raw = raw.where(F.regexp_like(F.col("value"), F.lit(pattern)))
    return raw.select(*cols)
