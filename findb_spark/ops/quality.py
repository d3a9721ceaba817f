"""Data-quality audit + PII scrubbing — the validation pass a training-data
pipeline runs before (and after) every ingest.

Both operators are pure built-in-function compositions (no Python in the
hot path):

- :func:`dq_audit` folds every per-row rule (null / range / custom
  predicate) into **one aggregate over one scan** — ``sum(case when
  violated)`` per rule, unpivoted to long format with one explode — then
  unions the two rules that genuinely need their own plan shape: key
  uniqueness (one groupBy on the key) and referential integrity (one
  left join against the dimension — broadcast when small — whose single
  aggregate yields orphan count and total together). At 100 TB the fact
  table is read once for all row rules, not once per rule.
- :func:`scrub_patterns` applies an ordered dict of named regexes to a
  string column: each pattern's matches are counted (``regexp_count``)
  and replaced with a mask token. Counting and replacing are JVM-side
  codegen expressions — the scan stays in whole-stage codegen, which is
  the difference between a regex pass and a 100x-slower Python UDF pass
  over a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def dq_audit(
    df: DataFrame,
    row_rules: dict[str, Column],
    unique_key: list[str] | None = None,
    fk: tuple[DataFrame, str, str] | None = None,
) -> DataFrame:
    """Long-format audit report: one row per rule, columns
    (check, n_violations, n_checked).

    ``row_rules``: name -> boolean Column that is True when the row
    VIOLATES the rule. All row rules evaluate in a single scan/aggregate.
    ``unique_key``: declares the row-identity columns; violations = rows
    beyond the first per key.
    ``fk``: (dim_df, fact_col, dim_col) — violations = fact rows whose
    non-null ``fact_col`` has no match in ``dim_col`` (left join;
    Catalyst broadcasts the dim side when it is small).
    """
    n_total = F.count("*")
    # count_if is a count aggregate: NULL-safe on the predicate and 0 (not
    # NULL) over zero rows — an empty batch (a real state for the
    # streaming monitor) must report 0 violations
    aggs = [n_total.alias("_n")] + [
        F.count_if(cond).alias(f"_v_{name}") for name, cond in row_rules.items()
    ]
    one_pass = df.agg(*aggs)
    # unpivot the wide single-row aggregate into long format with ONE
    # explode — a union of per-rule selects over `one_pass` would make
    # Spark recompute the scan+aggregate subtree once per rule
    kv = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(f"_v_{name}").cast("bigint").alias("n_violations"),
            )
            for name in row_rules
        ]
    )
    parts = [
        one_pass.select(
            F.col("_n").cast("bigint").alias("n_checked"), F.explode(kv).alias("_kv")
        ).select("_kv.check", "_kv.n_violations", "n_checked")
    ]
    if unique_key:
        dup = df.groupBy(*unique_key).agg(F.count("*").alias("_c"))
        parts.append(
            dup.agg(
                F.lit("unique:" + ",".join(unique_key)).alias("check"),
                F.coalesce(F.sum(F.col("_c") - 1), F.lit(0))
                .cast("bigint")
                .alias("n_violations"),
                F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint").alias("n_checked"),
            )
        )
    if fk is not None:
        dim, fact_col, dim_col = fk
        # left join (dim side broadcast when small) + one aggregate gives
        # orphan count AND total in a single pass — an anti-join would need
        # a second scan of `df` just to report n_checked
        j = df.select(fact_col).join(
            dim.select(F.col(dim_col).alias(fact_col))
            .distinct()
            .withColumn("_dim_hit", F.lit(1)),
            on=fact_col,
            how="left",
        )
        parts.append(
            j.agg(
                F.lit(f"fk:{fact_col}").alias("check"),
                F.count_if(F.col(fact_col).isNotNull() & F.col("_dim_hit").isNull())
                .cast("bigint")
                .alias("n_violations"),
                F.count("*").cast("bigint").alias("n_checked"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scrub_patterns(
    df: DataFrame,
    col: str,
    patterns: dict[str, str],
    mask: str = "[REDACTED]",
) -> DataFrame:
    """Redact every named regex in ``patterns`` from ``df[col]``.

    Adds ``<col>_scrubbed`` (all patterns replaced by ``mask``, applied in
    dict order so earlier patterns win overlaps) and one ``n_<name>``
    count column per pattern (matches in the ORIGINAL text). The standard
    PII pass (emails / long digit runs / id-like tokens) is a dict of
    three regexes; swapping jurisdictions touches only the dict.
    """
    out = df
    scrubbed = F.col(col)
    for name, pat in patterns.items():
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(col), F.lit(pat)))
        scrubbed = F.regexp_replace(scrubbed, pat, mask)
    return out.withColumn(f"{col}_scrubbed", scrubbed)
