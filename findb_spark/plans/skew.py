"""Skew mitigation by key salting.

AQE's skew-join splitting (on by default, session.py) handles most skew at
runtime by splitting oversized shuffle partitions — but only for sort-merge
joins it can observe. Manual salting remains the tool when (a) the skewed
side feeds a join AQE won't rewrite (e.g., after a custom partitioner or
inside a cached plan), or (b) a single hot key exceeds what any single
task can hold even after splitting.

``salted_join`` spreads each hot key of the big side across ``salt``
shuffle partitions by appending a uniform salt column, and replicates the
small side ``salt`` times so every (key, salt) bucket finds its match.
Cost: small side shuffles salt-times larger; big side spreads evenly —
the classic trade at 100 TB where one hot asset/user would otherwise pin
one executor for hours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on column ``on``, salting the big
    side into ``salt`` buckets per key. Result is identical to
    ``big.join(small, on, how)`` for 'inner' and 'left' joins; the join
    itself shuffles big rows uniformly even when one key dominates."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (right/full would double-count)")
    # salt derived from row CONTENT (every big-side column) MIXED WITH the
    # input partition id, not from monotonically_increasing_id():
    # content-hashing alone is retry-stable but sends fully-duplicated
    # rows of a hot key (a common skew shape) to ONE bucket — mixing the
    # partition id spreads duplicates that arrive in different input
    # partitions while staying stable across task retries (a retried task
    # recomputes the same partition). Residual limit: identical rows
    # co-located in one input partition still share a bucket; if that is
    # the dominant shape, pre-spread them with a within-partition
    # row_number (costs a sort) before salting.
    b = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in big.columns], F.spark_partition_id()),
            F.lit(salt),
        ).cast("int"),
    )
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return b.join(s, [on, "_salt"], how).drop("_salt")
