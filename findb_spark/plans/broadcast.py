"""Broadcast control for joins whose sides Catalyst cannot size.

Catalyst's ``sizeInBytes`` estimate does NOT model ``Generate`` fan-out:
a relation built by explode/posexplode inherits its child's estimate, so
a ~200x token explosion (or a per-key aggregate of one) can sit under
``spark.sql.autoBroadcastJoinThreshold`` on paper while being GiB-sized
in fact. The result is a mid-scale OOM WINDOW: small corpora broadcast
harmlessly, huge corpora's estimates finally cross the threshold and
shuffle — but in between, the planner broadcasts a corpus-proportional
relation and the build explodes driver/executor memory. The 256x scale
smoke caught exactly this in ``jaccard_pairs`` (a ~3 GiB "37 MB"
broadcast) and ``substring_run_stats``.

Rule of thumb encoded here: a join side that grows with the CORPUS
(exploded tokens/shingles, their frequency aggregates, per-doc arrays)
must never be broadcast — hash-partitioned shuffle is the strategy that
holds at every scale. Bounded relations (dimension tables, top-k heads,
codebooks, calendar spines) keep using ``F.broadcast`` explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def never_broadcast(df: DataFrame) -> DataFrame:
    """Pin this join input to a sort-merge join.

    ``merge`` rather than ``shuffle_hash``: a ShuffledHashJoin's
    per-partition build is an in-memory HashedRelation that CANNOT spill —
    at 256x the substring-runs occurrence join died with "Can't acquire
    67108864 bytes memory to build hash relation" under 32 concurrent
    build tasks. Sort-merge spills both sides and scales to any input;
    AQE still coalesces partitions and splits skew on the shuffled form,
    and the sort cost at small scale is noise against the shuffle itself.
    """
    return df.hint("merge")
