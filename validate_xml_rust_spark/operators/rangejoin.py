"""Bucketized range (interval) join — the second join family Spark lacks a
native operator for (pyspark guide: "as-of / range join → bucketize the
range key + equi-join on bucket + filter").

``range_join_count`` answers "for each left row, how many right rows share
the key AND fall within [left.ts - window, left.ts)" — the classic
events-in-preceding-window pattern (fraud lookbacks, rate limiting,
feature windows).

Physical strategy: quantize timestamps into ``window``-sized buckets; a
right row within the lookback lives in the left row's bucket or the one
before it, so the theta-join collapses to TWO equi-join probes
(explode the left side into (bucket, bucket-1)), then an exact range
filter. Cost: one shuffle on (key, bucket) — never the O(n·m) nested loop
Catalyst would otherwise plan for a pure inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    count_alias: str = "n_in_window",
) -> DataFrame:
    """All left columns + ``count_alias`` = #right rows with the same key
    and ``left.ts - window <= right.ts < left.ts``."""
    lsec = F.col(left_ts).cast("timestamp").cast("long")
    rsec = F.col(right_ts).cast("timestamp").cast("long")

    l = (
        left.withColumn("__lsec", lsec)
        # per-input-row probe id: the two bucket probes of one left row
        # regroup on it even when left rows are duplicates of each other
        .withColumn("__rowid", F.monotonically_increasing_id())
        .withColumn(
            # floor, NOT cast-truncate: trunc rounds toward zero, so
            # pre-1970 (negative-epoch) timestamps would bucket off-by-one
            # and silently drop in-window matches near bucket boundaries
            "__b", F.explode(F.array(F.floor(lsec / window_seconds).cast("long"),
                                     F.floor(lsec / window_seconds).cast("long") - 1))
        )
    )
    r = (
        right.select(
            F.col(on).alias("__rk"),
            rsec.alias("__rsec"),
            F.floor(rsec / window_seconds).cast("long").alias("__rb"),
        )
    )
    j = l.join(
        r,
        (l[on] == r["__rk"]) & (l["__b"] == r["__rb"])
        & (r["__rsec"] >= l["__lsec"] - window_seconds)
        & (r["__rsec"] < l["__lsec"]),
        "left",
    )
    # The explode duplicates each left row into 2 bucket probes; a right
    # row matches exactly ONE probe (its own bucket), so counting matched
    # __rsec over the probe pair needs no dedup.
    group_cols = ["__rowid"] + [c for c in left.columns]
    return (
        j.groupBy(*group_cols)
        .agg(F.count("__rsec").alias(count_alias))
        .drop("__rowid")
    )
