"""As-of join — an operator Spark lacks natively (pyspark guide: "As-of /
range join → bucketize + equi-join, or applyInPandas merge_asof").

This implementation uses neither: the **union + ordered-window
last-ignorenulls** formulation keeps everything in JVM window execution
(one shuffle on the key, one sort per partition — exactly the cost of a
sort-merge join) and has no per-group Python:

  1. tag left rows (needles) and right rows (candidates), union them,
  2. window over (key) ordered by (ts, right-before-left tiebreak),
  3. ``last(right_payload, ignorenulls=True)`` up to the current row =
     the most recent right row with ts <= left ts,
  4. keep only left rows.

Tolerance (max lookback) is applied as a post-filter on the matched ts.

Skew: AQE's skew handling splits JOIN partitions, NOT window exchanges —
a hot key lands its entire history on one task's sort. ``chunk_seconds``
is the mitigation: time-chunk salting with boundary carry-over. The
window partitions on (key, time_chunk) so a hot key's rows split across
chunks; correctness across chunk boundaries is restored by a carry pass —
the last right row of each (key, chunk) is rolled forward along the
per-key chunk sequence (a TINY window: ≤1 row per (key, active chunk))
and injected into the next chunks as a synthetic right row that, having
an earlier timestamp than everything in the chunk, sorts first. Cost: one
extra small shuffle; max task size drops from O(rows per hot key) to
O(rows per hot key per chunk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance_seconds: int | None = None,
    direction: str = "backward",
    chunk_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (direction='backward'; 'forward' mirrors).

    Output: all left columns + ``asof_<ts>`` + the right payload columns
    (null when no match within tolerance).

    ``chunk_seconds`` enables the hot-key mitigation (module docstring):
    the window partitions on (key, time-chunk) with boundary carry-over
    instead of (key) alone. Semantics are identical; use it when a single
    key can hold more rows than one task should sort."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lcols = left.columns
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lrow"),
        F.lit(None).cast("timestamp").alias("__rts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_payload],
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l.schema["__lrow"].dataType).alias("__lrow"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    payload_cols = ["__rts"] + [f"__r_{c}" for c in right_payload]
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()

    if chunk_seconds is None:
        u = l.unionByName(r)
        part_cols = ["__k"]
    else:
        chunk = F.floor(
            F.col("__ts").cast("timestamp").cast("long") / F.lit(chunk_seconds)
        ).alias("__chunk")
        l2 = l.withColumn("__chunk", chunk)
        r2 = r.withColumn("__chunk", chunk)
        # boundary row of each (key, chunk) on the right: the row a later
        # (backward) / earlier (forward) chunk would reach back to
        pick = F.max_by if direction == "backward" else F.min_by
        boundary = r2.groupBy("__k", "__chunk").agg(
            pick(F.struct("__ts", *payload_cols), F.col("__ts")).alias("__b")
        )
        # roll the boundary along the per-key chunk sequence — left chunk
        # markers sort BEFORE the same chunk's boundary row, so a marker
        # only sees boundaries from STRICTLY earlier (later, for forward)
        # chunks. This frame holds ≤ 1 row per (key, active chunk): tiny.
        markers = l2.select("__k", "__chunk").distinct().withColumn("__m", F.lit(0))
        src = boundary.select("__k", "__chunk", "__b").withColumn(
            "__m", F.lit(1)
        ).unionByName(markers.withColumn("__b", F.lit(None).cast(
            boundary.schema["__b"].dataType)), allowMissingColumns=False)
        chunk_order = (
            F.col("__chunk").asc() if direction == "backward" else F.col("__chunk").desc()
        )
        wseq = (
            Window.partitionBy("__k")
            .orderBy(chunk_order, F.col("__m").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carry = (
            src.withColumn("__carry", F.last("__b", ignorenulls=True).over(wseq))
            .filter((F.col("__m") == 0) & F.col("__carry").isNotNull())
            .select(
                "__k",
                "__chunk",
                F.col("__carry.__ts").alias("__ts"),
                F.lit(0).alias("__is_left"),
                F.lit(None).cast(l.schema["__lrow"].dataType).alias("__lrow"),
                *[F.col(f"__carry.{c}").alias(c) for c in payload_cols],
            )
        )
        # the carried row's ORIGINAL ts predates (postdates, for forward)
        # everything in the chunk, so it sorts first under ts_order — no
        # special sort flag needed
        u = l2.unionByName(r2).unionByName(carry.select(*l2.columns))
        part_cols = ["__k", "__chunk"]

    w = (
        Window.partitionBy(*part_cols)
        .orderBy(ts_order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    matched = u.select(
        "__is_left",
        "__lrow",
        F.col("__ts").alias("__lts"),
        F.last("__rts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in right_payload
        ],
    ).filter(F.col("__is_left") == 1)

    if tolerance_seconds is not None:
        delta = F.abs(
            F.col("__lts").cast("timestamp").cast("long")
            - F.col("asof_ts").cast("timestamp").cast("long")
        )
        in_tol = F.col("asof_ts").isNotNull() & (delta <= tolerance_seconds)
        matched = matched.select(
            "__lrow",
            F.when(in_tol, F.col("asof_ts")).alias("asof_ts"),
            *[
                F.when(in_tol, F.col(f"__m_{c}")).alias(f"__m_{c}")
                for c in right_payload
            ],
        )
    out = matched.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        F.col("asof_ts"),
        *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in right_payload],
    )
    return out
