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
Scales: the union shuffles once on the join key; skewed keys get AQE's
skew-split since it's a plain window shuffle.
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
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (direction='backward'; 'forward' mirrors).

    Output: all left columns + ``asof_<ts>`` + the right payload columns
    (null when no match within tolerance)."""
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
    u = l.unionByName(r)

    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts (<= semantics)
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
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
