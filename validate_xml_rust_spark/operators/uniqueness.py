"""Uniqueness / duplicate-key detection with explicit skew salting
(SURVEY.md §2.4 A10; north_rule: "uniqueness via salted hash-partitioned
groupBy").

Web-scale url/url-host keys are pathologically Zipf-skewed; a single
``groupBy(key)`` puts every hot key's rows in one reducer. The salted
two-phase aggregation bounds any single task:

  phase 1: groupBy(key, xxhash64(row-identity) % n_salts).count()
           — partial counts, each salt bucket ≤ 1/n_salts of the hot key
  phase 2: groupBy(key).sum(partial) — tiny input (≤ n_salts rows per key)

AQE coalesces the (many, small) phase-2 partitions. Note AQE's skew-join
splitting does NOT salt aggregations — this operator is why the engine
salts by hand (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(
    df: DataFrame, keys: list[str], n_salts: int = 16, salted: bool = True
) -> DataFrame:
    """Keys appearing more than once. Output: ``*keys, n_dup``.

    ``salted=False`` gives the naive single-shuffle plan (for plan/bench
    comparison in tests)."""
    key_cols = [F.col(k) for k in keys]
    nn = df
    if salted:
        salt = F.pmod(
            F.xxhash64(F.monotonically_increasing_id(), F.lit(7)), F.lit(n_salts)
        ).alias("__salt")
        partial = nn.groupBy(*key_cols, salt).agg(F.count(F.lit(1)).alias("__partial"))
        counts = partial.groupBy(*keys).agg(F.sum("__partial").alias("n_dup"))
    else:
        counts = nn.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_dup"))
    return counts.filter(F.col("n_dup") > 1)


def uniqueness_violations(
    df: DataFrame,
    keys: list[str],
    constraint_id: str = "unique",
    n_salts: int = 16,
    broadcast: bool = True,
) -> DataFrame:
    """Violation rows in the engine contract ``(url, constraint_id,
    observed_value)`` for duplicated keys. Null keys are not duplicates
    (SQL UNIQUE semantics — handled by ``not_null`` separately).

    ``broadcast=False`` for corpora where the duplicate-key set itself can
    exceed the broadcast ceiling (e.g. a crawl where most urls repeat):
    falls back to a shuffle join on the uniform key hash."""
    nn = df
    for k in keys:
        nn = nn.filter(F.col(k).isNotNull())
    dups = duplicate_keys(nn, keys, n_salts=n_salts)
    # Join back to recover the url of each offending row. The dup set is
    # usually tiny vs the table → broadcast it (escape hatch above).
    joined = nn.join(F.broadcast(dups) if broadcast else dups, on=keys, how="inner")
    return joined.select(
        F.col("url").alias("url"),
        F.lit(constraint_id).alias("constraint_id"),
        F.concat_ws("|", *[F.col(k).cast("string") for k in keys]).alias(
            "observed_value"
        ),
        F.concat(
            F.lit("duplicate key (n="), F.col("n_dup").cast("string"), F.lit(")")
        ).alias("message"),
    )
