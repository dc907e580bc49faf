"""Verdict aggregation + exit-code contract.

Mirrors ``ValidationResults::aggregate`` (reference src/validator.rs:258-323)
and the exit ladder (src/main.rs:113-119). One shuffle: a single hash
aggregation with map-side partial aggregation (Spark's HashAggregate does
the partial/final split automatically — the reference's single-pass fold
A1-A6 becomes partial folds per partition + a final merge)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _status_sum(status: str):
    # coalesce → 0 so an empty input yields zero counts, not nulls
    # (empty-input contract: src/validator.rs:983-991)
    return F.coalesce(
        F.sum(F.when(F.col("status") == status, 1).otherwise(0)), F.lit(0)
    )


def summarize(verdicts: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Counts per 4-state status + success rate + distinct specs used.

    ``by=None`` → one global row (the reference's ValidationResults);
    ``by=['partition_id']`` → per-partition pass/fail rows (north_rule)."""
    keys = by or []
    agg = (verdicts.groupBy(*keys) if keys else verdicts.groupBy()).agg(
        F.count(F.lit(1)).alias("total"),
        _status_sum("valid").alias("valid"),
        _status_sum("invalid").alias("invalid"),
        _status_sum("error").alias("error"),
        _status_sum("skipped").alias("skipped"),
        F.coalesce(F.sum("error_count"), F.lit(0)).alias("total_error_count"),
        F.sort_array(
            F.filter(F.collect_set("spec_id"), lambda x: x.isNotNull())
        ).alias("schemas_used"),
    )
    # success_rate: valid/total*100, 0.0 on empty — src/validator.rs:346-352.
    rate = F.when(
        F.col("total") > 0, F.col("valid") / F.col("total") * 100.0
    ).otherwise(F.lit(0.0))
    out = agg.withColumn("success_rate", rate)
    # all_valid / has_errors predicates (src/validator.rs:336-343)
    out = out.withColumn("all_valid", F.col("valid") == F.col("total")).withColumn(
        "has_errors", (F.col("error") > 0) | (F.col("invalid") > 0)
    )
    return out


def partition_pass_fail(verdicts: DataFrame) -> DataFrame:
    """Per-partition pass/fail verdict (north_rule: "the reference's exact
    per-partition pass/fail"): a partition passes iff every row in it is
    valid or skipped (skipped is a non-failure in the reference: exit code
    0 when only valid+skipped, src/main.rs:113-119)."""
    s = summarize(verdicts, by=["partition_id"])
    return s.withColumn(
        "passed", (F.col("invalid") == 0) & (F.col("error") == 0)
    ).orderBy("partition_id")


def exit_code(summary_row: dict, fail_fast: bool = False) -> int:
    """Exact exit ladder of src/main.rs:113-119:

    fail_fast & has_errors → 1; error rows → 2; invalid rows → 3; else 0.
    (The reference consults fail_fast only after the full run — no mid-run
    abort — and we replicate that faithfully, SURVEY.md §7.)"""
    has_errors = summary_row["error"] > 0 or summary_row["invalid"] > 0
    if fail_fast and has_errors:
        return 1
    if summary_row["error"] > 0:
        return 2
    if summary_row["invalid"] > 0:
        return 3
    return 0
