"""Result sinks: partitioned parquet layout for verdicts / violations /
metrics (the durable form of the reference's report, S8→tables).

Layout choices are the read-side optimization:
- verdicts partitioned by ``status`` — the overwhelmingly common read is
  "show me the failures" (reference prints only non-valid rows, P7);
  partition pruning turns that into a scan of the tiny failure partitions,
- violations partitioned by ``constraint_id`` — per-check drill-down reads
  one directory,
- metrics appended per run (the lineage ledger, operators/resume.py).

On Iceberg these become partitioned tables with snapshot commits; the
parquet layout keeps the same pruning behavior in the sandbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_results(
    verdicts: DataFrame,
    violations: DataFrame,
    out_dir: str,
    mode: str = "overwrite",
) -> None:
    (
        verdicts.drop("violation_entries")
        .withColumn("error_details", F.concat_ws("; ", "error_details"))
        .write.mode(mode)
        .partitionBy("status")
        .parquet(f"{out_dir}/verdicts")
    )
    violations.write.mode(mode).partitionBy("constraint_id").parquet(
        f"{out_dir}/violations"
    )


def read_failures(spark: SparkSession, out_dir: str) -> DataFrame:
    """The P7 read path: only non-valid partitions are scanned (partition
    pruning — assert via PartitionFilters in the plan)."""
    return spark.read.parquet(f"{out_dir}/verdicts").filter(
        F.col("status") != "valid"
    )


def read_violations_for(
    spark: SparkSession, out_dir: str, constraint_id: str
) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/violations").filter(
        F.col("constraint_id") == constraint_id
    )


def read_quarantine(spark: SparkSession, quarantine_dir: str) -> DataFrame:
    """Load a quarantine dir back as an INPUT frame for replay: the
    payload columns survive (url + whatever keep_cols rode the original
    verdicts), the stale verdict columns are dropped — a re-validation
    must re-derive them from scratch under the (possibly fixed) spec.
    The status partition column is itself a verdict and is dropped too.

    The path is refresh-listed first: the replay loop OVERWRITES the same
    dir it read, and a long-lived session's FileStatusCache would
    otherwise serve the previous generation's deleted part files."""
    spark.catalog.refreshByPath(quarantine_dir)
    q = spark.read.parquet(quarantine_dir)
    stale = {
        "status", "spec_id", "error_count", "error_details",
        "violation_entries", "revalidated", "content_fp",
    }
    keep = [c for c in q.columns if c not in stale]
    return q.select(*keep)


def quarantine_split(
    verdicts: DataFrame,
    keep_statuses: tuple[str, ...] = ("valid", "skipped"),
    quarantine_dir: str | None = None,
    mode: str = "overwrite",
) -> tuple[DataFrame, DataFrame]:
    """Route rows by verdict — the standard validation-sink pattern: rows
    whose status is in ``keep_statuses`` continue down the pipeline
    (``clean``); the rest (``quarantined``) carry their full verdict
    (status, error_count, error_details) for inspection, repair, and
    replay, optionally written to ``quarantine_dir`` partitioned by
    status (pruned reads per failure class).

    Input is a verdicts frame from ``validate(..., keep_cols=[...])`` so
    payload columns ride ALONGSIDE the verdict — no join back to the
    source (a join-back by id drops NULL-id rows, which are precisely the
    rows most likely to be quarantined, and cross-multiplies duplicate
    ids). One narrow filter each side; the quarantine write is the only
    materialization.

    Scale shape: at 10^12 rows with a healthy corpus the quarantine side
    is the tiny fraction — the clean side never shuffles or materializes
    here, it simply continues as a filtered scan."""
    keep = F.col("status").isin(list(keep_statuses))
    clean = verdicts.filter(keep)
    quarantined = verdicts.filter(~keep)
    if quarantine_dir is not None:
        (
            quarantined.drop("violation_entries")
            .withColumn("error_details", F.concat_ws("; ", "error_details"))
            .write.mode(mode)
            .partitionBy("status")
            .parquet(quarantine_dir)
        )
    return clean, quarantined
