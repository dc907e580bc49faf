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
