"""Cluster-scale physical techniques: bucketed co-located joins (zero
shuffle) and corrupt-input tolerance at the scan (S1 error semantics)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from validate_xml_rust_spark.operators.rangejoin import range_join_count
from validate_xml_rust_spark.plans import inspect
from validate_xml_rust_spark.sources.scan import read_pages_dir


def test_bucketed_join_no_shuffle(spark, tmp_path):
    # two tables bucketed on the join key: the join plans with ZERO shuffle
    # exchanges — the cluster co-location story (bucketBy ≈ pre-shuffled)
    import shutil

    a = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 10_000).withColumn("w", F.col("id") * 3)
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    # a previous crashed run can leave the managed location behind
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").replace("file:", "")
    for t in ("bkt_a", "bkt_b"):
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    a.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("bkt_a")
    b.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("bkt_b")
    # small tables would be broadcast (also shuffle-free, but that's not the
    # bucketing story) — force the sort-merge path to show co-location
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
        plan = inspect.physical_plan(j)
        assert "SortMergeJoin" in plan
        assert inspect.count_exchanges(j) == 0  # co-located: no shuffle
        assert "Bucketed: true" in plan
        assert j.count() == 10_000
        # contrast: the same join on plain parquet shuffles both sides
        a.write.mode("overwrite").parquet(str(tmp_path / "pa"))
        b.write.mode("overwrite").parquet(str(tmp_path / "pb"))
        pj = spark.read.parquet(str(tmp_path / "pa")).join(
            spark.read.parquet(str(tmp_path / "pb")), "id"
        )
        assert inspect.count_exchanges(pj) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_ignore_corrupt_files(spark, tmp_path):
    # a garbage file amid good parquet: warn-and-continue, not job failure
    # (reference tolerates per-entry errors, src/file_discovery.rs:128-134)
    from validate_xml_rust_spark.sources.pages import pages

    d = str(tmp_path / "mixed")
    pages(spark, 200).write.parquet(d)
    with open(os.path.join(d, "part-corrupt.parquet"), "wb") as f:
        f.write(b"this is not a parquet file at all")
    df = read_pages_dir(spark, d, ignore_corrupt=True, path_glob="*.parquet")
    assert df.count() == 200  # good rows all read, bad file skipped


def test_range_join_exact_semantics(spark):
    from datetime import datetime

    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "u", ts("2025-01-01 10:00:00"))], "eid long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("u", ts("2025-01-01 09:00:00")),  # exactly -1h → INCLUDED (>=)
            ("u", ts("2025-01-01 09:30:00")),  # inside
            ("u", ts("2025-01-01 10:00:00")),  # equal → EXCLUDED (<)
            ("u", ts("2025-01-01 08:59:59")),  # just outside
            ("x", ts("2025-01-01 09:30:00")),  # wrong key
        ],
        "k string, ts timestamp",
    )
    out = range_join_count(left, right, "k", "ts", "ts", 3600).collect()
    assert out[0]["n_in_window"] == 2
    # duplicate left rows stay distinct (probe-id grouping)
    left2 = left.unionByName(left)
    out2 = range_join_count(left2, right, "k", "ts", "ts", 3600).collect()
    assert [r["n_in_window"] for r in out2] == [2, 2]


def test_range_join_pre1970_timestamps(spark):
    """Negative epochs: floor-bucketing (not trunc-toward-zero) keeps
    boundary rows in the matching bucket for historical corpora."""
    from datetime import datetime

    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "u", ts("1969-12-31 23:30:00"))], "eid long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("u", ts("1969-12-31 22:30:00")),  # exactly -1h → INCLUDED
            ("u", ts("1969-12-31 23:00:00")),  # inside (epoch -3600)
            ("u", ts("1969-12-31 23:29:59")),  # inside, crosses epoch-0 bucket
            ("u", ts("1969-12-31 23:30:00")),  # equal → EXCLUDED
            ("u", ts("1969-12-31 22:29:59")),  # just outside
        ],
        "k string, ts timestamp",
    )
    out = range_join_count(left, right, "k", "ts", "ts", 3600).collect()
    assert out[0]["n_in_window"] == 3
