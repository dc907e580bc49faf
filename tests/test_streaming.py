"""Structured-Streaming incremental validation tests (memory/parquet sinks,
AvailableNow trigger drives batches synchronously)."""

from __future__ import annotations

from pyspark.sql import functions as F

from validate_xml_rust_spark.sources.pages import LANGS, pages, with_partition_id
from validate_xml_rust_spark.specs import Constraint, Spec, SpecRegistry
from validate_xml_rust_spark.streaming.incremental import (
    validate_stream_available_now,
    windowed_verdict_counts,
)


def _registry() -> SpecRegistry:
    spec = Spec(
        "webpage-v1",
        (
            Constraint("url_not_null", "url", "not_null"),
            Constraint("url_format", "url", "regex", {"pattern": r"^https?://.*"}),
            Constraint("html_utf8", "html", "utf8", severity="error"),
        ),
    )
    return SpecRegistry().add(spec, route_keys=LANGS)


def test_incremental_stream_processes_only_new_files(spark, tmp_path):
    inp = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    df1 = with_partition_id(pages(spark, 500), 4)
    df1.write.mode("append").parquet(inp)

    n1 = validate_stream_available_now(spark, inp, _registry(), ckpt, out, "s1")
    assert n1 >= 1
    verdicts = spark.read.parquet(f"{out}/verdicts")
    first_count = verdicts.count()
    assert first_count == 500

    # re-run with NO new files → zero new batches, output unchanged
    n2 = validate_stream_available_now(spark, inp, _registry(), ckpt, out, "s2")
    assert spark.read.parquet(f"{out}/verdicts").count() == first_count

    # append new files → only they are processed
    df2 = with_partition_id(pages(spark, 300), 2).withColumn(
        "url", F.concat(F.lit("https://new.example.com/"), F.col("url"))
    )
    df2.write.mode("append").parquet(inp)
    n3 = validate_stream_available_now(spark, inp, _registry(), ckpt, out, "s3")
    assert n3 >= 1
    assert spark.read.parquet(f"{out}/verdicts").count() == first_count + 300

    # metrics rows were committed per epoch
    metrics = spark.read.parquet(f"{out}/metrics")
    assert metrics.count() > 0
    assert metrics.filter(F.col("run_id").startswith("s3")).count() > 0


def test_windowed_verdict_counts_memory_sink(spark, tmp_path):
    inp = str(tmp_path / "pages2")
    # 1000 rows so lang='xx' rows (i=419, 838) exist with non-null warc_ts
    with_partition_id(pages(spark, 1000), 2).write.mode("append").parquet(inp)

    agg = windowed_verdict_counts(spark, inp, _registry(), window="6 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("verdict_windows")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM verdict_windows").collect()
    assert rows
    statuses = {r["status"] for r in rows}
    assert "valid" in statuses and "skipped" in statuses
    total = sum(r["n"] for r in rows)
    # null warc_ts rows are dropped by the event-time groupBy; everything
    # else lands in some window
    assert 980 <= total <= 1000


def test_streaming_verdicts_equal_batch_verdicts(spark, tmp_path):
    """Fidelity: the incremental streaming path must emit EXACTLY the
    verdict rows the batch path computes — per url: same status, same
    error_count (the stream==batch guarantee the gate asserts for
    aggregates, here at row granularity)."""
    from validate_xml_rust_spark.operators.validate import validate

    inp = str(tmp_path / "pages")
    df = with_partition_id(pages(spark, 800), 4)
    df.write.mode("append").parquet(inp)

    validate_stream_available_now(
        spark, inp, _registry(), str(tmp_path / "ck"), str(tmp_path / "out"), "eq"
    )
    stream_v = {
        (r["url"], r["partition_id"]): (r["status"], r["error_count"])
        for r in spark.read.parquet(f"{tmp_path}/out/verdicts").collect()
    }
    batch = validate(spark.read.parquet(inp), spark, _registry()).verdicts
    batch_v = {
        (r["url"], r["partition_id"]): (r["status"], r["error_count"])
        for r in batch.collect()
    }
    assert stream_v == batch_v


def test_shard_stream_available_now(spark, tmp_path):
    """Streaming shard ingest: first run bootstraps + drains all drops,
    re-run with no new files is a no-op, a new drop appends exactly its
    rows, and after every run the store passes verify_shards."""
    from validate_xml_rust_spark.operators.outputs import verify_shards
    from validate_xml_rust_spark.streaming.incremental import (
        shard_stream_available_now,
    )

    inp = str(tmp_path / "drops")
    out = str(tmp_path / "train")
    ckpt = str(tmp_path / "ckpt")

    def drop(lo, hi, name):
        (
            spark.range(lo, hi)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("doc body "), F.col("id")).alias("text"),
            )
            .withColumn("n_tokens", F.length("text").cast("int"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{inp}/{name}")
        )
        import glob
        import os
        import shutil

        # file-source streams list a flat directory of parquet files
        src = glob.glob(f"{inp}/{name}/*.parquet")[0]
        shutil.move(src, f"{inp}/{name}.parquet")
        shutil.rmtree(f"{inp}/{name}")

    import os

    os.makedirs(inp, exist_ok=True)
    drop(0, 120, "b0")
    drop(120, 200, "b1")
    n = shard_stream_available_now(
        spark, inp, out, tokens_per_shard=600, checkpoint_dir=ckpt
    )
    assert n >= 1
    assert spark.read.parquet(f"{out}/shards").count() == 200
    v = verify_shards(spark, out, 600)
    assert {r["status"] for r in v.collect()} == {"valid"}
    n_shards0 = {
        int(r["n_shards"])
        for r in spark.read.parquet(f"{out}/manifest").collect()
    }

    # no new drops: the checkpoint makes the re-run a no-op
    n2 = shard_stream_available_now(
        spark, inp, out, tokens_per_shard=600, checkpoint_dir=ckpt
    )
    assert spark.read.parquet(f"{out}/shards").count() == 200

    # a new drop appends exactly its rows; n_shards stays pinned
    drop(200, 250, "b2")
    shard_stream_available_now(
        spark, inp, out, tokens_per_shard=600, checkpoint_dir=ckpt
    )
    assert spark.read.parquet(f"{out}/shards").count() == 250
    m = spark.read.parquet(f"{out}/manifest")
    assert {int(r["n_shards"]) for r in m.collect()} == n_shards0
    v2 = verify_shards(spark, out, 600)
    assert {r["status"] for r in v2.collect()} == {"valid"}
