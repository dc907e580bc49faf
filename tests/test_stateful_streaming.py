"""applyInPandasWithState: cross-batch and cross-run first-seen dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from validate_xml_rust_spark.streaming.stateful import (
    run_available_now,
    streaming_first_seen_dedup,
)


def _write(spark, path, rows):
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string, partition_id int"
    )
    df.write.mode("append").parquet(path)


def test_first_seen_dedup_across_runs(spark, tmp_path):
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    _write(spark, inp, [
        ("https://a/1", None, b"x", "x", "en", 0),
        ("https://a/1", None, b"x", "x", "en", 0),  # dup within batch
        ("https://a/2", None, b"x", "x", "en", 0),
    ])
    out = str(tmp_path / "out")
    sdf = streaming_first_seen_dedup(spark, inp, ckpt)
    run_available_now(sdf, ckpt, out)
    rows = spark.read.parquet(out).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r["is_duplicate"])
    assert sorted(by_url["https://a/1"]) == [False, True]
    assert by_url["https://a/2"] == [False]

    # second RUN, same checkpoint: previously-seen urls are duplicates now
    _write(spark, inp, [
        ("https://a/1", None, b"x", "x", "en", 0),  # seen in run 1
        ("https://a/3", None, b"x", "x", "en", 0),  # new
    ])
    sdf2 = streaming_first_seen_dedup(spark, inp, ckpt)
    run_available_now(sdf2, ckpt, out)
    rows2 = [r for r in spark.read.parquet(out).collect() if r not in rows]
    got = {r["url"]: (r["is_duplicate"], r["n_seen_before"]) for r in rows2}
    assert got["https://a/1"] == (True, 2)  # state survived the restart
    assert got["https://a/3"] == (False, 0)
