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


def test_streaming_near_dedup_cross_batch(spark, tmp_path):
    """A near-duplicate arriving in a LATER micro-batch is caught against
    its batch-1 original via band-bucket keyed state — the incremental
    capability the batch LSH operator lacks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from validate_xml_rust_spark.streaming.stateful import streaming_near_dedup

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
            "omega one two three four five six")
    near = base.replace("five six", "seven eight")  # ~2/30 words changed
    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": [0, 1, 2],
                  "text": [base,
                           "totally different words in the first batch here "
                           "nothing shared with anything else at all",
                           "another unrelated document full of spark jargon "
                           "partitions shuffles and codegen stages"]}),
        d / "a_batch1.parquet",
    )
    pq.write_table(
        pa.table({"doc_id": [100, 101],
                  "text": [near,
                           "fresh unrelated second batch content with zero "
                           "overlap against any earlier document"]}),
        d / "b_batch2.parquet",
    )
    sdf = streaming_near_dedup(
        spark, str(d), threshold=0.5, max_files_per_trigger=1
    )
    name = "near_dedup_stream_test"
    q = (
        sdf.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).dropDuplicates(["id_new", "id_seen"]).collect()
    pairs = {frozenset((r["id_new"], r["id_seen"])): r["est_jaccard"] for r in rows}
    assert frozenset((0, 100)) in pairs          # cross-batch near-dup caught
    assert pairs[frozenset((0, 100))] >= 0.5
    assert all(101 not in p and 1 not in p and 2 not in p for p in pairs)


def test_streaming_near_dedup_across_runs(spark, tmp_path):
    """State survives a RESTART (the north-rule resume contract applied to
    dedup): run 1 ingests the original, the process 'stops', run 2 with
    the same checkpoint ingests a near copy — caught against run-1 state
    recovered from the parquet-sink checkpoint."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from validate_xml_rust_spark.streaming.stateful import (
        run_available_now,
        streaming_near_dedup,
    )

    base = ("red orange yellow green blue indigo violet cyan magenta "
            "crimson teal amber jade coral slate pearl onyx ruby topaz "
            "ivory bronze copper silver golden rose lily fern moss sage "
            "pine")
    near = base.replace("pine", "oak")
    d = tmp_path / "in"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    pq.write_table(pa.table({"doc_id": [0], "text": [base]}), d / "r1.parquet")
    run_available_now(streaming_near_dedup(spark, str(d)), ckpt, out)

    pq.write_table(pa.table({"doc_id": [50], "text": [near]}), d / "r2.parquet")
    run_available_now(streaming_near_dedup(spark, str(d)), ckpt, out)

    pairs = {
        frozenset((r["id_new"], r["id_seen"]))
        for r in spark.read.parquet(out).collect()
    }
    assert frozenset((0, 50)) in pairs  # run-2 arrival vs run-1 state
