"""Synthetic pages generator determinism + extractor byte-identity
(the north-star per-row invariant: extracted_text == text byte-equal)."""

from __future__ import annotations

from pyspark.sql import functions as F

from validate_xml_rust_spark.functions.text_extract import (
    extract_text_col,
    extract_text_py,
)
from validate_xml_rust_spark.sources.pages import (
    pages,
    py_row_kinds,
    with_partition_id,
)

N = 2000


def test_generator_deterministic(spark):
    key = ["url", "text", "lang", "warc_ts"]
    a = pages(spark, N).orderBy(*key).limit(50).collect()
    b = pages(spark, N).orderBy(*key).limit(50).collect()
    assert a == b


def test_planted_counts_match_python_mirror(spark):
    df = pages(spark, N).cache()
    exp = py_row_kinds(N)
    assert df.filter(F.col("url").isNull()).count() == exp["null_url"]
    assert df.filter(F.col("url").startswith("not-a-url-")).count() == exp["malformed_url"]
    assert df.filter(F.col("html").isNotNull() & ~F.is_valid_utf8("html")).count() == exp["bad_utf8"]
    assert df.filter(F.length("html") == 0).count() == exp["empty_html"]
    assert df.filter(F.col("warc_ts").isNull()).count() == exp["null_ts"]
    assert df.filter(F.year("warc_ts") > 2030).count() == exp["oor_ts"]
    assert df.filter(F.col("lang") == "xx").count() == exp["lang_off_enum"]
    assert df.filter(F.col("lang").isNull()).count() == exp["null_lang"]
    # duplicate urls: total - distinct = number of dup rows (each dup row
    # reuses exactly one prior url, and schedules don't collide at N=2000)
    nn = df.filter(F.col("url").isNotNull())
    assert nn.count() - nn.select("url").distinct().count() == exp["dup_url"]
    df.unpersist()


def test_extraction_invariant_spark_side(spark):
    # extract(html) == text for every valid-utf8 non-planted row
    df = pages(spark, N)
    ext = df.withColumn("ext", extract_text_col(F.col("html")))
    ok = ext.filter(F.is_valid_utf8("html") & (F.length("html") > 0))
    mismatches = ok.filter(F.col("ext") != F.col("text")).count()
    # planted '<<corrupted>>' rows that are neither empty-html nor bad-utf8
    expected = sum(
        1 for i in range(N) if i % 1201 == 0 and i % 1013 != 0 and i % 641 != 0
    )
    assert mismatches == expected
    # and the planted mismatches are exactly the '<<corrupted>>' rows
    assert (
        ok.filter((F.col("ext") != F.col("text")) & ~F.col("text").endswith("<<corrupted>>")).count()
        == 0
    )


def test_extraction_byte_identity_python_vs_spark(spark):
    rows = (
        pages(spark, 300)
        .withColumn("ext", extract_text_col(F.col("html")))
        .filter(F.is_valid_utf8("html"))
        .collect()
    )
    assert len(rows) > 250
    for r in rows:
        py = extract_text_py(bytes(r["html"]))
        assert py == r["ext"], r["url"]
        assert py.encode() == r["ext"].encode()


def test_partition_id_stable_and_bounded(spark):
    df = with_partition_id(pages(spark, 500), 16)
    stats = df.agg(
        F.min("partition_id").alias("lo"), F.max("partition_id").alias("hi")
    ).collect()[0]
    assert 0 <= stats["lo"] and stats["hi"] <= 15


def test_host_skew_planted(spark):
    # ~40% of urls on the hot host — the skew the salted agg must handle
    df = pages(spark, N)
    hot = df.filter(F.col("url").contains("hot.example.com")).count()
    assert 0.3 * N < hot < 0.5 * N
