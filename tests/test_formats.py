"""Source/sink format breadth: the verdict pipeline is format-agnostic —
CSV and JSON-lines inputs validate identically to parquet (the reference
reads raw files; the engine reads any Spark source with a schema)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from validate_xml_rust_spark.operators.validate import validate
from validate_xml_rust_spark.specs import Constraint, Spec, SpecRegistry

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


def _registry():
    spec = Spec(
        "fmt-v1",
        (
            Constraint("url_not_null", "url", "not_null"),
            Constraint("n_range", "n", "range", {"lo": 0, "hi": 100}),
        ),
    )
    return SpecRegistry().add(spec, route_keys=["en"])


def _verdict_counts(spark, df):
    res = validate(df, spark, _registry(), partition_col=None)
    return {
        r["status"]: r["count"]
        for r in res.verdicts.groupBy("status").count().collect()
    }


def test_same_verdicts_across_formats(spark, tmp_path):
    rows = [
        ("https://a/1", "en", 5),
        (None, "en", 5),
        ("https://a/3", "en", 999),
        ("https://a/4", "zz", 5),
    ]
    base = spark.createDataFrame(rows, SCHEMA)
    pq, csv, js = (str(tmp_path / x) for x in ("pq", "csv", "js"))
    base.write.parquet(pq)
    base.write.option("header", True).csv(csv)
    base.write.json(js)

    expected = {"valid": 1, "invalid": 2, "skipped": 1}
    assert _verdict_counts(spark, spark.read.parquet(pq)) == expected
    assert (
        _verdict_counts(spark, spark.read.schema(SCHEMA).option("header", True).csv(csv))
        == expected
    )
    assert _verdict_counts(spark, spark.read.schema(SCHEMA).json(js)) == expected


def test_orc_roundtrip(spark, tmp_path):
    p = str(tmp_path / "orc")
    df = spark.createDataFrame([("https://a/1", "en", 1)], SCHEMA)
    df.write.orc(p)
    assert _verdict_counts(spark, spark.read.orc(p)) == {"valid": 1}
