"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship run: synthesize the Common-Crawl-style pages
table (BASELINE.json input_hint shape) at sf0.001 scale, run the full
constraint-validation engine (spec routing via broadcast join → compiled
Column-expression checks → 4-state verdicts), return the per-partition
pass/fail summary (north_rule contract).

``queries()`` / ``oracle_sql()`` — operator coverage from SURVEY.md §2,
each Spark program paired with a DuckDB-runnable ANSI-SQL oracle over the
same parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query; driver checks rows>0 and a stable schema."""
    from validate_xml_rust_spark.operators.summary import partition_pass_fail
    from validate_xml_rust_spark.operators.validate import validate
    from validate_xml_rust_spark.sources.pages import (
        LANGS,
        pages,
        with_partition_id,
    )
    from validate_xml_rust_spark.specs import Constraint, Spec, SpecRegistry

    df = with_partition_id(pages(spark, 6000), num_partitions=16)
    spec = Spec(
        "webpage-v1",
        (
            Constraint("url_not_null", "url", "not_null"),
            Constraint("url_format", "url", "regex", {"pattern": r"^https?://.*"}),
            Constraint(
                "warc_ts_range", "warc_ts", "range",
                {"lo": "2025-01-01 00:00:00", "hi": "2026-01-01 00:00:00"},
            ),
            Constraint("html_utf8", "html", "utf8", severity="error"),
            Constraint("html_len", "html", "length", {"lo": 1, "hi": 100_000}),
            Constraint("lang_enum", "lang", "isin", {"values": LANGS}),
        ),
    )
    registry = SpecRegistry().add(spec, route_keys=LANGS)
    # content routing: the spec reference is extracted from the document
    # prologue itself (<meta name="spec" ...>) — the exact analog of the
    # reference's per-file xsi:schemaLocation extraction, including
    # skipped-when-absent and error-when-unreadable semantics.
    res = validate(df, spark, registry, route_mode="content")
    return partition_pass_fail(res.verdicts)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from validate_xml_rust_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from validate_xml_rust_spark.queries import ORACLES

    return dict(ORACLES)
