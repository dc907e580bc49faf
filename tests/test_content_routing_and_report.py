"""Content-based spec resolution (P1/X1), report formatting (S8), and
physical-plan shape assertions."""

from __future__ import annotations

from pyspark.sql import functions as F

from validate_xml_rust_spark.operators.report import (
    format_duration_ms,
    format_failures,
    report,
)
from validate_xml_rust_spark.operators.validate import extract_spec_ref, validate
from validate_xml_rust_spark.plans import inspect
from validate_xml_rust_spark.sources.pages import LANGS, pages, with_partition_id
from validate_xml_rust_spark.specs import Constraint, Spec, SpecRegistry

PAGE_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _registry() -> SpecRegistry:
    spec = Spec(
        "webpage-v1",
        (
            Constraint("url_not_null", "url", "not_null"),
            Constraint("html_utf8", "html", "utf8", severity="error"),
        ),
    )
    return SpecRegistry().add(spec, route_keys=LANGS)


def _html(spec: str | None) -> bytes:
    meta = f'<meta name="spec" content="{spec}"/>' if spec else ""
    return f"<html><head>{meta}</head><body>hi</body></html>".encode()


def test_extract_spec_ref_cases(spark):
    df = spark.createDataFrame(
        [
            (0, _html("webpage-v1")),
            (1, _html(None)),
            (2, b"\xff\xfebroken"),
            (3, b""),
            (4, None),
        ],
        "id long, html binary",
    )
    sid, failed = extract_spec_ref(F.col("html"))
    rows = {r["id"]: (r["s"], r["f"]) for r in df.select("id", sid.alias("s"), failed.alias("f")).collect()}
    assert rows[0] == ("webpage-v1", False)
    assert rows[1] == (None, False)  # readable, no ref → skipped later
    assert rows[2] == (None, True)  # invalid utf8 → extract error
    assert rows[3] == (None, True)  # empty doc → extract error
    assert rows[4] == (None, True)  # null doc → extract error


def test_content_routing_verdicts(spark):
    rows = [
        ("https://a/1", None, _html("webpage-v1"), "x", "en"),  # valid
        ("https://a/2", None, _html(None), "x", "en"),  # skipped (no ref)
        ("https://a/3", None, _html("ghost-v9"), "x", "en"),  # error (missing spec)
        ("https://a/4", None, b"\xff\xfe", "x", "en"),  # error (unreadable)
        (None, None, _html("webpage-v1"), "x", "en"),  # invalid (null url)
    ]
    df = spark.createDataFrame(rows, PAGE_SCHEMA)
    res = validate(df, spark, _registry(), route_mode="content")
    got = {(r["url"] or "<null>"): r["status"] for r in res.verdicts.collect()}
    assert got == {
        "https://a/1": "valid",
        "https://a/2": "skipped",
        "https://a/3": "error",
        "https://a/4": "error",
        "<null>": "invalid",
    }
    details = {
        (r["url"] or "<null>"): r["error_details"] for r in res.verdicts.collect()
    }
    assert details["https://a/4"] == ["failed to extract spec reference from document"]
    assert "ghost-v9" in details["https://a/3"][0]


def test_content_routing_on_generator(spark):
    # generator plants meta-less (i%359) and ghost-spec (i%523) rows
    df = with_partition_id(pages(spark, 2000), 8)
    res = validate(df, spark, _registry(), route_mode="content")
    counts = {r["status"]: r["count"] for r in res.verdicts.groupBy("status").count().collect()}
    exp_skip = sum(1 for i in range(2000) if i % 359 == 0 and i % 523 != 0
                   and i % 1013 != 0 and i % 641 != 0)
    exp_extract_err = sum(1 for i in range(2000) if i % 1013 == 0 or i % 641 == 0)
    exp_ghost = sum(1 for i in range(2000) if i % 523 == 0 and i % 359 != 0
                    and i % 1013 != 0 and i % 641 != 0)
    assert counts.get("skipped", 0) == exp_skip
    # errors = unreadable html + ghost-spec routes + error-severity checks(none here)
    assert counts.get("error", 0) == exp_extract_err + exp_ghost
    # override short-circuits extraction entirely
    res2 = validate(df, spark, _registry(), route_mode="content",
                    override_spec_id="webpage-v1")
    assert res2.verdicts.filter("status = 'skipped'").count() == 0


def test_override_beats_content(spark):
    df = spark.createDataFrame(
        [("https://a/1", None, _html("ghost-v9"), "x", "en")], PAGE_SCHEMA
    )
    res = validate(df, spark, _registry(), route_mode="content",
                   override_spec_id="webpage-v1")
    assert res.verdicts.collect()[0]["status"] == "valid"


def test_report_formatting(spark):
    df = spark.createDataFrame(
        [
            ("https://a/1", None, _html("webpage-v1"), "x", "en"),
            (None, None, _html("webpage-v1"), "x", "en"),
        ],
        PAGE_SCHEMA,
    )
    res = validate(df, spark, _registry(), route_mode="content")
    txt = report(res.verdicts, verbosity=2, wall_ms=1234.0, perf={"cpus": 4})
    assert "Total:   2" in txt
    assert "Invalid: 1" in txt
    assert "Success rate: 50.0%" in txt
    assert "Duration: 1.23s" in txt
    assert "Failures" in txt and "✗ INVALID  <null>:" in txt
    assert "cpus: 4" in txt
    assert format_duration_ms(500) == "500ms"
    assert format_duration_ms(90_000) == "1.5m"
    assert "url_not_null" in format_failures(res.verdicts)
    # pytest stdout is not a TTY → auto-detection must stay plain
    assert "\x1b[" not in txt


def test_report_color_modes(spark, monkeypatch):
    """Color iff TTY (reference src/output.rs:23): forced on → ANSI codes
    with the reference's per-status colors; forced off → plain; auto
    follows sys.stdout.isatty()."""
    import sys as _sys

    from validate_xml_rust_spark.operators.report import format_summary

    df = spark.createDataFrame(
        [
            ("https://a/1", None, _html("webpage-v1"), "x", "en"),
            (None, None, _html("webpage-v1"), "x", "en"),
        ],
        PAGE_SCHEMA,
    )
    res = validate(df, spark, _registry(), route_mode="content")
    colored = report(res.verdicts, verbosity=1, color=True)
    assert "\x1b[31m✗ INVALID\x1b[0m" in colored  # invalid = red (31)
    assert "\x1b[32mValid:\x1b[0m" in colored     # valid label = green (32)
    plain = report(res.verdicts, verbosity=1, color=False)
    assert "\x1b[" not in plain
    # auto mode: monkeypatched TTY turns color on without an explicit flag
    monkeypatch.setattr(_sys.stdout, "isatty", lambda: True, raising=False)
    srow = {"total": 1, "valid": 1, "invalid": 0, "error": 0, "skipped": 0,
            "success_rate": 100.0, "schemas_used": []}
    assert "\x1b[32m" in format_summary(srow)


def test_plan_shapes(spark):
    # broadcast join for spec routing; pushdown for a filtered parquet scan
    df = with_partition_id(pages(spark, 100), 2)
    res = validate(df, spark, _registry())
    assert inspect.has_broadcast_join(res.verdicts)
    assert inspect.count_broadcast_exchanges(res.verdicts) >= 1
    # NB: the verdict projection itself contains higher-order array
    # functions, which Spark excludes from whole-stage codegen; assert
    # codegen on the summary aggregation instead (the shuffle-side path).
    assert inspect.has_whole_stage_codegen(df.groupBy("lang").count())
    # content mode needs NO join at all — one narrow stage
    res_c = validate(df, spark, _registry(), route_mode="content")
    assert inspect.count_exchanges(res_c.verdicts) == 0
    assert not inspect.has_broadcast_join(res_c.verdicts)


def test_parquet_pushdown(spark, tmp_path):
    p = str(tmp_path / "pages_pd")
    with_partition_id(pages(spark, 500), 4).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("lang") == "en").select("url", "lang")
    pf = inspect.pushed_filters(df)
    assert "lang" in pf  # predicate reached the scan
    rs = inspect.scan_read_schema(df)
    assert "html" not in rs  # column pruning: binary column not read
