"""Partitioned result sinks + partition-pruning evidence on the read path."""

from __future__ import annotations

from pyspark.sql import functions as F

from validate_xml_rust_spark.operators.outputs import (
    read_failures,
    read_violations_for,
    write_results,
)
from validate_xml_rust_spark.operators.validate import validate
from validate_xml_rust_spark.plans import inspect
from validate_xml_rust_spark.sources.pages import LANGS, pages, with_partition_id
from validate_xml_rust_spark.specs import Constraint, Spec, SpecRegistry


def test_partitioned_outputs_and_pruning(spark, tmp_path):
    spec = Spec(
        "webpage-v1",
        (
            Constraint("url_not_null", "url", "not_null"),
            Constraint("url_format", "url", "regex", {"pattern": r"^https?://.*"}),
            Constraint("html_utf8", "html", "utf8", severity="error"),
        ),
    )
    reg = SpecRegistry().add(spec, route_keys=LANGS)
    df = with_partition_id(pages(spark, 3000), 8)
    res = validate(df, spark, reg)
    out = str(tmp_path / "results")
    write_results(res.verdicts, res.violations(), out)

    # read-side: status filter becomes a PARTITION filter (pruned scan)
    fails = read_failures(spark, out)
    plan = inspect.formatted_plan(fails)
    assert "PartitionFilters" in plan and "status" in plan
    total = spark.read.parquet(f"{out}/verdicts").count()
    n_fails = fails.count()
    assert total == 3000 and 0 < n_fails < 100

    # per-constraint drill-down reads one directory
    v = read_violations_for(spark, out, "url_format")
    assert v.count() > 0
    assert v.filter(F.col("constraint_id") != "url_format").count() == 0
    vplan = inspect.formatted_plan(v)
    assert "PartitionFilters" in vplan


def test_run_with_progress(spark):
    # progress callback observes task completion during a real action (A8)
    from validate_xml_rust_spark.operators.progress import run_with_progress

    df = with_partition_id(pages(spark, 50_000, 16), 8)
    seen = []
    n = run_with_progress(spark, lambda: df.count(), lambda d, t: seen.append((d, t)))
    assert n == 50_000
    assert seen, "callback never fired"
    d_last, t_last = seen[-1]
    assert d_last == t_last > 0  # reached 100%
    assert all(d2 >= d1 for (d1, _), (d2, _) in zip(seen, seen[1:]))  # monotone

    # errors inside the action propagate to the caller
    import pytest as _pytest

    with _pytest.raises(Exception):
        run_with_progress(
            spark,
            lambda: spark.sql("SELECT assert_true(false)").collect(),
            lambda d, t: None,
        )


def test_quarantine_split_routes_and_writes(spark, tmp_path):
    """quarantine_split: clean rows keep payload and continue; bad rows
    (including NULL-id rows — no join-back) land in the quarantine dir
    partitioned by status with their reasons."""
    from validate_xml_rust_spark.operators.outputs import quarantine_split
    from validate_xml_rust_spark.operators.validate import validate
    from validate_xml_rust_spark.specs import Constraint, Spec, SpecRegistry

    rows = [
        ("https://a.com/1", "en", "good text"),
        (None, "en", "null id row"),            # url_not_null -> invalid
        ("https://a.com/3", "zz", "unrouted"),  # skipped
        ("https://a.com/4", "en", None),        # text_not_null -> invalid
    ]
    df = spark.createDataFrame(rows, "url string, lang string, text string")
    reg = SpecRegistry().add(
        Spec("q-v1", (
            Constraint("url_not_null", "url", "not_null"),
            Constraint("text_not_null", "text", "not_null"),
        )),
        route_keys=["en"],
    )
    res = validate(df, spark, reg, partition_col=None, keep_cols=["lang", "text"])
    qdir = str(tmp_path / "quarantine")
    clean, bad = quarantine_split(res.verdicts, quarantine_dir=qdir)
    clean_rows = clean.collect()
    # clean = the valid row + the skipped row, payload intact
    assert sorted((r["url"], r["lang"]) for r in clean_rows) == [
        ("https://a.com/1", "en"), ("https://a.com/3", "zz"),
    ]
    assert all(r["text"] is not None or r["status"] == "skipped" for r in clean_rows)
    got = spark.read.parquet(qdir)
    bad_rows = got.collect()
    assert len(bad_rows) == 2
    # the NULL-id row is quarantined (a join-back design would lose it)
    assert any(r["url"] is None for r in bad_rows)
    assert all(r["status"] == "invalid" for r in bad_rows)
    assert any("url_not_null" in (r["error_details"] or "") for r in bad_rows)
    # partitioned by status -> pruned read path
    import os
    assert any(d.startswith("status=") for d in os.listdir(qdir))
