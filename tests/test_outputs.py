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
