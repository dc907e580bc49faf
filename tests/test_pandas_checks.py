"""pandas_check constraint kind: named Arrow-batched validators in specs."""

from __future__ import annotations

import pytest

from validate_xml_rust_spark.functions.pandas_checks import (
    _balanced_tags,
    pandas_check_column,
)
from validate_xml_rust_spark.operators.validate import validate
from validate_xml_rust_spark.specs import Constraint, Spec, SpecRegistry


def test_balanced_tags_pure():
    assert _balanced_tags("<html><p>x</p></html>")
    assert _balanced_tags("plain text")
    assert _balanced_tags("<br><meta charset='x'><!-- c --><a>t</a>")
    assert not _balanced_tags("<div><p>x</div>")  # wrong nesting depth ok but count...
    assert not _balanced_tags("</closed-first>")
    assert not _balanced_tags("<unclosed")


def test_valid_json_spec(spark):
    spec = Spec(
        "ev-v1",
        (
            Constraint("props_json", "props", "pandas_check", {"checker": "valid_json"}),
            Constraint("name_ascii", "name", "pandas_check", {"checker": "ascii_printable"}),
        ),
    )
    reg = SpecRegistry().add(spec, route_keys=["r"])
    df = spark.createDataFrame(
        [
            (0, '{"k": 1}', "ok", "r"),
            (1, "{broken", "ok", "r"),
            (2, None, "ok", "r"),  # null passes (not_null owns nulls)
            (3, '{"k": 2}', "café", "r"),  # non-ascii
        ],
        "rid long, props string, name string, lang string",
    )
    res = validate(df, spark, reg, id_col="rid", partition_col=None)
    got = {r["url"]: (r["status"], r["error_count"]) for r in res.verdicts.collect()}
    assert got[0] == ("valid", 0)
    assert got[1] == ("invalid", 1)
    assert got[2] == ("valid", 0)
    assert got[3] == ("invalid", 1)
    viols = {(v["url"], v["constraint_id"]) for v in res.violations().collect()}
    assert (1, "props_json") in viols and (3, "name_ascii") in viols


def test_unknown_checker_rejected():
    with pytest.raises(ValueError, match="unknown pandas checker"):
        from pyspark.sql import functions as F

        pandas_check_column("nope", F.col("x"))


def test_events_props_all_valid_json(spark, sf_dir):
    # the driver events table carries JSON props — real-data smoke
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    spec = Spec(
        "ev-v1",
        (Constraint("props_json", "props", "pandas_check", {"checker": "valid_json"}),),
    )
    reg = SpecRegistry().add(spec, route_keys=["click", "view", "purchase", "signup", "error"])
    res = validate(ev, spark, reg, route_col="event_type", id_col="event_id",
                   partition_col=None)
    assert res.verdicts.filter("status != 'valid'").count() == 0
