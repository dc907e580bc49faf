"""Example spark-submit job (north_rule launch mode:
``spark-submit --py-files validate_xml_rust_spark.zip tools/submit_job.py``).

Runs the flagship validation over synthetic pages and prints the
per-partition pass/fail summary — the same pipeline entry(spark) runs,
but through the cluster launch path: the package arrives via --py-files,
NOT an installed module."""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = SparkSession.builder.appName("vxrs-submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from validate_xml_rust_spark.operators.summary import (
        exit_code,
        partition_pass_fail,
        summarize,
    )
    from validate_xml_rust_spark.operators.validate import validate
    from validate_xml_rust_spark.sources.pages import LANGS, pages, with_partition_id
    from validate_xml_rust_spark.specs import Constraint, Spec, SpecRegistry

    df = with_partition_id(pages(spark, n_docs), 16)
    spec = Spec(
        "webpage-v1",
        (
            Constraint("url_not_null", "url", "not_null"),
            Constraint("url_format", "url", "regex", {"pattern": r"^https?://.*"}),
            Constraint("html_utf8", "html", "utf8", severity="error"),
        ),
    )
    registry = SpecRegistry().add(spec, route_keys=LANGS)
    res = validate(df, spark, registry, route_mode="content")
    rows = partition_pass_fail(res.verdicts).collect()
    srow = summarize(res.verdicts).collect()[0].asDict()
    print(json.dumps({
        "partitions": len(rows),
        "passed": sum(1 for r in rows if r["passed"]),
        "total": srow["total"],
        "valid": srow["valid"],
    }))
    code = exit_code(srow)
    spark.stop()
    return code


if __name__ == "__main__":
    sys.exit(main())
