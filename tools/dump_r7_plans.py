"""Dump .explain("formatted") for the round-7-touched queries/operators.

Usage: python tools/dump_r7_plans.py OUT_DIR SUFFIX [sf_dir]

Writes OUT_DIR/<name>_<SUFFIX>.txt per entry. Runs at sf0.001 by default
so gate functions that execute side jobs (streaming replays, store
ingests) stay fast; the PLAN of the returned frame is what the file
captures. Control bytes are escaped (the dump_plans.py rule)."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _clean(s: str) -> str:
    return "".join(
        ch if ch == "\n" or ch == "\t" or 32 <= ord(ch) < 0x10000 else f"\\x{ord(ch):02x}"
        for ch in s
    )


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from validate_xml_rust_spark import get_spark
    from validate_xml_rust_spark.queries import QUERIES

    spark = get_spark(app_name="r7-plans", cpus=8, shuffle_partitions=8)

    targets = [
        "langid", "incremental_dedup", "neardup_pairs",
        "near_dedup_components", "content_sample", "incremental_validate",
        "streaming_first_seen", "streaming_neardup", "streaming_drift_psi",
        "events_hourly", "drift_suite",
    ]

    def dump(name: str, df) -> None:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"{out_dir}/{name}_{suffix}.txt", "w") as f:
            f.write(_clean(buf.getvalue()))
        print("dumped", name, flush=True)

    for name in targets:
        try:
            dump(name, QUERIES[name](spark, sf_dir))
        except Exception as e:  # keep going; note the failure
            with open(f"{out_dir}/{name}_{suffix}.txt", "w") as f:
                f.write(f"FAILED to build: {e}\n")
            print("FAILED", name, e, flush=True)

    # operator-level frames (bench entries without gates)
    from validate_xml_rust_spark.operators.curation import dsir_resample
    from validate_xml_rust_spark.operators.dedup import near_dedup
    from validate_xml_rust_spark.operators.textstats import (
        langid_predict,
        langid_train,
    )
    from validate_xml_rust_spark.sources.corpus import (
        lang_corpus,
        synthetic_documents,
    )

    docs = synthetic_documents(spark, 600, n_partitions=8)
    try:
        dump("op_near_dedup", near_dedup(docs, threshold=0.6))
    except Exception as e:
        print("FAILED op_near_dedup", e)
    try:
        lc = lang_corpus(spark, 600, n_partitions=8)
        w = langid_train(lc.filter(F.col("doc_id") % 4 != 0))
        dump("op_langid_predict", langid_predict(lc, w))
    except Exception as e:
        print("FAILED op_langid_predict", e)
    try:
        target = docs.filter(F.col("doc_id") % 3 == 0).select("text")
        dump("op_dsir_resample", dsir_resample(docs, target, k=50))
    except Exception as e:
        print("FAILED op_dsir_resample", e)
    spark.stop()


if __name__ == "__main__":
    main()
