"""Regenerate committed oracle fixtures under fixtures/.

simhash_docs_600.parquet — per-doc 64-bit SimHash values for the planted
synthetic corpus (sources/corpus.py, seed-deterministic), computed via the
INDEPENDENT pure-expression path ``simhash64_expr`` (interpreted SQL
expressions, no Arrow/numpy). The simhash_neardups oracle brute-force
joins these values in DuckDB (bit_count(xor(...)) <= 3), so the gate
cross-validates:

  Spark Arrow-UDF simhash + chunk-banded candidate join
      vs
  expression simhash + exhaustive O(n²) Hamming join in DuckDB

Two different simhash implementations, two different pairing algorithms,
two different engines. Rerun after any change to sources/corpus.py or the
simhash implementations:  python tools/make_fixtures.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, ".")

N_DOCS = 600


def main() -> None:
    from validate_xml_rust_spark import get_spark
    from validate_xml_rust_spark.functions.texthash import simhash64_expr
    from validate_xml_rust_spark.sources.corpus import synthetic_documents

    spark = get_spark(app_name="make-fixtures", cpus=8, shuffle_partitions=8)
    docs = synthetic_documents(spark, N_DOCS, n_partitions=8)
    h = docs.select("doc_id", simhash64_expr("text").alias("simhash"))

    os.makedirs("fixtures", exist_ok=True)
    tmp = "fixtures/.simhash_tmp"
    h.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    shutil.move(os.path.join(tmp, part), f"fixtures/simhash_docs_{N_DOCS}.parquet")
    shutil.rmtree(tmp)
    print(f"wrote fixtures/simhash_docs_{N_DOCS}.parquet ({h.count()} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
