"""End-to-end curation pipeline (validate_xml_rust_spark/pipeline.py):
planted corpus in, curated+packed corpus out, lineage report accurate."""

from __future__ import annotations

from pyspark.sql import functions as F

from validate_xml_rust_spark.pipeline import curate
from validate_xml_rust_spark.sources.corpus import expected_pairs, synthetic_documents
from validate_xml_rust_spark.specs import Constraint, Spec, SpecRegistry


def test_curate_end_to_end(spark):
    n = 600
    docs = synthetic_documents(spark, n, 8).withColumn(
        "lang", F.lit("en")
    )
    # benchmark = copies of a few docs → those must be decontaminated away
    bench = docs.filter(F.col("doc_id").isin([5, 11])).select("text")
    spec = Spec(
        "doc-v1",
        (Constraint("text_not_null", "text", "not_null"),),
    )
    reg = SpecRegistry().add(spec, route_keys=["en"])

    res = curate(
        docs, spark, reg,
        benchmark=bench,
        near_dup_threshold=0.6,
        sample_rate=0.5,
        pack_max_tokens=512,
    )
    steps = {s["step"]: s for s in res.report["steps"]}
    assert list(steps) == ["validate", "exact_dedup", "near_dedup",
                           "decontaminate", "sample", "pack"]
    # validate drops nothing (all texts non-null), dedup drops the planted
    # exact dups, near-dedup the near dups, decontamination kills doc 5/11
    exact, near = expected_pairs(n)
    assert steps["validate"]["dropped"] == 0
    assert steps["exact_dedup"]["dropped"] == len(exact)
    assert steps["near_dedup"]["dropped"] >= int(0.9 * len(near))
    assert steps["decontaminate"]["dropped"] >= 2  # 5, 11 (+ any sharing grams)
    kept_ids = {r["doc_id"] for r in res.kept.select("doc_id").collect()}
    assert 5 not in kept_ids and 11 not in kept_ids
    # sample keeps roughly half of what remains
    pre = steps["decontaminate"]["rows_out"]
    assert 0.38 * pre < steps["sample"]["rows_out"] < 0.62 * pre
    # packing covers every surviving doc exactly once, within budget
    packed = res.packs.collect()
    assert {r["doc_id"] for r in packed} == kept_ids
    by_pack: dict = {}
    for r in packed:
        by_pack.setdefault(r["pack_id"], 0)
        by_pack[r["pack_id"]] += r["n_tokens"]
    assert all(t <= 512 for t in by_pack.values())  # 60-word docs ≪ budget
    assert steps["pack"]["n_packs"] == len(by_pack)


def test_curate_minimal_config(spark):
    # no registry, no benchmark, no sampling: just dedup
    docs = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d e f"), (2, "x y z w v u")],
        "doc_id long, text string",
    )
    res = curate(docs, spark, near_dup_threshold=None)
    assert [s["step"] for s in res.report["steps"]] == ["exact_dedup"]
    assert res.kept.count() == 2 and res.packs is None
