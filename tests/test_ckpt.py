"""Checkpoint hygiene (validate_xml_rust_spark/ckpt.py): eager_checkpoint
must identify ONLY its own blocks, and release must not touch sibling
caches whose first materialization rides the same action — the failure
mode that silently defeated connected_components' edges persist when ids
were derived from a global persistent-RDD registry set-diff."""

from __future__ import annotations

from validate_xml_rust_spark.ckpt import eager_checkpoint, release_blocks


def _n_persistent(spark) -> int:
    return len(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def test_release_spares_sibling_cache_materialized_by_same_action(spark):
    base = spark.range(1000).selectExpr("id", "id % 7 as k")
    cached = base.persist()
    before = _n_persistent(spark)
    # the checkpoint's materializing action is ALSO what builds the cache's
    # buffer RDD — a registry set-diff would claim both ids
    out, ids = eager_checkpoint(cached.groupBy("k").count())
    assert len(ids) == 1
    after_ckpt = _n_persistent(spark)
    assert after_ckpt >= before + 2  # cache buffer + checkpoint blocks
    assert out.count() == 7
    release_blocks(spark.sparkContext, ids)
    # the sibling cache's buffer RDD must survive the release
    assert _n_persistent(spark) == after_ckpt - 1
    assert cached.count() == 1000
    cached.unpersist()


def test_checkpointed_frame_readable_after_releasing_predecessor(spark):
    a, ids_a = eager_checkpoint(spark.range(100).selectExpr("id * 2 as v"))
    b, ids_b = eager_checkpoint(a.selectExpr("sum(v) as s"))
    assert ids_a and ids_b and ids_a != ids_b
    release_blocks(spark.sparkContext, ids_a)  # b is materialized — safe
    assert b.collect()[0]["s"] == sum(2 * i for i in range(100))
    release_blocks(spark.sparkContext, ids_b)
