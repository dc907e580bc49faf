"""Eager localCheckpoint hygiene shared by iterative / multi-step operators.

localCheckpoint blocks are persisted at the RDD level, OUTSIDE the SQL
CacheManager, so ``DataFrame.unpersist()`` cannot free them; release goes
through the context's persistent-RDD registry. The checkpoint's own RDD id
is read DIRECTLY off the returned frame's analyzed plan (a ``LogicalRDD``
wrapping exactly the RDD that ``localCheckpoint`` persisted) — never by
diffing the global ``getPersistentRDDs`` registry, which would also capture
(and later kill, at the RDD level, where a DataFrame cache does NOT
re-persist on next access) any unrelated cache whose first materialization
happens to ride the same action, or caches persisted concurrently by other
threads in the session.

Used by connected_components (per-round label checkpoints) and the curation
pipeline (per-step materialization). A block set must only be released
AFTER a newer checkpoint depending on it has materialized — freeing blocks
a live plan still references raises CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def eager_checkpoint(df: DataFrame) -> tuple[DataFrame, frozenset[int]]:
    """Materialize ``df`` as an eager localCheckpoint; return the
    lineage-free frame plus the id set of the RDD(s) holding its blocks."""
    out = df.localCheckpoint(eager=True)
    plan = out._jdf.queryExecution().analyzed()
    try:
        ids = frozenset({int(plan.rdd().id())})
    except Exception:
        # plan shape changed across Spark versions — leak rather than risk
        # releasing an unrelated RDD; caller's blocks die with the session
        ids = frozenset()
    return out, ids


def block_ids_of(df: DataFrame) -> frozenset[int]:
    """Block-RDD ids of an ALREADY-checkpointed frame (empty set if the
    frame is not a plain LogicalRDD scan — never guesses)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return frozenset()
        return frozenset({int(plan.rdd().id())})
    except Exception:
        return frozenset()


def release_blocks(df_or_sc, ids: frozenset[int]) -> None:
    """Unpersist checkpoint blocks by RDD id (no-op for unknown ids)."""
    sc = df_or_sc.sparkSession.sparkContext if isinstance(df_or_sc, DataFrame) else df_or_sc
    jmap = sc._jsc.getPersistentRDDs()
    for i in ids:
        rdd = jmap.get(i)
        if rdd is not None:
            rdd.unpersist()
