"""Custom stateful streaming operator: cross-batch first-seen URL dedup via
``applyInPandasWithState``.

The batch engine dedups within a dataset (operators/dedup.py); a streaming
ingest needs dedup ACROSS micro-batches — "have I ever seen this url (or
content fingerprint)?" — which is exactly Structured Streaming's
keyed-state surface (``applyInPandasWithState``, the custom-stateful-
operator slot mentioned in SURVEY.md §2.7's forward plan).

State model: key = the dedup key (url or fingerprint); state = (first_seen
epoch, n_seen). Output: one row per incoming record tagged ``is_duplicate``
— first occurrence False, every later occurrence (same or later batch)
True. State TTL is handled by the timeout conf when running continuous;
``availableNow`` drains everything.

At cluster scale the state store shards by key hash across executors
(RocksDB state backend recommended: ``spark.sql.streaming.stateStore
.providerClass=...RocksDBStateStoreProvider``) — the operator itself is
backend-agnostic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, url string, is_duplicate boolean, n_seen_before long"
STATE_SCHEMA = "n_seen long"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (k,) = key
    n_seen = state.get[0] if state.exists else 0
    out = []
    for pdf in pdfs:
        for url in pdf["url"]:
            out.append((k, url, n_seen > 0, n_seen))
            n_seen += 1
    state.update((n_seen,))
    yield pd.DataFrame(out, columns=["key", "url", "is_duplicate", "n_seen_before"])


def streaming_first_seen_dedup(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    key_expr: str = "url",
    schema: T.StructType | None = None,
) -> "DataFrame":
    """Build the stateful streaming dedup over a file-source stream;
    returns the streaming DataFrame (attach a sink + availableNow trigger;
    tests use the memory sink). Re-running with the same checkpoint keeps
    the state store, so duplicates are detected across RUNS too."""
    from validate_xml_rust_spark.streaming.incremental import PAGES_SCHEMA

    stream = spark.readStream.schema(schema or PAGES_SCHEMA).parquet(input_dir)
    keyed = stream.select(
        F.expr(key_expr).cast("string").alias("key"), F.col("url")
    ).filter(F.col("key").isNotNull())
    return keyed.groupBy("key").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    sdf: "DataFrame", checkpoint_dir: str, output_dir: str
) -> None:
    """Drain the stream synchronously into an append parquet sink (the
    memory sink cannot recover from a checkpoint, so cross-RUN state
    continuity requires a recoverable sink)."""
    q = (
        sdf.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
