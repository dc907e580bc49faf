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

quality_weights.parquet / quality_corpus_600.parquet — the trainable
quality classifier's DECIMAL(18,9) token weights (deterministic numpy
logistic fit over the labeled good/bad corpus) plus the corpus snapshot;
the model_quality gate scores the live generator with the weights in
Spark while DuckDB re-derives every logit by unnest + join over the
snapshot. Rerun after touching quality_corpus or the trainer.

planted_vectors.parquet — an INPUT fixture (both engines read the same
rows; nothing golden about it): 600 float32 vectors with 30 anchor
clusters of 3 satellites each at cosine ~0.97 against 400+ random
background vectors (max background cosine ~0.55). The driver's sf tables
carry no high-cosine pairs, so the banded-LSH near-dup and LSH ANN gates
need planted similarity structure to assert recall against the DuckDB
brute-force oracle. Seeded numpy — byte-stable across regenerations.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, ".")

N_DOCS = 600
N_VECS, DIM, N_ANCHORS, N_SATS = 600, 32, 30, 3
VEC_SEED = 4242


def main() -> None:
    from validate_xml_rust_spark import get_spark
    from validate_xml_rust_spark.functions.texthash import simhash64_expr
    from validate_xml_rust_spark.sources.corpus import synthetic_documents

    spark = get_spark(app_name="make-fixtures", cpus=8, shuffle_partitions=8)
    docs = synthetic_documents(spark, N_DOCS, n_partitions=8)
    h = docs.select("doc_id", simhash64_expr("text").alias("simhash"))

    os.makedirs("fixtures", exist_ok=True)

    def write_one(df, name: str) -> None:
        tmp = f"fixtures/.{name}_tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        shutil.move(os.path.join(tmp, part), f"fixtures/{name}.parquet")
        shutil.rmtree(tmp)
        print(f"wrote fixtures/{name}.parquet ({df.count()} rows)")

    write_one(h, f"simhash_docs_{N_DOCS}")
    # INPUT snapshot of the planted-shared-passage corpus (doc_id, text):
    # the passage-excision oracle re-derives gram marking / interval
    # merging / text rebuild from these rows in DuckDB while Spark runs
    # the live generator through the real operator.
    from validate_xml_rust_spark.sources.corpus import passage_corpus

    write_one(passage_corpus(spark, 400, n_partitions=8), "passage_docs_400")
    # INPUT snapshot of the planted corpus itself (doc_id, text): the
    # exact-dup and curation-lineage oracles brute-force their CTE chains
    # over these rows in DuckDB while Spark runs the live generator —
    # equality also pins the generator's determinism.
    write_one(docs, f"synthetic_docs_{N_DOCS}")
    # labeled multilingual corpus (Latin ×2 / Cyrillic / Greek / CJK):
    # the langid-classifier oracle retrains the hashed char-n-gram model
    # from this snapshot in SQL while Spark runs the live generator
    from validate_xml_rust_spark.sources.corpus import lang_corpus

    write_one(lang_corpus(spark, N_DOCS, n_partitions=8), f"lang_docs_{N_DOCS}")

    # quality model: weights trained on the labeled good/bad corpus
    # (sources/corpus.py:quality_corpus, deterministic) + the corpus
    # snapshot itself. The model_quality gate scores the live generator
    # with these DECIMAL(18,9) weights in Spark while DuckDB re-derives
    # the same logits by unnest + join over the snapshot.
    from validate_xml_rust_spark.operators.quality_model import (
        train_quality_model,
    )
    from validate_xml_rust_spark.sources.corpus import quality_corpus

    qcorp = quality_corpus(spark, N_DOCS, n_partitions=8)
    model = train_quality_model(qcorp)
    write_one(model.to_df(spark), "quality_weights")
    write_one(qcorp, f"quality_corpus_{N_DOCS}")

    # BPE tokenizer fixtures: merges learned (deterministically) on the
    # synthetic corpus word frequencies, plus the EXHAUSTIVE word →
    # subword-pieces table for that corpus — the chunking oracle rebuilds
    # each doc's subword stream from the committed table while Spark runs
    # the live Arrow encoder, so the gate pins encoder + window arithmetic.
    from pyspark.sql import functions as F

    from validate_xml_rust_spark.functions.bpe import Bpe, train_bpe
    from validate_xml_rust_spark.functions.texthash import tokens

    wc = {
        r["w"]: r["c"]
        for r in docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    bpe = Bpe(train_bpe(wc, n_merges=300))
    write_one(bpe.to_df(spark), "bpe_merges")
    words = sorted(wc)
    write_one(
        spark.createDataFrame(
            [(w, len(bpe.encode(w)), " ".join(bpe.encode(w))) for w in words],
            "word string, n_sub long, subs string",
        ),
        f"bpe_words_{N_DOCS}",
    )
    spark.stop()

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(VEC_SEED)
    vecs = np.zeros((N_VECS, DIM), dtype=np.float64)
    # anchors at ids 0..N_ANCHORS-1; satellites of anchor i at
    # 100 + N_SATS*i + j; everything else random background
    for i in range(N_ANCHORS):
        v = rng.standard_normal(DIM)
        vecs[i] = v / np.linalg.norm(v)
    for i in range(N_ANCHORS):
        for j in range(N_SATS):
            noise = rng.standard_normal(DIM)
            a = vecs[i]
            noise -= (noise @ a) * a
            noise /= np.linalg.norm(noise)
            c = 0.97 + 0.02 * rng.random()
            vecs[100 + N_SATS * i + j] = c * a + np.sqrt(1 - c * c) * noise
    for k in range(N_VECS):
        if not vecs[k].any():
            v = rng.standard_normal(DIM)
            vecs[k] = v / np.linalg.norm(v)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), type=pa.int64()),
                "embedding": pa.array(
                    [vecs[k].astype(np.float32).tolist() for k in range(N_VECS)],
                    type=pa.list_(pa.float32()),
                ),
            }
        ),
        "fixtures/planted_vectors.parquet",
    )
    print(f"wrote fixtures/planted_vectors.parquet ({N_VECS} rows)")


if __name__ == "__main__":
    main()
