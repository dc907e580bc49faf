"""BPE tokenizer: parity with an independent reference implementation,
committed-fixture stability, decode round-trips, and the model-real
wiring into chunking / packing / decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from validate_xml_rust_spark.functions.bpe import (
    EOW,
    Bpe,
    bpe_token_count,
    bpe_tokens,
    default_bpe,
    train_bpe,
)

CORPUS = {
    "low": 8, "lower": 6, "lowest": 3, "newer": 5, "new": 9, "wider": 2,
    "widest": 1, "w123": 4, "w124": 4, "w19": 7,
}


def ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """INDEPENDENT reference encoder: apply merges strictly in training
    order, each merging every occurrence — provably equivalent to the
    production encoder's lowest-rank-first search, via different code."""
    sym = list(word) + [EOW]
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_train_deterministic_and_greedy():
    m1 = train_bpe(CORPUS, n_merges=40)
    m2 = train_bpe(dict(reversed(list(CORPUS.items()))), n_merges=40)
    assert m1 == m2  # dict order must not matter
    # round 1: ('l','o'), ('o','w'), ('w','</w>') all count 17 — the
    # documented tie-break (count, then pair — total order) picks the
    # lexicographically largest pair, deterministically
    assert m1[0] == ("w", EOW)
    assert m1[1] == ("l", "o")  # 'ow' count drops to 2 after round 1


def test_encoder_parity_with_reference():
    merges = train_bpe(CORPUS, n_merges=25)
    bpe = Bpe(merges)
    words = list(CORPUS) + ["l", "", "lowestest", "w1234", "zzz", "wid"]
    for w in words:
        assert bpe.encode(w) == (ref_encode(w, merges) if w else []), w


def test_encode_roundtrip_and_eow():
    bpe = Bpe(train_bpe(CORPUS, n_merges=25))
    for w in list(CORPUS) + ["unseen", "w9", "lowlow"]:
        pieces = bpe.encode(w)
        assert "".join(pieces) == w + EOW
        assert bpe.decode_pieces(pieces) == w


def test_fixture_vocab_stability(spark):
    """The committed merges + word table agree with the live encoder —
    the chunking oracle depends on this exhaustively."""
    bpe = default_bpe(spark)
    rows = spark.read.parquet("fixtures/bpe_words_600.parquet").collect()
    assert len(rows) > 4000
    for r in rows[::97]:  # spot-check a deterministic stride
        assert bpe.encode(r["word"]) == r["subs"].split(" ")
        assert r["n_sub"] == len(r["subs"].split(" "))


def test_bpe_tokens_column_matches_driver_encoder(spark):
    from validate_xml_rust_spark.sources.corpus import synthetic_documents

    bpe = default_bpe(spark)
    docs = synthetic_documents(spark, 40, 4)
    got = {
        r["doc_id"]: (r["toks"], r["cnt"])
        for r in docs.select(
            "doc_id",
            bpe_tokens(F.col("text"), bpe).alias("toks"),
            bpe_token_count(F.col("text"), bpe).alias("cnt"),
        ).collect()
    }
    for r in docs.collect():
        words = r["text"].split(" ")
        expect = [p for w in words for p in bpe.encode(w)]
        assert got[r["doc_id"]][0] == expect
        assert got[r["doc_id"]][1] == len(expect)
        # decode round-trip at the document level
        assert bpe.decode_pieces(got[r["doc_id"]][0]) == r["text"]


def test_chunk_documents_bpe_budgets_and_reconstruction(spark):
    from validate_xml_rust_spark.operators.curation import chunk_documents
    from validate_xml_rust_spark.sources.corpus import synthetic_documents

    bpe = default_bpe(spark)
    docs = synthetic_documents(spark, 30, 4)
    # overlap=0: chunks partition the subword stream exactly
    out = chunk_documents(
        docs, chunk_tokens=32, overlap=0, tokenizer="bpe", bpe=bpe
    ).orderBy("doc_id", "chunk_idx").collect()
    by_doc: dict[int, list] = {}
    for r in out:
        assert 0 < r["n_tokens"] <= 32
        assert len(r["chunk_text"].split(" ")) == r["n_tokens"]
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_text"])
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, parts in by_doc.items():
        stream = " ".join(parts).split(" ")
        assert bpe.decode_pieces(stream) == texts[doc_id]
    # the Arrow encode evaluates ONCE per row, not once per reference
    plan = (
        chunk_documents(docs, 32, 0, tokenizer="bpe", bpe=bpe)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan


def test_pack_sequences_with_bpe_budgets(spark):
    from validate_xml_rust_spark.operators.curation import pack_sequences
    from validate_xml_rust_spark.sources.corpus import synthetic_documents

    bpe = default_bpe(spark)
    docs = synthetic_documents(spark, 60, 4).withColumn(
        "partition_id", (F.col("doc_id") % 4).cast("int")
    ).withColumn("n_tokens", bpe_token_count(F.col("text"), bpe))
    packed = pack_sequences(docs, max_tokens=300)
    rows = packed.collect()
    assert {r["doc_id"] for r in rows} == set(range(60))
    per_pack: dict[int, int] = {}
    for r in rows:
        per_pack[r["pack_id"]] = per_pack.get(r["pack_id"], 0) + r["n_tokens"]
    # every doc here is ~120 bpe tokens < 300, so no singleton overflow:
    # every pack respects the model-token budget
    assert all(v <= 300 for v in per_pack.values())
    assert len(per_pack) > 1


def test_contamination_sweep_bpe_domain(spark):
    """The sweep in model-token space: benchmark entry lengths, the
    primary threshold, and the gram domain are all BPE subwords. A
    7-WORD quiz entry (which the ws sweep would route to a short exact
    pass) is ≥13 bpe tokens of this vocabulary, so it routes to the
    primary pass — and still catches the verbatim copy."""
    from validate_xml_rust_spark.operators.curation import contamination_sweep

    bpe = default_bpe(spark)
    entry = "w101 w202 w303 w404 w505 w606 w707"
    n_bpe = sum(len(bpe.encode(w)) for w in entry.split())
    assert n_bpe >= 13  # routes to the primary pass in bpe domain
    bench = spark.createDataFrame([(entry,)], "text string")
    docs = spark.createDataFrame(
        [
            (0, f"w1 w2 w3 {entry} w4 w5"),          # verbatim copy
            (1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),   # clean
            (2, f"w1 {entry.rsplit(' ', 3)[0]} w4"),  # half the entry only
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_sweep(
            docs, bench, tokenizer="bpe", bpe=bpe
        ).collect()
    }
    assert got[0] is True
    assert got[1] is False
    # the 3-word fragment is < 13 bpe tokens of shared run → primary pass
    # misses it (correct: the published recipe only matches full n-grams)
    assert got[2] is False
