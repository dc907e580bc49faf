"""Property-based tests (hypothesis): the compiled Column-expression checks
must agree with an independent pure-Python evaluation on arbitrary inputs —
an upgrade over the reference's example-based suite (SURVEY.md §5)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from validate_xml_rust_spark.specs import Constraint, Spec, SpecRegistry
from validate_xml_rust_spark.operators.validate import validate

TEXT = st.one_of(st.none(), st.text(min_size=0, max_size=40))
NUM = st.one_of(st.none(), st.integers(min_value=-10_000, max_value=10_000))


def py_check(row: dict) -> tuple[int, bool]:
    """Independent Python oracle of the spec below: returns
    (n_invalid_failures, any_error_failure)."""
    fails = 0
    url, n, tag = row["url"], row["n"], row["tag"]
    if url is None:
        fails += 1
    if url is not None and not re.search(r"^https?://", url):
        fails += 1
    if n is not None and (n < 0 or n > 1000):
        fails += 1
    if tag is not None and tag not in ("a", "b", "c"):
        fails += 1
    if url is not None and not (1 <= len(url) <= 30):
        fails += 1
    return fails, False


def make_registry() -> SpecRegistry:
    spec = Spec(
        "prop-v1",
        (
            Constraint("url_not_null", "url", "not_null"),
            Constraint("url_format", "url", "regex", {"pattern": r"^https?://"}),
            Constraint("n_range", "n", "range", {"lo": 0, "hi": 1000}),
            Constraint("tag_enum", "tag", "isin", {"values": ["a", "b", "c"]}),
            Constraint("url_len", "url", "length", {"lo": 1, "hi": 30}),
        ),
    )
    return SpecRegistry().add(spec, route_keys=["r"])


@settings(max_examples=30, deadline=None)
@given(
    rows=st.lists(
        st.fixed_dictionaries({"url": TEXT, "n": NUM, "tag": TEXT}),
        min_size=1,
        max_size=12,
    )
)
def test_compiled_checks_match_python_oracle(spark_prop, rows):
    spark = spark_prop
    data = [(i, r["url"], r["n"], r["tag"], "r") for i, r in enumerate(rows)]
    df = spark.createDataFrame(
        data, "rid long, url string, n long, tag string, lang string"
    )
    res = validate(
        df, spark, make_registry(), route_col="lang", id_col="rid",
        partition_col=None,
    )
    got = {r["url"]: r for r in res.verdicts.collect()}  # url here = rid
    for i, r in enumerate(rows):
        fails, _ = py_check(r)
        v = got[i]
        if fails == 0:
            assert v["status"] == "valid", (r, v)
            assert v["error_count"] == 0
        else:
            assert v["status"] == "invalid", (r, v)
            assert v["error_count"] == fails, (r, v)


@settings(max_examples=20, deadline=None)
@given(raw=st.binary(min_size=0, max_size=60))
def test_utf8_check_matches_python(spark_prop, raw):
    spark = spark_prop
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(bytearray(raw),)], "b binary")
    got = df.select((~F.is_valid_utf8("b")).alias("bad")).collect()[0]["bad"]
    try:
        raw.decode("utf-8")
        expected_bad = False
    except UnicodeDecodeError:
        expected_bad = True
    assert got == expected_bad


def test_length_constraint_requires_bound():
    import pytest

    from validate_xml_rust_spark.specs import Constraint, compile_constraint

    with pytest.raises(ValueError, match="needs lo and/or hi"):
        compile_constraint(Constraint("c", "url", "length", {}))


@given(
    toks=st.lists(st.integers(min_value=0, max_value=600), min_size=1, max_size=60),
    budget=st.integers(min_value=1, max_value=1200),
)
@settings(max_examples=12, deadline=None)
def test_pack_sequences_matches_python_reference(spark_prop, toks, budget):
    """pack_sequences (grouped-map applyInPandas) agrees with a pure-Python
    reference fold on arbitrary token sequences and budgets."""
    from validate_xml_rust_spark.operators.curation import pack_sequences

    rows = [(i, 0, t) for i, t in enumerate(toks)]
    df = spark_prop.createDataFrame(rows, "doc_id long, partition_id int, n_tokens int")
    got = {
        r["doc_id"]: r["pack_id"] & 0xFFFFFFFF
        for r in pack_sequences(df, max_tokens=budget).collect()
    }

    # reference fold
    seq, used, expect = -1, 0, {}
    for i, t in enumerate(toks):
        if seq < 0 or used + t > budget:
            seq += 1
            used = 0
        used += t
        expect[i] = seq
    assert got == expect


@given(rate=st.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=8, deadline=None)
def test_hash_sample_rate_bounds(spark_prop, rate):
    """Deterministic sampling: kept fraction tracks the rate, rate=0 keeps
    nothing, rate=1 keeps everything, and membership is stable."""
    from validate_xml_rust_spark.operators.curation import hash_sample

    df = spark_prop.range(0, 1500).withColumnRenamed("id", "k")
    kept = hash_sample(df, rate, "k").count()
    assert abs(kept / 1500 - rate) < 0.08 or kept in (0, 1500)
    if rate == 0.0:
        assert kept == 0
    if rate == 1.0:
        assert kept == 1500


@given(
    keys=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=120),
    bits_pow=st.integers(min_value=8, max_value=14),
)
@settings(max_examples=10, deadline=None)
def test_bloom_prepass_never_loses_a_duplicate(spark_prop, keys, bits_pow):
    """Superset property: for ARBITRARY key multisets and bloom sizes
    (down to degenerate 256-bit filters where almost everything collides),
    duplicate_keys(bloom=True) equals the plain path — false positives
    only ever ADD rows to the pre-filter, never drop a real duplicate."""
    from validate_xml_rust_spark.operators.uniqueness import duplicate_keys

    df = spark_prop.createDataFrame(
        [(f"k{v}",) for v in keys], "k string"
    ).repartition(4)
    got = {
        (r["k"], r["n_dup"])
        for r in duplicate_keys(df, ["k"], bloom=True, bloom_bits=1 << bits_pow).collect()
    }
    want = {(r["k"], r["n_dup"]) for r in duplicate_keys(df, ["k"]).collect()}
    assert got == want


@given(
    words=st.lists(
        st.text(alphabet="abcxyz019", min_size=1, max_size=6),
        min_size=0, max_size=80,
    ),
    size=st.integers(min_value=2, max_value=12),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
@settings(max_examples=12, deadline=None)
def test_chunk_documents_covers_and_reconstructs(spark_prop, words, size, overlap_frac):
    """Chunking properties on arbitrary token sequences: (a) with
    overlap=0 the chunks PARTITION the token sequence exactly (concat
    reconstructs it); (b) with any overlap, dropping the first `overlap`
    tokens of every chunk but the first also reconstructs it; (c) every
    chunk except the last has exactly `size` tokens."""
    from pyspark.sql import functions as F

    from validate_xml_rust_spark.functions.texthash import tokens as tok_expr
    from validate_xml_rust_spark.operators.curation import chunk_documents

    overlap = min(int(size * overlap_frac), size - 1)
    text = " ".join(words)
    df = spark_prop.createDataFrame([(1, text)], "doc_id long, text string")
    # engine tokenizer (alnum runs) — derive the reference from Spark once
    ref = df.select(tok_expr(F.col("text")).alias("w")).collect()[0]["w"]
    chunks = sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, size, overlap).collect()
    )
    if not ref:
        assert chunks == []
        return
    rebuilt = []
    for idx, ctext, n in chunks:
        ct = ctext.split(" ") if ctext else []
        assert len(ct) == n
        if idx < len(chunks) - 1:
            assert n == size
        rebuilt.extend(ct if idx == 0 else ct[overlap:])
    assert rebuilt == ref


@given(
    q_len=st.integers(min_value=5, max_value=12),
    pad=st.integers(min_value=0, max_value=20),
)
@settings(max_examples=8, deadline=None)
def test_contamination_sweep_catches_any_short_length(spark_prop, q_len, pad):
    """Any benchmark entry of length min_n..primary_n-1 embedded verbatim
    in a longer doc is caught by the sweep (the per-length passes cover
    every short length present)."""
    from validate_xml_rust_spark.operators.curation import contamination_sweep

    q = " ".join(f"q{i}" for i in range(q_len))
    doc = " ".join(f"p{i}" for i in range(pad)) + " " + q + " tail words here"
    docs = spark_prop.createDataFrame(
        [(1, doc), (2, "completely unrelated filler text body")],
        "doc_id long, text string",
    )
    bench = spark_prop.createDataFrame([(q,)], "text string")
    out = {r["doc_id"]: r["contaminated"]
           for r in contamination_sweep(docs, bench, primary_n=13, min_n=5).collect()}
    assert out == {1: True, 2: False}
