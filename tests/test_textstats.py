"""Text-analysis operator unit tests."""

from __future__ import annotations

from validate_xml_rust_spark.operators.textstats import (
    detect_language,
    doc_fingerprint,
    quality_score,
    token_stats,
)


def _d(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_langid_markers(spark):
    d = _d(
        spark,
        [
            (0, "the cat and the dog of the house"),
            (1, "der hund und die katze und der vogel"),
            (2, "le chat et les chiens et le"),
            (3, "el perro y los gatos y el"),
            (4, "zzz qqq xxx"),
            (5, None),
        ],
    )
    got = {r["doc_id"]: r["detected_lang"] for r in detect_language(d).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "und", 5: "und"}


def test_token_stats(spark):
    d = _d(spark, [(0, "hello world  foo"), (1, ""), (2, None), (3, "a-b c3d")])
    got = {r["doc_id"]: (r["n_tokens"], r["text_chars"]) for r in token_stats(d).collect()}
    assert got[0] == (3, 16)
    assert got[1] == (0, 0)
    assert got[2] == (0, 0)
    assert got[3][0] == 2


def test_quality_bounds_and_monotonicity(spark):
    d = _d(
        spark,
        [
            (0, "the cat and the dog walked over the hill and the fox ran"),
            (1, "!!!,,,;;;???...!!!,,,"),
            (2, None),
        ],
    )
    got = {r["doc_id"]: r["quality"] for r in quality_score(d).collect()}
    assert all(0.0 <= q <= 1.0 for q in got.values())
    assert got[0] > got[1]  # natural text beats punctuation soup
    assert got[2] == 0.0


def test_fingerprint_normalization(spark):
    d = _d(spark, [(0, "Hello   World"), (1, "hello world"), (2, " HELLO\tWORLD ")])
    rows = doc_fingerprint(d).collect()
    fps = {r["fp_md5"] for r in rows}
    rolls = {r["fp_roll"] for r in rows}
    assert len(fps) == 1 and len(rolls) == 1  # all normalize identically


def test_repetition_stats_flags_boilerplate(spark):
    from validate_xml_rust_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "buy now buy now buy now buy now buy now buy now"),  # spam
            (1, "each word in this sentence appears exactly once here"),
            (2, ""),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[0]["repetitive"] and out[0]["unigram_rep"] > 0.5
    assert out[0]["bigram_rep"] > 0.5  # "buy now" repeats as a bigram too
    assert not out[1]["repetitive"] and out[1]["unigram_rep"] == 0.0
    assert out[2]["unigram_rep"] == 0.0 and out[3]["bigram_rep"] == 0.0


def test_lm_perplexity_smoothing_and_edges(spark):
    """Add-α bigram LM (CCNet shape): hand-computed smoothed scores on a
    3-word reference; OOV bigrams over OOV left words score exactly
    ln(α·V/α) = ln(V); docs with <2 tokens emit n_bigrams=0/NULL score;
    broadcast and shuffle-join paths agree exactly."""
    import math

    from validate_xml_rust_spark.operators.textstats import lm_perplexity

    ref = spark.createDataFrame([("a b a b",)], "text string")
    # ref counts: c(a)=2 c(b)=2, c('a b')=2 c('b a')=1, V=2
    docs = spark.createDataFrame(
        [
            (0, "a b"),          # -ln((2+.1)/(2+.2))
            (1, "z z"),          # OOV: -ln(.1/.2) = ln(2) = ln(V)
            (2, "a"),            # 1 token → no bigrams
            (3, None),           # NULL text → no bigrams
            (4, "b a b"),        # mean of 'b a' and 'a b'
        ],
        "doc_id long, text string",
    )
    for bc in (True, False):
        got = {
            r["doc_id"]: (r["n_bigrams"], r["log_ppl"])
            for r in lm_perplexity(docs, ref, broadcast_ref=bc).collect()
        }
        assert got[0] == (1, round(-math.log(2.1 / 2.2), 6))
        assert got[1] == (1, round(math.log(2.0), 6))
        assert got[2] == (0, None) and got[3] == (0, None)
        exp4 = round(-(math.log(1.1 / 2.2) + math.log(2.1 / 2.2)) / 2, 6)
        assert got[4] == (2, exp4)
