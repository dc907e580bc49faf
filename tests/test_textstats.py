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


def test_gopher_rules_each_rule_fires(spark):
    from validate_xml_rust_spark.operators.textstats import gopher_rules

    good = (
        "the quick brown fox jumps over that lazy dog and it runs away "
        "to be of good cheer with friends nearby every single day now "
        "more words keep coming here so the count clears fifty total "
        "easily done with room to spare in this plain english sentence "
        "that keeps going until the word counter is satisfied fully"
    )
    d = _d(
        spark,
        [
            (0, good),                                    # passes all
            (1, "too short to be of use"),                # word count
            (2, "- one\n- two\n- three\n- four"),         # bullets (and count)
            (3, good + "\nwait...\nmore...\nyes..."),     # ellipsis lines
            (4, good + " " + "# " * 20),                  # symbol ratio
            (5, "42 " * 60),                              # alpha frac + mean_wl
            (6, None),                                    # NULL text
        ],
    )
    rows = {r["doc_id"]: r for r in gopher_rules(d).collect()}
    assert rows[0]["gopher_pass"] is True
    assert rows[0]["g_stop_hits"] >= 2
    assert rows[1]["gopher_pass"] is False and rows[1]["g_n_words"] < 50
    assert rows[2]["g_bullet_frac"] == 1.0
    assert rows[3]["g_ellipsis_frac"] > 0.3
    assert rows[3]["gopher_pass"] is False
    assert rows[4]["g_symbol_ratio"] > 0.1
    assert rows[5]["g_alpha_frac"] == 0.0
    assert rows[5]["g_mean_wl"] == 2.0
    assert rows[6]["g_n_words"] == 0 and rows[6]["gopher_pass"] is False


def test_gopher_rules_threshold_is_configurable(spark):
    from validate_xml_rust_spark.operators.textstats import gopher_rules

    text = (
        "the cat and the dog went to the house of friends that have "
        "come along with them today"
    )  # 17 words, stopword-rich, clean
    d = _d(spark, [(0, text)])
    assert gopher_rules(d, min_words=10).collect()[0]["gopher_pass"] is True
    assert gopher_rules(d, min_words=50).collect()[0]["gopher_pass"] is False


def test_repetition_dup_line_frac(spark):
    from validate_xml_rust_spark.operators.textstats import repetition_stats

    d = _d(
        spark,
        [
            (0, "one\ntwo\nthree"),            # all distinct → 0
            (1, "same\nsame\nsame\nsame"),      # 3 of 4 duplicated
            (2, "a\n\n\na"),                    # empties ignored → 1 of 2
            (3, None),
            (4, "no newlines at all"),
        ],
    )
    got = {r["doc_id"]: r["dup_line_frac"] for r in repetition_stats(d).collect()}
    assert got[0] == 0.0
    assert got[1] == 0.75
    assert got[2] == 0.5
    assert got[3] == 0.0
    assert got[4] == 0.0


def test_repetition_ngram_coverage_fractions(spark):
    """Pin the Gopher char-coverage arithmetic on hand-computable docs."""
    from validate_xml_rust_spark.operators.textstats import repetition_stats

    d = _d(
        spark,
        [
            # "ab cd" ×3: top2 = 3·4/12, top3 = 2·6/12, top4 = 2·8/12
            # (>1 is legal: overlapping occurrences each contribute),
            # 5-grams both unique → dup5 = 0
            (0, "ab cd ab cd ab cd"),
            # 5-gram "v w x y z" at positions 1 and 8 → coverage 10/14
            (1, "v w x y z a b v w x y z c d"),
            (2, "one two three four five six"),  # nothing repeats
            (3, None),
        ],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(d).collect()}
    assert rows[0]["top2_char_frac"] == 1.0
    assert rows[0]["top3_char_frac"] == 1.0
    assert rows[0]["top4_char_frac"] == round(2 * 8 / 12, 6)
    assert rows[0]["dup5_char_frac"] == 0.0
    assert rows[1]["top2_char_frac"] == round(2 * 2 / 14, 6)
    assert rows[1]["dup5_char_frac"] == round(10 / 14, 6)
    assert rows[1]["dup10_char_frac"] == 0.0
    assert rows[1]["rep_ngram_pass"] is False
    assert rows[2]["top2_char_frac"] == 0.0
    assert rows[2]["dup5_char_frac"] == 0.0
    assert rows[2]["rep_ngram_pass"] is True
    assert rows[3]["rep_ngram_pass"] is True  # empty doc: all signals 0


def test_repetition_ngram_coverage_overlap_counts_once(spark):
    """Self-overlapping duplicated grams cover each position once."""
    from validate_xml_rust_spark.operators.textstats import repetition_stats

    d = _d(spark, [(0, "a a a a a a a a a a")])  # 10 × "a"
    r = repetition_stats(d).collect()[0]
    # bigram (a a) ×9, gram chars 2, total chars 10
    assert r["top2_char_frac"] == round(9 * 2 / 10, 6)
    # every position inside a duplicated 5-gram → exactly 1.0, not 6×5/10
    assert r["dup5_char_frac"] == 1.0
    assert r["rep_ngram_pass"] is False


def test_repetition_line_para_char_fractions(spark):
    from validate_xml_rust_spark.operators.textstats import repetition_stats

    d = _d(
        spark,
        [
            # lines: "dup"x2 + "unique-longer" → char frac 6/19;
            # one paragraph (no blank line) → para signals 0
            (0, "dup\nunique-longer\ndup"),
            # paragraphs: "same para"x2 + "other" → dup_para_frac 1/3,
            # char frac 18/23; each para is one line so lines dup too
            (1, "same para\n\nother\n\nsame para"),
            (2, None),
        ],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(d).collect()}
    assert rows[0]["dup_line_char_frac"] == round(6 / 19, 6)
    assert rows[0]["dup_para_frac"] == 0.0
    assert rows[0]["dup_para_char_frac"] == 0.0
    assert rows[1]["dup_para_frac"] == round(1 - 2 / 3, 6)
    assert rows[1]["dup_para_char_frac"] == round(18 / 23, 6)
    assert rows[1]["rep_dup_pass"] is False
    assert rows[2]["dup_line_char_frac"] == 0.0
    assert rows[2]["rep_dup_pass"] is True


def test_c4_rules_line_and_page_gates(spark):
    from validate_xml_rust_spark.operators.textstats import c4_rules

    good = "\n".join(
        [
            "This is a proper sentence with enough words.",  # kept
            "short line.",                        # <5 words → dropped
            "No terminal punctuation here at all",  # no punct → dropped
            'He said "stop right there and wait."',  # kept
            "Enable javascript to view this page.",  # javascript → dropped
            "Another good sentence rounds this out!",  # kept
        ]
    )
    d = _d(
        spark,
        [
            (0, good),
            (1, "Lorem Ipsum dolor sit amet filler text."),
            (2, "function f() { return 1; } is code with words."),
            (3, "One good sentence is not enough lines."),
            (4, None),
        ],
    )
    rows = {r["doc_id"]: r for r in c4_rules(d).collect()}
    assert rows[0]["c4_lines_total"] == 6 and rows[0]["c4_lines_kept"] == 3
    assert rows[0]["c4_pass"] is True
    assert rows[0]["c4_text"].count("\n") == 2
    assert "javascript" not in rows[0]["c4_text"].lower()
    assert rows[1]["c4_has_lorem"] is True and rows[1]["c4_pass"] is False
    assert rows[2]["c4_has_brace"] is True and rows[2]["c4_pass"] is False
    assert rows[3]["c4_lines_kept"] == 1 and rows[3]["c4_pass"] is False
    assert rows[4]["c4_text"] == "" and rows[4]["c4_pass"] is False


def test_perplexity_buckets_terciles(spark):
    from validate_xml_rust_spark.operators.textstats import perplexity_buckets

    ref_text = "the cat sat on the mat and the dog sat on the rug"
    rows = [
        (0, "the cat sat on the mat", "en"),       # most reference-like
        (1, "the dog sat on the rug today", "en"),
        (2, "zebra xylophone quark entropy", "en"),  # OOV → worst
        (3, "cat", "en"),                          # <2 tokens → NULL bucket
        (4, "the cat sat on the mat", "de"),       # own group: sole doc
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    ref = spark.createDataFrame([(ref_text,)], "text string")
    got = {
        r["doc_id"]: r
        for r in perplexity_buckets(docs, ref, group_col="lang").collect()
    }
    assert got[0]["ppl_bucket"] == "head"
    assert got[2]["ppl_bucket"] == "tail"
    assert got[3]["ppl_bucket"] is None
    # buckets are per-group: the lone de doc is its own head
    assert got[4]["ppl_bucket"] == "head"
    # ungrouped: global terciles still cover head..tail
    glob = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(docs, ref).collect()
    }
    assert glob[3] is None
    assert {glob[0], glob[2]} == {"head", "tail"}


def test_langid_ngram_model_holdout_accuracy(spark):
    """The trainable hashed char-n-gram classifier separates all five
    scripts (incl. two Latin languages distinguished only by gram
    distribution) on a holdout quarter it never saw; empty/NULL text
    predicts 'und'."""
    from pyspark.sql import functions as F

    from validate_xml_rust_spark.operators.textstats import (
        langid_predict,
        langid_train,
    )
    from validate_xml_rust_spark.sources.corpus import lang_corpus

    docs = lang_corpus(spark, 400, n_partitions=4)
    w = langid_train(docs.filter(F.col("doc_id") % 4 != 0))
    pred = langid_predict(docs.filter(F.col("doc_id") % 4 == 0), w)
    rows = pred.select("lang", "detected_lang").collect()
    acc = sum(1 for r in rows if r["lang"] == r["detected_lang"]) / len(rows)
    assert acc >= 0.95, acc
    # every language is actually predicted (not one dominant class)
    assert {r["detected_lang"] for r in rows} == {"de", "el", "en", "ru", "zh"}

    # no matched gram → 'und' (NULL and empty text)
    odd = spark.createDataFrame(
        [(1000, None), (1001, ""), (1002, "zz")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["detected_lang"] for r in langid_predict(odd, w).collect()}
    assert got[1000] == "und" and got[1001] == "und"


def test_char_gram_extraction_survives_generator_lambdas(spark):
    """Regression: extracting char n-grams with a HOF lambda over a text
    column that is ITSELF built from nested transform lambdas (every
    synthetic generator) corrupts the grams — CollapseProject inlines
    the generator expression into the outer lambda and the nested lambda
    variables collide (measured: empty and whole-document 'grams'). The
    explode-based extraction must match a driver-side reference exactly,
    multiset-wise, straight off the generator plan (no checkpoint)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from validate_xml_rust_spark.operators.textstats import _char_gram_buckets
    from validate_xml_rust_spark.operators.curation import sample_ticket
    from validate_xml_rust_spark.sources.corpus import lang_corpus

    docs = lang_corpus(spark, 10, n_partitions=2)
    got = Counter(
        r["b"]
        for r in _char_gram_buckets(
            docs, "text", {"__id": F.col("doc_id")}, (3, 4, 5), 65536, "langid"
        ).collect()
    )
    # driver-side reference over the same rows
    import hashlib

    def ticket(g: str) -> int:
        return int(hashlib.md5(f"langid:{g}".encode()).hexdigest()[:8], 16)

    want: Counter = Counter()
    for r in docs.collect():
        t = (r["text"] or "").lower()
        for n in (3, 4, 5):
            for i in range(len(t) - n + 1):
                want[ticket(t[i : i + n]) % 65536] += 1
    assert got == want
