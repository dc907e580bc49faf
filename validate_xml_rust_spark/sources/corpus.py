"""Synthetic document corpus with CONTROLLED planted near-duplicates —
the recall/throughput harness for the dedup operators.

Unlike the pages table (whose repeated filler makes *everything* weakly
similar), each doc here is a pseudo-random word sequence drawn from a
vocabulary by seeded hashes, so two independent docs share almost no
3-gram shingles (expected Jaccard ≈ 0). Planted structure:

- ``id % 17 == 0`` (id>0): EXACT duplicate of doc id-1,
- ``id % 13 == 0`` (id>0, not exact-dup): NEAR duplicate of id-1 — same
  words with the last ``PERTURB`` words replaced (Jaccard ≈ 1 - k·PERTURB/n
  over shingles — high but < 1).

``expected_pairs(n)`` reproduces the schedule in Python for recall
assertions. Pure Column expressions — scales like the pages generator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 271
VOCAB = 5000
DOC_WORDS = 60
PERTURB = 4


def synthetic_documents(
    spark: SparkSession, n_rows: int, n_partitions: int | None = None
) -> DataFrame:
    df = spark.range(0, n_rows, 1, n_partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    is_exact = (i % 17 == 0) & (i > 0)
    is_near = (i % 13 == 0) & (i > 0) & ~is_exact
    base = F.when(is_exact | is_near, i - 1).otherwise(i)

    def word(doc: F.Column, j: F.Column) -> F.Column:
        h = F.abs(F.xxhash64(doc, j, F.lit(SEED))) % VOCAB
        return F.concat(F.lit("w"), h.cast("string"))

    idx = F.sequence(F.lit(0), F.lit(DOC_WORDS - 1))
    words = F.transform(idx, lambda j: word(base, j))
    # near-dup: replace the tail words with id-derived (not base-derived) ones
    perturbed = F.transform(
        idx,
        lambda j: F.when(
            is_near & (j >= DOC_WORDS - PERTURB), word(i + F.lit(10_000_000), j)
        ).otherwise(word(base, j)),
    )
    text = F.concat_ws(" ", F.when(is_near, perturbed).otherwise(words))
    return df.select(i.alias("doc_id"), text.alias("text"))


def _repr_of(i: int) -> tuple[int, int | None]:
    """Symbolic text identity: (base_doc, perturb_tag)."""
    if i > 0 and i % 17 == 0:
        return (i - 1, None)  # copies base words of i-1 (unperturbed)
    if i > 0 and i % 13 == 0:
        return (i - 1, i)  # base words of i-1 with an i-derived tail
    return (i, None)


def expected_pairs(n_rows: int) -> tuple[set, set]:
    """(exact_pairs, near_pairs), (a, b) with a < b.

    Computed from symbolic text identity so schedule chain collisions
    (an "exact dup" of a row that was itself perturbed) land in the right
    bucket: equal reprs → exact; same base, different perturb → near."""
    exact, near = set(), set()
    reprs = [_repr_of(i) for i in range(n_rows)]
    for i in range(1, n_rows):
        a, b = reprs[i - 1], reprs[i]
        if a == b:
            exact.add((i - 1, i))
        elif a[0] == b[0]:
            near.add((i - 1, i))
    return exact, near


PASSAGE_DOC_WORDS = 60
PASSAGE_LEN = 12


def passage_corpus(
    spark: SparkSession, n_rows: int, n_partitions: int | None = None
) -> DataFrame:
    """Corpus with PLANTED SHARED PASSAGES for substring-level excision
    (dedup.excise_shared_passages): each doc is 60 otherwise-unique words
    (id-derived — two docs share no 8-gram by construction), with 12-token
    passages ``p<g>x0 .. p<g>x11`` injected on a deterministic schedule:

    - ``id % 4 == 1``: passage P(id % 3) at positions [20, 32) — the
      plain single-span case (min id of each group keeps its copy);
    - ``id % 4 == 2``: P(3 + id % 2) at [10, 22) AND P(5) at [22, 34) —
      two ADJACENT shared spans that must merge to one excised span;
    - ``id % 4 == 3 and id % 3 == 0``: P(6) at [48, 60) — a passage
      flush against the document end (boundary case);
    - ``id % 4 == 0``: no passage — must pass through untouched.

    Pure Column expressions, deterministic, scales like the other
    generators. Output: ``doc_id, text``."""
    df = spark.range(
        0, n_rows, 1, n_partitions or spark.sparkContext.defaultParallelism
    )
    i = F.col("id")

    def uword(j: F.Column) -> F.Column:
        h = F.abs(F.xxhash64(i, j, F.lit(SEED + 9)))
        return F.concat(F.lit("u"), h.cast("string"))

    def pword(g: F.Column, off: F.Column) -> F.Column:
        return F.concat(
            F.lit("p"), g.cast("string"), F.lit("x"), off.cast("string")
        )

    idx = F.sequence(F.lit(0), F.lit(PASSAGE_DOC_WORDS - 1))

    def word(j: F.Column) -> F.Column:
        return (
            F.when(
                (i % 4 == 1) & (j >= 20) & (j < 32), pword(i % 3, j - 20)
            )
            .when(
                (i % 4 == 2) & (j >= 10) & (j < 22),
                pword(F.lit(3) + i % 2, j - 10),
            )
            .when((i % 4 == 2) & (j >= 22) & (j < 34), pword(F.lit(5), j - 22))
            .when(
                (i % 4 == 3) & (i % 3 == 0) & (j >= 48), pword(F.lit(6), j - 48)
            )
            .otherwise(uword(j))
        )

    text = F.concat_ws(" ", F.transform(idx, word))
    return df.select(i.alias("doc_id"), text.alias("text"))


SPAM_WORDS = (
    "buy", "click", "free", "win", "now", "offer", "casino", "prize",
)
QUALITY_DOC_WORDS = 40


def quality_corpus(
    spark: SparkSession, n_rows: int, n_partitions: int | None = None
) -> DataFrame:
    """Labeled good/bad corpus for the trainable quality scorer
    (operators/quality_model.py). ``label=1`` (odd ids): varied
    pseudo-random words from a ``g####`` vocabulary with common function
    words sprinkled in; ``label=0`` (even ids): spam — a short loop of
    promotional words (SPAM_WORDS) plus a tiny repeated filler set. The
    classes are separable on token identity, so a linear token-weight
    model must learn them; pure Column expressions, deterministic, scales
    like the other generators. Output: ``doc_id, text, label``."""
    df = spark.range(0, n_rows, 1, n_partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    label = (i % 2).cast("int")
    idx = F.sequence(F.lit(0), F.lit(QUALITY_DOC_WORDS - 1))

    def good_word(j: F.Column) -> F.Column:
        h = F.abs(F.xxhash64(i, j, F.lit(SEED + 1))) % VOCAB
        return F.when(
            j % 5 == 2,
            F.element_at(
                F.array(F.lit("the"), F.lit("and"), F.lit("of")),
                ((h % 3) + 1).cast("int"),
            ),
        ).otherwise(F.concat(F.lit("g"), h.cast("string")))

    def bad_word(j: F.Column) -> F.Column:
        h = F.abs(F.xxhash64(i, j, F.lit(SEED + 2)))
        spam = F.element_at(
            F.array(*[F.lit(w) for w in SPAM_WORDS]),
            ((h % len(SPAM_WORDS)) + 1).cast("int"),
        )
        # a small repeated filler set keeps bad docs from being pure spam
        return F.when(j % 3 == 0, F.concat(F.lit("f"), (h % 20).cast("string"))).otherwise(spam)

    text = F.concat_ws(
        " ",
        F.transform(idx, lambda j: F.when(label == 1, good_word(j)).otherwise(bad_word(j))),
    )
    return df.select(i.alias("doc_id"), text.alias("text"), label.alias("label"))


# --- multilingual corpus for the trainable language identifier ----------

LANGID_LANGS = ("de", "el", "en", "ru", "zh")
# per-language alphabets (already lowercase, so `lower()` is an identity
# on both engines — no locale-sensitive case mapping in the gate):
# two Latin-script languages with overlapping letters (separation must
# come from the learned gram distribution, not the script), plus
# Cyrillic, Greek, and CJK for non-Latin coverage
_LANG_ALPHA = {
    "en": "etaoinshrdlc",
    "de": "ensiratdhulg",
    "ru": "оеаинтсрвлкм",
    "el": "αοιετσνηρκπμ",
    "zh": "的一是不了人我在有他这中大来上",
}
LANGID_VOCAB = 50
LANGID_DOC_WORDS = 30


def lang_corpus(
    spark: SparkSession, n_rows: int, n_partitions: int | None = None
) -> DataFrame:
    """Labeled multilingual corpus for the hashed char-n-gram language
    identifier (operators/textstats.py:langid_train/langid_predict).
    ``lang = LANGID_LANGS[id % 5]``; each language has a FIXED 50-word
    pseudo-vocabulary whose words (3-5 chars) are hash-drawn from its own
    alphabet, so each language concentrates on a stable, language-specific
    set of character n-grams — exactly the signal a fastText-style
    classifier learns. Pure Column expressions (scales like the other
    generators); committed snapshot: fixtures/lang_docs_600.parquet.
    Output: ``doc_id, lang, text``."""
    df = spark.range(0, n_rows, 1, n_partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    lang = F.element_at(
        F.array(*[F.lit(l) for l in LANGID_LANGS]), ((i % 5) + 1).cast("int")
    )

    def lang_text(code: str) -> F.Column:
        alpha = _LANG_ALPHA[code]
        arr = F.array(*[F.lit(c) for c in alpha])

        def word(w: F.Column) -> F.Column:
            # vocabulary index: which of the language's 50 words sits at
            # slot w of doc i (depends on the doc, not the language)
            v = F.abs(F.xxhash64(i, w, F.lit(SEED + 7))) % LANGID_VOCAB
            nw = (F.abs(F.xxhash64(F.lit(code), v, F.lit(SEED + 11))) % 3) + 3
            chars = F.transform(
                F.sequence(F.lit(0), F.lit(4)),
                lambda j: F.when(
                    j < nw,
                    F.element_at(
                        arr,
                        (
                            (
                                F.abs(
                                    F.xxhash64(F.lit(code), v, j, F.lit(SEED + 12))
                                )
                                % len(alpha)
                            )
                            + 1
                        ).cast("int"),
                    ),
                ).otherwise(F.lit("")),
            )
            return F.array_join(chars, "")

        idx = F.sequence(F.lit(0), F.lit(LANGID_DOC_WORDS - 1))
        return F.concat_ws(" ", F.transform(idx, word))

    text = F.lit(None).cast("string")
    for code in LANGID_LANGS:
        text = F.when(lang == code, lang_text(code)).otherwise(text)
    return df.select(i.alias("doc_id"), lang.alias("lang"), text.alias("text"))


# --- prose-shaped corpus for quality-pack benchmarks/tests ---------------

# distinct per-line templates: identical cross-line filler would itself
# be Gopher-failing boilerplate (a repeated 4/5-gram covering >16% of
# chars); each template carries stopwords and terminal punctuation so
# the published packs judge per-document CONTENT, not the generator's
# shape
PROSE_LINE_TEMPLATES: tuple[tuple[str, str], ...] = (
    ("It was the part ", " and so it goes on."),
    ("Then we see some ", " which is read now."),
    ("Here are more of ", " that came before this."),
    ("Not all of those ", " will be kept today."),
    ("In the end there is ", " and that is all."),
)


def prose_documents(
    spark: SparkSession, n_rows: int, n_partitions: int | None = None
) -> DataFrame:
    """The synthetic corpus re-shaped so the PUBLISHED quality packs keep
    a realistic fraction: raw ``synthetic_documents`` text is single-line
    stopword-free word soup, which C4 (no line ends in punctuation → 0
    lines kept) and Gopher (no stopword hits → every doc dropped) are
    DESIGNED to annihilate — a preset benchmark over it times steps over
    doomed rows and ends at kept=0. Each doc becomes 5 punctuated,
    stopword-bearing lines (~70 words) whose content words come from
    spans of the original text, so the planted exact/near duplicates
    survive the reshaping and dedup steps stay exercised.
    Output: ``doc_id, text``."""
    base = synthetic_documents(spark, n_rows, n_partitions)

    def line(idx: int) -> F.Column:
        pre, post = PROSE_LINE_TEMPLATES[idx]
        return F.concat(
            F.lit(pre), F.substring(F.col("text"), 1 + 60 * idx, 55), F.lit(post)
        )

    return base.select(
        "doc_id",
        F.concat_ws(
            "\n", *[line(i) for i in range(len(PROSE_LINE_TEMPLATES))]
        ).alias("text"),
    )
