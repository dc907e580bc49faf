"""PII detection + redaction signal pack.

Public recipe: the Dolma toolkit's PII tagger and the BigScience ROOTS
PII pipeline both scrub web text with regex detectors for the three
high-volume classes — email addresses, phone numbers, IP addresses —
replacing matches with fixed pipe-delimited tokens so downstream
tokenizers see a stable vocabulary item instead of the raw identifier.
This module reimplements that recipe as pure Spark Column expressions:
three ``regexp_count`` probes (signals) and a chained ``regexp_replace``
(redaction), all whole-stage codegen — no Python in the hot path.

Pattern contract (the oracle-parity rule): every pattern is written in
the java.util.regex ∩ RE2 common subset so the DuckDB oracle can restate
it VERBATIM — no lookaround, no backreferences, and deliberately no
``\\b`` (Java's word boundary is Unicode-aware, RE2's is ASCII; on
non-ASCII-adjacent matches the two engines would disagree). Counting and
replacement are leftmost non-overlapping in both engines, and greedy
quantifier backtracking resolves identically, so the same pattern string
yields byte-identical output on both sides.

Redaction is idempotent (the repo's canonicalizer rule): no replacement
token contains a digit or ``@``, so no pattern can match the output of a
prior redaction — property-tested in tests/test_pii.py.

Reference parity: the reference validates whole files against schema
specs (src/validator.rs); content policy is outside its scope. This pack
belongs to the LLM-data-pipeline surface (SURVEY §2 LLM ops), the same
family as the C4/Gopher rule packs (operators/textstats.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java ∩ RE2 subset — see module docstring. Order matters for redaction:
# emails first (their local parts can contain digit runs a later pattern
# could claim), then IPv4 (dotted digit groups), then phone (the loosest
# digit shape, applied once the stricter classes are gone).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PHONE_RE = r"\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}"

# (class, pattern, Dolma-style replacement token) in REDACTION ORDER.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "|||EMAIL_ADDRESS|||"),
    ("ipv4", IPV4_RE, "|||IP_ADDRESS|||"),
    ("phone", PHONE_RE, "|||PHONE_NUMBER|||"),
)

# columns pii_signals adds — filter/strip steps drop exactly this set
PII_COLUMNS: tuple[str, ...] = (
    "n_emails", "n_ipv4", "n_phones", "pii_total", "has_pii",
)


def _count(col: Column, pattern: str) -> Column:
    # counts are measured on the ORIGINAL text (pre-redaction), NULL → 0
    return F.coalesce(
        F.regexp_count(col, F.lit(pattern)).cast("long"), F.lit(0).cast("long")
    )


def pii_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add per-document PII counts (all pure codegen, one text scan per
    pattern): ``n_emails`` / ``n_ipv4`` / ``n_phones`` (BIGINT, NULL text
    counts 0), ``pii_total``, and ``has_pii``. Counts are taken on the
    raw text — run this BEFORE :func:`redact_pii` when both are wanted.
    """
    t = F.col(text_col)
    counts = {name: _count(t, pat) for name, pat, _ in PII_PATTERNS}
    out = (
        df.withColumn("n_emails", counts["email"])
        .withColumn("n_ipv4", counts["ipv4"])
        .withColumn("n_phones", counts["phone"])
    )
    total = F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones")
    return out.withColumn("pii_total", total).withColumn(
        "has_pii", total > 0
    )


def redact_pii_col(col: Column) -> Column:
    """The redaction expression: chained ``regexp_replace`` in
    :data:`PII_PATTERNS` order. NULL in → NULL out (no coalesce — a
    missing document stays missing). Idempotent: tokens contain no digit
    or ``@``, so re-running matches nothing."""
    out = col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace every detected PII span in ``text_col`` with its class
    token (Dolma convention: ``|||EMAIL_ADDRESS|||`` /
    ``|||IP_ADDRESS|||`` / ``|||PHONE_NUMBER|||``). In-place when
    ``out_col`` is None. Zero shuffle — a projection over the scan."""
    return df.withColumn(out_col or text_col, redact_pii_col(F.col(text_col)))
