"""Deterministic HTML → text extraction.

The north-star invariant (BASELINE.json input_hint): *byte-identical
extracted text per url* versus the stored ``text`` column. The extractor is
therefore pinned to a tiny, versioned, locale-free algorithm implemented
twice with identical semantics:

1. ``extract_text_col`` — pure Column expressions (JVM regex, vectorized,
   whole-stage codegen; the hot path),
2. ``extract_text_py`` — pure Python (ground truth for pytest byte-equality
   checks and for the pandas-UDF fallback).

Algorithm EXTRACTOR_VERSION 1:
  decode UTF-8 → drop <script>/<style> elements → strip all tags →
  collapse whitespace runs to a single space → trim.

The regexes below use only syntax with identical meaning in Java's
``java.util.regex`` and Python's ``re`` ((?is) flags, lazy quantifiers,
character classes), so both implementations are byte-equivalent.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

EXTRACTOR_VERSION = 1

_SCRIPT_STYLE = r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>"
_TAG = r"(?s)<[^>]*>"
_WS = r"\s+"


def extract_text_from_html_str(html: Column) -> Column:
    """Extractor over an already-decoded HTML string column."""
    no_script = F.regexp_replace(html, _SCRIPT_STYLE, " ")
    no_tags = F.regexp_replace(no_script, _TAG, " ")
    collapsed = F.regexp_replace(no_tags, _WS, " ")
    return F.trim(collapsed)


def extract_text_col(html_binary: Column) -> Column:
    """Extractor over the ``html:binary`` column (decodes UTF-8 first).

    Spark 4's decode() throws on malformed UTF-8, so invalid rows are gated
    to NULL here; they are flagged by the ``utf8`` constraint as ``error``
    verdicts (mirrors the reference failing the document parse on bad
    bytes, src/validator.rs:659-663)."""
    decoded = F.when(F.is_valid_utf8(html_binary), F.decode(html_binary, "UTF-8"))
    return extract_text_from_html_str(decoded)


_PY_SCRIPT_STYLE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.I | re.S)
_PY_TAG = re.compile(r"<[^>]*>", re.S)
_PY_WS = re.compile(r"\s+")


def extract_text_py(html: bytes | str) -> str:
    """Reference (ground-truth) implementation — byte-identical to
    ``extract_text_col`` for valid-UTF-8 input."""
    s = html.decode("utf-8") if isinstance(html, bytes) else html
    s = _PY_SCRIPT_STYLE.sub(" ", s)
    s = _PY_TAG.sub(" ", s)
    s = _PY_WS.sub(" ", s)
    return s.strip()
