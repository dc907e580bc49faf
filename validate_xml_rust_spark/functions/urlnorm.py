"""URL canonicalization — the crawl-side precursor to exact url dedup.

The reference resolves every file path through `fs::canonicalize` before
keying its cache (reference src/cache.rs:139-170, src/file_discovery.rs:
100-134): two spellings of the same resource must collapse to one key or
the dedup/uniqueness/caching layers silently double-count. For a
Common-Crawl-style corpus the same contract applies to urls — the classic
web canonicalization rules (RFC 3986 §6 syntax-based normalization plus
the tracking-parameter strip every crawler applies):

- scheme and host lowercased; ``www.`` prefix dropped
- default ports stripped (``:80`` for http, ``:443`` for https)
- fragment dropped (never sent to the server)
- tracking query parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``), remaining parameters sorted bytewise, empty query dropped
- trailing slashes stripped from the path

Everything is a pure Column expression (JVM regex + array ops — no
Python, no shuffle): canonicalization is a map over the scan, so it
composes with uniqueness/dedup at zero extra cost and Catalyst keeps the
whole thing inside the scan's projection. The parse regex is RE2-safe
(no lookaround) so the DuckDB oracle restates it verbatim.

Scale note: at 10^12 urls this runs as a projection inside the page scan;
the downstream ``duplicate_keys(canonical_url)`` shuffle is the same one
exact uniqueness already pays, now keyed on the collapsed form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ^scheme://authority path ?query   (fragment is whatever trails; dropped)
URL_PARTS_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?"

# one query parameter of a tracking family — dropped during normalization
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url``; NULL for null / non-``scheme://`` input.

    Deterministic per byte-content — safe to use as a dedup / cache /
    uniqueness key across partitionings and engines.
    """
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, URL_PARTS_RE, 1))
    auth = F.lower(F.regexp_extract(u, URL_PARTS_RE, 2))
    # default ports, then the www. alias host prefix
    auth = F.when(scheme == "http", F.regexp_replace(auth, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(auth, r":443$", "")).otherwise(auth)
    )
    # (www\.)+ not www\.: stacked prefixes (www.www.a.com) must collapse in
    # ONE pass or canonicalize loses its fixed-point property (a stored key
    # re-canonicalized on a later ingest would change)
    auth = F.regexp_replace(auth, r"^(www\.)+", "")
    path = F.regexp_replace(F.regexp_extract(u, URL_PARTS_RE, 3), r"/+$", "")
    rawq = F.regexp_extract(u, URL_PARTS_RE, 4)  # '?a=1&b=2' or ''
    params = F.filter(
        F.split(F.regexp_replace(rawq, r"^\?", ""), "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
    )
    query = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(canon)


def canonical_dup_groups(
    df: DataFrame, url_col: str = "url", canon_col: str = "canonical_url"
) -> DataFrame:
    """Groups of raw urls that collapse to one canonical form.

    One hash-partitioned aggregation on the canonical key (uniform
    distribution — host skew does not transfer to the canonical string's
    hash); emits (canonical_url, n_raw, n_distinct_raw) for every
    canonical form with more than one raw OCCURRENCE. That includes
    byte-identical repeats (n_distinct_raw = 1) — they are duplicates
    under the canonical key too; filter ``n_distinct_raw > 1`` to see
    only true spelling collapses. The map-side combine handles the common
    all-unique case, so the shuffle carries ~one row per distinct url.
    """
    return (
        df.select(F.col(url_col).alias("__u"), canonicalize_url(F.col(url_col)).alias(canon_col))
        .where(F.col(canon_col).isNotNull())
        .groupBy(canon_col)
        .agg(
            F.count("*").alias("n_raw"),
            F.countDistinct("__u").alias("n_distinct_raw"),
        )
        .where(F.col("n_raw") > 1)
    )
