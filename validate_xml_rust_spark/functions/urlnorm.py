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

def url_host(url: Column) -> Column:
    """Canonical host of ``url``: authority lowercased, userinfo and any
    ``:port`` stripped, ``(www.)+`` alias prefix dropped; NULL for
    null / non-``scheme://`` input. The matching key for host-level
    policy (blocklists, per-host quality)."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, URL_PARTS_RE, 1))
    auth = F.lower(F.regexp_extract(u, URL_PARTS_RE, 2))
    host = F.regexp_replace(auth, r"^[^@]*@", "")
    host = F.regexp_replace(host, r":[0-9]+$", "")
    host = F.regexp_replace(host, r"^(www\.)+", "")
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(host)


def host_suffixes(labels: Column, n: Column) -> Column:
    """All dot-suffixes of a pre-split host (``[a,b,c]`` → [a.b.c, b.c,
    c]) — the equi-join form of "equals or is a subdomain of". Both
    arguments must be PLAIN ATTRIBUTES materialized by a prior select
    (the HOF-lambda rule: an embedded expression tree re-evaluates per
    element). Bounded by the label count (hosts have a handful of
    labels), so the explode is a constant-factor map, never a fan-out."""
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )


def domain_blocklist_flags(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    host_out: str | None = None,
    out_col: str = "blocked",
) -> DataFrame:
    """Flag rows whose url host equals OR is a subdomain of any blocked
    registered domain — the C4/RefinedWeb UT1-blocklist curation step
    (public recipe: Raffel et al. 2020 §2.2 block bad-word domains;
    RefinedWeb uses the UT1 adult/malware lists). ``blocked`` must
    carry its registered domains in ``domain_col`` (UT1 list shape:
    one domain per row). Adds ``blocked boolean`` (NULL-host rows are
    never blocked); pass ``host_out`` to also keep the canonical host
    key the match ran on, so callers never re-derive it.

    Scale shape: matching runs on the DISTINCT-host dimension (10^7
    hosts vs 10^12 pages), suffix-exploded (≤ label count per host)
    into an equi-join against the broadcast blocklist (UT1 lists are
    ~10^6 domains — broadcastable by nature); rows then join the hit
    set on the uniform host key. No per-row scan of the list exists."""
    b = F.broadcast(
        blocked.select(F.lower(F.col(domain_col)).alias("__bd")).distinct()
    )
    with_host = df.withColumn("__h", url_host(F.col(url_col)))
    hit_hosts = (
        with_host.select("__h")
        .where(F.col("__h").isNotNull())
        .distinct()
        .select(
            "__h",
            F.split("__h", r"\.").alias("__labels"),
        )
        .withColumn("__n", F.size("__labels"))
        .select(
            "__h",
            F.explode(
                host_suffixes(F.col("__labels"), F.col("__n"))
            ).alias("__s"),
        )
        .join(b, F.col("__s") == F.col("__bd"), "left_semi")
        .select(F.col("__h").alias("__bh"))
        .distinct()
    )
    out = (
        with_host.join(
            hit_hosts, with_host["__h"] == F.col("__bh"), "left"
        )
        .withColumn(out_col, F.col("__bh").isNotNull())
        .drop("__bh")
    )
    if host_out is None:
        return out.drop("__h")
    return out.withColumnRenamed("__h", host_out)


def domain_blocklist_filter(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose url host is blocked (see domain_blocklist_flags);
    NULL-host rows survive — a missing url is not a blocked url."""
    flagged = domain_blocklist_flags(df, blocked, url_col, domain_col)
    return flagged.filter(~F.col("blocked")).drop("blocked")


def robots_exclusion_flags(
    df: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    host_out: str | None = None,
) -> DataFrame:
    """Robots-disallow registry exclusion: flag rows whose host equals or
    is a subdomain of any domain in the crawler's robots-excluded list —
    the SAME equals-or-subdomain machinery as the UT1 domain blocklist,
    under its own flag name (``robots_excluded``) so both policies
    compose in one frame (a page can be blocklisted, robots-excluded,
    both, or neither). Reference analog: the include/exclude glob family
    where exclude wins (src/file_discovery.rs S3)."""
    return domain_blocklist_flags(
        df, robots, url_col, domain_col, host_out=host_out,
        out_col="robots_excluded",
    )


def robots_exclusion_filter(
    df: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop robots-excluded rows; NULL-host rows survive (no url is not
    an excluded url — the blocklist rule)."""
    flagged = robots_exclusion_flags(df, robots, url_col, domain_col)
    return flagged.filter(~F.col("robots_excluded")).drop("robots_excluded")
