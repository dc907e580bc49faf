"""URL canonicalization: every RFC-3986-style rule plus the tracking-param
strip, including the inputs the gate query's synthesized corpus can't
reach (nulls, non-url strings, :80 vs :443 interplay, ports that are NOT
default and must survive)."""

from __future__ import annotations

from pyspark.sql import functions as F

from validate_xml_rust_spark.functions.urlnorm import (
    canonical_dup_groups,
    canonicalize_url,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]


def test_canonicalize_rules(spark):
    got = _canon(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/a/b/?b=2&utm_source=x&a=1#frag",
            "http://example.com:80/",
            "http://example.com:8080/x",       # non-default port survives
            "https://example.com:80/x",        # :80 is NOT default for https
            "  https://example.com/x  ",       # trims
            "https://example.com/x?utm_source=a&utm_medium=b&fbclid=1&gclid=2&ref=r",
            "https://sub.www.example.com/x",   # www. stripped only as prefix
            "https://www.www.example.com/x",   # stacked prefixes collapse
            "ftp://example.com/file",          # other schemes pass through
            "not-a-url",
            None,
        ],
    )
    assert got == [
        "https://example.com/a/b?a=1&b=2",
        "http://example.com",
        "http://example.com:8080/x",
        "https://example.com:80/x",
        "https://example.com/x",
        "https://example.com/x",
        "https://sub.www.example.com/x",
        "https://example.com/x",
        "ftp://example.com/file",
        None,
        None,
    ]


def test_canonical_dup_groups(spark):
    df = spark.createDataFrame(
        [
            ("https://a.com/x",),
            ("https://www.a.com/x/",),
            ("https://a.com/x#f",),
            ("https://a.com/x",),  # exact repeat: raw dup, one distinct spelling
            ("https://b.com/y",),  # singleton — filtered out
            ("bogus",),
        ],
        "url string",
    )
    rows = canonical_dup_groups(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["canonical_url"] == "https://a.com/x"
    assert r["n_raw"] == 4 and r["n_distinct_raw"] == 3


def test_canonicalize_idempotent(spark):
    """canon(canon(u)) == canon(u): the canonical form is a fixed point —
    the property that makes it safe as a storage key (re-canonicalizing a
    stored key on a later ingest never changes it). Checked over a grid
    of structured url parts in ONE Spark pass."""
    schemes = ["https", "HTTP", "ftp"]
    hosts = ["www.a.com", "www.www.a.com", "A.com:443", "a.com:80",
             "sub.www.b.org:8080"]
    paths = ["", "/", "/x/", "/x/y"]
    queries = ["", "?b=2&a=1", "?utm_source=s", "?b=2&utm_medium=m&a=1&a=1"]
    frags = ["", "#f"]
    urls = [
        f"{s}://{h}{p}{q}{fr}"
        for s in schemes for h in hosts for p in paths
        for q in queries for fr in frags
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        canonicalize_url(F.col("url")).alias("c1"),
        canonicalize_url(canonicalize_url(F.col("url"))).alias("c2"),
    ).collect()
    bad = [(r["c1"], r["c2"]) for r in out if r["c1"] != r["c2"]]
    assert not bad, bad[:5]
    assert len(out) == len(urls)


def test_domain_blocklist_matching(spark):
    """UT1-style blocklist: exact host and any-subdomain matching through
    the www./port/userinfo normalizations; lookalike hosts (notbad.com vs
    bad.com) never match; NULL/invalid urls are never blocked and survive
    the filter."""
    from pyspark.sql import functions as F

    from validate_xml_rust_spark.functions.urlnorm import (
        domain_blocklist_filter,
        domain_blocklist_flags,
    )

    rows = [
        (0, "https://bad.com/x"),                 # exact
        (1, "https://www.bad.com:443/x"),         # www + port strip
        (2, "http://a.b.bad.com/x"),              # deep subdomain
        (3, "https://notbad.com/x"),              # suffix lookalike: clean
        (4, "https://user:pw@bad.com/x"),         # userinfo strip
        (5, "https://good.org/x"),                # clean
        (6, None),                                # NULL url: never blocked
        (7, "not a url"),                         # unparsable: never blocked
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    bl = spark.createDataFrame([("bad.com",)], "domain string")
    got = {
        r["id"]: r["blocked"]
        for r in domain_blocklist_flags(df, bl).collect()
    }
    assert got == {0: True, 1: True, 2: True, 3: False, 4: True,
                   5: False, 6: False, 7: False}
    kept = {r["id"] for r in domain_blocklist_filter(df, bl).collect()}
    assert kept == {3, 5, 6, 7}
    # blocklist entries are case-normalized too
    bl2 = spark.createDataFrame([("BAD.com",)], "domain string")
    assert {
        r["id"]
        for r in domain_blocklist_flags(df, bl2).filter(F.col("blocked")).collect()
    } == {0, 1, 2, 4}


def test_license_signals(spark):
    from pyspark.sql import functions as F

    from validate_xml_rust_spark.operators.textstats import license_signals

    rows = [
        (0, '<a rel="license" href="https://creativecommons.org/licenses/by/4.0/">x</a>'),
        (1, '<A REL="LICENSE" HREF="HTTPS://CREATIVECOMMONS.ORG/LICENSES/BY-SA/3.0/">y</A>'),
        (2, "<a rel='license' href='https://example.com/tos'>terms</a>"),
        (3, '<a href="https://creativecommons.org/publicdomain/zero/1.0/">cc0</a>'),
        (4, "<p>plain page</p>"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r["doc_id"]: (r["has_license_rel"], r["cc_license"], r["license_ok"])
        for r in license_signals(df, allow=("cc-by-4.0", "cc0-1.0")).collect()
    }
    assert got[0] == (True, "cc-by-4.0", True)
    assert got[1] == (True, "cc-by-sa-3.0", False)  # case-insensitive
    assert got[2] == (True, None, False)            # rel without CC URL
    assert got[3] == (False, "cc0-1.0", True)
    assert got[4] == (False, None, False)
    assert got[5] == (False, None, False)           # NULL html


def test_robots_exclusion_composes_with_blocklist(spark):
    from pyspark.sql import functions as F

    from validate_xml_rust_spark.functions.urlnorm import (
        domain_blocklist_flags,
        robots_exclusion_flags,
    )

    urls = spark.createDataFrame(
        [
            ("https://a.example.com/1",),
            ("https://b.example.org/2",),
            ("https://sub.b.example.org/3",),
            ("https://c.example.net/4",),
            (None,),
        ],
        "url string",
    )
    bl = spark.createDataFrame([("a.example.com",)], "domain string")
    rb = spark.createDataFrame(
        [("a.example.com",), ("b.example.org",)], "domain string"
    )
    out = robots_exclusion_flags(domain_blocklist_flags(urls, bl), rb)
    got = {
        r["url"]: (r["blocked"], r["robots_excluded"]) for r in out.collect()
    }
    assert got["https://a.example.com/1"] == (True, True)       # both
    assert got["https://b.example.org/2"] == (False, True)      # robots only
    assert got["https://sub.b.example.org/3"] == (False, True)  # subdomain
    assert got["https://c.example.net/4"] == (False, False)
    assert got[None] == (False, False)                          # NULL url
