"""Scan-source filters (S1-S5) + spec loader / cache (S6/S7/P2/P4/P5/A7/F7)."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from validate_xml_rust_spark.sources.scan import (
    extension_filter,
    glob_filters,
    glob_to_regex,
    max_depth_filter,
    read_pages_dir,
    single_url,
)
from validate_xml_rust_spark.sources.spec_loader import (
    SpecCache,
    SpecLoadError,
    cache_key,
    classify_source,
    fetch_remote,
    load_spec,
    validate_spec_content,
)

URLS = [
    ("https://a.com/docs/x.xml",),
    ("https://a.com/docs/y.XML",),
    ("https://a.com/docs/z.txt",),
    ("https://a.com/noext",),
    ("https://a.com/a/b/c/d/deep.xml",),
    ("https://b.com/skip/me.xml",),
]


@pytest.fixture()
def urls_df(spark):
    return spark.createDataFrame(URLS, "url string")


def test_extension_filter(urls_df):
    # case-insensitive extension set; extension-less rejected
    got = {r["url"] for r in extension_filter(urls_df, ["xml"]).collect()}
    assert got == {
        "https://a.com/docs/x.xml",
        "https://a.com/docs/y.XML",
        "https://a.com/a/b/c/d/deep.xml",
        "https://b.com/skip/me.xml",
    }


def test_glob_filters_exclude_wins(urls_df):
    out = glob_filters(
        urls_df,
        include=["**a.com/**"],
        exclude=["**/skip/**", "**.txt"],
    )
    got = {r["url"] for r in out.collect()}
    assert "https://b.com/skip/me.xml" not in got
    assert "https://a.com/docs/z.txt" not in got
    assert "https://a.com/docs/x.xml" in got


def test_glob_to_regex():
    assert glob_to_regex("*.xml") == r"^[^/]*\.xml$"
    import re

    assert re.match(glob_to_regex("**/skip/**"), "https://b.com/skip/me.xml")
    assert not re.match(glob_to_regex("*.xml"), "a/b.xml")  # * not crossing /


def test_max_depth_and_single(urls_df):
    shallow = {r["url"] for r in max_depth_filter(urls_df, 2).collect()}
    assert "https://a.com/a/b/c/d/deep.xml" not in shallow
    assert "https://a.com/docs/x.xml" in shallow
    one = single_url(urls_df, "https://a.com/noext").collect()
    assert len(one) == 1


def test_read_pages_dir_recursive(spark, tmp_path):
    from validate_xml_rust_spark.sources.pages import pages

    p1 = str(tmp_path / "root" / "a")
    p2 = str(tmp_path / "root" / "a" / "nested")
    pages(spark, 50).write.parquet(p1)
    pages(spark, 30).write.parquet(p2)
    df = read_pages_dir(spark, str(tmp_path / "root"), path_glob="*.parquet")
    assert df.count() == 80  # recursive listing found both levels


# --- spec loader ---

SPEC_DICT = {
    "spec_id": "loaded-v1",
    "constraints": [
        {"constraint_id": "u", "column": "url", "kind": "not_null"},
    ],
}


def test_classify_source():
    assert classify_source("https://x/spec.json") == "remote"
    assert classify_source("HTTP://x/spec.json") == "remote"
    assert classify_source("/tmp/spec.json") == "local"


def test_content_sanity_checks():
    ok = validate_spec_content(json.dumps(SPEC_DICT).encode())
    assert ok["spec_id"] == "loaded-v1"
    with pytest.raises(SpecLoadError, match="UTF-8"):
        validate_spec_content(b"\xff\xfe{}")
    with pytest.raises(SpecLoadError, match="JSON object"):
        validate_spec_content(b"<xml/>")
    with pytest.raises(SpecLoadError, match="not valid JSON"):
        validate_spec_content(b"{broken")
    with pytest.raises(SpecLoadError, match="missing required"):
        validate_spec_content(b'{"foo": 1}')


def test_load_local_spec(tmp_path):
    p = tmp_path / "spec.json"
    p.write_text(json.dumps(SPEC_DICT))
    spec = load_spec(str(p))
    assert spec.spec_id == "loaded-v1" and len(spec.constraints) == 1
    with pytest.raises(SpecLoadError, match="not found"):
        load_spec(str(tmp_path / "missing.json"))


def test_fetch_remote_retries_with_backoff():
    calls = {"n": 0}

    def flaky(url: str) -> bytes:
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("boom")
        return b"ok"

    t0 = time.perf_counter()
    assert fetch_remote("https://x/spec.json", base_delay_s=0.05, _opener=flaky) == b"ok"
    elapsed = time.perf_counter() - t0
    assert calls["n"] == 3
    assert elapsed >= 0.05 + 0.10  # backoff doubled: 0.05 then 0.1

    def always_fails(url: str) -> bytes:
        raise OSError("down")

    with pytest.raises(SpecLoadError, match="after 2 retries"):
        fetch_remote("https://x/s.json", max_retries=2, base_delay_s=0.01, _opener=always_fails)


def test_cache_two_tier_and_ttl(tmp_path):
    cache = SpecCache(str(tmp_path / "c"), ttl_s=0.4)
    url = "https://x/spec.json"
    assert cache.get(url) is None  # miss
    cache.set(url, b"payload")
    assert cache.get(url) == b"payload"  # L1 hit
    # drop L1 → next get repopulates from disk
    cache._mem.clear()
    assert cache.get(url) == b"payload"
    assert cache_key(url) in {p.stem for p in (tmp_path / "c").iterdir()}
    # TTL expiry
    time.sleep(0.5)
    assert cache.get(url) is None
    assert cache.cleanup_expired() == 1
    stats = cache.stats()
    assert stats["disk_entries"] == 0
    assert 0 < stats["hit_rate"] < 1


def test_load_spec_uses_cache(tmp_path):
    calls = {"n": 0}

    def opener(url: str) -> bytes:
        calls["n"] += 1
        return json.dumps(SPEC_DICT).encode()

    cache = SpecCache(str(tmp_path / "c2"), ttl_s=60)
    s1 = load_spec("https://x/spec.json", cache=cache, _opener=opener)
    s2 = load_spec("https://x/spec.json", cache=cache, _opener=opener)
    assert calls["n"] == 1  # single-flight: second load served from cache
    assert s1.spec_id == s2.spec_id == "loaded-v1"
