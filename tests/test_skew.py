"""Salted two-phase aggregation: equivalence with the naive plan + host
stats over the skewed pages table."""

from __future__ import annotations

from pyspark.sql import functions as F

from validate_xml_rust_spark.operators.skew import host_stats_salted, salted_agg
from validate_xml_rust_spark.sources.pages import HOT_HOST, pages


def test_salted_agg_matches_naive(spark):
    df = spark.createDataFrame(
        [(k, float(v)) for k in ("a", "b") for v in range(100)]
        + [("hot", float(v)) for v in range(500)],
        "k string, v double",
    )
    salted = {
        r["k"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in salted_agg(
            df, ["k"],
            [("count", None, "n"), ("sum", "v", "s"), ("min", "v", "lo"), ("max", "v", "hi")],
            n_salts=8,
        ).collect()
    }
    naive = {
        r["k"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
             F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    }
    assert salted == naive


def test_host_stats_on_skewed_pages(spark):
    df = pages(spark, 5000)
    stats = {r["host"]: r for r in host_stats_salted(df).collect()}
    hot = stats[HOT_HOST]
    # ~40% of urls on the hot host (generator plants the skew)
    assert 0.3 * 5000 < hot["n_pages"] < 0.5 * 5000
    # approx distinct within 10% of exact
    exact = (
        df.filter(F.col("url").contains(HOT_HOST)).select("url").distinct().count()
    )
    assert abs(hot["approx_distinct_urls"] - exact) / exact < 0.1
    assert hot["first_ts"] is not None and hot["last_ts"] >= hot["first_ts"]


def test_uniqueness_violations_broadcast_escape_hatch(spark):
    from validate_xml_rust_spark.operators.uniqueness import uniqueness_violations

    df = spark.createDataFrame(
        [("u1", "k1"), ("u2", "k1"), ("u3", "k2")], "url string, k string"
    )
    bc = uniqueness_violations(df, ["k"])
    nobc = uniqueness_violations(df, ["k"], broadcast=False)
    assert sorted(r["url"] for r in nobc.collect()) == ["u1", "u2"]
    assert "BroadcastHashJoin" in bc._jdf.queryExecution().executedPlan().toString()
    # escape hatch: no FORCED broadcast hint — the static plan is a shuffle
    # join on the uniform key (AQE may still pick broadcast at runtime when
    # the dup set measures tiny, which is exactly the desired adaptivity;
    # the hatch exists for corpora where it does not)
    static_plan = nobc._jdf.queryExecution().sparkPlan().toString()
    joins = [ln for ln in static_plan.splitlines() if "Join" in ln and "k#" in ln]
    assert all("BroadcastHashJoin" not in ln for ln in joins), static_plan


def test_bloom_prepass_exact_and_selective(spark):
    """bloom=True must (a) produce the exact same dup set as the plain
    path and (b) send only a small suspected fraction of a low-dup corpus
    into the groupBy shuffle (SCALE.md §3 mitigation (a), now real)."""
    from validate_xml_rust_spark.operators.uniqueness import duplicate_keys

    n = 50_000
    base = spark.range(n).selectExpr("concat('k', id) as k")
    dups = spark.range(20).selectExpr("concat('k', id * 977) as k")
    df = base.unionByName(dups).repartition(8)

    stats: dict = {}
    with_bloom = {
        (r["k"], r["n_dup"])
        for r in duplicate_keys(df, ["k"], bloom=True, stats=stats).collect()
    }
    plain = {
        (r["k"], r["n_dup"]) for r in duplicate_keys(df, ["k"]).collect()
    }
    assert with_bloom == plain and len(plain) == 20
    # the shuffle input shrank from the full corpus to the suspects
    assert stats["total_rows"] == n + 20
    assert stats["suspected_rows"] < 0.02 * n, stats


def test_bloom_prepass_catches_cross_partition_and_null_dups(spark):
    from validate_xml_rust_spark.operators.uniqueness import duplicate_keys

    # every dup pair straddles partitions; plus a null-key pair (matches
    # the plain path's null-group semantics)
    a = spark.range(1000).selectExpr("concat('x', id) as k").coalesce(1)
    b = spark.range(990, 1010).selectExpr(
        "CASE WHEN id < 1000 THEN concat('x', id) END as k"
    ).coalesce(1)
    df = a.unionByName(b)
    got = {
        (r["k"], r["n_dup"])
        for r in duplicate_keys(df, ["k"], bloom=True).collect()
    }
    want = {
        (r["k"], r["n_dup"]) for r in duplicate_keys(df, ["k"]).collect()
    }
    assert got == want
    assert (None, 10) in got  # ids 1000-1009 → 10 NULL keys, one group


def test_frequent_values_skewed_column(spark):
    """frequent_values on a Zipf-ish column: matches a plain groupBy
    top-k (values + counts + deterministic tie-break), NULLs excluded,
    and the global top-k plans as TakeOrdered (no full-sort shuffle of
    the distinct-value table)."""
    from pyspark.sql import functions as F

    from validate_xml_rust_spark.operators.profile import frequent_values

    # hot value 'a' (500 rows), then b=200, c=200 (tie → value asc), d=50,
    # plus nulls that must not appear
    rows = (
        [("a",)] * 500 + [("b",)] * 200 + [("c",)] * 200 + [("d",)] * 50
        + [(None,)] * 25
    )
    df = spark.createDataFrame(rows, "v string").repartition(8)
    top = frequent_values(df, "v", k=3)
    got = [(r["value"], r["n"], r["rank"]) for r in top.orderBy("rank").collect()]
    assert got == [("a", 500, 1), ("b", 200, 2), ("c", 200, 3)]
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # two-phase salted count: both aggregation phases present
    analyzed = top._jdf.queryExecution().analyzed().toString()
    assert "__salt" in analyzed
