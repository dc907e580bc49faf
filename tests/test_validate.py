"""Per-row verdict suite — mirrors the reference's per-file test cases
(FIXTURES.md §7; reference src/validator.rs tests at 932-1268)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from validate_xml_rust_spark import Constraint, Spec, SpecRegistry
from validate_xml_rust_spark.operators.summary import exit_code, summarize
from validate_xml_rust_spark.operators.validate import validate

PAGE_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _spec() -> Spec:
    return Spec(
        "webpage-v1",
        (
            Constraint("url_not_null", "url", "not_null"),
            Constraint("url_format", "url", "regex", {"pattern": r"^https?://.*"}),
            Constraint("html_utf8", "html", "utf8", severity="error"),
            Constraint("text_len", "text", "length", {"lo": 1, "hi": 10_000}),
        ),
    )


def _registry() -> SpecRegistry:
    return SpecRegistry().add(_spec(), route_keys=["en", "de"])


def _rows(spark, rows):
    return spark.createDataFrame(rows, PAGE_SCHEMA)


def _verdict(spark, row, registry=None, **kw):
    df = _rows(spark, [row])
    res = validate(df, spark, registry or _registry(), **kw)
    return res.verdicts.collect()[0]


GOOD = ("https://a.example.com/1", None, b"<p>hi</p>", "hi", "en")


def test_valid_row(spark):
    # reference: valid local schema → Valid (src/validator.rs:1041-1081)
    v = _verdict(spark, GOOD)
    assert v["status"] == "valid"
    assert v["error_count"] == 0
    assert v["error_details"] == []
    assert v["spec_id"] == "webpage-v1"


def test_invalid_row_error_count(spark):
    # two failed constraints → Invalid{error_count=2} (src/validator.rs:713-719)
    v = _verdict(spark, (None, None, b"<p>hi</p>", "", "en"))
    assert v["status"] == "invalid"
    assert v["error_count"] == 2  # url_not_null + text_len (url_format null-guarded)
    assert len(v["error_details"]) == 2


def test_no_spec_resolvable_skipped(spark):
    # no schema URL found → Skipped (src/validator.rs:626-643, 1024-1038)
    v = _verdict(spark, ("https://a/1", None, b"x", "x", "zz"))
    assert v["status"] == "skipped"
    assert v["error_details"] == ["No spec resolved for row"]
    # null routing key also skips
    v2 = _verdict(spark, ("https://a/1", None, b"x", "x", None))
    assert v2["status"] == "skipped"


def test_missing_spec_error(spark):
    # routed to a spec_id absent from registry → Error (src/validator.rs:1084-1099)
    reg = _registry().add_route("fr", "missing-spec-v9")
    v = _verdict(spark, ("https://a/1", None, b"x", "x", "fr"), registry=reg)
    assert v["status"] == "error"
    assert "spec not found in registry: missing-spec-v9" in v["error_details"][0]


def test_garbage_input_error_run_continues(spark):
    # non-UTF-8 html amid clean rows → that row Error, others unaffected
    # (error containment, src/validator.rs:699-730)
    rows = [GOOD, ("https://a/2", None, b"\xff\xfe<p>", "x", "en"), GOOD]
    res = validate(_rows(spark, rows), spark, _registry())
    statuses = [r["status"] for r in res.verdicts.collect()]
    assert sorted(statuses) == ["error", "valid", "valid"]


def test_error_precedence_over_invalid(spark):
    # a row that is both unreadable and constraint-violating → error wins
    v = _verdict(spark, (None, None, b"\xff", "", "en"))
    assert v["status"] == "error"


def test_spec_override(spark):
    # --schema global override ignores routing (src/validator.rs:1210-1268)
    strict = Spec("strict-v1", (Constraint("always", "url", "regex", {"pattern": "^ftp://"}),))
    reg = _registry().add(strict)
    v = _verdict(spark, GOOD, registry=reg, override_spec_id="strict-v1")
    assert v["spec_id"] == "strict-v1"
    assert v["status"] == "invalid"
    # and a row that would otherwise be skipped is now validated
    v2 = _verdict(
        spark, ("https://a/1", None, b"x", "x", "zz"), registry=reg,
        override_spec_id="webpage-v1",
    )
    assert v2["status"] == "valid"


def test_empty_input(spark):
    # empty input → zero counts, success_rate 0 (src/validator.rs:983-991)
    df = _rows(spark, []).limit(0)
    res = validate(df, spark, _registry())
    row = summarize(res.verdicts).collect()[0]
    assert row["total"] == 0
    assert row["success_rate"] == 0.0
    assert exit_code(row.asDict()) == 0


def test_aggregation_math(spark):
    # 5-row mix → counts (2 valid,1 invalid,1 error,1 skipped), 40% rate,
    # 2 distinct specs (src/validator.rs:932-980)
    other = Spec("other-v1", (Constraint("u", "url", "not_null"),))
    reg = _registry().add(other, route_keys=["fr"])
    rows = [
        GOOD,
        ("https://a/2", None, b"<p>ok</p>", "ok", "fr"),  # valid via other-v1
        ("ftp://bad", None, b"x", "x", "en"),  # invalid (url_format)
        ("https://a/3", None, b"\xff", "x", "en"),  # error (utf8)
        ("https://a/4", None, b"x", "x", "zz"),  # skipped
    ]
    res = validate(_rows(spark, rows), spark, reg)
    row = summarize(res.verdicts).collect()[0]
    assert (row["total"], row["valid"], row["invalid"], row["error"], row["skipped"]) == (5, 2, 1, 1, 1)
    assert row["success_rate"] == pytest.approx(40.0)
    assert row["schemas_used"] == ["other-v1", "webpage-v1"]
    d = row.asDict()
    assert exit_code(d) == 2  # error wins over invalid (src/main.rs:115-118)
    assert exit_code(d, fail_fast=True) == 1


def test_partitioned_equivalence(spark):
    # same rows at 1 vs 4 partitions → identical verdicts
    # (concurrent-run equivalence, src/validator.rs:1102-1141)
    rows = [
        GOOD,
        ("https://a/2", None, b"\xff", "x", "en"),
        ("ftp://bad", None, b"x", "x", "de"),
        ("https://a/4", None, b"x", "x", "zz"),
        (None, None, b"x", "x", "en"),
    ]
    df1 = _rows(spark, rows).repartition(1)
    df4 = _rows(spark, rows).repartition(4)
    reg = _registry()
    get = lambda df: sorted(  # noqa: E731
        (r["url"] or "", r["status"], r["error_count"])
        for r in validate(df, spark, reg).verdicts.collect()
    )
    assert get(df1) == get(df4)


def test_violation_rows_contract(spark):
    rows = [("ftp://bad", None, b"x", "", "en")]
    res = validate(_rows(spark, rows), spark, _registry())
    viols = res.violations().orderBy("constraint_id").collect()
    assert [(v["constraint_id"], v["observed_value"]) for v in viols] == [
        ("text_len", "0"),
        ("url_format", "ftp://bad"),
    ]
    assert set(res.violations().columns) == {
        "url", "partition_id", "constraint_id", "observed_value", "message",
    }


def test_exit_codes_all_valid(spark):
    res = validate(_rows(spark, [GOOD, GOOD]), spark, _registry())
    assert exit_code(summarize(res.verdicts).collect()[0].asDict()) == 0


def test_invalid_only_exit_3(spark):
    res = validate(_rows(spark, [("ftp://x", None, b"x", "x", "en")]), spark, _registry())
    assert exit_code(summarize(res.verdicts).collect()[0].asDict()) == 3


def test_broadcast_join_in_plan(spark):
    # spec resolution must be a broadcast join (SURVEY.md §2.3 J1)
    df = _rows(spark, [GOOD])
    res = validate(df, spark, _registry())
    plan = res.verdicts._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_fd_violations_semantics(spark):
    """X → Y check: NULL dependent is a real binding; NULL determinant is
    excluded; satisfied keys don't report; examples are sorted+bounded."""
    from pyspark.sql import functions as F

    from validate_xml_rust_spark.operators.profile import fd_violations

    df = spark.createDataFrame(
        [
            ("us-ca", "CA"), ("us-ca", "CA"),          # satisfied FD
            ("us-ny", "NY"), ("us-ny", None),          # NULL is a 2nd binding
            ("us-tx", "TX"), ("us-tx", "AZ"), ("us-tx", "NM"), ("us-tx", "OK"),
            (None, "XX"), (None, "YY"),                # no key identity
        ],
        "zip string, state string",
    )
    rows = {r["zip"]: r for r in fd_violations(df, "zip", "state").collect()}
    assert set(rows) == {"us-ny", "us-tx"}
    ny = rows["us-ny"]
    assert ny["n_dependent_values"] == 2 and ny["n_rows"] == 2
    assert ny["example_values"] == ["<null>", "NY"]
    tx = rows["us-tx"]
    assert tx["n_dependent_values"] == 4 and tx["n_rows"] == 4
    assert tx["example_values"] == ["AZ", "NM", "OK"]  # sorted, capped at 3
    # multi-column determinant: any NULL part excludes the row
    df2 = spark.createDataFrame(
        [("a", 1, "x"), ("a", 1, "y"), ("a", None, "z")],
        "k1 string, k2 int, y string",
    )
    out2 = fd_violations(df2, ["k1", "k2"], "y").collect()
    assert len(out2) == 1 and out2[0]["n_rows"] == 2


def test_profile_diff_flags_and_schema_evolution(spark):
    from validate_xml_rust_spark.operators.profile import profile, profile_diff

    old_df = spark.createDataFrame(
        [(i, "x" if i % 10 else None) for i in range(100)], "a long, b string"
    )
    # new snapshot: b's null rate triples; column c appears, a disappears
    new_df = spark.createDataFrame(
        [(("x" if i % 10 >= 3 else None), float(i)) for i in range(100)],
        "b string, c double",
    )
    d = {
        (r["column_name"], r["metric"]): r
        for r in profile_diff(
            profile(old_df, exact=True), profile(new_df, exact=True)
        ).collect()
    }
    nb = d[("b", "null_rate")]
    assert nb["old_value"] == 0.1 and nb["new_value"] == 0.3
    assert nb["rel_change"] == 2.0 and nb["flagged"] is True
    assert d[("b", "n_distinct")]["flagged"] is False  # 1 == 1
    # schema evolution: one-sided rows are always flagged, rel_change NULL
    assert d[("a", "null_rate")]["new_value"] is None
    assert d[("a", "null_rate")]["flagged"] is True
    assert d[("c", "n_distinct")]["old_value"] is None
    assert d[("c", "n_distinct")]["flagged"] is True
    assert d[("c", "n_distinct")]["rel_change"] is None


def test_referential_composite_keys(spark):
    from validate_xml_rust_spark.operators.referential import (
        referential_violations,
    )

    child = spark.createDataFrame(
        [("r1", "a", 1), ("r2", "a", 2), ("r3", "b", 1),
         ("r4", None, 1), ("r5", "a", None)],
        "url string, k1 string, k2 int",
    )
    parent = spark.createDataFrame(
        [("a", 1), ("b", 1)], "p1 string, p2 int"
    )
    v = referential_violations(
        child, parent, ["k1", "k2"], ["p1", "p2"], "fk", broadcast=True
    ).collect()
    # only ("a",2) violates; any-null component rows are not checkable
    assert [(r["url"], r["observed_value"]) for r in v] == [("r2", "a|2")]
    assert "k1|k2 not found in parent p1|p2" in v[0]["message"]


def test_numeric_percentiles_sketch_vs_exact(spark):
    from validate_xml_rust_spark.operators.profile import numeric_percentiles

    df = spark.range(0, 20_000).select(
        (F.col("id") % 1000).cast("double").alias("v"),
        (F.col("id") * 7 % 113).cast("double").alias("w"),
    )
    exact = {
        (r["column_name"], r["p"]): r["value"]
        for r in numeric_percentiles(df, ["v", "w"], exact=True).collect()
    }
    approx = {
        (r["column_name"], r["p"]): r["value"]
        for r in numeric_percentiles(df, ["v", "w"]).collect()
    }
    assert set(exact) == set(approx) == {
        (c, p) for c in ("v", "w") for p in (0.5, 0.9, 0.99)
    }
    # GK sketch at accuracy=10k over 20k rows: within ~2 ranks of exact
    for k, ev in exact.items():
        col = k[0]
        spread = 1000 if col == "v" else 113
        assert abs(approx[k] - ev) <= spread * 0.005 + 2, (k, ev, approx[k])


def test_verdict_diff_transitions(spark):
    from validate_xml_rust_spark.operators.summary import verdict_diff

    old = spark.createDataFrame(
        [("a", "valid"), ("b", "invalid"), ("c", "valid"), ("d", "error"),
         ("gone", "valid"), (None, "invalid")],
        "url string, status string",
    )
    new = spark.createDataFrame(
        [("a", "valid"),            # unchanged → dropped
         ("b", "valid"),            # fixed
         ("c", "invalid"),          # regressed
         ("d", "skipped"),          # changed (non-valid → non-valid)
         ("fresh", "valid"),        # added
         (None, "error")],          # NULL id → excluded both sides
        "url string, status string",
    )
    got = {r["url"]: r["transition"] for r in verdict_diff(old, new).collect()}
    assert got == {
        "b": "fixed", "c": "regressed", "d": "changed",
        "fresh": "added", "gone": "removed",
    }
    # identity: diff of a run against itself is empty
    assert verdict_diff(new, new).count() == 0


def test_verdict_diff_duplicate_ids_deterministic(spark):
    """Duplicate ids reduce to their WORST status before diffing, so the
    result is partition/execution-invariant and diff(x, x) stays empty."""
    from validate_xml_rust_spark.operators.summary import verdict_diff

    dup = spark.createDataFrame(
        [("u", "valid"), ("u", "invalid"), ("u", "skipped"),
         ("w", "error"), ("w", "valid")],
        "url string, status string",
    )
    assert verdict_diff(dup, dup).count() == 0
    assert verdict_diff(dup.repartition(8), dup.repartition(1)).count() == 0
    clean = spark.createDataFrame(
        [("u", "valid"), ("w", "valid")], "url string, status string"
    )
    got = {r["url"]: (r["old_status"], r["transition"])
           for r in verdict_diff(dup, clean).collect()}
    # worst-of-duplicates is the old side: u=invalid, w=error — both fixed
    assert got == {"u": ("invalid", "fixed"), "w": ("error", "fixed")}


def test_verdict_diff_unknown_and_null_statuses(spark):
    """Arbitrary verdict frames (older parquet) may carry statuses outside
    the 4-state vocabulary, or NULL: the diff must not crash (the old
    element_at(_, 0) path threw), must rank them WORSE than error, and
    must not mislabel an all-NULL-status id as added/removed."""
    from validate_xml_rust_spark.operators.summary import verdict_diff

    old = spark.createDataFrame(
        [("a", "valid"), ("b", "mystery"), ("c", None), ("d", "error"),
         ("d", "mystery")],
        "url string, status string",
    )
    new = spark.createDataFrame(
        [("a", "mystery"),   # valid → unknown: regressed (unknown ≠ valid)
         ("b", "valid"),     # unknown → valid: fixed
         ("c", "valid"),     # NULL ('unknown') → valid: fixed, NOT added
         ("d", "error")],    # worst-of-dup old side is 'mystery' → changed
        "url string, status string",
    )
    got = {r["url"]: (r["old_status"], r["new_status"], r["transition"])
           for r in verdict_diff(old, new).collect()}
    assert got == {
        "a": ("valid", "mystery", "regressed"),
        "b": ("mystery", "valid", "fixed"),
        "c": ("unknown", "valid", "fixed"),
        "d": ("mystery", "error", "changed"),
    }
    # identity still holds with unknown/NULL statuses in play
    assert verdict_diff(old, old).count() == 0
    assert verdict_diff(old.repartition(8), old.repartition(1)).count() == 0


def test_gopher_constraint_kind(spark):
    good_text = (
        "the quick brown fox jumps over that lazy dog and it runs away "
        "to be of good cheer with friends nearby every single day now "
        "more words keep coming here so the count clears fifty total "
        "easily done with room to spare in this plain english sentence "
        "that keeps going until the word counter is satisfied fully"
    )
    spec = Spec(
        "gopher-v1",
        (Constraint("text_gopher", "text", "gopher", {"min_words": 10}),),
    )
    reg = SpecRegistry().add(spec, route_keys=["en", "de"])
    ok = _verdict(spark, ("https://a/1", None, b"x", good_text, "en"), reg)
    assert ok["status"] == "valid"
    # numeric soup: fails alpha_words + mean_word_len + stop_words —
    # the observed_value names the failing rules
    res = validate(
        _rows(spark, [("https://a/2", None, b"x", "42 " * 30, "en")]),
        spark, reg,
    )
    bad = res.verdicts.collect()[0]
    assert bad["status"] == "invalid"
    viol = res.violations().collect()[0]
    assert "alpha_words" in viol["observed_value"]
    assert "stop_words" in viol["observed_value"]
    assert "mean_word_len" in viol["observed_value"]
    assert "bullet_lines" not in viol["observed_value"]
    # NULL text passes — not_null owns null-ness
    nul = _verdict(spark, ("https://a/3", None, b"x", None, "en"), reg)
    assert nul["status"] == "valid"


def test_c4_constraint_kind(spark):
    good_text = "\n".join(
        ["This line has five good words."] * 3
    )
    spec = Spec(
        "c4-v1",
        (Constraint("text_c4", "text", "c4", {"min_lines": 2}),),
    )
    reg = SpecRegistry().add(spec, route_keys=["en"])
    ok = _verdict(spark, ("https://a/1", None, b"x", good_text, "en"), reg)
    assert ok["status"] == "valid"
    res = validate(
        _rows(
            spark,
            [("https://a/2", None, b"x", "lorem ipsum { no punct", "en")],
        ),
        spark, reg,
    )
    assert res.verdicts.collect()[0]["status"] == "invalid"
    viol = res.violations().collect()[0]
    assert "lorem_ipsum" in viol["observed_value"]
    assert "curly_brace" in viol["observed_value"]
    assert "too_few_kept_lines" in viol["observed_value"]
    # NULL text passes — not_null owns null-ness
    nul = _verdict(spark, ("https://a/3", None, b"x", None, "en"), reg)
    assert nul["status"] == "valid"


def test_corpus_datasheet(spark):
    from validate_xml_rust_spark.operators.profile import corpus_datasheet

    rows = (
        [(i, "hello world " * (1 + i % 3), "en", "web") for i in range(6)]
        + [(10 + i, "bonjour", "fr", "web") for i in range(3)]
        + [(20, None, None, "books")]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    ds = corpus_datasheet(df, probabilities=(0.5,))
    got = {
        (r["section"], r["key"], r["metric"]): r["value"] for r in ds.collect()
    }
    assert got[("corpus", "*", "n_docs")] == 10.0
    assert got[("lang", "en", "n_docs")] == 6.0
    assert got[("lang", "en", "share")] == 0.6
    # NULL group value is its own key, not merged into the ()-row
    assert got[("lang", "__null__", "n_docs")] == 1.0
    assert got[("lang", "__null__", "null_text_frac")] == 1.0
    assert got[("source", "web", "n_docs")] == 9.0
    assert ("corpus", "*", "share") not in got  # definitionally 1, elided
    assert ("length", "0.5", "n_chars_pct") in got
    # ONE grouping-sets aggregation feeds every group section: exactly
    # one Expand in the plan, and no second scan for the share total
    plan = ds._jdf.queryExecution().executedPlan().toString()
    expand_nodes = [
        ln for ln in plan.splitlines() if ln.lstrip(" :+-").startswith("Expand")
    ]
    assert len(expand_nodes) == 1, plan


def test_corpus_datasheet_empty_and_all_null(spark):
    from validate_xml_rust_spark.operators.profile import corpus_datasheet

    schema = "doc_id long, text string, lang string, source string"
    empty = spark.createDataFrame([], schema)
    assert corpus_datasheet(empty).count() == 0  # empty -> empty
    allnull = spark.createDataFrame([(1, None, "en", "web")], schema)
    got = {(r["section"], r["metric"]) for r in corpus_datasheet(allnull).collect()}
    assert ("corpus", "n_docs") in got
    assert not any(s == "length" for s, _ in got)  # no percentile rows


def test_corpus_datasheet_sketch_percentiles(spark):
    """exact=False routes the length section through the GK sketch —
    same schema, rank-tolerant values (scale path at 10^12 rows)."""
    from validate_xml_rust_spark.operators.profile import corpus_datasheet

    df = spark.createDataFrame(
        [(i, "x" * (1 + i % 100), "en", "web") for i in range(2000)],
        "doc_id long, text string, lang string, source string",
    )
    exact = {
        r["key"]: r["value"]
        for r in corpus_datasheet(df).collect()
        if r["section"] == "length"
    }
    approx = {
        r["key"]: r["value"]
        for r in corpus_datasheet(df, exact=False).collect()
        if r["section"] == "length"
    }
    assert set(exact) == set(approx)
    for k in exact:
        assert abs(exact[k] - approx[k]) <= 2.0, (k, exact[k], approx[k])


def test_datasheet_diff_semantics(spark):
    from validate_xml_rust_spark.operators.profile import (
        corpus_datasheet,
        datasheet_diff,
    )

    schema = "doc_id long, text string, lang string, source string"
    old = spark.createDataFrame(
        [(i, "x" * 50, "en" if i % 2 == 0 else "fr", "web") for i in range(40)],
        schema,
    )
    # new snapshot: fr disappears, de appears, en share moves
    new = spark.createDataFrame(
        [(i, "x" * 50, "en" if i % 3 == 0 else "de", "web") for i in range(30)],
        schema,
    )
    d = datasheet_diff(
        corpus_datasheet(old, probabilities=(0.5,)),
        corpus_datasheet(new, probabilities=(0.5,)),
    )
    rows = {(r["section"], r["key"], r["metric"]): r for r in d.collect()}
    gone = rows[("lang", "fr", "n_docs")]
    assert gone["new_value"] is None and gone["flagged"]
    assert gone["rel_change"] is None
    born = rows[("lang", "de", "n_docs")]
    assert born["old_value"] is None and born["flagged"]
    moved = rows[("corpus", "*", "n_docs")]
    assert moved["old_value"] == 40.0 and moved["new_value"] == 30.0
    assert moved["flagged"] and abs(moved["rel_change"] - 0.25) < 1e-9
    stable = rows[("length", "0.5", "n_chars_pct")]
    assert not stable["flagged"]  # identical length distribution
    # diff(x, x) flags nothing
    same = datasheet_diff(
        corpus_datasheet(old, probabilities=(0.5,)),
        corpus_datasheet(old, probabilities=(0.5,)),
    )
    assert same.filter(F.col("flagged")).count() == 0
