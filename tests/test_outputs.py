"""Partitioned result sinks + partition-pruning evidence on the read path."""

from __future__ import annotations

from pyspark.sql import functions as F

from validate_xml_rust_spark.operators.outputs import (
    read_failures,
    read_violations_for,
    write_results,
)
from validate_xml_rust_spark.operators.validate import validate
from validate_xml_rust_spark.plans import inspect
from validate_xml_rust_spark.sources.pages import LANGS, pages, with_partition_id
from validate_xml_rust_spark.specs import Constraint, Spec, SpecRegistry


def test_partitioned_outputs_and_pruning(spark, tmp_path):
    spec = Spec(
        "webpage-v1",
        (
            Constraint("url_not_null", "url", "not_null"),
            Constraint("url_format", "url", "regex", {"pattern": r"^https?://.*"}),
            Constraint("html_utf8", "html", "utf8", severity="error"),
        ),
    )
    reg = SpecRegistry().add(spec, route_keys=LANGS)
    df = with_partition_id(pages(spark, 3000), 8)
    res = validate(df, spark, reg)
    out = str(tmp_path / "results")
    write_results(res.verdicts, res.violations(), out)

    # read-side: status filter becomes a PARTITION filter (pruned scan)
    fails = read_failures(spark, out)
    plan = inspect.formatted_plan(fails)
    assert "PartitionFilters" in plan and "status" in plan
    total = spark.read.parquet(f"{out}/verdicts").count()
    n_fails = fails.count()
    assert total == 3000 and 0 < n_fails < 100

    # per-constraint drill-down reads one directory
    v = read_violations_for(spark, out, "url_format")
    assert v.count() > 0
    assert v.filter(F.col("constraint_id") != "url_format").count() == 0
    vplan = inspect.formatted_plan(v)
    assert "PartitionFilters" in vplan


def test_run_with_progress(spark):
    # progress callback observes task completion during a real action (A8)
    from validate_xml_rust_spark.operators.progress import run_with_progress

    df = with_partition_id(pages(spark, 50_000, 16), 8)
    seen = []
    n = run_with_progress(spark, lambda: df.count(), lambda d, t: seen.append((d, t)))
    assert n == 50_000
    assert seen, "callback never fired"
    d_last, t_last = seen[-1]
    assert d_last == t_last > 0  # reached 100%
    assert all(d2 >= d1 for (d1, _), (d2, _) in zip(seen, seen[1:]))  # monotone

    # errors inside the action propagate to the caller
    import pytest as _pytest

    with _pytest.raises(Exception):
        run_with_progress(
            spark,
            lambda: spark.sql("SELECT assert_true(false)").collect(),
            lambda d, t: None,
        )


def test_quarantine_split_routes_and_writes(spark, tmp_path):
    """quarantine_split: clean rows keep payload and continue; bad rows
    (including NULL-id rows — no join-back) land in the quarantine dir
    partitioned by status with their reasons."""
    from validate_xml_rust_spark.operators.outputs import quarantine_split
    from validate_xml_rust_spark.operators.validate import validate
    from validate_xml_rust_spark.specs import Constraint, Spec, SpecRegistry

    rows = [
        ("https://a.com/1", "en", "good text"),
        (None, "en", "null id row"),            # url_not_null -> invalid
        ("https://a.com/3", "zz", "unrouted"),  # skipped
        ("https://a.com/4", "en", None),        # text_not_null -> invalid
    ]
    df = spark.createDataFrame(rows, "url string, lang string, text string")
    reg = SpecRegistry().add(
        Spec("q-v1", (
            Constraint("url_not_null", "url", "not_null"),
            Constraint("text_not_null", "text", "not_null"),
        )),
        route_keys=["en"],
    )
    res = validate(df, spark, reg, partition_col=None, keep_cols=["lang", "text"])
    qdir = str(tmp_path / "quarantine")
    clean, bad = quarantine_split(res.verdicts, quarantine_dir=qdir)
    clean_rows = clean.collect()
    # clean = the valid row + the skipped row, payload intact
    assert sorted((r["url"], r["lang"]) for r in clean_rows) == [
        ("https://a.com/1", "en"), ("https://a.com/3", "zz"),
    ]
    assert all(r["text"] is not None or r["status"] == "skipped" for r in clean_rows)
    got = spark.read.parquet(qdir)
    bad_rows = got.collect()
    assert len(bad_rows) == 2
    # the NULL-id row is quarantined (a join-back design would lose it)
    assert any(r["url"] is None for r in bad_rows)
    assert all(r["status"] == "invalid" for r in bad_rows)
    assert any("url_not_null" in (r["error_details"] or "") for r in bad_rows)
    # partitioned by status -> pruned read path
    import os
    assert any(d.startswith("status=") for d in os.listdir(qdir))


def test_shard_assignments_deterministic_and_bounded(spark):
    from validate_xml_rust_spark.operators.outputs import shard_assignments

    rows = [(i, "x" * (10 + i % 40)) for i in range(400)] + [(None, "nullid")]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_tokens", F.length("text")
    )
    a, n = shard_assignments(df, tokens_per_shard=1500)
    total = sum(10 + i % 40 for i in range(400)) + 6
    assert n == -(-total // 1500)
    got = {r["doc_id"]: r["shard_id"] for r in a.collect()}
    # every shard id in range; NULL id -> shard 0, never dropped
    assert all(0 <= s < n for s in got.values())
    assert got[None] == 0
    # deterministic across a different partitioning
    b, n2 = shard_assignments(df.repartition(7), tokens_per_shard=1500)
    assert n2 == n
    assert {r["doc_id"]: r["shard_id"] for r in b.collect()} == got
    # pinned n_shards path skips the counting pass and respects the pin
    c, n3 = shard_assignments(df, n_shards=3)
    assert n3 == 3
    assert all(0 <= r["shard_id"] < 3 for r in c.collect())


def test_write_training_shards_roundtrip_and_manifest(spark, tmp_path):
    from validate_xml_rust_spark.operators.outputs import (
        shard_manifest,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i} body " * (1 + i % 5)) for i in range(300)],
        "doc_id long, text string",
    ).withColumn("n_tokens", F.length("text"))
    out = str(tmp_path / "train")
    manifest = write_training_shards(df, out, tokens_per_shard=2000)
    m = {r["shard_id"]: r for r in manifest.collect()}
    import os

    # layout: one parquet file per shard directory (repartitioned write)
    sdirs = [d for d in os.listdir(f"{out}/shards") if d.startswith("shard_id=")]
    assert len(sdirs) == len(m)
    for d in sdirs:
        parts = [
            f for f in os.listdir(f"{out}/shards/{d}") if f.endswith(".parquet")
        ]
        assert len(parts) == 1, f"{d} has {len(parts)} files"
    # read-back equals input; per-shard counts match the manifest
    back = spark.read.parquet(f"{out}/shards")
    assert back.count() == 300
    per = {
        r["shard_id"]: (r["nd"], r["nt"])
        for r in back.groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("nd"), F.sum("n_tokens").alias("nt"))
        .collect()
    }
    assert per == {k: (v["n_docs"], v["n_tokens"]) for k, v in m.items()}
    # manifest sink agrees with the returned frame, checksum included
    stored = spark.read.parquet(f"{out}/manifest")
    assert {
        (r["shard_id"], r["n_docs"], r["n_tokens"], r["content_sum"])
        for r in stored.collect()
    } == {(k, v["n_docs"], v["n_tokens"], v["content_sum"]) for k, v in m.items()}
    # checksum is content-sensitive: perturbing one doc's text moves
    # exactly that doc's shard checksum, counts unchanged
    df2 = df.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.lit("tampered")).otherwise(F.col("text")),
    )
    from validate_xml_rust_spark.operators.outputs import shard_assignments

    s2, _ = shard_assignments(df2, tokens_per_shard=2000)
    m2 = {
        r["shard_id"]: r for r in shard_manifest(s2, 2000).collect()
    }
    changed = [k for k in m if m[k]["content_sum"] != m2[k]["content_sum"]]
    hit = s2.filter(F.col("doc_id") == 7).collect()[0]["shard_id"]
    assert changed == [hit]
    assert all(m[k]["n_docs"] == m2[k]["n_docs"] for k in m)


def test_append_training_shards_incremental(spark, tmp_path):
    from validate_xml_rust_spark.operators.outputs import (
        append_training_shards,
        shard_assignments,
        shard_manifest,
        write_training_shards,
    )

    def mk(lo, hi):
        return spark.createDataFrame(
            [(i, f"doc {i} body " * (1 + i % 5)) for i in range(lo, hi)],
            "doc_id long, text string",
        ).withColumn("n_tokens", F.length("text"))

    out = str(tmp_path / "train")
    m0 = write_training_shards(mk(0, 300), out, tokens_per_shard=2000)
    n0 = int(m0.select("n_shards").first()["n_shards"])
    import os

    def file_listing():
        got = {}
        for d in os.listdir(f"{out}/shards"):
            if d.startswith("shard_id="):
                got[d] = sorted(
                    f
                    for f in os.listdir(f"{out}/shards/{d}")
                    if f.endswith(".parquet")
                )
        return got

    before = file_listing()
    batch = mk(300, 340)
    m1 = append_training_shards(batch, out, tokens_per_shard=2000)
    # n_shards pinned: existing docs never moved shards
    assert {int(r["n_shards"]) for r in m1.collect()} == {n0}
    back = spark.read.parquet(f"{out}/shards")
    assert back.count() == 340
    # assignment identical to a pinned-n assignment over the union
    expect, _ = shard_assignments(mk(0, 340), n_shards=n0)
    exp = {r["doc_id"]: r["shard_id"] for r in expect.collect()}
    assert {r["doc_id"]: r["shard_id"] for r in back.collect()} == exp
    # untouched shard directories kept their exact files (no rewrite)
    touched = {
        f"shard_id={r['shard_id']}"
        for r in shard_assignments(batch, n_shards=n0)[0]
        .select("shard_id")
        .distinct()
        .collect()
    }
    after = file_listing()
    for d, files in before.items():
        if d not in touched:
            assert after[d] == files, f"untouched {d} was rewritten"
    # refreshed manifest == a from-scratch manifest over the union
    fresh = {
        r["shard_id"]: (r["n_docs"], r["n_tokens"], r["content_sum"])
        for r in shard_manifest(expect, 2000).collect()
    }
    assert {
        r["shard_id"]: (r["n_docs"], r["n_tokens"], r["content_sum"])
        for r in m1.collect()
    } == fresh
    # empty batch: no-op, same manifest back
    m2 = append_training_shards(
        mk(0, 0), out, tokens_per_shard=2000
    )
    assert m2.count() == m1.count()


def test_verify_shards_detects_tamper_and_drift(spark, tmp_path):
    import glob
    import os

    import pyarrow.parquet as pq

    from validate_xml_rust_spark.operators.outputs import (
        verify_shards,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i} body " * (1 + i % 4)) for i in range(200)],
        "doc_id long, text string",
    ).withColumn("n_tokens", F.length("text"))
    out = str(tmp_path / "train")
    write_training_shards(df, out, tokens_per_shard=1500)

    v0 = verify_shards(spark, out, 1500)
    assert {r["status"] for r in v0.collect()} == {"valid"}

    # tamper: rewrite one shard file with a modified text payload
    victim = sorted(glob.glob(f"{out}/shards/shard_id=*/*.parquet"))[0]
    tbl = pq.read_table(victim).to_pandas()
    tbl.loc[0, "text"] = "tampered payload"
    # keep n_tokens as-is: only the checksum should trip
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(tbl, preserve_index=False), victim)
    # drop Hadoop's local-FS .crc sidecar: it would flag the rewrite at
    # the byte layer before our checksum runs (object stores, where the
    # corpus actually lives, have no such sidecar — the manifest
    # checksum is the audit there)
    crc = os.path.join(
        os.path.dirname(victim), "." + os.path.basename(victim) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    victim_shard = int(victim.split("shard_id=")[1].split("/")[0])

    v1 = {r["shard_id"]: r for r in verify_shards(spark, out, 1500).collect()}
    bad = v1[victim_shard]
    assert bad["status"] == "invalid"
    assert any("content_sum" in d for d in bad["error_details"])
    assert all(
        r["status"] == "valid" for s, r in v1.items() if s != victim_shard
    )

    # structural drift: delete a whole shard directory -> error verdict
    victim_dir = os.path.dirname(
        sorted(glob.glob(f"{out}/shards/shard_id=*/*.parquet"))[-1]
    )
    gone = int(victim_dir.split("shard_id=")[1])
    import shutil

    shutil.rmtree(victim_dir)
    v2 = {r["shard_id"]: r for r in verify_shards(spark, out, 1500).collect()}
    assert v2[gone]["status"] == "error"
    assert any("missing from store" in d for d in v2[gone]["error_details"])
    # verdicts compose with the standard exit ladder
    from validate_xml_rust_spark.operators.summary import exit_code, summarize

    s = summarize(
        spark.createDataFrame(list(v2.values())).withColumn(
            "spec_id", F.lit("shards")
        )
    ).collect()[0]
    assert exit_code(s.asDict()) == 2


def test_shard_sink_null_id_and_empty_store_bootstrap(spark, tmp_path):
    from validate_xml_rust_spark.operators.outputs import (
        append_training_shards,
        shard_assignments,
        shard_manifest,
        write_training_shards,
    )

    # NULL-id doc: lands in shard 0 AND contributes to that shard's
    # checksum (the ':content' key stays defined — concat_ws would have
    # silently produced a different key domain than the oracle)
    df = spark.createDataFrame(
        [(1, "aaa"), (None, "nullbody")], "doc_id long, text string"
    ).withColumn("n_tokens", F.length("text"))
    sh, n = shard_assignments(df, n_shards=4)
    m = {r["shard_id"]: r for r in shard_manifest(sh, 100).collect()}
    no_null = df.filter(F.col("doc_id").isNotNull()).withColumn(
        "n_tokens", F.length("text")
    )
    sh2, _ = shard_assignments(no_null, n_shards=4)
    m2 = {r["shard_id"]: r for r in shard_manifest(sh2, 100).collect()}
    expected_docs = (m2[0]["n_docs"] + 1) if 0 in m2 else 1
    assert m[0]["n_docs"] == expected_docs
    if 0 in m2:
        assert m[0]["content_sum"] != m2[0]["content_sum"]

    # bootstrap: initial write of ZERO rows, then append == fresh write
    out = str(tmp_path / "train")
    empty = spark.createDataFrame([], "doc_id long, text string, n_tokens int")
    write_training_shards(empty, out, tokens_per_shard=1000)
    batch = spark.createDataFrame(
        [(i, f"doc {i} " * (1 + i % 3)) for i in range(50)],
        "doc_id long, text string",
    ).withColumn("n_tokens", F.length("text"))
    m1 = append_training_shards(batch, out, tokens_per_shard=1000)
    assert m1.count() > 0
    assert spark.read.parquet(f"{out}/shards").count() == 50
    # and a second append now pins the bootstrap's n_shards
    n0 = int(m1.select("n_shards").first()["n_shards"])
    more = spark.createDataFrame(
        [(100 + i, f"extra {i}") for i in range(5)], "doc_id long, text string"
    ).withColumn("n_tokens", F.length("text"))
    m2b = append_training_shards(more, out, tokens_per_shard=1000)
    assert {int(r["n_shards"]) for r in m2b.collect()} == {n0}
    assert spark.read.parquet(f"{out}/shards").count() == 55


def test_verify_shards_empty_store(spark, tmp_path):
    from validate_xml_rust_spark.operators.outputs import (
        verify_shards,
        write_training_shards,
    )

    out = str(tmp_path / "train")
    empty = spark.createDataFrame([], "doc_id long, text string, n_tokens int")
    write_training_shards(empty, out, tokens_per_shard=1000)
    # empty store: no shard part files exist — the audit reports an
    # empty (trivially consistent) store instead of crashing
    assert verify_shards(spark, out, 1000).count() == 0


def test_shard_pin_survives_empty_bootstrap_write(spark, tmp_path):
    """An explicit n_shards pin on a ZERO-row initial write must survive
    to the first real append (the pin lives in out_dir/meta, not on
    manifest rows that don't exist)."""
    from validate_xml_rust_spark.operators.outputs import (
        append_training_shards,
        write_training_shards,
    )

    out = str(tmp_path / "train")
    empty = spark.createDataFrame([], "doc_id long, text string, n_tokens int")
    write_training_shards(empty, out, tokens_per_shard=1000, n_shards=7)
    batch = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    ).withColumn("n_tokens", F.length("text"))
    m = append_training_shards(batch, out, tokens_per_shard=1000)
    assert {int(r["n_shards"]) for r in m.collect()} == {7}
    assert {
        r["shard_id"] for r in spark.read.parquet(f"{out}/shards").collect()
    } <= set(range(7))


def test_meta_reset_on_unpinned_empty_overwrite(spark, tmp_path):
    """Re-initializing a store with a zero-row UNPINNED write resets the
    layout: the next append derives n_shards from its own batch instead
    of serving the dead generation's pin."""
    from validate_xml_rust_spark.operators.outputs import (
        append_training_shards,
        write_training_shards,
    )

    out = str(tmp_path / "train")

    def mk(n):
        return spark.createDataFrame(
            [(i, "body " * 40) for i in range(n)], "doc_id long, text string"
        ).withColumn("n_tokens", F.length("text"))

    m0 = write_training_shards(mk(500), out, tokens_per_shard=2000)
    assert int(m0.select("n_shards").first()["n_shards"]) > 10
    # reset: zero rows, no pin
    write_training_shards(mk(0), out, tokens_per_shard=2000)
    m1 = append_training_shards(mk(5), out, tokens_per_shard=2000)
    assert {int(r["n_shards"]) for r in m1.collect()} == {1}


def test_half_applied_append_names_generation(spark, tmp_path, monkeypatch):
    """Commit-log WAL: an append killed between its shard overwrite and
    its manifest write leaves an OPEN generation; the audit reports the
    touched shards as errors NAMING that generation (distinct from
    tampering), and a successful re-append closes it."""
    import pytest

    from validate_xml_rust_spark.operators import outputs as mod
    from validate_xml_rust_spark.operators.outputs import (
        append_training_shards,
        open_commits,
        verify_shards,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i} body " * (1 + i % 4)) for i in range(120)],
        "doc_id long, text string",
    ).withColumn("n_tokens", F.length("text"))
    out = str(tmp_path / "train")
    write_training_shards(df, out, tokens_per_shard=1500)
    assert open_commits(spark, out) == []  # gen 1 begun AND done

    batch = spark.createDataFrame(
        [(1000 + i, f"new doc {i} content " * 3) for i in range(40)],
        "doc_id long, text string",
    ).withColumn("n_tokens", F.length("text"))

    # kill the append AFTER the shard dirs are rewritten but BEFORE the
    # manifest lands: shard_manifest is the first post-write step
    real = mod.shard_manifest

    def boom(*a, **k):
        raise RuntimeError("killed mid-append")

    monkeypatch.setattr(mod, "shard_manifest", boom)
    with pytest.raises(RuntimeError, match="killed mid-append"):
        append_training_shards(batch, out, tokens_per_shard=1500)
    monkeypatch.setattr(mod, "shard_manifest", real)

    opens = open_commits(spark, out)
    assert len(opens) == 1 and opens[0]["generation"] == 2
    touched = set(opens[0]["touched"])
    assert touched  # the batch mapped to at least one shard

    audit = {r["shard_id"]: r for r in verify_shards(spark, out, 1500).collect()}
    for sid in touched:
        row = audit[sid]
        assert row["status"] == "error"
        assert any(
            "generation 2 begun but never committed" in d
            for d in row["error_details"]
        ), row["error_details"]
    # untouched shards stay valid — the incident is scoped, not global
    for sid, row in audit.items():
        if sid not in touched:
            assert row["status"] == "valid", (sid, row)

    # recovery: re-run the SAME append; generation 3 commits over the
    # same shards and supersedes the open generation 2 — the audit is
    # clean again (gen 2 never wrote 'done', but every shard it touched
    # has a LATER committed mutation)
    append_training_shards(batch, out, tokens_per_shard=1500)
    gens = {o["generation"] for o in open_commits(spark, out)}
    assert gens == {2}  # still open in the raw log — but superseded
    v2 = verify_shards(spark, out, 1500)
    assert {r["status"] for r in v2.collect()} == {"valid"}
