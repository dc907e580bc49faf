"""Result sinks: partitioned parquet layout for verdicts / violations /
metrics (the durable form of the reference's report, S8→tables).

Layout choices are the read-side optimization:
- verdicts partitioned by ``status`` — the overwhelmingly common read is
  "show me the failures" (reference prints only non-valid rows, P7);
  partition pruning turns that into a scan of the tiny failure partitions,
- violations partitioned by ``constraint_id`` — per-check drill-down reads
  one directory,
- metrics appended per run (the lineage ledger, operators/resume.py).

On Iceberg these become partitioned tables with snapshot commits; the
parquet layout keeps the same pruning behavior in the sandbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_results(
    verdicts: DataFrame,
    violations: DataFrame,
    out_dir: str,
    mode: str = "overwrite",
) -> None:
    (
        verdicts.drop("violation_entries")
        .withColumn("error_details", F.concat_ws("; ", "error_details"))
        .write.mode(mode)
        .partitionBy("status")
        .parquet(f"{out_dir}/verdicts")
    )
    violations.write.mode(mode).partitionBy("constraint_id").parquet(
        f"{out_dir}/violations"
    )


def read_failures(spark: SparkSession, out_dir: str) -> DataFrame:
    """The P7 read path: only non-valid partitions are scanned (partition
    pruning — assert via PartitionFilters in the plan)."""
    return spark.read.parquet(f"{out_dir}/verdicts").filter(
        F.col("status") != "valid"
    )


def read_violations_for(
    spark: SparkSession, out_dir: str, constraint_id: str
) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/violations").filter(
        F.col("constraint_id") == constraint_id
    )


def read_quarantine(spark: SparkSession, quarantine_dir: str) -> DataFrame:
    """Load a quarantine dir back as an INPUT frame for replay: the
    payload columns survive (url + whatever keep_cols rode the original
    verdicts), the stale verdict columns are dropped — a re-validation
    must re-derive them from scratch under the (possibly fixed) spec.
    The status partition column is itself a verdict and is dropped too.

    The path is refresh-listed first: the replay loop OVERWRITES the same
    dir it read, and a long-lived session's FileStatusCache would
    otherwise serve the previous generation's deleted part files."""
    spark.catalog.refreshByPath(quarantine_dir)
    q = spark.read.parquet(quarantine_dir)
    stale = {
        "status", "spec_id", "error_count", "error_details",
        "violation_entries", "revalidated", "content_fp",
    }
    keep = [c for c in q.columns if c not in stale]
    return q.select(*keep)


def shard_assignments(
    df: DataFrame,
    tokens_per_shard: int | None = None,
    n_shards: int | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    seed: str = "shards",
) -> tuple[DataFrame, int]:
    """Deterministic token-budgeted shard assignment — the last-mile step
    before training: each doc draws its md5 sampling ticket on ``id`` and
    lands in ``floor(ticket · n_shards / 2³²)``, i.e. equal-width ticket
    intervals. Assignment is therefore a stateless per-row expression:
    reproducible across runs, partitionings, retries, and engines (the
    same ticket arithmetic as curation.hash_sample), and docs never move
    between shards when UPSTREAM rows change — only when n_shards does.

    ``n_shards`` is taken directly or derived as
    ``ceil(Σ tokens / tokens_per_shard)`` (one aggregate pass; the only
    full-corpus dependence, and the reason assignment is split from the
    write — callers doing incremental appends pass a pinned n_shards).
    Token-balance across shards is law-of-large-numbers (each shard is a
    uniform 1/n sample of docs): at 10⁴+ docs/shard the spread is ~1%,
    with no global sort and no sequential fold.

    NULL ids draw a NULL ticket → shard 0 (kept, not dropped; route
    upstream if NULL ids need quarantining instead). Returns
    ``(df + shard_id bigint, n_shards)``.
    """
    from validate_xml_rust_spark.operators.curation import (
        TICKET_SPACE,
        sample_ticket,
    )

    if n_shards is None:
        if tokens_per_shard is None or tokens_per_shard <= 0:
            raise ValueError("pass tokens_per_shard > 0 or n_shards")
        total = df.agg(
            F.sum(F.coalesce(F.col(tokens_col), F.lit(0)).cast("long"))
        ).collect()[0][0] or 0
        n_shards = max(1, -(-int(total) // int(tokens_per_shard)))
    tick = F.coalesce(
        sample_ticket(F.col(id_col), seed), F.lit(0).cast("long")
    )
    shard = F.floor(tick * F.lit(int(n_shards)) / F.lit(TICKET_SPACE))
    return df.withColumn("shard_id", shard.cast("long")), int(n_shards)


def shard_manifest(
    sharded: DataFrame,
    tokens_per_shard: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    content_col: str = "text",
    seed: str = "shardsum",
) -> DataFrame:
    """Per-shard manifest for a sharded training set: doc count, token
    count, fill ratio against the budget, and an ORDER-INDEPENDENT
    content checksum — the sum of each doc's md5-derived 32-bit value of
    ``id:content`` — so a consumer (or a later re-shard) can verify a
    shard's contents without re-reading payload bytes in a fixed order.
    One hash aggregation on the uniform shard key; partials merge
    map-side, so the manifest costs one scan at any corpus size.

    Output: ``shard_id, n_docs, n_tokens, fill_ratio, content_sum`` —
    every column re-derivable in ANSI SQL (the checksum is exact-integer
    arithmetic: ≤2³² per doc, bigint-summed)."""
    from validate_xml_rust_spark.operators.curation import sample_ticket

    # F.concat (NULL-propagating) is NOT usable here: the key must stay
    # defined for NULL ids (shard_assignments keeps them, in shard 0),
    # and it must match the oracle restatement exactly — so both sides
    # coalesce id and content to '' explicitly
    doc_fp = sample_ticket(
        F.concat(
            F.coalesce(F.col(id_col).cast("string"), F.lit("")),
            F.lit(":"),
            F.coalesce(F.col(content_col).cast("string"), F.lit("")),
        ),
        seed,
    )
    return (
        sharded.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.coalesce(F.col(tokens_col), F.lit(0)).cast("long")
            ).alias("n_tokens"),
            F.sum(doc_fp).alias("content_sum"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("n_tokens") / F.lit(float(tokens_per_shard)), 6),
        )
        .select("shard_id", "n_docs", "n_tokens", "fill_ratio", "content_sum")
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    tokens_per_shard: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    content_col: str = "text",
    mode: str = "overwrite",
    n_shards: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Write a curated corpus as token-budgeted training shards plus a
    manifest: ``out_dir/shards/shard_id=K/`` parquet (one file per shard
    — rows are repartitioned BY the shard column first, so the write
    does not fan every task out into every shard directory) and
    ``out_dir/manifest/`` with the per-shard summary. Rows are sorted by
    id within each shard so shard files are byte-reproducible run over
    run. Returns the manifest frame, re-read from the sink. Pass
    ``n_shards`` to pin the shard count explicitly (e.g. when the first
    batch of a streaming ingest is not representative of the eventual
    corpus size) instead of deriving it from this frame's token total.
    The pin lives in ``out_dir/meta`` (one row), NOT just on manifest
    rows — a zero-row initial write must not lose an explicit pin.
    A zero-row write WITHOUT an explicit pin writes no meta: the layout
    is then undecided, and the first real append derives it.

    The input is eager-checkpointed ONCE up front: the sink needs the
    frame three times (token-sum pass for n_shards, the shards write,
    the manifest aggregation), and without the checkpoint each pass
    would re-execute the caller's full upstream lineage (the repo's
    measured multi-branch tax); all three run as block scans instead,
    and the blocks are released before returning. Callers whose frame
    is ALREADY materialized (a prior checkpoint/persist) pass
    ``checkpoint=False`` to skip the second payload copy."""
    from validate_xml_rust_spark.ckpt import eager_checkpoint, release_blocks

    spark = df.sparkSession
    pinned = n_shards
    if checkpoint:
        ck, blocks = eager_checkpoint(df)
    else:
        ck, blocks = df, frozenset()
    sharded, n_shards = shard_assignments(
        ck,
        tokens_per_shard=tokens_per_shard,
        n_shards=n_shards,
        id_col=id_col,
        tokens_col=tokens_col,
    )
    # Precondition BEFORE the WAL reset (r6 ADVICE): mode='error' on an
    # existing store fails without moving a byte — resetting the log
    # first would destroy the healthy record and make verify_shards
    # report the fully intact store as half-applied. Fail here instead,
    # leaving the prior log recoverable.
    import os as _os

    if mode in ("error", "errorifexists") and _os.path.exists(
        f"{out_dir}/shards"
    ):
        raise FileExistsError(
            f"{out_dir}/shards exists and mode={mode!r}; commit log left "
            "untouched"
        )
    # WAL: a full (re)write RESETS the commit log — generation 1 begins
    # before the first shard byte moves ([] = the whole store)
    _log_commit(spark, out_dir, 1, "begin", [], mode="overwrite")
    (
        sharded.repartition(n_shards, F.col("shard_id"))
        .sortWithinPartitions("shard_id", id_col)
        .write.mode(mode)
        .partitionBy("shard_id")
        .parquet(f"{out_dir}/shards")
    )
    manifest = shard_manifest(
        sharded,
        tokens_per_shard,
        id_col=id_col,
        tokens_col=tokens_col,
        content_col=content_col,
    )
    # n_shards rides the manifest rows for consumers reading only the
    # manifest; the DURABLE pin is the meta sidecar below
    manifest = manifest.withColumn("n_shards", F.lit(n_shards).cast("long"))
    manifest.write.mode(mode).parquet(f"{out_dir}/manifest")
    spark.catalog.refreshByPath(f"{out_dir}/manifest")
    stored = spark.read.parquet(f"{out_dir}/manifest")
    # the meta sidecar is ALWAYS (over)written — a decided layout as one
    # row, an undecided one (zero-row unpinned write) as zero rows — so
    # a re-initialized store can never serve a dead generation's pin
    meta_rows = (
        [(int(n_shards), int(tokens_per_shard))]
        if pinned is not None or stored.limit(1).count() > 0
        else []
    )
    spark.createDataFrame(
        meta_rows, "n_shards long, tokens_per_shard long"
    ).write.mode(mode).parquet(f"{out_dir}/meta")
    _log_commit(spark, out_dir, 1, "done", [])
    release_blocks(spark.sparkContext, blocks)
    return stored


def append_training_shards(
    new_df: DataFrame,
    out_dir: str,
    tokens_per_shard: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    content_col: str = "text",
) -> DataFrame:
    """Append a new batch to an existing sharded training set WITHOUT
    rewriting the corpus: n_shards is pinned from the stored manifest
    (assignment is a pure function of id and n_shards, so existing docs
    never move), only the shard directories that receive new docs are
    rewritten (dynamic partition overwrite — untouched shard files stay
    byte-identical on disk), and the manifest is refreshed to the new
    totals. At 10^12 docs an append touches O(min(batch, n_shards))
    partitions, not the corpus.

    Appending drifts ``fill_ratio`` upward (the budget denominator is
    fixed); consumers re-shard with ``write_training_shards`` when the
    manifest says fill has outgrown the budget. Duplicate ids between
    batch and corpus are NOT collapsed here — run incremental_dedup
    upstream; a dup lands (deterministically) in its shard twice.

    Returns the refreshed full manifest."""
    from validate_xml_rust_spark.ckpt import eager_checkpoint, release_blocks

    from pyspark.errors import AnalysisException

    spark = new_df.sparkSession
    n_shards = None
    try:
        spark.catalog.refreshByPath(f"{out_dir}/meta")
        meta = spark.read.parquet(f"{out_dir}/meta").first()
        if meta is not None:
            n_shards = int(meta["n_shards"])
    except AnalysisException:
        pass  # pre-meta store layout: fall back to manifest rows
    spark.catalog.refreshByPath(f"{out_dir}/manifest")
    prior = spark.read.parquet(f"{out_dir}/manifest")
    if n_shards is None:
        first = prior.select("n_shards").first()
        if first is None:
            # undecided store (a zero-row initial write with no explicit
            # pin writes no meta): appending IS the initial write
            return write_training_shards(
                new_df, out_dir, tokens_per_shard,
                id_col=id_col, tokens_col=tokens_col,
                content_col=content_col,
            )
        n_shards = int(first["n_shards"])
    assigned, _ = shard_assignments(
        new_df, n_shards=n_shards, id_col=id_col, tokens_col=tokens_col
    )
    touched = [
        r["shard_id"] for r in assigned.select("shard_id").distinct().collect()
    ]
    if not touched:  # empty batch: nothing to rewrite
        return prior
    gen = _next_generation(spark, out_dir)
    _log_commit(spark, out_dir, gen, "begin", touched)
    # the rewrite READS the shard dirs it is about to overwrite — the
    # combined rows must be materialized (checkpoint blocks) before the
    # write starts deleting source files
    spark.catalog.refreshByPath(f"{out_dir}/shards")
    try:
        old_touched = spark.read.parquet(f"{out_dir}/shards").filter(
            F.col("shard_id").isin(touched)
        )
    except AnalysisException:
        # a pinned zero-row initial write leaves no shard part files —
        # the store exists (meta + empty manifest) but holds nothing yet
        old_touched = assigned.limit(0)
    cols = [c for c in old_touched.columns]
    combined, blocks = eager_checkpoint(
        old_touched.unionByName(assigned.select(*cols))
    )
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            combined.repartition(len(touched), F.col("shard_id"))
            .sortWithinPartitions("shard_id", id_col)
            .write.mode("overwrite")
            .partitionBy("shard_id")
            .parquet(f"{out_dir}/shards")
        )
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev_mode
        )
    refreshed = shard_manifest(
        combined,
        tokens_per_shard,
        id_col=id_col,
        tokens_col=tokens_col,
        content_col=content_col,
    )
    manifest = (
        prior.filter(~F.col("shard_id").isin(touched))
        .drop("n_shards")
        .unionByName(refreshed)
        .withColumn("n_shards", F.lit(n_shards).cast("long"))
    )
    # the manifest overwrite also reads its own prior generation
    manifest, mblocks = eager_checkpoint(manifest)
    manifest.write.mode("overwrite").parquet(f"{out_dir}/manifest")
    _log_commit(spark, out_dir, gen, "done", touched)
    release_blocks(spark.sparkContext, blocks | mblocks)
    # re-read from the sink: the checkpoint frames above just had their
    # blocks released, so they must not escape to the caller
    spark.catalog.refreshByPath(f"{out_dir}/manifest")
    return spark.read.parquet(f"{out_dir}/manifest")


def _log_commit(
    spark: SparkSession,
    out_dir: str,
    generation: int,
    phase: str,
    touched: list[int],
    mode: str = "append",
) -> None:
    """One commit-log record under ``out_dir/commits`` — the shard
    store's WAL (the DirectorySnapshotSource generation pattern,
    operators/resume.py; an Iceberg table gets this from its atomic
    snapshot commit). A mutation writes ``begin`` BEFORE touching any
    shard directory and ``done`` after its manifest lands, so a crash
    between them is DETECTABLE as an open generation instead of reading
    as payload tampering. ``touched=[]`` means the whole store (a full
    rewrite)."""
    spark.createDataFrame(
        [(int(generation), phase, [int(t) for t in touched])],
        "generation long, phase string, touched array<long>",
    ).withColumn("committed_at", F.current_timestamp()).write.mode(mode).parquet(
        f"{out_dir}/commits"
    )


def open_commits(spark: SparkSession, out_dir: str) -> list[dict]:
    """Generations with a ``begin`` record but no ``done`` — half-applied
    mutations. Empty for a healthy store; [] for a pre-commit-log store
    (backward compatible). O(#mutations) driver rows."""
    from pyspark.errors import AnalysisException

    try:
        spark.catalog.refreshByPath(f"{out_dir}/commits")
        log = spark.read.parquet(f"{out_dir}/commits").collect()
    except AnalysisException:
        return []
    done = {int(r["generation"]) for r in log if r["phase"] == "done"}
    return [
        {
            "generation": int(r["generation"]),
            "touched": [int(t) for t in (r["touched"] or [])],
        }
        for r in log
        if r["phase"] == "begin" and int(r["generation"]) not in done
    ]


def _next_generation(spark: SparkSession, out_dir: str) -> int:
    from pyspark.errors import AnalysisException

    try:
        spark.catalog.refreshByPath(f"{out_dir}/commits")
        head = (
            spark.read.parquet(f"{out_dir}/commits")
            .agg(F.max("generation").alias("g"))
            .first()
        )
        return (int(head["g"]) if head and head["g"] is not None else 0) + 1
    except AnalysisException:
        return 1


def verify_shards(
    spark: SparkSession,
    out_dir: str,
    tokens_per_shard: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    content_col: str = "text",
) -> DataFrame:
    """Validate a training-shard store against its own manifest — the
    reference's per-file verdict workflow (validate every file, report
    status + violation details) applied to shards as the "files": re-read
    the payload, recompute per-shard doc counts, token counts, and the
    order-independent content checksum, and emit one verdict row per
    shard: ``shard_id, status ('valid'|'invalid'|'error'), error_count,
    error_details array<string>``.

    - count/token/checksum mismatch → ``invalid`` with one detail per
      failed check (truncated files, tampered payload bytes, and
      manifest drift all surface here);
    - a shard present in the manifest but missing from the store (or
      vice versa) → ``error`` (structural, not content, failure);
    - misassigned rows (a doc sitting in a shard its ticket does not map
      to) are caught by the checksum row set, since checksums are
      recomputed per physical shard directory.

    One scan of the payload + the tiny manifest, joined full-outer on
    shard_id — at 10^12 docs this is the cheap audit you run after every
    append. Compose with ``summarize``/``exit_code`` for the CLI ladder."""
    from pyspark.errors import AnalysisException

    spark.catalog.refreshByPath(f"{out_dir}/manifest")
    spark.catalog.refreshByPath(f"{out_dir}/shards")
    manifest = spark.read.parquet(f"{out_dir}/manifest")
    try:
        payload = spark.read.parquet(f"{out_dir}/shards")
    except AnalysisException:
        # an empty store writes a manifest but no shard part files
        # (partitionBy emits nothing for zero rows) — audit it as an
        # empty payload, not a crash
        payload = spark.createDataFrame(
            [],
            f"`{id_col}` string, `{content_col}` string, "
            f"`{tokens_col}` int, shard_id long",
        )
    observed = shard_manifest(
        payload,
        tokens_per_shard,
        id_col=id_col,
        tokens_col=tokens_col,
        content_col=content_col,
    )
    m = manifest.select(
        "shard_id",
        F.col("n_docs").alias("m_docs"),
        F.col("n_tokens").alias("m_tokens"),
        F.col("content_sum").alias("m_sum"),
    )
    o = observed.select(
        "shard_id",
        F.col("n_docs").alias("o_docs"),
        F.col("n_tokens").alias("o_tokens"),
        F.col("content_sum").alias("o_sum"),
    )
    j = m.join(o, "shard_id", "full_outer")
    # commit-log check: a shard touched by a BEGUN-but-never-COMMITTED
    # mutation is half-applied — report it as a structural error NAMING
    # the generation, distinctly from payload tampering (whose checksum
    # detail it would otherwise be indistinguishable from). touched=[]
    # (a full rewrite) covers every shard.
    opens = open_commits(spark, out_dir)
    # a LATER committed mutation covering the same shard supersedes the
    # open generation there (the recovery path: re-running the failed
    # append commits a new generation over the same shards and the
    # incident closes; a full rewrite resets the whole log)
    try:
        spark.catalog.refreshByPath(f"{out_dir}/commits")
        dones = [
            (int(r["generation"]), [int(t) for t in (r["touched"] or [])])
            for r in spark.read.parquet(f"{out_dir}/commits").collect()
            if r["phase"] == "done"
        ]
    except AnalysisException:
        dones = []

    def _resolved(gen: int, shard: int) -> bool:
        return any(
            g2 > gen and (not t2 or shard in t2) for g2, t2 in dones
        )

    whole_gen = max(
        (c["generation"] for c in opens if not c["touched"]), default=None
    )
    per_shard = {}
    for c in opens:
        for t in c["touched"]:
            if not _resolved(c["generation"], t):
                per_shard[t] = max(per_shard.get(t, 0), c["generation"])
    open_gen = F.lit(None).cast("long")
    if per_shard:
        gen_map = F.create_map(
            *[F.lit(x) for kv in per_shard.items() for x in kv]
        )
        open_gen = gen_map[F.col("shard_id")].cast("long")
    if whole_gen is not None:
        open_gen = F.greatest(open_gen, F.lit(whole_gen).cast("long"))
    half_applied = F.when(
        open_gen.isNotNull(),
        F.concat(
            F.lit("append generation "),
            open_gen.cast("string"),
            F.lit(" begun but never committed — half-applied write, "
                  "not tampering; re-run the append"),
        ),
    )
    checks = [
        (
            F.col("m_docs").isNotNull() & F.col("o_docs").isNotNull()
            & (F.col("m_docs") != F.col("o_docs")),
            F.concat(
                F.lit("n_docs: manifest="), F.col("m_docs").cast("string"),
                F.lit(" observed="), F.col("o_docs").cast("string"),
            ),
        ),
        (
            F.col("m_tokens").isNotNull() & F.col("o_tokens").isNotNull()
            & (F.col("m_tokens") != F.col("o_tokens")),
            F.concat(
                F.lit("n_tokens: manifest="), F.col("m_tokens").cast("string"),
                F.lit(" observed="), F.col("o_tokens").cast("string"),
            ),
        ),
        (
            F.col("m_sum").isNotNull() & F.col("o_sum").isNotNull()
            & (F.col("m_sum") != F.col("o_sum")),
            F.lit("content_sum: checksum mismatch"),
        ),
    ]
    details = F.filter(
        F.array(
            half_applied,
            *[F.when(cond, msg) for cond, msg in checks],
            F.when(F.col("o_docs").isNull(), F.lit("shard missing from store")),
            F.when(
                F.col("m_docs").isNull(), F.lit("shard not in manifest")
            ),
        ),
        lambda x: x.isNotNull(),
    )
    status = (
        F.when(
            open_gen.isNotNull()
            | F.col("o_docs").isNull()
            | F.col("m_docs").isNull(),
            F.lit("error"),
        )
        .when(F.size(details) > 0, F.lit("invalid"))
        .otherwise(F.lit("valid"))
    )
    return j.select(
        "shard_id",
        status.alias("status"),
        F.size(details).cast("int").alias("error_count"),
        details.alias("error_details"),
    )


def quarantine_split(
    verdicts: DataFrame,
    keep_statuses: tuple[str, ...] = ("valid", "skipped"),
    quarantine_dir: str | None = None,
    mode: str = "overwrite",
) -> tuple[DataFrame, DataFrame]:
    """Route rows by verdict — the standard validation-sink pattern: rows
    whose status is in ``keep_statuses`` continue down the pipeline
    (``clean``); the rest (``quarantined``) carry their full verdict
    (status, error_count, error_details) for inspection, repair, and
    replay, optionally written to ``quarantine_dir`` partitioned by
    status (pruned reads per failure class).

    Input is a verdicts frame from ``validate(..., keep_cols=[...])`` so
    payload columns ride ALONGSIDE the verdict — no join back to the
    source (a join-back by id drops NULL-id rows, which are precisely the
    rows most likely to be quarantined, and cross-multiplies duplicate
    ids). One narrow filter each side; the quarantine write is the only
    materialization.

    Scale shape: at 10^12 rows with a healthy corpus the quarantine side
    is the tiny fraction — the clean side never shuffles or materializes
    here, it simply continues as a filtered scan."""
    keep = F.col("status").isin(list(keep_statuses))
    clean = verdicts.filter(keep)
    quarantined = verdicts.filter(~keep)
    if quarantine_dir is not None:
        (
            quarantined.drop("violation_entries")
            .withColumn("error_details", F.concat_ws("; ", "error_details"))
            .write.mode(mode)
            .partitionBy("status")
            .parquet(quarantine_dir)
        )
    return clean, quarantined
