"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring how a production vector pipeline scales:

- **Brute-force cosine top-k** — the exactness baseline. The query vector
  (or a small query set) is broadcast; the scan side computes the cosine
  with pure array expressions (``zip_with`` dot product folded in doubles),
  then takes top-k. One narrow pass + a TakeOrdered — no shuffle of the
  big side. Exact and embarrassingly parallel, but O(N) per query.

- **LSH-bucketed ANN** (random-hyperplane signs) — the scale path. Each
  vector gets a ``n_planes``-bit sign signature from deterministic seeded
  hyperplanes (hash-derived, no stored model); candidates = vectors whose
  signature matches the query's bucket within ``probe_hamming`` bits.
  Bucket cardinality is ~N/2^n_planes, so per-query work drops by the
  bucket fan-in while recall stays high for close vectors (sign-LSH
  collision probability = 1 - θ/π per plane).

- **Embedding cosine near-dup** — all-pairs above a threshold via the
  same LSH buckets (self-join on bucket), for dedup pipelines.

Deterministic hyperplanes: the (n_planes × dim) plane matrix regenerates
from the module seed (PCG64) anywhere — driver or executor — so no model
file or plan constant ships. Signatures are one numpy matmul per Arrow
batch (``lsh_signature``); an interpreted expression form with the same
planes as literals (``lsh_signature_expr``) is the bit-equality oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEED = 97


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in doubles (left-to-right fold — deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    d = dot(a, b)
    n = norm(a) * norm(b)
    return F.when(n > 0, d / n).otherwise(F.lit(0.0))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector (broadcast as a
    plan constant — no join at all)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    # orderBy+limit compiles to TakeOrdered — per-partition top-k then a
    # k-row merge on the driver; no full sort, no shuffle of N rows.
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def _plane_matrix(dim: int, n_planes: int) -> "np.ndarray":
    """Deterministic (n_planes × dim) hyperplane matrix from the module
    seed (PCG64). Regenerable anywhere — driver or any executor — so no
    model state ships with the plan."""
    rng = np.random.default_rng(SEED)
    return rng.standard_normal((n_planes, dim))


def _pack_signs(dots: "np.ndarray") -> "np.ndarray":
    """(n × n_planes) dot products → packed sign longs (bit p = dot_p > 0)."""
    bits = (dots > 0).astype(np.int64)
    weights = (1 << np.arange(dots.shape[1], dtype=np.int64))
    return bits @ weights


def lsh_signature_np(vec: "np.ndarray", n_planes: int = 12) -> int:
    """Driver-side signature of one query vector (same planes, same numpy
    matmul as the executor UDF — bit-identical by construction)."""
    v = np.asarray(vec, dtype="float64")
    planes = _plane_matrix(len(v), n_planes)
    return int(_pack_signs((v[None, :] @ planes.T))[0])


def lsh_signature(vec: Column, n_planes: int = 12) -> Column:
    """Random-hyperplane sign signature packed into a long (bit p = sign of
    ⟨vec, plane_p⟩), via an Arrow-batched numpy UDF: one (batch × dim) @
    (dim × n_planes) matmul per Arrow batch. Planes regenerate from the
    seed inside the worker (~10 KB, no model file, no plan constant).

    This replaces n_planes× interpreted zip_with/aggregate folds per row —
    the repo rule ("per-element array math beyond ~10 ops/row belongs in an
    Arrow numpy UDF"): at corpus scale signature computation dominates the
    LSH job. ``lsh_signature_expr`` remains as the cross-check oracle."""

    @F.pandas_udf("long")
    def sig(batch: pd.Series) -> pd.Series:
        if len(batch) == 0:
            return pd.Series(np.empty(0, dtype=np.int64))
        mask = batch.notna().to_numpy()
        out = np.zeros(len(batch), dtype=np.int64)
        if mask.any():
            V = np.stack(
                [np.asarray(v, dtype="float64") for v in batch[mask]]
            )
            planes = _plane_matrix(V.shape[1], n_planes)
            out[mask] = _pack_signs(V @ planes.T)
        return pd.Series(out)

    return sig(vec)


def lsh_signature_expr(vec: Column, dim: int, n_planes: int = 12) -> Column:
    """Pure-expression reference form of ``lsh_signature``: the SAME plane
    matrix embedded as array literals, dot product as an interpreted
    zip_with/aggregate fold. Cross-check oracle only (tests assert bit
    equality with the Arrow form); use ``lsh_signature`` for volume."""
    planes = _plane_matrix(dim, n_planes)
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(w)) for w in planes[p]])
        d = F.aggregate(
            F.zip_with(vec, plane, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(
            F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    probe_hamming: int = 2,
    exclude_id: int | None = None,
) -> DataFrame:
    """Approximate top-k: restrict the exact scoring to vectors whose LSH
    bucket is within ``probe_hamming`` bits of the query's bucket, then
    brute-force within candidates. Recall tunes with n_planes/probe."""
    # Query signature computed driver-side with the SAME numpy matmul the
    # executor UDF runs — bit-identical, no extra Spark job.
    qsig = lsh_signature_np(query_vec, n_planes)

    sig = lsh_signature(F.col(vec_col), n_planes)
    cand = df.withColumn("__sig", sig).filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig).cast("long"))) <= probe_hamming
    )
    return brute_force_topk(cand, query_vec, k, id_col, vec_col, exclude_id)


def ivf_train(
    df: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iters: int = 3,
    sample_cap: int = 20_000,
    id_col: str = "vec_id",
):
    """Train an IVF coarse quantizer: deterministic hash-sample of vectors
    → numpy Lloyd iterations on the driver. Returns a (n_centroids, dim)
    numpy array. Driver-side by design: centroids are a tiny model that
    then broadcasts in the assignment UDF's closure — the same
    "compile once on the driver, apply everywhere" shape as spec
    compilation (X2)."""
    nn = df.filter(F.col(vec_col).isNotNull())
    n = nn.count()
    if n > sample_cap:
        mod = max(2, n // sample_cap)
        nn = nn.filter(F.pmod(F.xxhash64(F.col(id_col), F.lit(31)), F.lit(mod)) == 0)
    sample = np.array(
        [r[0] for r in nn.select(vec_col).collect()], dtype="float64"
    )
    # deterministic farthest-point init (k-means++-style, no RNG): start at
    # sample[0], then repeatedly take the point farthest from any centroid —
    # naive first-k init can seed every centroid inside one cluster
    chosen = [0]
    d2min = ((sample - sample[0]) ** 2).sum(axis=1)
    while len(chosen) < min(n_centroids, len(sample)):
        nxt = int(d2min.argmax())
        chosen.append(nxt)
        d2min = np.minimum(d2min, ((sample - sample[nxt]) ** 2).sum(axis=1))
    cents = sample[chosen].copy()
    for _ in range(n_iters):
        d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_assign(df: DataFrame, centroids, vec_col: str = "embedding") -> DataFrame:
    """Attach ``cluster_id`` = nearest centroid (Arrow-batched numpy)."""
    cents = centroids.astype("float64")

    @F.pandas_udf("int")
    def assign(batch: pd.Series) -> pd.Series:
        out = []
        for v in batch:
            if v is None:
                out.append(-1)
                continue
            x = np.asarray(v, dtype="float64")
            out.append(int(((cents - x) ** 2).sum(axis=1).argmin()))
        return pd.Series(out, dtype="int32")

    return df.withColumn("cluster_id", assign(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    centroids,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF search: probe the ``nprobe`` clusters nearest the query, then
    exact cosine within — per-query work drops to ~nprobe/n_centroids of
    the corpus. The assignment column would be precomputed/persisted in a
    real index; recomputed here for self-containment."""
    q = np.asarray(query_vec, dtype="float64")
    order = (((centroids - q) ** 2).sum(axis=1)).argsort()[:nprobe]
    probed = ivf_assign(df, centroids, vec_col).filter(
        F.col("cluster_id").isin([int(c) for c in order])
    )
    return brute_force_topk(probed, query_vec, k, id_col, vec_col, exclude_id)


def ivf_build(
    df: DataFrame,
    centroids,
    index_dir: str,
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF index: vectors + ``cluster_id``, written as parquet
    PARTITIONED BY cluster_id. This is the "real index" form — ``ivf_topk``
    recomputes assignment per query (fine for a demo, wasteful in
    production); the built index makes a probe a *partition-pruned scan*:
    only the nprobe cluster directories are listed and read, so per-query
    IO drops to ~nprobe/n_centroids of the corpus with zero compute."""
    ivf_assign(df, centroids, vec_col).write.mode("overwrite").partitionBy(
        "cluster_id"
    ).parquet(index_dir)


def ivf_topk_indexed(
    spark,
    index_dir: str,
    centroids,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF search over a built index (``ivf_build``): the cluster_id
    filter prunes parquet partitions at planning time — check
    PartitionFilters in .explain — then exact cosine within the probed
    clusters."""
    q = np.asarray(query_vec, dtype="float64")
    order = (((centroids - q) ** 2).sum(axis=1)).argsort()[:nprobe]
    probed = spark.read.parquet(index_dir).filter(
        F.col("cluster_id").isin([int(c) for c in order])
    )
    return brute_force_topk(probed, query_vec, k, id_col, vec_col, exclude_id)


def diversity_sample(
    df: DataFrame,
    target_per_cluster: int,
    centroids=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: str = "div",
    count_sample_rate: float | None = None,
) -> DataFrame:
    """Cluster-balanced diversity sampling over an embedding column —
    the embedding-space analog of stratified_sample (the public
    density-equalizing selection idea behind SemDeDup-style prototype
    pruning and DataComp cluster-coverage ablations): cap every k-means
    cluster's contribution at ~``target_per_cluster`` rows, so dense
    regions stop dominating the training mix while sparse regions keep
    full coverage.

    Mechanism: assign each vector to its nearest centroid (Arrow argmin
    — ``centroids`` is a (k, dim) array, or an ``ivf_train`` model is
    fit here), count cluster sizes (bounded k-row aggregate), derive a
    per-cluster keep rate min(1, target/n_c) as a 32-bit ticket
    threshold floor(target·2³²/n_c), and keep rows whose deterministic
    md5 ticket falls under their cluster's threshold. Membership is
    reproducible across runs/partitionings/engines; counts per cluster
    are ~target (rate-based, not an exact quota — exactness would need
    a per-cluster sort, a skew-prone Window this deliberately avoids:
    AQE never splits Window skew).

    Rows with NULL vectors carry no cluster evidence and are excluded —
    route them around the operator if they should survive. Output: the
    selected rows + ``cluster_id``.

    Scale shape: the rate derivation needs cluster sizes, so by default
    the corpus runs through the Arrow assignment TWICE (the count
    branch and the probe branch are separate subtrees — no persist is
    hidden here). Rates only need approximate sizes, so at volume pass
    ``count_sample_rate`` to bound the count pass to a deterministic
    hash sample (sizes scale back up by 1/rate before the threshold
    floor); the probe pass still covers every row. The count itself is
    a k-row aggregate, the threshold join broadcasts, and the keep
    decision is a stateless per-row predicate — zero corpus shuffle
    either way."""
    from validate_xml_rust_spark.operators.curation import (
        TICKET_SPACE,
        hash_sample,
        sample_ticket,
    )

    cents = (
        centroids
        if centroids is not None
        else ivf_train(df, vec_col, n_centroids, id_col=id_col)
    )
    nn = df.filter(F.col(vec_col).isNotNull())
    a = ivf_assign(nn, cents, vec_col)
    counted = (
        a
        if count_sample_rate is None
        else ivf_assign(
            hash_sample(nn, count_sample_rate, id_col, seed + "_cn"),
            cents, vec_col,
        )
    )
    scale = 1.0 if count_sample_rate is None else 1.0 / count_sample_rate
    cn = counted.groupBy("cluster_id").agg(
        F.ceil(F.count(F.lit(1)) * F.lit(scale)).cast("long").alias("__n")
    )
    # left join + coalesce(1): a cluster the count sample missed is by
    # construction tiny — keep it whole (rate 1), never drop it (an
    # inner join here would silently erase exactly the sparse clusters
    # this operator exists to preserve)
    thr = F.least(
        F.lit(TICKET_SPACE).cast("long"),
        F.floor(
            F.lit(float(target_per_cluster) * TICKET_SPACE)
            / F.coalesce(F.col("__n"), F.lit(1))
        ).cast("long"),
    )
    return (
        a.join(F.broadcast(cn), "cluster_id", "left")
        .filter(sample_ticket(F.col(id_col), seed) < thr)
        .drop("__n")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int = 16,
    n_iters: int = 3,
    max_cluster: int = 20_000,
    drops_only: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public recipe):
    k-means-cluster the embedding space, then inside each cluster drop
    every vector whose cosine to a LOWER-id cluster-mate reaches
    ``threshold`` (min-id keeper — deterministic and SQL-restatable).
    Semantic copies (same meaning, different words) collapse to one
    exemplar — the dedup step textual MinHash/SimHash cannot perform.

    Default output: the KEPT rows of ``df`` (all columns). With
    ``drops_only=True`` returns the audit view instead: one row per
    dropped vector ``(id_col, witness_id, cos_sim)``, witness = the
    SMALLEST cluster-mate id justifying the drop (cos_sim to it, 6dp).

    Scale shape (10^10 vectors): clustering reuses the ivf trainer
    (deterministic capped hash-sample + driver Lloyd, farthest-point
    init, no RNG; centroids broadcast in the assignment UDF's closure);
    the prune is ONE shuffle on cluster_id into applyInPandas, where
    each cluster runs a blocked numpy cosine matmul (BLAS) — O(m²) in
    cluster size, so ``n_centroids`` must bound m ≈ n/k (the paper's
    regime). Clusters above ``max_cluster`` are kept whole rather than
    exploded — the same conservative degenerate-bucket stance as the
    LSH paths. Zero-norm vectors have cosine 0 to everything (the
    ``cosine`` expression convention) and are never dropped. Rows whose
    id is NULL or not castable to long are never dropped (and never
    witness) — there is no key to join a drop decision back on; ids are
    expected unique (an id shared by several rows drops or keeps them
    as a unit through the anti-join)."""
    nn = df.filter(
        F.col(vec_col).isNotNull() & F.col(id_col).cast("long").isNotNull()
    )
    cents = ivf_train(
        nn, vec_col, n_centroids=n_centroids, n_iters=n_iters, id_col=id_col
    )
    asg = ivf_assign(nn, cents, vec_col).select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).alias("__v"),
        "cluster_id",
    )
    thr, cap = float(threshold), int(max_cluster)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id": pd.Series(dtype="int64"),
                "witness_id": pd.Series(dtype="int64"),
                "cos_sim": pd.Series(dtype="float64"),
            }
        )
        m = len(pdf)
        if m < 2 or m > cap:
            return empty
        pdf = pdf.sort_values("__id")
        ids = pdf["__id"].to_numpy()
        vecs = np.stack(
            [np.asarray(v, dtype="float64") for v in pdf["__v"]]
        )
        nrm = np.sqrt((vecs * vecs).sum(axis=1))
        safe = np.where(nrm > 0, nrm, 1.0)
        vn = np.where((nrm > 0)[:, None], vecs / safe[:, None], 0.0)
        out_i, out_w, out_c = [], [], []
        blk = 1024  # bound the matmul block to blk × m doubles
        for s in range(1, m, blk):
            e = min(s + blk, m)
            sims = vn[s:e] @ vn[:e].T
            for r in range(e - s):
                i = s + r
                hits = np.nonzero(sims[r, :i] >= thr)[0]
                if len(hits):
                    w = int(hits[0])  # ids sorted → first hit = min id
                    out_i.append(int(ids[i]))
                    out_w.append(int(ids[w]))
                    out_c.append(float(np.round(sims[r, w], 6)))
        if not out_i:
            return empty
        return pd.DataFrame(
            {"id": out_i, "witness_id": out_w, "cos_sim": out_c}
        )

    drops = asg.groupBy("cluster_id").applyInPandas(
        prune, "id long, witness_id long, cos_sim double"
    )
    if drops_only:
        return drops.select(
            F.col("id").alias(id_col), "witness_id", "cos_sim"
        )
    return df.join(
        drops.select(F.col("id").cast(df.schema[id_col].dataType).alias(id_col)),
        id_col,
        "left_anti",
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits_per_band: int = 8,
    bands: int = 8,
    max_bucket: int = 2000,
) -> DataFrame:
    """All pairs with cosine ≥ threshold, via BANDED sign-LSH (the
    MinHash-banding structure applied to hyperplane signs): one
    ``bands × bits_per_band``-bit signature per vector (single Arrow
    matmul), each ``bits_per_band``-bit slice is a band key, candidates =
    pairs colliding in ANY band, then exact-cosine verification.

    Band-OR is what makes the recall usable at real thresholds: a single
    exact-bucket match on 10 bits recalls only (1-θ/π)^10 ≈ 35% of
    0.95-cosine pairs, while 8 bands of 8 bits recall
    1-(1-p^8)^8 ≈ 99% at the same verification cost profile. Degenerate
    buckets (zero vectors, boilerplate embeddings) are capped like the
    MinHash path. Output: id_a < id_b, cos_sim."""
    n_bits = bits_per_band * bands
    sigd = df.select(
        F.col(id_col).alias("__id"),
        lsh_signature(F.col(vec_col), n_bits).alias("__sig"),
    )
    banded = sigd.select(
        "__id",
        F.explode(_band_keys_expr("__sig", bands, bits_per_band)).alias("bk"),
    ).select("__id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    sizes = banded.groupBy("band", "key").agg(F.count(F.lit(1)).alias("__bw"))
    banded = banded.join(
        sizes.filter(F.col("__bw") <= max_bucket).drop("__bw"), ["band", "key"]
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    # verify joins need only (id, vector) — take them from the RAW input,
    # not sigd, or the signature UDF would be recomputed on both join
    # sides (3x total) just to be projected away
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _band_keys_expr(sig_col: str, bands: int, bits_per_band: int):
    """(band, key) structs from a packed sign signature — the banded
    slice layout shared by the self-join near-dup and the cross-corpus
    decontamination paths. Bounded HOF (``bands`` elements), safe: the
    lambda references only the plain signature attribute."""
    mask = (1 << bits_per_band) - 1
    return F.expr(
        f"transform(sequence(0, {bands - 1}), b -> "
        f"struct(b AS band, shiftrightunsigned({sig_col}, b * {bits_per_band}) "
        f"& {mask} AS key))"
    )


def semantic_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "vec_id",
    bench_vec_col: str = "embedding",
    threshold: float = 0.95,
    bits_per_band: int = 8,
    bands: int = 8,
    exact: bool = False,
) -> DataFrame:
    """Semantic test-set decontamination: every (corpus, benchmark) pair
    with embedding cosine ≥ ``threshold`` — the EMBEDDING-SPACE
    complement of the n-gram ``contamination_flags`` (paraphrased or
    re-tokenized benchmark leakage that shares no 8-gram still lands
    next to the benchmark item in embedding space; flagging by
    embedding similarity is the published practice behind
    SemDeDup-style semantic matching, applied cross-corpus).

    Output: ``(id, bench_id, cos_sim)`` — one row per contaminated pair;
    drop policy belongs to the caller (left_anti on ``id``), mirroring
    ``contamination_flags``.

    Scale shape (the n-gram decontaminate's cost profile, in embedding
    space): the benchmark is SMALL — eval suites are 10³–10⁶ rows — so
    its banded sign-LSH layout, carrying its raw vectors, BROADCASTS.
    The corpus side computes its own signatures (one Arrow matmul per
    batch), explodes ``bands`` band keys, probes the broadcast buckets,
    and exact-verifies each collision in place against the benchmark
    vector riding the broadcast row — ZERO corpus-side shuffle; only
    the verified hits (the contamination, tiny by construction) reach
    the final distinct. A pair colliding in k bands is verified k≤bands
    times before the distinct — the price of never joining back into
    the corpus for vectors; both engines' cosine is deterministic, so
    the duplicates collapse exactly. Same signature family as
    embedding_near_duplicates (seeded hyperplanes regenerated anywhere),
    so the recall argument carries over: at 16×4 bits the per-pair miss
    probability at cos 0.9 is ~4e-6, and the gate asserts recall 1.0 on
    the planted corpus. ``exact=True`` skips the LSH prefilter (corpus ×
    broadcast-benchmark cross join) for recall audits at bounded sizes.
    """
    bench = benchmark.select(
        F.col(bench_id_col).alias("__bid"),
        F.col(bench_vec_col).alias("__bv"),
    )
    if exact:
        pairs = df.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("__v")
        ).crossJoin(F.broadcast(bench))
    else:
        n_bits = bits_per_band * bands
        bband = (
            bench.withColumn("__sig", lsh_signature(F.col("__bv"), n_bits))
            .select(
                "__bid", "__bv",
                F.explode(
                    _band_keys_expr("__sig", bands, bits_per_band)
                ).alias("bk"),
            )
            .select(
                "__bid", "__bv",
                F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
            )
        )
        cband = (
            df.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("__v"),
                lsh_signature(F.col(vec_col), n_bits).alias("__sig"),
            )
            .select(
                "id", "__v",
                F.explode(
                    _band_keys_expr("__sig", bands, bits_per_band)
                ).alias("bk"),
            )
            .select(
                "id", "__v",
                F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
            )
        )
        pairs = cband.join(F.broadcast(bband), ["band", "key"])
    return (
        pairs.select(
            "id",
            F.col("__bid").alias("bench_id"),
            F.round(cosine(F.col("__v"), F.col("__bv")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )
