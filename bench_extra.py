"""Round-7 optimization micro-bench (guide §1.4): isolated per-operator
timings with the noop sink, independent of the frozen ``bench.py``.

Usage::

    python bench_extra.py [entry ...]        # default: all entries
    BENCH_EXTRA_REPS=3 python bench_extra.py langid streaming

Prints one JSON line per entry: {"entry": ..., "secs": [rep, ...]} and a
final summary line. Entries mirror the heavy ``bench.py`` keys but time
ONLY the operator under study (noop-style full evaluation via the same
bit_xor/xxhash64 force as bench.py), so a change's effect is readable
without a 18-minute full-bench run. Reuses bench.py's ``_force`` and
``_sweep`` so the measurement methodology matches the frozen harness.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench as _b  # reuse _force/_sweep so methodology matches

REPS = int(os.environ.get("BENCH_EXTRA_REPS", "2"))


def _time(fn) -> list[float]:
    out = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 3))
        _b._sweep()
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from validate_xml_rust_spark import get_spark

    want = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="vxrs-bench-extra", cpus=cpus, shuffle_partitions=cpus)
    _b._SPARK = spark
    results: dict[str, list[float]] = {}

    def run(name: str, setup, fn) -> None:
        if want and not any(w in name for w in want):
            return
        ctx = setup() if setup else None
        spark.sparkContext.setJobDescription(name)
        fn(ctx)  # warmup
        _b._sweep()
        results[name] = _time(lambda: fn(ctx))
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({"entry": name, "secs": results[name]}), flush=True)

    import tempfile

    # ---- corpora (untimed setup, parquet-materialized like bench.py) ----
    from validate_xml_rust_spark.sources.corpus import (
        prose_documents,
        synthetic_documents,
    )

    corpus = synthetic_documents(spark, 100_000, cpus * 2)

    def _prose():
        d = tempfile.mkdtemp(prefix="bx_presets_") + "/docs"
        prose_documents(spark, 100_000, cpus * 2).write.mode("overwrite").parquet(d)
        return spark.read.parquet(d)

    # ---- minhash core ----
    from validate_xml_rust_spark.operators.dedup import (
        minhash_near_duplicates,
        near_dedup,
    )

    run(
        "minhash_dedup_100k", None,
        lambda _: _b._force(minhash_near_duplicates(corpus, threshold=0.6)),
    )

    # signing stage alone (the Arrow hot path)
    from validate_xml_rust_spark.functions.texthash import (
        minhash_signature,
        minhash_signature_from_text,
        shingle_hashes,
    )

    run(
        "minhash_sign_only_100k", None,
        lambda _: _b._force(
            corpus.select(
                "doc_id",
                minhash_signature_from_text(F.col("text"), 3, 32).alias("sig"),
            )
        ),
    )
    run(
        "shingle_hashes_100k", None,
        lambda _: _b._force(
            corpus.select(
                "doc_id", shingle_hashes(F.col("text"), 3).alias("sh")
            )
        ),
    )

    # ---- curate presets ----
    from validate_xml_rust_spark.pipeline import curate, preset_kwargs

    def _preset_setup():
        pc = _prose()
        return pc

    for preset in ("c4", "gopher", "web", "dolma"):
        def _run_preset(pc, preset=preset):
            kw = preset_kwargs(preset)
            res = curate(pc, spark, **kw)
            res.release()

        run(f"curate_{preset}_100k", _preset_setup, _run_preset)

    run(
        "curate_100k", None,
        lambda _: (lambda r: r.release())(
            curate(corpus, spark, near_dup_threshold=0.6, sample_rate=0.9,
                   pack_max_tokens=2048)
        ),
    )

    # ---- langid ----
    from validate_xml_rust_spark.operators.textstats import (
        langid_predict,
        langid_train,
    )
    from validate_xml_rust_spark.sources.corpus import lang_corpus

    def _langid_setup():
        d = tempfile.mkdtemp(prefix="bx_langid_") + "/docs"
        lang_corpus(spark, 200_000, cpus * 2).write.mode("overwrite").parquet(d)
        return spark.read.parquet(d)

    def _run_langid(lc):
        w = langid_train(lc.filter(F.col("doc_id") < 50_000))
        _b._force(langid_predict(lc, w).groupBy("lang", "detected_lang").count())

    run("langid_train_score_200k", _langid_setup, _run_langid)

    # ---- streaming gates (as the QUERIES entries time them) ----
    from validate_xml_rust_spark.queries import (
        q_streaming_first_seen,
        q_streaming_neardup,
    )

    run(
        "streaming_neardup", None,
        lambda _: _b._force(q_streaming_neardup(spark, sf_dir)),
    )
    run(
        "streaming_first_seen", None,
        lambda _: _b._force(q_streaming_first_seen(spark, sf_dir)),
    )

    # ---- incremental dedup gate + bench entry ----
    from validate_xml_rust_spark.queries import q_incremental_dedup

    run(
        "incremental_dedup", None,
        lambda _: _b._force(q_incremental_dedup(spark, sf_dir)),
    )

    from validate_xml_rust_spark.operators.dedup import (
        SignatureStore,
        incremental_near_dedup,
    )

    def _incr_setup():
        store = SignatureStore(spark, tempfile.mkdtemp(prefix="bx_ss_"))
        incremental_near_dedup(
            corpus.filter(F.col("doc_id") % 2 == 0), store, threshold=0.6
        )
        _b._sweep()
        return store

    run(
        "incremental_neardup_100k", _incr_setup,
        lambda store: _b._force(
            incremental_near_dedup(
                corpus.filter(F.col("doc_id") % 2 == 1), store,
                threshold=0.6, commit=False,
            )
        ),
    )

    # ---- incremental validate at pages scale ----
    def _iv_setup():
        from validate_xml_rust_spark.ckpt import eager_checkpoint
        from validate_xml_rust_spark.operators.resume import content_fingerprint
        from validate_xml_rust_spark.operators.validate import validate as _v
        from validate_xml_rust_spark.sources.pages import LANGS, pages, with_partition_id
        from validate_xml_rust_spark.specs import Constraint, Spec, SpecRegistry

        pg = with_partition_id(pages(spark, 1_000_000, cpus * 2), 64)
        reg = SpecRegistry().add(
            Spec(
                "webpage-v1",
                (
                    Constraint("url_not_null", "url", "not_null"),
                    Constraint("url_format", "url", "regex", {"pattern": r"^https?://.*"}),
                    Constraint("html_utf8", "html", "utf8", severity="error"),
                    Constraint("lang_enum", "lang", "isin", {"values": LANGS}),
                ),
            ),
            route_keys=LANGS,
        )
        fcols = ["text", "lang"]
        prior_pages = pg.filter(F.coalesce(F.xxhash64("url") % 4, F.lit(0)) != 0)
        pv = _v(prior_pages, spark, reg).verdicts.select(
            F.col("url"), "spec_id", "status", "error_count"
        )
        prior, ids = eager_checkpoint(
            prior_pages.select("url", content_fingerprint(fcols).alias("content_fp"))
            .join(pv, "url")
            .dropDuplicates(["url"])
        )
        _b._PROTECT.update(ids)
        return (pg, prior, reg, fcols)

    def _run_iv(ctx):
        from validate_xml_rust_spark.operators.resume import incremental_verdicts

        pg, prior, reg, fcols = ctx
        _b._force(
            incremental_verdicts(pg, prior, spark, reg, fcols).select(
                "url", "status", "error_count", "revalidated"
            )
        )

    run("incremental_validate_pages", _iv_setup, _run_iv)

    total = {k: min(v) for k, v in results.items()}
    print(json.dumps({"summary_min": total, "reps": REPS, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
