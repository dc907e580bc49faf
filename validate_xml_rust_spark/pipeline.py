"""End-to-end corpus curation: the pipeline a training-data user actually
runs, assembled from the engine's operators with a per-step lineage
report.

    validate → exact dedup → near dedup → decontaminate →
    repetition filter → deterministic sample → sequence packing

Every step is the already-gate-checked operator; this module is the glue
plus drop accounting (``report['steps']``: step, rows_in, rows_out,
dropped). Steps are skipped when their knob is None — the pipeline
degrades to exactly the steps you configure.

Scale shape: one validation scan; dedup/near-dedup shuffle hash keys;
decontamination broadcasts the benchmark; sampling and the repetition
filter are stateless predicates; packing is per-shard sequential. Between
steps the surviving id set is carried as a DataFrame — no driver-side
materialization of row data (counts only)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CurationResult:
    kept: DataFrame
    packs: DataFrame | None
    report: dict = field(default_factory=dict)


def curate(
    df: DataFrame,
    spark: SparkSession,
    registry=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    route_col: str = "lang",
    benchmark: DataFrame | None = None,
    near_dup_threshold: float | None = 0.8,
    max_repetition: float | None = None,
    sample_rate: float | None = None,
    pack_max_tokens: int | None = None,
    contamination_n: int = 8,
) -> CurationResult:
    """Run the configured curation steps in order; every step logs
    (rows_in, rows_out) into ``result.report['steps']``."""
    steps: list[dict] = []
    cur = df
    n = cur.count()

    def log(step: str, out_df: DataFrame) -> DataFrame:
        nonlocal n
        m = out_df.count()
        steps.append({"step": step, "rows_in": n, "rows_out": m, "dropped": n - m})
        n = m
        return out_df

    if registry is not None:
        from validate_xml_rust_spark.operators.validate import validate

        res = validate(
            cur.withColumn("__cid", F.col(id_col).cast("string")),
            spark, registry, route_col=route_col, id_col="__cid",
            partition_col=None,
        )
        valid_ids = res.verdicts.filter(F.col("status") == "valid").select(
            F.col("url").alias("__vid")
        )
        cur = log(
            "validate",
            cur.join(
                valid_ids, cur[id_col].cast("string") == F.col("__vid"), "left_semi"
            ),
        )

    from validate_xml_rust_spark.operators.dedup import exact_dedup, near_dedup

    cur = log("exact_dedup", exact_dedup(cur, id_col, text_col))
    if near_dup_threshold is not None:
        cur = log(
            "near_dedup",
            near_dedup(cur, id_col, text_col, threshold=near_dup_threshold),
        )

    if benchmark is not None:
        from validate_xml_rust_spark.operators.curation import contamination_flags

        flags = contamination_flags(
            cur, benchmark, id_col=id_col, text_col=text_col, n=contamination_n
        )
        clean = flags.filter(~F.col("contaminated")).select(
            F.col(id_col).alias("__kid")
        )
        cur = log(
            "decontaminate",
            cur.join(clean, cur[id_col] == F.col("__kid"), "left_semi"),
        )

    if max_repetition is not None:
        from validate_xml_rust_spark.operators.textstats import repetition_stats

        rep = repetition_stats(cur, text_col, flag_threshold=max_repetition)
        cur = log("repetition_filter", rep.filter(~F.col("repetitive")).drop(
            "unigram_rep", "bigram_rep", "repetitive"
        ))

    if sample_rate is not None:
        from validate_xml_rust_spark.operators.curation import hash_sample

        cur = log("sample", hash_sample(cur, sample_rate, id_col))

    packs = None
    if pack_max_tokens is not None:
        from validate_xml_rust_spark.operators.curation import pack_sequences
        from validate_xml_rust_spark.operators.textstats import token_stats

        with_tokens = token_stats(cur, text_col).withColumn(
            "partition_id", F.spark_partition_id()
        )
        packs = pack_sequences(with_tokens, pack_max_tokens, id_col=id_col)
        steps.append(
            {
                "step": "pack",
                "rows_in": n,
                "rows_out": n,
                "dropped": 0,
                "n_packs": packs.select("pack_id").distinct().count(),
            }
        )

    return CurationResult(kept=cur, packs=packs, report={"steps": steps})
