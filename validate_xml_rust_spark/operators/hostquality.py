"""Per-host (per-source) quality aggregation feeding spec constraints.

The one curation signal large-scale web pipelines apply at HOST grain
rather than document grain (public recipes: C4's blocklist domains,
Gopher/RefinedWeb per-domain quality filtering): aggregate a per-document
quality score by url-host and keep/drop whole hosts by their mean.

Scale shape: host keys are Zipf-skewed (one CDN host can own percents of
a crawl), so the aggregation is the salted two-phase groupBy from
operators/skew.py — never a single-reducer hot key. The per-doc score is
a pure codegen'd expression (operators/textstats.quality_score), so the
whole operator is scan → narrow projection → salted agg: one shuffle of
O(hosts × n_salts) partial rows.

Determinism contract (gate-friendly): the per-doc score is rounded to
6dp and accumulated in DECIMAL(18,6) — an exact, order-independent sum —
and the mean is computed once, in double, at the final projection. Both
engines therefore agree bit-for-bit (repo rule: accumulate exactly in
DECIMAL, cast at the final projection).

Reference analog: per-file verdict aggregation into per-schema summary
counts (src/validator.rs:346-352) — here lifted to per-host keep/drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from validate_xml_rust_spark.operators.skew import salted_agg


def group_quality_stats(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    quality_col: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Mean document quality per group: ``(group_col, n_docs,
    mean_quality)``. ``quality_col=None`` computes the heuristic
    textstats score inline (zero extra shuffle); pass a column name to
    aggregate an existing score (e.g. the trained model's probability).
    NULL groups are excluded (an unattributable doc has no host verdict);
    NULL scores count toward n_docs but not the mean's numerator — the
    mean divides by the number of SCORED docs."""
    if quality_col is None:
        from validate_xml_rust_spark.operators.textstats import quality_score

        scored = quality_score(df, text_col=text_col)
        quality_col = "quality"
    else:
        scored = df
    q6 = F.round(F.col(quality_col), 6).cast("decimal(18,6)")
    base = scored.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col), q6.alias("__q")
    )
    agg = salted_agg(
        base,
        [group_col],
        [("sum", "__q", "__sum_q"), ("count", None, "n_docs"),
         ("count", "__q", "__n_scored")],
    )
    return agg.select(
        F.col(group_col),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.when(
            F.col("__n_scored") > 0,
            F.round(
                F.col("__sum_q").cast("double") / F.col("__n_scored"), 6
            ),
        ).alias("mean_quality"),
    )


def host_quality_violations(
    df: DataFrame,
    group_col: str = "source",
    constraint_id: str = "host_quality",
    min_mean_quality: float = 0.5,
    min_docs: int = 1,
    text_col: str = "text",
    quality_col: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """One violation row per group whose mean quality falls below the
    threshold (with at least ``min_docs`` docs — tiny hosts are noise,
    not signal). Engine violation contract ``(url, constraint_id,
    observed_value, message)`` with the GROUP value as url — a host-level
    keep/drop verdict, exactly like the reference's per-schema failure
    summary lifted to table scope."""
    stats = group_quality_stats(
        df, group_col=group_col, text_col=text_col,
        quality_col=quality_col, n_salts=n_salts,
    )
    bad = stats.filter(
        (F.col("n_docs") >= min_docs)
        & F.col("mean_quality").isNotNull()
        & (F.col("mean_quality") < min_mean_quality)
    )
    return bad.select(
        F.col(group_col).cast("string").alias("url"),
        F.lit(constraint_id).alias("constraint_id"),
        F.col("mean_quality").cast("string").alias("observed_value"),
        F.concat(
            F.lit("host mean quality "),
            F.col("mean_quality").cast("string"),
            F.lit(f" < {min_mean_quality} over "),
            F.col("n_docs").cast("string"),
            F.lit(" docs"),
        ).alias("message"),
    )
