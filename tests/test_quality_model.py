"""Trainable quality classifier (operators/quality_model.py): training
determinism, holdout generalization, Arrow-vs-expression scoring parity,
and serialization roundtrip."""

from __future__ import annotations

from pyspark.sql import functions as F

from validate_xml_rust_spark.operators.quality_model import (
    QualityModel,
    score_quality,
    score_quality_expr,
    train_quality_model,
)
from validate_xml_rust_spark.sources.corpus import quality_corpus


def _acc(scored, n):
    return (
        scored.withColumn("pred", (F.col("quality_logit") > 0).cast("int"))
        .filter(F.col("pred") == F.col("label"))
        .count()
        / n
    )


def test_train_separates_and_generalizes(spark):
    corp = quality_corpus(spark, 600, 8)
    model = train_quality_model(corp)
    # spam tokens learn negative weight, function words positive
    assert model.weights["casino"] < 0 < model.weights["the"]
    assert _acc(score_quality(corp, model), 600) >= 0.99
    # holdout: unseen ids (the generators draw per-id pseudo-random words)
    hold = quality_corpus(spark, 1200, 8).filter(F.col("doc_id") >= 600)
    assert _acc(score_quality(hold, model), 600) >= 0.95


def test_train_deterministic(spark):
    corp = quality_corpus(spark, 400, 8)
    m1 = train_quality_model(corp, vocab_size=128, sample_cap=400, iters=50)
    m2 = train_quality_model(corp, vocab_size=128, sample_cap=400, iters=50)
    assert m1 == m2  # exact — zero init, fixed order, fixed iterations


def test_arrow_and_expression_paths_agree(spark):
    corp = quality_corpus(spark, 300, 4)
    model = train_quality_model(corp, vocab_size=128, sample_cap=300, iters=50)
    wdf = model.to_df(spark)
    arrow = score_quality(corp, model).select("doc_id", "quality_logit")
    expr = score_quality_expr(corp, wdf)
    joined = arrow.join(expr, "doc_id")
    # expression path rounds to 6dp; Arrow path is raw float64
    bad = joined.filter(
        F.abs(F.col("quality_logit") - F.col("logit")) > 1e-5
    ).count()
    assert bad == 0
    # keep flag consistent with the logit sign
    assert joined.filter(
        (F.col("logit") > 0) != F.col("keep")
    ).count() == 0


def test_null_and_empty_text_score_bias_only(spark):
    model = QualityModel(weights={"spam": -2.0}, bias=0.25)
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "spam spam")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r["quality_logit"]
        for r in score_quality(df, model).collect()
    }
    assert rows[0] == rows[1] == 0.25  # no tokens → bias alone
    assert abs(rows[2] - (0.25 - 4.0)) < 1e-12  # occurrences COUNT, not set
    # expression path: same rule (docs with no matched tokens keep bias)
    e = {
        r["doc_id"]: (r["logit"], r["keep"])
        for r in score_quality_expr(df, model.to_df(df.sparkSession)).collect()
    }
    assert e[0] == (0.25, True) and e[1] == (0.25, True)
    assert e[2] == (-3.75, False)


def test_model_roundtrip(spark):
    corp = quality_corpus(spark, 200, 4)
    model = train_quality_model(corp, vocab_size=64, sample_cap=200, iters=30)
    back = QualityModel.from_df(model.to_df(spark))
    assert back.bias == model.bias
    assert back.weights == model.weights  # 9dp rounding applied at train
