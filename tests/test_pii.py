"""PII redaction integration surface (operators/curation.redact_pii —
the q:redact_pii-gated operator): idempotence (property-tested, the
repo's canonicalizer rule), NULL containment, and the curate step added
in r6 (core counts/output tests live in tests/test_curation.py)."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from validate_xml_rust_spark.operators.curation import redact_pii


def _one(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_pii_redaction_all_three_classes(spark):
    txt = (
        "Write to alice.smith+news@sub.example.co.uk or bob@ex.org, "
        "call 555-012-3456 or 555.012.3456, server at 10.1.2.3 "
        "and 192.168.255.1."
    )
    row = redact_pii(_one(spark, txt), "text").collect()[0]
    assert row["n_email"] == 2 and row["n_phone"] == 2 and row["n_ip"] == 2
    assert row["redacted"] == (
        "Write to <EMAIL> or <EMAIL>, call <PHONE> or <PHONE>, "
        "server at <IP> and <IP>."
    )


def test_pii_null_and_clean_text(spark):
    # NULL text: the operator's documented coalesce-to-'' semantics
    row = redact_pii(
        spark.createDataFrame([(1, None)], "doc_id long, text string"),
        "text",
    ).collect()[0]
    assert row["n_email"] == 0 and row["redacted"] == ""
    clean = "No identifiers here: meeting at 3pm, room 204, v1.2 release."
    assert redact_pii(_one(spark, clean), "text").collect()[0]["redacted"] == clean


def test_pii_in_place_out_col(spark):
    row = redact_pii(_one(spark, "a@b.io"), "text", out_col="text").collect()[0]
    assert row["text"] == "<EMAIL>"


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            list("abc @.+-()0123456789\n") + ["@ex.org", "10.1.2.3", "555-123-4567"]
        ),
        max_size=12,
    )
)
def test_pii_redaction_idempotent(spark_prop, s):
    df = _one(spark_prop, "".join(s))
    once = redact_pii(df, "text").collect()[0]["redacted"]
    twice = redact_pii(
        redact_pii(df, "text", out_col="text"), "text"
    ).collect()[0]["redacted"]
    assert once == twice


def test_curate_redact_pii_step(spark):
    from validate_xml_rust_spark.pipeline import curate

    docs = spark.createDataFrame(
        [
            (1, "keep me, mail root@host.example.com today"),
            (2, "plain text, nothing sensitive"),
            (3, "node 10.0.0.1 answers 555-123-4567"),
        ],
        "doc_id long, text string",
    )
    res = curate(docs, spark, near_dup_threshold=None)
    assert res.kept.count() == 3  # no redaction step configured
    assert "pii_redact" not in [s["step"] for s in res.report["steps"]]
    res = curate(docs, spark, near_dup_threshold=None, pii_redact=True)
    rows = {r["doc_id"]: r["text"] for r in res.kept.collect()}
    assert rows[1] == "keep me, mail <EMAIL> today"
    assert rows[2] == "plain text, nothing sensitive"
    assert rows[3] == "node <IP> answers <PHONE>"
    # audit counts are report concerns, not pipeline schema
    assert set(res.kept.columns) == {"doc_id", "text"}
    entry = next(s for s in res.report["steps"] if s["step"] == "pii_redact")
    assert entry["rows_in"] == entry["rows_out"] == 3
