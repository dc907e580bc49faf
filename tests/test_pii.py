"""PII detection/redaction pack (functions/pii.py): exact counts and
redacted bytes on handcrafted rows, NULL containment, idempotence
(property-tested — the repo's canonicalizer rule), and the curate step.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from validate_xml_rust_spark.functions.pii import (
    PII_COLUMNS,
    pii_signals,
    redact_pii,
)


def _one(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_pii_counts_and_redaction(spark):
    txt = (
        "Write to alice.smith+news@sub.example.co.uk or bob@ex.org, "
        "call (555) 012-3456 or 555.012.3456, server at 10.1.2.3 "
        "and 192.168.255.1."
    )
    got = pii_signals(_one(spark, txt), "text").collect()[0]
    assert got["n_emails"] == 2
    assert got["n_phones"] == 2
    assert got["n_ipv4"] == 2
    assert got["pii_total"] == 6 and got["has_pii"] is True

    red = redact_pii(_one(spark, txt), "text").collect()[0]["text"]
    assert red == (
        "Write to |||EMAIL_ADDRESS||| or |||EMAIL_ADDRESS|||, "
        "call |||PHONE_NUMBER||| or |||PHONE_NUMBER|||, "
        "server at |||IP_ADDRESS||| and |||IP_ADDRESS|||."
    )


def test_pii_clean_text_untouched(spark):
    txt = "No identifiers here: meeting at 3pm, room 204, v1.2 release."
    row = pii_signals(_one(spark, txt), "text").collect()[0]
    assert row["pii_total"] == 0 and row["has_pii"] is False
    assert (
        redact_pii(_one(spark, txt), "text").collect()[0]["text"] == txt
    )


def test_pii_null_containment(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = pii_signals(df, "text").collect()[0]
    assert row["n_emails"] == 0 and row["pii_total"] == 0
    assert row["has_pii"] is False
    assert redact_pii(df, "text").collect()[0]["text"] is None


def test_pii_out_col_and_column_set(spark):
    df = redact_pii(_one(spark, "a@b.io"), "text", out_col="clean")
    row = df.collect()[0]
    assert row["text"] == "a@b.io" and row["clean"] == "|||EMAIL_ADDRESS|||"
    sig = pii_signals(_one(spark, "x"), "text")
    assert [c for c in sig.columns if c not in ("doc_id", "text")] == list(
        PII_COLUMNS
    )


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            list("abc @.+-()0123456789\n") + ["@ex.org", "10.1.2.3", "555"]
        ),
        max_size=12,
    )
)
def test_pii_redaction_idempotent(spark_prop, s):
    df = _one(spark_prop, "".join(s))
    once = redact_pii(df, "text").collect()[0]["text"]
    twice = redact_pii(redact_pii(df, "text"), "text").collect()[0]["text"]
    assert once == twice


def test_curate_redact_pii_step(spark):
    from validate_xml_rust_spark.pipeline import curate

    docs = spark.createDataFrame(
        [
            (1, "keep me, mail root@host.example.com today"),
            (2, "plain text, nothing sensitive"),
            (3, "node 10.0.0.1 answers (555) 123-4567"),
        ],
        "doc_id long, text string",
    )
    res = curate(docs, spark, near_dup_threshold=None)
    assert res.kept.count() == 3  # no redaction step configured
    res = curate(docs, spark, near_dup_threshold=None, pii_redact=True)
    rows = {r["doc_id"]: r["text"] for r in res.kept.collect()}
    assert rows[1] == "keep me, mail |||EMAIL_ADDRESS||| today"
    assert rows[2] == "plain text, nothing sensitive"
    assert rows[3] == "node |||IP_ADDRESS||| answers |||PHONE_NUMBER|||"
    step_names = [s["step"] for s in res.report["steps"]]
    assert "pii_redact" in step_names
    entry = next(s for s in res.report["steps"] if s["step"] == "pii_redact")
    assert entry["rows_in"] == entry["rows_out"] == 3
