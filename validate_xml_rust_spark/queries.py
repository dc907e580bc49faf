"""Driver-facing query pack: each entry pairs a Spark DataFrame program with
an ANSI-SQL oracle (DuckDB) over the same parquet tables.

Conventions (driver contract):
- every computed column is aliased identically in Spark and SQL,
- money sums go through DECIMAL(18,2) on BOTH sides (exact, order-
  independent — double sums differ across engines in the last ulps),
- rates/ratios are rounded to 6 decimals on both sides,
- deterministic ORDER BY friendly output (driver sorts anyway).

The validation queries run the real engine (specs → verdicts → violations →
summary) over the ``documents`` table; the oracle re-states the same
semantics in SQL, proving the rule compiler's Column-expression output
agrees with a from-scratch declarative restatement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from validate_xml_rust_spark.operators.referential import referential_violations
from validate_xml_rust_spark.operators.summary import summarize
from validate_xml_rust_spark.operators.uniqueness import duplicate_keys
from validate_xml_rust_spark.operators.validate import validate
from validate_xml_rust_spark.specs import Constraint, Spec, SpecRegistry


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Documents validation spec: routed by lang; es → missing spec (error row),
# zh → unrouted (skipped), en/de/fr → doc-v1.
# ---------------------------------------------------------------------------

DOC_ROUTED = ["en", "de", "fr"]
DOC_MISSING_ROUTE = "es"  # routed to a spec_id absent from the registry
N_CHARS_LO, N_CHARS_HI = 100, 450


def doc_registry() -> SpecRegistry:
    spec = Spec(
        "doc-v1",
        (
            Constraint("text_not_null", "text", "not_null"),
            Constraint("n_chars_range", "n_chars", "range", {"lo": N_CHARS_LO, "hi": N_CHARS_HI}),
            Constraint("source_format", "source", "regex", {"pattern": r"^src[0-9]+$"}),
            Constraint("text_matches_n_chars", "n_chars", "expr",
                       {"predicate": "length(text) = n_chars"}),
        ),
    )
    reg = SpecRegistry().add(spec, route_keys=DOC_ROUTED)
    reg.add_route(DOC_MISSING_ROUTE, "doc-missing-v9")
    return reg


def _doc_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").withColumn(
        "doc_key", F.col("doc_id").cast("string")
    )
    res = validate(
        docs, spark, doc_registry(), route_col="lang", id_col="doc_key",
        partition_col=None,
    )
    return res


# The oracle restatement of doc-v1's row checks (used by several oracles).
_ORACLE_FAILS = f"""
    (CASE WHEN text IS NULL THEN 1 ELSE 0 END)
  + (CASE WHEN n_chars IS NOT NULL AND (n_chars < {N_CHARS_LO} OR n_chars > {N_CHARS_HI}) THEN 1 ELSE 0 END)
  + (CASE WHEN source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]+$') THEN 1 ELSE 0 END)
  + (CASE WHEN NOT coalesce(length(text) = n_chars, FALSE) THEN 1 ELSE 0 END)
"""

_ORACLE_STATUS = f"""
  CASE WHEN lang IS NULL OR lang NOT IN ('en','de','fr','es') THEN 'skipped'
       WHEN lang = 'es' THEN 'error'
       WHEN ({_ORACLE_FAILS}) > 0 THEN 'invalid'
       ELSE 'valid' END
"""


def q_validate_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _doc_verdicts(spark, sf_dir).verdicts
    return v.select(
        F.col("url").alias("doc_key"),
        "spec_id",
        "status",
        "error_count",
    )


ORACLE_VALIDATE_VERDICTS = f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_key,
       CASE WHEN lang IN ('en','de','fr') THEN 'doc-v1'
            WHEN lang = 'es' THEN 'doc-missing-v9' END AS spec_id,
       {_ORACLE_STATUS} AS status,
       CAST(CASE WHEN ({_ORACLE_STATUS}) = 'invalid' THEN ({_ORACLE_FAILS}) ELSE 0 END AS INT) AS error_count
FROM documents
"""


def q_validate_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _doc_verdicts(spark, sf_dir).violations()
    return v.select(
        F.col("url").alias("doc_key"), "constraint_id", "observed_value"
    )


ORACLE_VALIDATE_VIOLATIONS = f"""
WITH routed AS (SELECT * FROM documents WHERE lang IN ('en','de','fr'))
SELECT CAST(doc_id AS VARCHAR) AS doc_key, 'text_not_null' AS constraint_id,
       '<null>' AS observed_value
FROM routed WHERE text IS NULL
UNION ALL
SELECT CAST(doc_id AS VARCHAR), 'n_chars_range', CAST(n_chars AS VARCHAR)
FROM routed WHERE n_chars IS NOT NULL AND (n_chars < {N_CHARS_LO} OR n_chars > {N_CHARS_HI})
UNION ALL
SELECT CAST(doc_id AS VARCHAR), 'source_format', CAST(source AS VARCHAR)
FROM routed WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]+$')
UNION ALL
SELECT CAST(doc_id AS VARCHAR), 'text_matches_n_chars', coalesce(CAST(n_chars AS VARCHAR), '<null>')
FROM routed WHERE NOT coalesce(length(text) = n_chars, FALSE)
"""


def q_validate_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _doc_verdicts(spark, sf_dir).verdicts
    s = summarize(v)
    return s.select(
        "total", "valid", "invalid", "error", "skipped",
        F.round("success_rate", 6).alias("success_rate"),
        F.concat_ws(",", "schemas_used").alias("schemas_used"),
    )


ORACLE_VALIDATE_SUMMARY = f"""
WITH v AS (SELECT {_ORACLE_STATUS} AS status FROM documents)
SELECT count(*) AS total,
       count(*) FILTER (WHERE status='valid') AS valid,
       count(*) FILTER (WHERE status='invalid') AS invalid,
       count(*) FILTER (WHERE status='error') AS error,
       count(*) FILTER (WHERE status='skipped') AS skipped,
       round(count(*) FILTER (WHERE status='valid') * 100.0 / count(*), 6) AS success_rate,
       'doc-missing-v9,doc-v1' AS schemas_used
FROM v
"""


def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from validate_xml_rust_spark.operators.profile import profile

    docs = _t(spark, sf_dir, "documents")
    p = profile(docs, ["lang", "source", "n_chars"])
    return p.select(
        "column_name",
        F.round("null_rate", 6).alias("null_rate"),
        "n_distinct", "min_value", "max_value",
    )


ORACLE_PROFILE_DOCUMENTS = """
SELECT 'lang' AS column_name,
       round(CAST(count(*) FILTER (WHERE lang IS NULL) AS DOUBLE)/count(*), 6) AS null_rate,
       count(DISTINCT lang) AS n_distinct,
       CAST(min(lang) AS VARCHAR) AS min_value, CAST(max(lang) AS VARCHAR) AS max_value
FROM documents
UNION ALL
SELECT 'source', round(CAST(count(*) FILTER (WHERE source IS NULL) AS DOUBLE)/count(*), 6),
       count(DISTINCT source), CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
FROM documents
UNION ALL
SELECT 'n_chars', round(CAST(count(*) FILTER (WHERE n_chars IS NULL) AS DOUBLE)/count(*), 6),
       count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
FROM documents
"""


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from validate_xml_rust_spark.operators.profile import length_histogram

    docs = _t(spark, sf_dir, "documents")
    return length_histogram(docs, "text", lo=0, hi=600, n_buckets=12)


ORACLE_LENGTH_HISTOGRAM = """
WITH b AS (
  SELECT least(greatest(CAST(floor(length(text)/50) AS INT), 0), 11) AS bucket
  FROM documents WHERE text IS NOT NULL)
SELECT bucket, CAST(bucket*50 AS INT) AS bucket_lo,
       CAST((bucket+1)*50 AS INT) AS bucket_hi, count(*) AS n
FROM b GROUP BY bucket
"""


def q_duplicate_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return duplicate_keys(orders, ["o_custkey"], n_salts=8)


ORACLE_DUPLICATE_CUSTKEYS = """
SELECT o_custkey, count(*) AS n_dup FROM orders
GROUP BY o_custkey HAVING count(*) > 1
"""


def q_referential_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # parent = "registered" customers (positive balance) — planted misses
    parents = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    return referential_violations(
        orders, parents, "o_custkey", "c_custkey",
        constraint_id="custkey_in_registry", id_col="o_orderkey",
    )


ORACLE_REFERENTIAL_ORDERS = """
SELECT CAST(o_orderkey AS VARCHAR) AS url,
       'custkey_in_registry' AS constraint_id,
       CAST(o_custkey AS VARCHAR) AS observed_value,
       'o_custkey not found in parent c_custkey' AS message
FROM orders
WHERE o_custkey IS NOT NULL
  AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
"""


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped flagship aggregate (SURVEY.md A1/A2 analog at scale).

    DECIMAL sums for engine-exact equality with the oracle."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
            F.sum(dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - disc))
            .cast("decimal(28,6)").alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
       sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(28,6)) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: orders ⋈ customer ⋈ nation — dims broadcast explicitly."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


ORACLE_REVENUE_BY_NATION = """
SELECT n_name, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window batch aggregation (streaming A1 analog)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


ORACLE_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


QUERIES = {
    "validate_verdicts": q_validate_verdicts,
    "validate_violations": q_validate_violations,
    "validate_summary": q_validate_summary,
    "profile_documents": q_profile_documents,
    "length_histogram": q_length_histogram,
    "duplicate_custkeys": q_duplicate_custkeys,
    "referential_orders": q_referential_orders,
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "events_hourly": q_events_hourly,
}

ORACLES = {
    "validate_verdicts": ORACLE_VALIDATE_VERDICTS,
    "validate_violations": ORACLE_VALIDATE_VIOLATIONS,
    "validate_summary": ORACLE_VALIDATE_SUMMARY,
    "profile_documents": ORACLE_PROFILE_DOCUMENTS,
    "length_histogram": ORACLE_LENGTH_HISTOGRAM,
    "duplicate_custkeys": ORACLE_DUPLICATE_CUSTKEYS,
    "referential_orders": ORACLE_REFERENTIAL_ORDERS,
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "revenue_by_nation": ORACLE_REVENUE_BY_NATION,
    "events_hourly": ORACLE_EVENTS_HOURLY,
}
