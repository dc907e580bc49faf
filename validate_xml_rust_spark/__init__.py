"""validate_xml_rust_spark — a PySpark-native schema + constraint validation engine.

Re-expresses the capabilities of FranklinChen/validate-xml-rust (a concurrent
per-file XSD validator, /root/reference) as an idiomatic Spark DataFrame
pipeline over web-scale page tables ``(url, warc_ts, html, text, lang)``:

* a rule compiler turning declarative constraint specs into vectorized
  Column expressions (``specs.py``),
* per-row 4-state verdicts ``valid|invalid|error|skipped`` with the
  reference's exact precedence (``operators/validate.py``,
  cf. reference src/validator.rs:61-70, 605-731),
* violation rows ``(url, constraint_id, observed_value)``,
* summary aggregation + exit-code contract (``operators/summary.py``,
  cf. src/validator.rs:233-352, src/main.rs:113-119),
* column profiling, salted uniqueness, referential anti-joins,
  distribution drift, dedup / similarity / text analysis operators.

Everything is ``pyspark.sql`` DataFrames + Column expressions; pandas/Arrow
UDFs only where expressions cannot express the semantics. No RDDs, no
per-row Python.
"""

__version__ = "0.1.0"

from validate_xml_rust_spark.session import get_spark  # noqa: F401
from validate_xml_rust_spark.specs import (  # noqa: F401
    Constraint,
    Spec,
    SpecRegistry,
    compile_spec,
)
