"""Human-readable run report — the stdout sink (S8,
reference src/output.rs:35-195) transposed to the engine.

The report renders from a COLLECTED summary row + (optionally) the
non-valid verdicts, so nothing here touches executors: the heavy outputs
(violations, metrics) go to parquet sinks; this is the operator-console
view. Verbosity levels mirror the reference: 0 summary only, 1 + failures
per row (src/output.rs:51-57 prints only non-valid), 2 + performance."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def format_duration_ms(ms: float) -> str:
    """Duration buckets exactly like src/output.rs:198-209 (ms / s / m)."""
    if ms < 1000:
        return f"{ms:.0f}ms"
    if ms < 60_000:
        return f"{ms / 1000:.2f}s"
    return f"{ms / 60_000:.1f}m"


def format_summary(summary: dict, wall_ms: float | None = None) -> str:
    lines = [
        "Validation Results",
        "==================",
        f"Total:   {summary['total']}",
        f"Valid:   {summary['valid']}",
        f"Invalid: {summary['invalid']}",
        f"Errors:  {summary['error']}",
        f"Skipped: {summary['skipped']}",
        f"Success rate: {summary['success_rate']:.1f}%",
        f"Specs used: {', '.join(summary.get('schemas_used') or []) or '(none)'}",
    ]
    if wall_ms is not None:
        thr = summary["total"] / (wall_ms / 1000) if wall_ms > 0 else 0.0
        lines.append(f"Duration: {format_duration_ms(wall_ms)}")
        lines.append(f"Throughput: {thr:,.0f} docs/sec")
    return "\n".join(lines)


def format_failures(verdicts: DataFrame, limit: int = 50) -> str:
    """Verbose view: only non-valid rows (P7), '<url>: <status>: details'."""
    rows = (
        verdicts.filter(F.col("status") != "valid")
        .select("url", "status", "error_details")
        .limit(limit)
        .collect()
    )
    out = []
    for r in rows:
        details = "; ".join(r["error_details"] or [])
        out.append(f"{r['url'] or '<null>'}: {r['status']}: {details}")
    return "\n".join(out)


def report(
    verdicts: DataFrame,
    verbosity: int = 0,
    wall_ms: float | None = None,
    perf: dict | None = None,
) -> str:
    from validate_xml_rust_spark.operators.summary import summarize

    srow = summarize(verdicts).collect()[0].asDict()
    parts = [format_summary(srow, wall_ms)]
    if verbosity >= 1:
        failures = format_failures(verdicts)
        if failures:
            parts.append("\nFailures\n--------\n" + failures)
    if verbosity >= 2 and perf:
        parts.append(
            "\nPerformance\n-----------\n"
            + "\n".join(f"{k}: {v}" for k, v in sorted(perf.items()))
        )
    return "\n".join(parts)
