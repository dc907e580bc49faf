"""As-of join operator: backward/forward semantics, tolerance, ties."""

from __future__ import annotations

from datetime import datetime

from validate_xml_rust_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2025-01-01 10:00:00")),
            (2, "u1", _ts("2025-01-01 12:00:00")),
            (3, "u2", _ts("2025-01-01 09:00:00")),  # before any right row
            (4, "u3", _ts("2025-01-01 10:00:00")),  # equal-ts match
        ],
        "event_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2025-01-01 09:30:00"), 10.0),
            ("u1", _ts("2025-01-01 11:00:00"), 20.0),
            ("u2", _ts("2025-01-01 09:30:00"), 30.0),
            ("u3", _ts("2025-01-01 10:00:00"), 40.0),
        ],
        "user string, ts timestamp, value double",
    )
    return left, right


def test_asof_backward(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(
            left, right, "user", "ts", "ts", ["value"]
        ).collect()
    }
    assert out[1] == (_ts("2025-01-01 09:30:00"), 10.0)  # most recent <=
    assert out[2] == (_ts("2025-01-01 11:00:00"), 20.0)
    assert out[3] == (None, None)  # nothing at or before
    assert out[4] == (_ts("2025-01-01 10:00:00"), 40.0)  # ts equality counts


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            left, right, "user", "ts", "ts", ["value"],
            tolerance_seconds=1800,
        ).collect()
    }
    assert out[1] == 10.0  # 30 min back — inside tolerance
    assert out[2] is None  # nearest is 60 min back — outside
    assert out[4] == 40.0


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            left, right, "user", "ts", "ts", ["value"], direction="forward"
        ).collect()
    }
    assert out[3] == 30.0  # next right row at/after 09:00 is 09:30
    assert out[1] == 20.0  # next at/after 10:00 is 11:00
    assert out[2] is None  # nothing after 12:00


def test_asof_partitioning_invariance(spark):
    left, right = _frames(spark)
    a = sorted(
        (r["event_id"], r["asof_value"])
        for r in asof_join(left.repartition(1), right.repartition(1), "user", "ts", "ts", ["value"]).collect()
    )
    b = sorted(
        (r["event_id"], r["asof_value"])
        for r in asof_join(left.repartition(7), right.repartition(5), "user", "ts", "ts", ["value"]).collect()
    )
    assert a == b


def test_asof_chunked_equals_unchunked(spark):
    """Time-chunk salting with boundary carry-over: identical output to
    the single-window path, including matches that reach across many empty
    chunks, for both directions and with tolerance."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    base = datetime(2025, 3, 1)
    # hot key "h": 400 clicks, sparse purchases; cold key "c": a handful.
    # Unique ts per (key, side) → tie-free, so outputs compare exactly.
    left_rows, right_rows = [], []
    for i in range(400):
        left_rows.append((i, "h", base + timedelta(seconds=37 * i + 1)))
    for i in range(12):
        right_rows.append(("h", base + timedelta(seconds=1200 * i), float(i)))
    for i in range(5):
        left_rows.append((1000 + i, "c", base + timedelta(seconds=500 * i + 3)))
    right_rows.append(("c", base + timedelta(seconds=2), 99.0))
    left = spark.createDataFrame(left_rows, "eid long, k string, ts timestamp")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp, v double")

    def run(**kw):
        out = asof_join(left, right, "k", "ts", "ts", ["v"], **kw)
        return sorted(
            (r["eid"], r["asof_ts"], r["asof_v"]) for r in out.collect()
        )

    for direction in ("backward", "forward"):
        for tol in (None, 1800):
            a = run(direction=direction, tolerance_seconds=tol)
            b = run(direction=direction, tolerance_seconds=tol, chunk_seconds=600)
            assert a == b, (direction, tol)

    # the chunked plan really partitions the window on (key, chunk)
    plan = asof_join(
        left, right, "k", "ts", "ts", ["v"], chunk_seconds=600
    )._jdf.queryExecution().sparkPlan().toString()
    assert "__chunk" in plan.split("Window")[1][:400]
