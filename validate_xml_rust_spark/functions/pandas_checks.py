"""Named Arrow-batched validators — the ``pandas_check`` constraint kind.

The north_star calls for "vectorized Column expressions AND pandas/Arrow
UDF batch validators": Column expressions cover everything structurally
expressible (specs.py); this registry holds the residue — checks that need
real parsing or stateful scanning per value, vectorized per Arrow batch
(never row-at-a-time Python through the JVM).

Contract: a checker takes a ``pd.Series`` and returns a boolean
``pd.Series`` (True = PASS). Null inputs must PASS (null-ness belongs to
``not_null``). A checker must contain its own errors (X9): any per-value
exception is a FAIL, never a task failure.

Checkers are referenced BY NAME from spec JSON (``params: {"checker":
"valid_json"}``) so specs stay declarative/serializable and arbitrary code
can't ride in through a spec file.
"""

from __future__ import annotations

import json
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _contained(fn: Callable[[object], bool]) -> Callable[[pd.Series], pd.Series]:
    def run(s: pd.Series) -> pd.Series:
        def one(v) -> bool:
            if v is None:
                return True
            try:
                return bool(fn(v))
            except Exception:
                return False

        return s.map(one)

    return run


def _valid_json(v) -> bool:
    json.loads(v)
    return True


def _balanced_tags(v) -> bool:
    """Angle-bracket tags open/close balanced (a cheap structural HTML
    sanity check — the kind of scan that's awkward as a Column expr)."""
    depth = 0
    i, n = 0, len(v)
    while i < n:
        if v[i] == "<":
            j = v.find(">", i + 1)
            if j < 0:
                return False
            tag = v[i + 1 : j].strip()
            if tag.startswith("!") or tag.startswith("?") or tag.endswith("/"):
                pass  # comment/decl/self-closing
            elif tag.startswith("/"):
                depth -= 1
                if depth < 0:
                    return False
            else:
                name = tag.split()[0].lower() if tag.split() else ""
                if name not in ("br", "hr", "img", "meta", "link", "input"):
                    depth += 1
            i = j + 1
        else:
            i += 1
    return depth == 0


def _ascii_printable(v) -> bool:
    return all(32 <= ord(c) < 127 or c in "\t\n\r" for c in v)


CHECKERS: dict[str, Callable[[pd.Series], pd.Series]] = {
    "valid_json": _contained(_valid_json),
    "balanced_tags": _contained(_balanced_tags),
    "ascii_printable": _contained(_ascii_printable),
}


def pandas_check_column(
    checker_name: str, col: Column, batch_timeout_ms: float | None = None
) -> Column:
    """Boolean PASS column for a named checker (Arrow-batched).

    ``batch_timeout_ms`` is the X7 analog (reference per-file timeout,
    src/validator.rs:549-569): Spark has no per-row preemption, so the
    closest safe contract is a wall-clock budget per Arrow batch —
    evaluation proceeds in slices, and once the budget is spent the
    REMAINING values return NULL (= "not evaluated"), which the spec
    compiler surfaces as ``error``-severity timeout violations rather
    than a hung task."""
    try:
        checker = CHECKERS[checker_name]
    except KeyError:
        raise ValueError(
            f"unknown pandas checker {checker_name!r}; registered: {sorted(CHECKERS)}"
        ) from None

    @F.pandas_udf("boolean")
    def run(s: pd.Series) -> pd.Series:
        if batch_timeout_ms is None:
            return checker(s)
        import time

        deadline = time.perf_counter() + batch_timeout_ms / 1000.0
        slices: list[pd.Series] = []
        step = 64
        for i in range(0, len(s), step):
            if time.perf_counter() > deadline:
                slices.append(
                    pd.Series([None] * (len(s) - i), index=s.index[i:], dtype=object)
                )
                break
            slices.append(checker(s.iloc[i : i + step]).astype(object))
        if not slices:
            return pd.Series([], dtype=object)
        return pd.concat(slices)

    if batch_timeout_ms is not None:
        # The budget cut is wall-clock dependent: under task retry /
        # speculation (or if Catalyst duplicated the expression) the NULL
        # tail could start at different rows across evaluations, letting
        # the fail check (ok == false) and its _timeout companion
        # (ok IS NULL) disagree about which rows were evaluated. Marking
        # the UDF nondeterministic stops Catalyst from duplicating or
        # pushing it; verdict counts under an expired budget remain
        # best-effort by contract (documented in specs.expand_constraint).
        run = run.asNondeterministic()

    return run(col.cast("string"))
