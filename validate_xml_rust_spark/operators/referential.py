"""Referential-integrity checks via anti-joins (SURVEY.md §2.3 J3;
north_rule: "referential checks via broadcast/sort-merge anti-joins").

A child row violates iff its foreign key has no match in the parent key
set. Violations = LEFT ANTI join survivors.

Strategy selection:
- ``broadcast=True`` (default for small parents, e.g. a host registry):
  parent keys are deduped then broadcast — zero shuffle of the child.
- ``broadcast=False``: plain left_anti; Catalyst plans a sort-merge anti
  join (both sides shuffle on the key; AQE handles skew splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_keys(key: "str | list[str]") -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def referential_violating_rows(
    child: DataFrame,
    parent: DataFrame,
    child_key: "str | list[str]",
    parent_key: "str | list[str]",
    broadcast: bool = True,
) -> DataFrame:
    """Child rows whose non-null key is absent from the parent.

    ``child_key``/``parent_key`` accept a single column or a COMPOSITE
    key (list of columns, positionally paired). NULL semantics follow
    SQL's simple match rule: a child row with ANY null key component is
    not checkable and never violates (``not_null`` owns null-ness)."""
    cks, pks = _as_keys(child_key), _as_keys(parent_key)
    if len(cks) != len(pks):
        raise ValueError("child_key and parent_key arity must match")
    parent_keys = parent.select(
        *[F.col(p).alias(f"__pk{i}") for i, p in enumerate(pks)]
    ).dropDuplicates()
    if broadcast:
        parent_keys = F.broadcast(parent_keys)
    nn = child
    for c in cks:
        nn = nn.filter(F.col(c).isNotNull())
    cond = None
    for i, c in enumerate(cks):
        eq = nn[c] == F.col(f"__pk{i}")
        cond = eq if cond is None else cond & eq
    return nn.join(parent_keys, cond, "left_anti")


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: "str | list[str]",
    parent_key: "str | list[str]",
    constraint_id: str,
    id_col: str = "url",
    broadcast: bool = True,
) -> DataFrame:
    """Violation rows ``(url, constraint_id, observed_value, message)``;
    composite keys report the components pipe-joined."""
    cks, pks = _as_keys(child_key), _as_keys(parent_key)
    bad = referential_violating_rows(child, parent, cks, pks, broadcast)
    return bad.select(
        F.col(id_col).cast("string").alias("url"),
        F.lit(constraint_id).alias("constraint_id"),
        F.concat_ws("|", *[F.col(c).cast("string") for c in cks]).alias(
            "observed_value"
        ),
        F.lit(
            f"{'|'.join(cks)} not found in parent {'|'.join(pks)}"
        ).alias("message"),
    )
