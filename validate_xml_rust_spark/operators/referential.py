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


def referential_violating_rows(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    broadcast: bool = True,
) -> DataFrame:
    """Child rows whose non-null key is absent from the parent."""
    parent_keys = parent.select(F.col(parent_key).alias("__pk")).dropDuplicates()
    if broadcast:
        parent_keys = F.broadcast(parent_keys)
    nn = child.filter(F.col(child_key).isNotNull())
    return nn.join(parent_keys, nn[child_key] == F.col("__pk"), "left_anti")


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    constraint_id: str,
    id_col: str = "url",
    broadcast: bool = True,
) -> DataFrame:
    """Violation rows ``(url, constraint_id, observed_value, message)``."""
    bad = referential_violating_rows(child, parent, child_key, parent_key, broadcast)
    return bad.select(
        F.col(id_col).cast("string").alias("url"),
        F.lit(constraint_id).alias("constraint_id"),
        F.col(child_key).cast("string").alias("observed_value"),
        F.lit(f"{child_key} not found in parent {parent_key}").alias("message"),
    )
