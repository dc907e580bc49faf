"""Dataset discovery source — the engine's analog of the reference's
recursive directory walker (S1-S5 in SURVEY.md §2.1,
reference src/file_discovery.rs:100-220).

The reference walks a directory tree collecting files filtered by
extension, include/exclude globs, and a max depth. At table scale the same
contract maps to scan options + pushed-down predicates:

- recursion        → ``recursiveFileLookup`` scan option (S1)
- per-entry errors → ``spark.sql.files.ignoreCorruptFiles`` (warn+continue,
                     src/file_discovery.rs:128-134)
- extension filter → ``pathGlobFilter`` at scan time, plus a row-level
                     url-extension predicate for url-keyed tables (S2)
- include/exclude  → glob→regex translation, exclude wins (S3,
                     src/file_discovery.rs:208-219)
- max depth        → path-segment count bound (S4)
- single file      → equality predicate (S5)

All row-level variants are plain Column predicates — Catalyst pushes them
into the parquet scan (check ``PushedFilters`` in ``.explain``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def glob_to_regex(glob: str) -> str:
    """Translate a path glob (*, **, ?) to an anchored Java/RE2-safe regex
    (same semantics as the reference's globset patterns)."""
    out = []
    i = 0
    while i < len(glob):
        c = glob[i]
        if c == "*":
            if glob[i : i + 2] == "**":
                out.append(".*")
                i += 2
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


def read_pages_dir(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    recursive: bool = True,
    ignore_corrupt: bool = True,
    path_glob: str | None = None,
) -> DataFrame:
    """Scan-time discovery: recursive listing + per-file error tolerance +
    filename filtering, all pushed to the reader (S1/S2/X8)."""
    reader = spark.read.format(fmt)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if ignore_corrupt:
        reader = reader.option("ignoreCorruptFiles", "true")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.load(path)


def url_extension(url: Column) -> Column:
    """Lowercased extension of the url path; null when extension-less
    (reference rejects extension-less files, src/file_discovery.rs:198-206)."""
    last = F.element_at(F.split(url, "/"), -1)
    ext = F.when(
        last.contains("."), F.lower(F.element_at(F.split(last, r"\."), -1))
    )
    return ext


def extension_filter(df: DataFrame, extensions: list[str], url_col: str = "url") -> DataFrame:
    """Keep rows whose url extension ∈ set (S2). Extension-less → dropped."""
    exts = [e.lower().lstrip(".") for e in extensions]
    return df.filter(url_extension(F.col(url_col)).isin(exts))


def glob_filters(
    df: DataFrame,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    url_col: str = "url",
) -> DataFrame:
    """Include/exclude glob filtering; exclude wins, then include must match
    if present (exact precedence of src/file_discovery.rs:208-219)."""
    col = F.col(url_col)
    out = df
    for g in exclude or []:
        out = out.filter(~F.coalesce(col.rlike(glob_to_regex(g)), F.lit(False)))
    if include:
        inc = F.lit(False)
        for g in include:
            inc = inc | F.coalesce(col.rlike(glob_to_regex(g)), F.lit(False))
        out = out.filter(inc)
    return out


def max_depth_filter(df: DataFrame, max_depth: int, url_col: str = "url") -> DataFrame:
    """Depth bound: number of path segments after the host ≤ max_depth (S4)."""
    path = F.parse_url(F.col(url_col), F.lit("PATH"))
    depth = F.size(F.filter(F.split(F.coalesce(path, F.lit("")), "/"), lambda s: F.length(s) > 0))
    return df.filter(depth <= max_depth)


def single_url(df: DataFrame, url: str, url_col: str = "url") -> DataFrame:
    """Single-item scan (S5): the validate-one-file entry point's input."""
    return df.filter(F.col(url_col) == F.lit(url))
