"""Local simulation of the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, Decimal):
        return f"{v:f}"
    if isinstance(v, float):
        return repr(v)  # BIT-EXACT: engines must agree to the last ulp
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from validate_xml_rust_spark import get_spark

    spark = get_spark(app_name="oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spark_rows = sdf.collect()
        spark_cols = sorted(sdf.columns)
        if name not in os_:
            print(f"{name:28s} rows={len(spark_rows):7d}  (no oracle — rows-only)")
            continue
        rel = con.sql(os_[name])
        duck_cols = sorted(rel.columns)
        duck_rows = rel.fetchall()
        ok_cols = spark_cols == duck_cols
        # order-insensitive value compare, columns sorted by name
        sidx = [sdf.columns.index(c) for c in spark_cols]
        didx = [rel.columns.index(c) for c in duck_cols]
        sset = sorted(tuple(norm(r[i]) for i in sidx) for r in spark_rows)
        dset = sorted(tuple(norm(r[i]) for i in didx) for r in duck_rows)
        ok = ok_cols and sset == dset
        status = "OK " if ok else "FAIL"
        print(f"{name:28s} {status} spark={len(spark_rows):7d} duck={len(duck_rows):7d} cols_match={ok_cols}")
        if not ok:
            failures += 1
            if not ok_cols:
                print(f"   spark cols: {spark_cols}\n   duck  cols: {duck_cols}")
            diff_s = [r for r in sset if r not in set(dset)][:3]
            diff_d = [r for r in dset if r not in set(sset)][:3]
            print(f"   spark-only: {diff_s}\n   duck-only : {diff_d}")
    spark.stop()
    n_run = len(only) if only else len(qs)
    print(f"-- {n_run - failures}/{n_run} OK, {failures} FAIL --")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
