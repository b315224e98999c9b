"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an oracle exists, the
matching SQL on DuckDB over the same parquet tables; compares row count,
column names, and an order-insensitive value multiset (stringified,
column-sorted). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from amazon_s3_find_and_forget_spark.entry_queries import TABLES  # noqa: E402
from amazon_s3_find_and_forget_spark.session import get_spark  # noqa: E402


def norm(v):
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonical(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    data = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return cols, data


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        sc, sd = canonical(scols, srows)
        dc, dd = canonical(dcols, drows)
        if [c.lower() for c in sc] != [c.lower() for c in dc]:
            failures.append(name)
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
        elif len(sd) != len(dd):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(sd)} duck={len(dd)}")
        elif sd != dd:
            failures.append(name)
            diff = [(a, b) for a, b in zip(sd, dd) if a != b][:3]
            print(f"FAIL  {name}: values differ; first diffs: {diff}")
        else:
            print(f"OK    {name}: {len(sd)} rows")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
