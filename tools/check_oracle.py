"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an oracle exists, the
matching SQL on DuckDB over the same parquet tables; compares row count,
column names, and an order-insensitive value multiset (stringified,
column-sorted).

Round-1 lesson baked in: the driver builds its OWN vanilla SparkSession
(none of our builder confs) and hashes values strictly — so this replica
defaults to a bare session and to strict stringification (float repr,
un-normalized Decimal). Any DecimalType column reaching the final output
is flagged loudly: decimals must be cast to double before the driver's
hasher sees them (entry_queries._dec2dbl).

Usage:

    python tools/check_oracle.py [--builder-session] [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from datetime import datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from amazon_s3_find_and_forget_spark.entry_queries import TABLES  # noqa: E402


def bare_spark():
    """A vanilla session, as the driver harness builds it: no builder confs."""
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("oracle-check-bare")
        .getOrCreate()
    )


def norm(v):
    if v is None:
        return ""
    if isinstance(v, Decimal):
        # strict: no normalize(); a Decimal in the output is already a bug
        return f"DEC:{v}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    data = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return cols, data


def main():
    args = [a for a in sys.argv[1:] if a != "--builder-session"]
    if "--builder-session" in sys.argv[1:]:
        from amazon_s3_find_and_forget_spark.session import get_spark

        spark = get_spark(app_name="oracle-check")
    else:
        spark = bare_spark()
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
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
            dec_cols = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName().startswith("decimal")
            ]
            if dec_cols:
                print(f"WARN  {name}: DecimalType in output {dec_cols} — "
                      "will hash-fail in the driver; cast to double")
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
