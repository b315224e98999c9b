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

Round-4 lesson baked in: DuckDB results are fetched through
``fetch_arrow_table()`` rather than ``fetchall()``. ``fetchall()``
converts HUGEINT (the type DuckDB silently widens ``sum(<integer>)`` to)
into a plain Python int, erasing exactly the type difference the driver's
typed hasher sees (HUGEINT exports to Arrow as decimal128(38,0) while
Spark emits int64) — which is how three "verified" oracles hash-failed
in the driver for three rounds straight. Arrow preserves the Decimal, so
the value comparison now fails locally the way the driver fails; on top,
per-column Arrow type tokens are compared and any decimal-vs-integer
mismatch is a hard FAIL (other token mismatches WARN).

Usage:

    python tools/check_oracle.py [--builder-session] [--json PATH]
                                 [sf_dir] [query ...]

``--json PATH`` writes a machine-readable sweep artifact (one record per
catalog row: status OK/ROWS/FAIL, row counts, failure detail, plus git
HEAD and session metadata) — the per-round ``ORACLE_SWEEP_rN.json`` that
covers the 50+ oracles sitting outside the driver's 50-row gate window.
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


def spark_type_token(dt):
    """Collapse a Spark DataType to a comparable family token."""
    name = dt.typeName()
    mapping = {
        "long": "int64", "integer": "int32", "short": "int16",
        "byte": "int8", "double": "float64", "float": "float32",
        "string": "string", "boolean": "bool", "date": "date",
        "timestamp": "timestamp", "timestamp_ntz": "timestamp",
        "binary": "binary",
    }
    if name.startswith("decimal"):
        return "decimal"
    if name == "array":
        return f"list<{spark_type_token(dt.elementType)}>"
    return mapping.get(name, name)


def arrow_type_token(t):
    """Collapse a pyarrow DataType to the same family tokens."""
    import pyarrow as pa

    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{arrow_type_token(t.value_type)}>"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_float32(t):
        return "float32"
    return str(t)


def type_mismatches(sdf, arrow_tbl):
    """Pair columns by (sorted) name; yield (col, spark_tok, duck_tok) diffs."""
    s_tok = {f.name.lower(): spark_type_token(f.dataType) for f in sdf.schema.fields}
    d_tok = {
        f.name.lower(): arrow_type_token(f.type) for f in arrow_tbl.schema
    }
    out = []
    for col in sorted(set(s_tok) & set(d_tok)):
        if s_tok[col] != d_tok[col]:
            out.append((col, s_tok[col], d_tok[col]))
    return out


def main():
    raw = sys.argv[1:]
    json_path = None
    if "--json" in raw:
        i = raw.index("--json")
        if i + 1 >= len(raw):
            sys.exit("usage: --json PATH (missing path)")
        json_path = raw[i + 1]
        raw = raw[:i] + raw[i + 2:]
    args = [a for a in raw if a != "--builder-session"]
    if "--builder-session" in raw:
        from amazon_s3_find_and_forget_spark.session import get_spark

        spark = get_spark(app_name="oracle-check")
    else:
        spark = bare_spark()
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}

    def record(name, status, spark_rows=None, oracle_rows=None, detail=None):
        results[name] = {
            "status": status,
            "spark_rows": spark_rows,
            "oracle_rows": oracle_rows,
            "detail": detail,
        }
    con = duckdb.connect()
    for t in TABLES:
        path = f"{os.path.join(sf_dir, t)}.parquet"
        if os.path.isdir(path):
            # derived scale dirs write multi-file corpora (directory
            # layout, tools/make_scale_data.py) — DuckDB needs a glob
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # same inter-query hygiene as bench.py: drop caches a query
        # persisted and release localCheckpoint blocks NOW (ContextCleaner
        # only frees them after GC notices) — in the deliberately-vanilla
        # 1 GB session a 105-query sequence otherwise accumulates blocks
        # until a heavy query (the sf1 ngram index) OOMs on leftovers
        import gc as _gc

        spark.catalog.clearCache()
        _gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001 - dead JVM: surfaces below anyway
            pass
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
            record(name, "FAIL", detail=f"spark error {type(e).__name__}: {e}")
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            record(name, "ROWS", spark_rows=len(srows))
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            tbl = res.fetch_arrow_table()
            dcols = tbl.schema.names
            drows = [
                tuple(row[c] for c in dcols) for row in tbl.to_pylist()
            ]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            record(name, "FAIL", spark_rows=len(srows),
                   detail=f"duckdb error {e}")
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        mism = type_mismatches(sdf, tbl)
        hard = [m for m in mism if ("decimal" in m[1]) != ("decimal" in m[2])]
        if hard:
            failures.append(name)
            record(name, "FAIL", spark_rows=len(srows), oracle_rows=len(drows),
                   detail=f"decimal/integer type mismatch: {hard}")
            print(f"FAIL  {name}: decimal/integer type mismatch "
                  f"(spark vs duckdb-arrow): {hard} — un-cast sum()? "
                  "Wrap the outer aggregate in CAST(... AS BIGINT)")
            continue
        if mism:
            print(f"WARN  {name}: type-token drift (spark vs duckdb): {mism}")
        sc, sd = canonical(scols, srows)
        dc, dd = canonical(dcols, drows)
        if [c.lower() for c in sc] != [c.lower() for c in dc]:
            failures.append(name)
            record(name, "FAIL", spark_rows=len(sd), oracle_rows=len(dd),
                   detail=f"columns differ spark={sc} duck={dc}")
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
        elif len(sd) != len(dd):
            failures.append(name)
            record(name, "FAIL", spark_rows=len(sd), oracle_rows=len(dd),
                   detail="rowcount mismatch")
            print(f"FAIL  {name}: rowcount spark={len(sd)} duck={len(dd)}")
        elif sd != dd:
            failures.append(name)
            diff = [(a, b) for a, b in zip(sd, dd) if a != b][:3]
            record(name, "FAIL", spark_rows=len(sd), oracle_rows=len(dd),
                   detail=f"values differ; first diffs: {diff}")
            print(f"FAIL  {name}: values differ; first diffs: {diff}")
        else:
            record(name, "OK", spark_rows=len(sd), oracle_rows=len(dd))
            print(f"OK    {name}: {len(sd)} rows")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    if json_path:
        import json
        import subprocess

        try:
            head = subprocess.run(
                ["git", "rev-parse", "HEAD"],
                capture_output=True, text=True, timeout=10,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ).stdout.strip()
        except Exception:  # noqa: BLE001 — artifact metadata only
            head = None
        counts = {"OK": 0, "ROWS": 0, "FAIL": 0}
        for rec in results.values():
            counts[rec["status"]] += 1
        doc = {
            "sf_dir": sf_dir,
            "git_head": head,
            "session": "builder" if "--builder-session" in raw else "bare",
            "total": len(results),
            "ok": counts["OK"],
            "rows_only": counts["ROWS"],
            "fail": counts["FAIL"],
            "failures": failures,
            "queries": results,
        }
        with open(json_path, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"sweep artifact written: {json_path}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
