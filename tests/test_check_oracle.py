"""The local oracle replica must be at least as strict as the driver.

Round-4 lesson: DuckDB widens ``sum(<integer>)`` to HUGEINT, which exports
to Arrow as decimal128(38,0) while Spark emits int64. The driver's typed
hasher fails on that; ``fetchall()``-based comparison silently passes
(HUGEINT -> Python int). These tests pin the replica's detection of
exactly that failure mode.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from check_oracle import (  # noqa: E402
    arrow_type_token,
    spark_type_token,
    type_mismatches,
)


def _duck_arrow(sql):
    return duckdb.connect().execute(sql).fetch_arrow_table()


def test_uncast_sum_tokenizes_as_decimal():
    tbl = _duck_arrow("SELECT sum(x) AS s FROM (SELECT 1 AS x)")
    assert arrow_type_token(tbl.schema.field("s").type) == "decimal"


def test_cast_sum_tokenizes_as_int64():
    tbl = _duck_arrow("SELECT CAST(sum(x) AS BIGINT) AS s FROM (SELECT 1 AS x)")
    assert arrow_type_token(tbl.schema.field("s").type) == "int64"


def test_double_and_string_tokens():
    tbl = _duck_arrow("SELECT 1.5::DOUBLE AS d, 'x' AS s, TRUE AS b")
    assert arrow_type_token(tbl.schema.field("d").type) == "float64"
    assert arrow_type_token(tbl.schema.field("s").type) == "string"
    assert arrow_type_token(tbl.schema.field("b").type) == "bool"


def test_injected_uncast_sum_is_hard_mismatch(spark):
    """A deliberately un-cast oracle sum() must be flagged decimal-vs-int."""
    sdf = spark.createDataFrame([(3,)], "s: bigint")
    tbl = _duck_arrow("SELECT sum(x) AS s FROM (SELECT 1 AS x UNION ALL SELECT 2)")
    mism = type_mismatches(sdf, tbl)
    hard = [m for m in mism if ("decimal" in m[1]) != ("decimal" in m[2])]
    assert hard == [("s", "int64", "decimal")]


def test_matching_bigint_has_no_mismatch(spark):
    sdf = spark.createDataFrame([(3,)], "s: bigint")
    tbl = _duck_arrow(
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (SELECT 1 AS x UNION ALL SELECT 2)"
    )
    assert type_mismatches(sdf, tbl) == []


def test_spark_type_tokens(spark):
    df = spark.sql(
        "SELECT CAST(1 AS BIGINT) a, CAST(1 AS INT) b, CAST(1.0 AS DOUBLE) c, "
        "'x' d, CAST(1.0 AS DECIMAL(18,2)) e, array(CAST(1.0 AS FLOAT)) f"
    )
    toks = [spark_type_token(f.dataType) for f in df.schema.fields]
    assert toks == ["int64", "int32", "float64", "string", "decimal",
                    "list<float32>"]


def test_arrow_list_token():
    tbl = _duck_arrow("SELECT [1.0::FLOAT, 2.0::FLOAT] AS v")
    assert arrow_type_token(tbl.schema.field("v").type) == "list<float32>"


def test_gate_window_invariants():
    """The driver gates the FIRST 50 queries() entries: every one must
    carry an oracle, names must be unique, and every oracle key must
    exist in the catalog (a dangling oracle is a silent no-op)."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from amazon_s3_find_and_forget_spark import entry_queries as eq

    names = list(eq.QUERIES)
    assert len(names) == len(set(names))
    gate = names[:50]
    missing = [n for n in gate if n not in eq.ORACLES]
    assert missing == [], f"gate rows without oracle: {missing}"
    dangling = [n for n in eq.ORACLES if n not in eq.QUERIES]
    assert dangling == [], f"oracles without query: {dangling}"


def test_no_duplicate_literal_keys_in_catalog():
    """Dict/list literals silently keep the LAST value for duplicate
    keys — a rotation mistake would move a row's gate position
    invisibly. Scan every family module's QUERIES literal and the
    GATE_ORDER/TAIL_ORDER literals in catalog/__init__.py."""
    import ast

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    catalog_dir = os.path.join(
        root, "amazon_s3_find_and_forget_spark", "catalog"
    )
    all_keys = []
    for fname in sorted(os.listdir(catalog_dir)):
        if not fname.endswith(".py") or fname in ("__init__.py", "loader.py"):
            continue
        tree = ast.parse(open(os.path.join(catalog_dir, fname)).read())
        for node in tree.body:
            if (
                isinstance(node, ast.Assign)
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == "QUERIES"
            ):
                keys = [k.value for k in node.value.keys]
                dupes = sorted({k for k in keys if keys.count(k) > 1})
                assert dupes == [], f"{fname}: duplicate keys {dupes}"
                all_keys.extend(keys)
    dupes = sorted({k for k in all_keys if all_keys.count(k) > 1})
    assert dupes == [], f"keys registered by two families: {dupes}"

    init = ast.parse(open(os.path.join(catalog_dir, "__init__.py")).read())
    orders = {}
    for node in init.body:
        if isinstance(node, ast.Assign) and isinstance(
            node.targets[0], ast.Name
        ):
            name = node.targets[0].id
            if name in ("GATE_ORDER", "TAIL_ORDER"):
                orders[name] = [e.value for e in node.value.elts]
    assert len(orders["GATE_ORDER"]) == 50, "gate window must be exactly 50"
    ordered = orders["GATE_ORDER"] + orders["TAIL_ORDER"]
    dupes = sorted({k for k in ordered if ordered.count(k) > 1})
    assert dupes == [], f"duplicate order entries: {dupes}"
    assert sorted(ordered) == sorted(all_keys)
