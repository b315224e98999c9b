"""Golden row-level delete cases, ported behaviorally from the reference's
tests/unit/ecs_tasks/test_parquet.py (cited per-case)."""

import os
from decimal import Decimal

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from amazon_s3_find_and_forget_spark.sources.parquet_file import (
    delete_mask,
    rewrite_parquet_file,
)


def write_tbl(tmp_path, name, data, schema=None):
    table = pa.table(data, schema=schema)
    path = os.path.join(tmp_path, name)
    pq.write_table(table, path)
    return path, table


def read_back(path):
    return pq.read_table(path)


def test_simple_delete(tmp_path):
    # reference test_parquet.py:77-92 — 2 of 3 rows deleted
    path, _ = write_tbl(
        tmp_path, "t.parquet", {"customer_id": ["12345", "23456", "34567"]}
    )
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path, out, [{"Type": "Simple", "Column": "customer_id", "MatchIds": ["12345", "23456"]}]
    )
    assert stats == {"ProcessedRows": 3, "DeletedRows": 2}
    assert read_back(out).column("customer_id").to_pylist() == ["34567"]


def test_multi_column_zero_survivors(tmp_path):
    # reference test_parquet.py:95-108 — DeletedRows counts rows once
    path, _ = write_tbl(
        tmp_path, "t.parquet", {"customer_id": ["12345"], "other_id": ["12345"]}
    )
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path,
        out,
        [
            {"Type": "Simple", "Column": "customer_id", "MatchIds": ["12345"]},
            {"Type": "Simple", "Column": "other_id", "MatchIds": ["12345"]},
        ],
    )
    assert stats == {"ProcessedRows": 1, "DeletedRows": 1}
    assert read_back(out).num_rows == 0


def test_case_insensitive_nested(tmp_path):
    # reference test_parquet.py:111-130
    t = pa.table(
        {
            "userData": pa.array(
                [{"customerId": "12345"}, {"customerId": "34567"}],
                type=pa.struct([("customerId", pa.string())]),
            )
        }
    )
    path = os.path.join(tmp_path, "t.parquet")
    pq.write_table(t, path)
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path,
        out,
        [{"Type": "Simple", "Column": "userdata.customerid", "MatchIds": ["12345"]}],
    )
    assert stats["DeletedRows"] == 1
    kept = read_back(out)
    assert kept.column("userData").to_pylist() == [{"customerId": "34567"}]


def test_struct_dot_path_preserved(tmp_path):
    # reference test_parquet.py:151-177 — nested struct survives intact
    t = pa.table(
        {
            "customer_id": ["a", "b"],
            "user_info": pa.array(
                [
                    {"personal_information": {"email": "a@test.com", "name": "A"}},
                    {"personal_information": {"email": "b@test.com", "name": "B"}},
                ],
                type=pa.struct(
                    [
                        (
                            "personal_information",
                            pa.struct([("email", pa.string()), ("name", pa.string())]),
                        )
                    ]
                ),
            ),
        }
    )
    path = os.path.join(tmp_path, "t.parquet")
    pq.write_table(t, path)
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path,
        out,
        [
            {
                "Type": "Simple",
                "Column": "user_info.personal_information.email",
                "MatchIds": ["a@test.com"],
            }
        ],
    )
    assert stats["DeletedRows"] == 1
    kept = read_back(out)
    assert kept.column("user_info").to_pylist() == [
        {"personal_information": {"email": "b@test.com", "name": "B"}}
    ]


def test_composite_tuple_typed(tmp_path):
    # reference test_parquet.py:230-252 — typed tuple equality (int, str)
    path, _ = write_tbl(
        tmp_path,
        "t.parquet",
        {"age": pa.array([11, 12, 11], type=pa.int32()), "last_name": ["a", "b", "a"]},
    )
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path,
        out,
        [
            {
                "Type": "Composite",
                "Columns": ["age", "last_name"],
                "MatchIds": [(11, "a")],
            }
        ],
    )
    assert stats == {"ProcessedRows": 3, "DeletedRows": 2}
    assert read_back(out).column("last_name").to_pylist() == ["b"]


def test_mixed_simple_and_composite(tmp_path):
    # reference test_parquet.py:285-305 — union of deletions
    path, _ = write_tbl(
        tmp_path,
        "t.parquet",
        {"customer_id": ["1", "2", "3", "4"], "last_name": ["a", "b", "c", "d"]},
    )
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path,
        out,
        [
            {"Type": "Simple", "Column": "customer_id", "MatchIds": ["1"]},
            {
                "Type": "Composite",
                "Columns": ["customer_id", "last_name"],
                "MatchIds": [("3", "c")],
            },
        ],
    )
    assert stats["DeletedRows"] == 2
    assert read_back(out).column("customer_id").to_pylist() == ["2", "4"]


def test_decimal_scale_exact(tmp_path):
    # reference test_parquet.py:319-341 — "123.450" matches decimal(6,3)
    schema = pa.schema([("customer_id_decimal", pa.decimal128(6, 3))])
    t = pa.table(
        {"customer_id_decimal": [Decimal("123.450"), Decimal("234.560")]},
        schema=schema,
    )
    path = os.path.join(tmp_path, "t.parquet")
    pq.write_table(t, path)
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path,
        out,
        [
            {
                "Type": "Simple",
                "Column": "customer_id_decimal",
                "MatchIds": ["123.450"],
            }
        ],
    )
    assert stats["DeletedRows"] == 1
    assert read_back(out).column("customer_id_decimal").to_pylist() == [
        Decimal("234.560")
    ]


def test_composite_with_decimal(tmp_path):
    # reference test_parquet.py:373-407
    schema = pa.schema(
        [("d", pa.decimal128(6, 3)), ("name", pa.string())]
    )
    t = pa.table(
        {"d": [Decimal("123.450"), Decimal("123.450")], "name": ["x", "y"]},
        schema=schema,
    )
    path = os.path.join(tmp_path, "t.parquet")
    pq.write_table(t, path)
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path,
        out,
        [
            {
                "Type": "Composite",
                "Columns": ["d", "name"],
                "MatchIds": [("123.450", "x")],
            }
        ],
    )
    assert stats["DeletedRows"] == 1
    assert read_back(out).column("name").to_pylist() == ["y"]


def test_missing_column_raises(tmp_path):
    # reference test_parquet.py:410-423
    t = pa.table({"customer_id": ["1"]})
    with pytest.raises(ValueError, match="not found"):
        delete_mask(t, [{"Type": "Simple", "Column": "nope", "MatchIds": ["1"]}])


def test_nulls_never_match(tmp_path):
    path, _ = write_tbl(
        tmp_path, "t.parquet", {"customer_id": ["12345", None, "34567"]}
    )
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path, out, [{"Type": "Simple", "Column": "customer_id", "MatchIds": ["12345"]}]
    )
    assert stats["DeletedRows"] == 1
    assert read_back(out).column("customer_id").to_pylist() == [None, "34567"]


def test_schema_metadata_stripped(tmp_path):
    path, _ = write_tbl(tmp_path, "t.parquet", {"customer_id": ["1", "2"]})
    out = os.path.join(tmp_path, "out.parquet")
    rewrite_parquet_file(
        path, out, [{"Type": "Simple", "Column": "customer_id", "MatchIds": ["1"]}]
    )
    assert read_back(out).schema.metadata in (None, {})


def test_multi_row_group_streaming(tmp_path):
    """Parity: test_parquet.py:48 (multiple row groups) — every row group
    is visited, matches deleted across group boundaries, output readable
    as one table."""
    ids = list(range(90))
    table = pa.table({"cid": ids, "payload": [f"p{i}" for i in ids]})
    path = os.path.join(tmp_path, "multi.parquet")
    pq.write_table(table, path, row_group_size=20)  # 5 row groups
    assert pq.ParquetFile(path).num_row_groups == 5
    out = os.path.join(tmp_path, "out.parquet")
    # one match per row group, incl. first and last
    stats = rewrite_parquet_file(
        path, out, [{"Column": "cid", "MatchIds": {0, 25, 45, 65, 89}, "Type": "Simple"}]
    )
    assert stats == {"ProcessedRows": 90, "DeletedRows": 5}
    back = read_back(out)
    assert back.num_rows == 85
    remaining = set(back.column("cid").to_pylist())
    assert remaining == set(ids) - {0, 25, 45, 65, 89}


def test_complex_payload_columns_preserved(tmp_path):
    """Parity: test_parquet.py:151 (complex types) — list and nested
    struct payload columns ride through the rewrite byte-equal on
    surviving rows; match on a nested dot path."""
    schema = pa.schema(
        [
            ("customer_id", pa.int64()),
            (
                "user_info",
                pa.struct(
                    [
                        (
                            "personal_information",
                            pa.struct([("name", pa.string()), ("email", pa.string())]),
                        )
                    ]
                ),
            ),
            ("tags", pa.list_(pa.string())),
        ]
    )
    rows = {
        "customer_id": [12345, 23456, 34567],
        "user_info": [
            {"personal_information": {"name": "matteo", "email": "12345@test.com"}},
            {"personal_information": {"name": "nick", "email": "23456@test.com"}},
            {"personal_information": {"name": "chris", "email": "34567@test.com"}},
        ],
        "tags": [["a", "b"], ["c"], []],
    }
    path, _ = write_tbl(tmp_path, "cx.parquet", rows, schema=schema)
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path,
        out,
        [
            {
                "Column": "user_info.personal_information.name",
                "MatchIds": {"matteo", "chris"},
                "Type": "Simple",
            }
        ],
    )
    assert stats == {"ProcessedRows": 3, "DeletedRows": 2}
    back = read_back(out)
    assert back.num_rows == 1
    assert back.column("customer_id").to_pylist() == [23456]
    assert back.column("user_info").to_pylist() == [
        {"personal_information": {"name": "nick", "email": "23456@test.com"}}
    ]
    assert back.column("tags").to_pylist() == [["c"]]
    assert back.schema.equals(pa.schema(schema))


# --- vectorized composite mask (round-7): loop/vector equivalence ---------

from amazon_s3_find_and_forget_spark.sources.parquet_file import (  # noqa: E402
    _composite_mask,
    _composite_mask_loop,
    _get_column,
)


def test_composite_mask_matches_loop_with_nulls():
    # nulls in the data never match; a tuple with a None member never
    # matches anything (NULL = x is not true) — identical to the loop
    table = pa.table(
        {
            "a": pa.array([1, 2, None, 2, 3, 1], type=pa.int64()),
            "b": pa.array(["x", "y", "y", None, "z", "y"]),
        }
    )
    tuples = [(1, "x"), (2, "y"), (None, "y"), (3, "q")]
    vec = _composite_mask(table, ["a", "b"], tuples)
    loop = _composite_mask_loop(
        [_get_column(table, "a"), _get_column(table, "b")],
        [t for t in tuples if all(v is not None for v in t)],
    )
    assert vec.to_pylist() == loop.to_pylist()
    assert vec.to_pylist() == [True, True, False, False, False, False]


def test_composite_mask_no_partial_match_aliasing():
    # (1,'x') and (2,'y') in the tuple set must NOT match rows (1,'y')
    # or (2,'x') — the mixed-radix key may not mix digits across tuples
    table = pa.table(
        {"a": pa.array([1, 2, 1, 2], type=pa.int64()), "b": ["x", "y", "y", "x"]}
    )
    vec = _composite_mask(table, ["a", "b"], [(1, "x"), (2, "y")])
    assert vec.to_pylist() == [True, True, False, False]


def test_composite_mask_all_null_tuples_matches_nothing():
    table = pa.table({"a": pa.array([1, 2]), "b": ["x", "y"]})
    vec = _composite_mask(table, ["a", "b"], [(None, "x")])
    assert vec.to_pylist() == [False, False]


def test_composite_mask_fuzz_equivalence():
    import random

    rng = random.Random(42)
    for trial in range(20):
        n = rng.randint(1, 200)
        a = [rng.choice([None, *range(10)]) for _ in range(n)]
        b = [rng.choice([None, "p", "q", "r", "s"]) for _ in range(n)]
        table = pa.table(
            {"a": pa.array(a, type=pa.int64()), "b": pa.array(b)}
        )
        tuples = [
            (rng.choice(range(12)), rng.choice(["p", "q", "r", "s", "t"]))
            for _ in range(rng.randint(1, 30))
        ]
        vec = _composite_mask(table, ["a", "b"], tuples)
        loop = _composite_mask_loop(
            [_get_column(table, "a"), _get_column(table, "b")], tuples
        )
        assert vec.to_pylist() == loop.to_pylist(), f"trial {trial}"


def test_rewrite_zero_row_file(tmp_path):
    # a file fully redacted by a prior job: 0-row row group must rewrite
    # cleanly (regression: untyped empty mask inferred null -> pc.invert
    # had no kernel)
    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    t = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.string())})
    path = os.path.join(tmp_path, "empty.parquet")
    pq.write_table(t, path)
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path,
        out,
        [
            {"Type": "Simple", "Column": "a", "MatchIds": [1]},
            {"Type": "Composite", "Columns": ["a", "b"], "MatchIds": [(None, "x")]},
        ],
    )
    assert stats == {"ProcessedRows": 0, "DeletedRows": 0}
    assert read_back(out).schema.equals(schema)


def test_delete_mask_zero_rows_no_groups():
    t = pa.table({"a": pa.array([], pa.int64())})
    mask = delete_mask(t, [])
    import pyarrow.compute as pc

    assert pc.invert(mask).to_pylist() == []


# --- redact mode -----------------------------------------------------------


def test_redact_simple(tmp_path):
    path, _ = write_tbl(
        tmp_path,
        "t.parquet",
        {
            "customer_id": ["12345", "23456", "34567"],
            "name": ["a", "b", "c"],
        },
    )
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path,
        out,
        [{"Type": "Simple", "Column": "customer_id", "MatchIds": ["12345", "23456"]}],
        redact_columns=["customer_id", "name"],
    )
    # DeletedRows counts REDACTED rows; all rows survive
    assert stats == {"ProcessedRows": 3, "DeletedRows": 2}
    got = read_back(out)
    assert got.column("customer_id").to_pylist() == [None, None, "34567"]
    assert got.column("name").to_pylist() == [None, None, "c"]


def test_redact_subset_of_columns_preserves_rest(tmp_path):
    path, src = write_tbl(
        tmp_path,
        "t.parquet",
        {"customer_id": ["1", "2"], "age": [30, 40], "city": ["x", "y"]},
    )
    out = os.path.join(tmp_path, "out.parquet")
    rewrite_parquet_file(
        path,
        out,
        [{"Type": "Simple", "Column": "customer_id", "MatchIds": ["1"]}],
        redact_columns=["city"],
    )
    got = read_back(out)
    # matched row keeps its identifier and age; only city nulled
    assert got.column("customer_id").to_pylist() == ["1", "2"]
    assert got.column("age").to_pylist() == [30, 40]
    assert got.column("city").to_pylist() == [None, "y"]
    assert got.schema == src.schema


def test_redact_nested_struct_field(tmp_path):
    path, _ = write_tbl(
        tmp_path,
        "t.parquet",
        {
            "user_info": [
                {"email": "e1", "name": "n1"},
                {"email": "e2", "name": "n2"},
                None,
            ],
            "customer_id": ["1", "2", "3"],
        },
    )
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path,
        out,
        [{"Type": "Simple", "Column": "customer_id", "MatchIds": ["1", "3"]}],
        redact_columns=["user_info.EMAIL"],  # case-insensitive dot path
    )
    assert stats["DeletedRows"] == 2
    got = read_back(out)
    assert got.column("user_info").to_pylist() == [
        {"email": None, "name": "n1"},
        {"email": "e2", "name": "n2"},
        None,  # struct-null row stays struct-null
    ]


def test_redact_zero_matches_counts_zero(tmp_path):
    path, src = write_tbl(
        tmp_path, "t.parquet", {"customer_id": ["1", "2"]}
    )
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path,
        out,
        [{"Type": "Simple", "Column": "customer_id", "MatchIds": ["99"]}],
        redact_columns=["customer_id"],
    )
    assert stats == {"ProcessedRows": 2, "DeletedRows": 0}
    assert read_back(out).equals(src)


def test_redact_non_nullable_column_raises(tmp_path):
    schema = pa.schema([pa.field("customer_id", pa.string(), nullable=False)])
    path, _ = write_tbl(
        tmp_path, "t.parquet", {"customer_id": ["1", "2"]}, schema=schema
    )
    out = os.path.join(tmp_path, "out.parquet")
    with pytest.raises(ValueError, match="non-nullable"):
        rewrite_parquet_file(
            path,
            out,
            [{"Type": "Simple", "Column": "customer_id", "MatchIds": ["1"]}],
            redact_columns=["customer_id"],
        )


def test_redact_multi_row_group_streaming(tmp_path):
    table = pa.table({"id": list(range(100)), "v": [str(i) for i in range(100)]})
    path = os.path.join(tmp_path, "t.parquet")
    pq.write_table(table, path, row_group_size=10)
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path,
        out,
        [{"Type": "Simple", "Column": "id", "MatchIds": [5, 55, 95]}],
        redact_columns=["v"],
    )
    assert stats == {"ProcessedRows": 100, "DeletedRows": 3}
    got = read_back(out)
    assert got.num_rows == 100
    vals = got.column("v").to_pylist()
    assert [i for i, v in enumerate(vals) if v is None] == [5, 55, 95]


def test_redact_nested_with_non_nullable_sibling(tmp_path):
    """A not-null SIBLING inside the struct must not break redaction of
    a nullable leaf (regression: names-only rebuild dropped field
    nullability and failed the cast back to the file schema)."""
    schema = pa.schema(
        [
            pa.field(
                "info",
                pa.struct(
                    [
                        pa.field("name", pa.string()),
                        pa.field("age", pa.int64(), nullable=False),
                    ]
                ),
            ),
            pa.field("customer_id", pa.string()),
        ]
    )
    path, _ = write_tbl(
        tmp_path,
        "t.parquet",
        {
            "info": [{"name": "n1", "age": 30}, {"name": "n2", "age": 40}],
            "customer_id": ["1", "2"],
        },
        schema=schema,
    )
    out = os.path.join(tmp_path, "out.parquet")
    stats = rewrite_parquet_file(
        path,
        out,
        [{"Type": "Simple", "Column": "customer_id", "MatchIds": ["1"]}],
        redact_columns=["info.name"],
    )
    assert stats["DeletedRows"] == 1
    got = read_back(out)
    assert got.schema == schema
    assert got.column("info").to_pylist() == [
        {"name": None, "age": 30},
        {"name": "n2", "age": 40},
    ]


def test_redact_nested_non_nullable_leaf_raises(tmp_path):
    schema = pa.schema(
        [
            pa.field(
                "info",
                pa.struct([pa.field("age", pa.int64(), nullable=False)]),
            ),
            pa.field("customer_id", pa.string()),
        ]
    )
    path, _ = write_tbl(
        tmp_path,
        "t.parquet",
        {"info": [{"age": 30}], "customer_id": ["1"]},
        schema=schema,
    )
    out = os.path.join(tmp_path, "out.parquet")
    with pytest.raises(ValueError, match="non-nullable"):
        rewrite_parquet_file(
            path,
            out,
            [{"Type": "Simple", "Column": "customer_id", "MatchIds": ["1"]}],
            redact_columns=["info.age"],
        )


def test_redact_empty_column_list_rejected(tmp_path):
    """redact_columns=[] must not truthiness-fall-through to delete
    mode (nor to redact-nothing): the mode switch is `is not None` and
    an explicit empty list is a contract error, raised before any
    bytes are read."""
    with pytest.raises(ValueError, match="redact_columns"):
        rewrite_parquet_file(
            os.path.join(tmp_path, "never-read.parquet"),
            os.path.join(tmp_path, "out.parquet"),
            [{"Type": "Simple", "Column": "c", "MatchIds": ["1"]}],
            redact_columns=[],
        )
