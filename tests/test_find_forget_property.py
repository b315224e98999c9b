"""Property-based fuzz of the flagship Find/Forget path.

Hypothesis generates small random lakes — unicode/empty strings,
negative and boundary integers, NULLs in non-identifier columns,
duplicate identifier values across files — plus a random deletion
queue, and asserts the erasure CONTRACT end to end through the public
``run_job``:

- exactly the rows whose identifier is enqueued disappear;
- every survivor row is preserved value-for-value (including NULLs and
  unicode payloads);
- the lake schema is byte-identical after the rewrite;
- the job completes and its stats account for every deleted row.

Deterministic seeds (``derandomize``): the suite is a regression gate,
not a CI coin flip. The reference's parity contract for this behavior
lives in its acceptance tier (tests/acceptance/test_job_*.py); here it
is checked over a randomized input space instead of fixtures.
"""

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amazon_s3_find_and_forget_spark.data_mappers import DataMapper
from amazon_s3_find_and_forget_spark.jobs import run_job
from amazon_s3_find_and_forget_spark.matches import QueueItem

# identifier values: signed 64-bit corners included
_IDS = st.integers(min_value=-(2**63) + 1, max_value=2**63 - 1)
# payloads: unicode, empties, whitespace, NULLs
_PAYLOAD = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=12,
    ),
)


@st.composite
def _lake_case(draw):
    ids = draw(
        st.lists(_IDS, min_size=1, max_size=12, unique=True)
    )
    # rows: (identifier, payload, weight) — identifiers may repeat
    # across rows (multiple records per customer)
    rows = []
    for i in ids:
        for _ in range(draw(st.integers(min_value=1, max_value=3))):
            rows.append(
                (i, draw(_PAYLOAD), draw(st.integers(-1000, 1000)))
            )
    n_match = draw(st.integers(min_value=0, max_value=len(ids)))
    matches = ids[:n_match]
    n_files = draw(st.integers(min_value=1, max_value=3))
    return rows, matches, n_files


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_lake_case())
def test_run_job_erasure_contract(spark, tmp_path_factory, case):
    rows, matches, n_files = case
    work = tmp_path_factory.mktemp("fuzzlake")
    lake = os.path.join(str(work), "t")
    df = spark.createDataFrame(
        rows, "uid long, payload string, weight long"
    )
    df.repartition(n_files).write.parquet(lake)
    before = spark.read.parquet(lake)
    schema_before = before.schema
    survivors_expected = sorted(
        (r for r in rows if r[0] not in set(matches)),
        key=lambda r: (r[0], r[1] is None, r[1] or "", r[2]),
    )

    mapper = DataMapper("t", lake, ["uid"], format="parquet")
    items = [QueueItem(match_id=m) for m in matches]
    if items:
        result = run_job(spark, [mapper], items)
        assert result.status == "COMPLETED", result
        deleted = sum(s[3] for s in result.file_stats)
        assert deleted == len(rows) - len(survivors_expected)
        spark.catalog.clearCache()

    after = spark.read.parquet(lake)
    assert after.schema == schema_before
    got = sorted(
        ((r["uid"], r["payload"], r["weight"]) for r in after.collect()),
        key=lambda r: (r[0], r[1] is None, r[1] or "", r[2]),
    )
    assert got == survivors_expected


@st.composite
def _composite_case(draw):
    firsts = draw(st.lists(
        st.text(alphabet="abcdeé ", min_size=1, max_size=5),
        min_size=1, max_size=6, unique=True,
    ))
    lasts = draw(st.lists(
        st.text(alphabet="xyzü'-", min_size=1, max_size=5),
        min_size=1, max_size=4, unique=True,
    ))
    rows = []
    for f in firsts:
        for last in lasts:
            if draw(st.booleans()):
                rows.append((f, last, draw(st.integers(0, 99))))
    if not rows:
        rows.append((firsts[0], lasts[0], 1))
    pairs = sorted({(f, last) for f, last, _ in rows})
    n_match = draw(st.integers(min_value=1, max_value=len(pairs)))
    return rows, pairs[:n_match]


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_composite_case())
def test_run_job_composite_erasure_contract(spark, tmp_path_factory, case):
    # composite (first,last) tuple matches: ONLY rows matching BOTH
    # columns of an enqueued tuple are erased — never the cross product
    # of matched firsts x matched lasts (the unicode alphabet keeps the
    # case-insensitivity and encoding paths honest)
    rows, match_pairs = case
    work = tmp_path_factory.mktemp("fuzzcomp")
    lake = os.path.join(str(work), "t")
    spark.createDataFrame(
        rows, "first string, last string, score long"
    ).write.parquet(lake)

    mapper = DataMapper("t", lake, ["first", "last"], format="parquet")
    items = [
        QueueItem(
            match_id=[
                {"Column": "first", "Value": f},
                {"Column": "last", "Value": last},
            ],
            type="Composite",
            data_mappers=["t"],  # reference parity: exactly one mapper
        )
        for f, last in match_pairs
    ]
    result = run_job(spark, [mapper], items)
    assert result.status == "COMPLETED", result
    spark.catalog.clearCache()

    matched = set(match_pairs)
    expected = sorted(r for r in rows if (r[0], r[1]) not in matched)
    got = sorted(
        (r["first"], r["last"], r["score"])
        for r in spark.read.parquet(lake).collect()
    )
    assert got == expected
