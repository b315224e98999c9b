"""A/B micro-benchmark: vectorized composite mask vs the per-tuple loop.

Round-6 verdict item #2: the per-tuple composite mask in
sources/parquet_file.py was O(tuples x columns) Arrow kernel dispatches;
at thousands of composite matches (a realistic GDPR queue) each row
group paid thousands of full-column passes. The shipped path now
dictionary-encodes each member column once (``index_in``) and compares a
single mixed-radix int64 key (``is_in``), so cost is O(columns) kernel
passes regardless of tuple count.

Run: python tools/ab_composite_mask.py [n_rows] [tuple_counts...]
Prints wall-clock per variant and asserts the masks are identical.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazon_s3_find_and_forget_spark.sources.parquet_file import (  # noqa: E402
    _composite_mask,
    _composite_mask_loop,
    _get_column,
)


def make_table(n_rows: int) -> pa.Table:
    rng = np.random.default_rng(7)
    return pa.table(
        {
            "first": pa.array(
                ["u%06d" % v for v in rng.integers(0, n_rows // 4, n_rows)]
            ),
            "last": pa.array(
                ["n%05d" % v for v in rng.integers(0, 50_000, n_rows)]
            ),
        }
    )


def make_tuples(n: int) -> list[tuple]:
    rng = np.random.default_rng(11)
    return [
        ("u%06d" % a, "n%05d" % b)
        for a, b in zip(
            rng.integers(0, 250_000, n), rng.integers(0, 50_000, n)
        )
    ]


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    counts = [int(c) for c in sys.argv[2:]] or [10, 100, 1_000, 5_000]
    table = make_table(n_rows)
    cols = ["first", "last"]
    arrays = [_get_column(table, c) for c in cols]
    print(f"rows={n_rows}  columns={cols}")
    print(f"{'tuples':>8} {'loop(s)':>10} {'vectorized(s)':>14} {'speedup':>8}")
    for n in counts:
        tuples = make_tuples(n)
        t0 = time.perf_counter()
        m_loop = _composite_mask_loop(arrays, tuples)
        t_loop = time.perf_counter() - t0
        t0 = time.perf_counter()
        m_vec = _composite_mask(table, cols, tuples)
        t_vec = time.perf_counter() - t0
        assert m_loop.equals(m_vec) or m_loop.to_pylist() == m_vec.to_pylist()
        print(
            f"{n:>8} {t_loop:>10.4f} {t_vec:>14.4f} "
            f"{t_loop / max(t_vec, 1e-9):>7.1f}x"
        )


if __name__ == "__main__":
    main()
