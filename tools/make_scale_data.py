"""Tile an sf dir by an integer factor for scaling benchmarks (sf0.1 -> sf1).

The driver ships sf{0.001,0.01,0.1}; the scaling story above sf0.1 is
ours to prove (round-5/6 verdict ask). This tool derives an N-x dataset
from an existing sf dir with the SAME schemas and distributions:

- dimensions (region, nation) copy unchanged;
- every fact/entity table is tiled N times with per-copy key offsets
  (``key += copy * (max_key + 1)``), keeping FK joins consistent
  (orders.o_custkey tracks customer, lineitem.l_orderkey tracks orders,
  ...), so join selectivities and per-key cardinalities are preserved
  while total volume scales linearly;
- document text in copies k>0 is word-PERMUTED under a deterministic
  seed: vocabulary and length distributions are preserved but shingle
  sets are destroyed, so near-dup density stays at the base rate
  instead of exploding quadratically (10 exact copies of every doc
  would make every LSH bucket 10x denser and the candidate-pair count
  100x — a measurement artifact, not a scaling fact);
- embeddings in copies k>0 get small deterministic gaussian noise
  (sigma=0.02) for the same reason.

Timestamps are NOT shifted: event/order densities per hour scale N-x,
which is what "the same workload, more traffic" means.

Usage:
    python tools/make_scale_data.py OUTDIR [--src /root/testdata/sf0.1]
        [--mult 10] [--seed 42]
Then:
    SPARK_GRAFT_SF_DIR=OUTDIR python bench.py
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DIMS = ["region", "nation"]
# table -> columns keyed by (entity) whose id-space is offset per copy
OFFSET_COLS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
# entity -> (table, column) its id-space is defined by
ENTITY_SOURCE = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}


def permute_texts(texts: list, copy: int, seed: int) -> list:
    rng = np.random.default_rng(seed * 1_000_003 + copy)
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        words = t.split()
        if len(words) > 1:
            words = [words[i] for i in rng.permutation(len(words))]
        out.append(" ".join(words))
    return out


def jitter_embeddings(col: pa.ChunkedArray, copy: int, seed: int) -> pa.Array:
    # python round-trip on purpose: preserves null vectors and works for
    # list AND fixed_size_list encodings (a raw offsets rebuild drops
    # the validity bitmap and fixed_size_list has no offsets at all)
    rng = np.random.default_rng(seed * 7_000_003 + copy)
    out = []
    for vec in col.to_pylist():
        if vec is None:
            out.append(None)
        else:
            noise = rng.normal(0.0, 0.02, size=len(vec))
            out.append(
                (np.asarray(vec, np.float32) + noise.astype(np.float32))
                .tolist()
            )
    return pa.array(out, type=col.type)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    tables = {
        name: pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        for name in DIMS + list(OFFSET_COLS)
    }
    strides = {
        entity: int(pc.max(tables[tbl].column(col)).as_py()) + 1
        for entity, (tbl, col) in ENTITY_SOURCE.items()
    }

    for name in DIMS:
        pq.write_table(
            tables[name], os.path.join(args.outdir, f"{name}.parquet")
        )
        print(f"{name}: copied ({tables[name].num_rows} rows)")

    for name, keyed in OFFSET_COLS.items():
        base = tables[name]
        copies = []
        for k in range(args.mult):
            t = base
            for col, entity in keyed.items():
                idx = t.column_names.index(col)
                shifted = pc.add(
                    pc.cast(t.column(col), pa.int64()),
                    pa.scalar(k * strides[entity], pa.int64()),
                ).cast(t.schema.field(col).type)
                t = t.set_column(idx, t.schema.field(col), shifted)
            if name == "documents" and k > 0:
                texts = permute_texts(
                    t.column("text").to_pylist(), k, args.seed
                )
                t = t.set_column(
                    t.column_names.index("text"),
                    t.schema.field("text"),
                    pa.array(texts, pa.string()),
                )
                t = t.set_column(
                    t.column_names.index("n_chars"),
                    t.schema.field("n_chars"),
                    pa.array(
                        [None if x is None else len(x) for x in texts],
                        pa.int64(),
                    ),
                )
            if name == "embeddings" and k > 0:
                t = t.set_column(
                    t.column_names.index("embedding"),
                    t.schema.field("embedding"),
                    jitter_embeddings(t.column("embedding"), k, args.seed),
                )
            copies.append(t)
        tiled = pa.concat_tables(copies)
        pq.write_table(
            tiled,
            os.path.join(args.outdir, f"{name}.parquet"),
            row_group_size=1 << 20,
        )
        print(f"{name}: {base.num_rows} -> {tiled.num_rows} rows")


if __name__ == "__main__":
    main()
