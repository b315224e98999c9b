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
  (sigma=0.02) for the same reason;
- a SECOND corpus ``documents_v2`` is derived for near-dup operators:
  word permutation preserves the bag of words, so every copy of a doc
  SimHash-collides with every other copy and the pair count grows
  quadratically in the tile factor — an artifact of the generator, not
  a scaling fact (round-12 SCALE.md). In v2 each copy is EITHER a
  genuine near-dup of its source (10% of copies: a few words replaced,
  staying within SimHash Hamming / MinHash Jaccard near-dup range) or
  a per-copy token-salted rewrite (every token distinct from every
  other copy's), so the near-dup PAIR mass stays linear in corpus
  size across tiling decades;
- the documents corpora are written as multi-file directories with
  bounded row groups (8192 rows): the round-12 single-1M-row-row-group
  layout serialized every map-only text plan onto one task at sf10 —
  a layout artifact the lane then measured instead of the engine;
- tiled documents copies (k>0) carry a class-conditional marker
  vocabulary (``inject_class_markers``, v4): en docs get ``enq*``
  tokens, the rest ``xq*``, so the selection layer's classifier/DSIR
  claim booleans stay assertable at lane scale instead of decaying
  with tiling depth (round-13 measured AUC 0.58 at sf1 on the
  attenuated natural markers).

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


# fraction of v2-corpus copies that are near-dups of their source text
ND_RATE = 0.1


def variant_texts(texts: list, copy: int, seed: int) -> list:
    """Near-dup variant rule for the ``documents_v2`` corpus.

    Per (doc, copy) a deterministic coin picks:
    - near-dup (ND_RATE): replace ~len/64 words (>=1) with fresh
      ``nd<copy>w<pos>`` tokens — the copy stays within SimHash Hamming
      and MinHash Jaccard near-dup range of its source;
    - rewrite (otherwise): suffix-salt EVERY token with the copy index,
      giving the copy a vocabulary disjoint from every other copy's —
      its SimHash is uncorrelated with the source's, so it collides
      with nothing outside its own copy stratum.

    Result: each source doc gains O(ND_RATE * mult) near-dup partners
    per tiling step — pair mass linear in corpus size — instead of the
    permutation corpus's all-copies-collide quadratic blowup.
    """
    rng = np.random.default_rng(seed * 9_000_011 + copy)
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        words = t.split()
        if not words:
            out.append(t)
            continue
        if rng.random() < ND_RATE:
            n_rep = min(max(1, len(words) // 64), len(words))
            for i in rng.choice(len(words), size=n_rep, replace=False):
                words[int(i)] = f"nd{copy}w{int(i)}"
        else:
            words = [f"{w}k{copy}" for w in words]
        out.append(" ".join(words))
    return out


def write_docs_dir(table: pa.Table, out: str, rows_per_file: int = 8192):
    """Write a documents corpus as a directory of bounded-row-group
    files (``out/part-NNNNN.parquet``). Spark reads the directory
    transparently; DuckDB needs a ``dir/**/*.parquet`` glob (handled in
    tools/check_oracle.py). 8192-row groups over ~600-char docs are
    ~5 MB — enough granularity that a 500k-doc corpus fans out over
    every core instead of serializing on one whole-corpus row group."""
    if os.path.isfile(out):
        os.remove(out)  # pre-round-13 single-file layout at this path
    os.makedirs(out, exist_ok=True)
    for old in os.listdir(out):
        if old.endswith(".parquet"):
            os.remove(os.path.join(out, old))
    n = table.num_rows
    for i, start in enumerate(range(0, n, rows_per_file)):
        pq.write_table(
            table.slice(start, rows_per_file),
            os.path.join(out, f"part-{i:05d}.parquet"),
            row_group_size=rows_per_file,
        )
    return (n + rows_per_file - 1) // rows_per_file


# class-conditional marker injection for tiled documents copies (v4):
# each tiled doc gains MARKERS_PER_DOC tokens drawn from its class's
# disjoint MARKER_VOCAB-token family
MARKERS_PER_DOC = 3
MARKER_VOCAB = 50


def inject_class_markers(
    texts: list, langs: list, copy: int, seed: int
) -> list:
    """A REAL class-conditional vocabulary shift for tiled copies
    (round-14, r13 verdict ask #5): ``lang == 'en'`` docs append
    ``MARKERS_PER_DOC`` tokens from the ``enq*`` family, every other
    doc from the disjoint ``xq*`` family; deterministic per
    (doc, copy).

    Why: the source corpus's en-vs-rest signal is sparse language
    markers (~0.8 hits/doc), and tiling attenuates it further —
    permutation destroys the bigram half of the hashed feature space —
    capping classifier AUC at 0.58 at sf1, which made the selection
    layer's claim booleans unassertable above sf0.1. With the shift
    the task stays separable (measured AUC >= 0.9 at sf1) at any
    tiling depth, while the ~3 extra tokens on ~100-word docs leave
    dedup/span/minhash lane semantics materially unchanged."""
    rng = np.random.default_rng(seed * 5_000_101 + copy)
    out = []
    for t, lang in zip(texts, langs):
        if t is None:
            out.append(None)
            continue
        fam = "enq" if lang == "en" else "xq"
        draws = rng.integers(0, MARKER_VOCAB, MARKERS_PER_DOC)
        marks = " ".join(f"{fam}{int(i)}" for i in draws)
        out.append(f"{t} {marks}".strip())
    return out


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
                texts = inject_class_markers(
                    texts, t.column("lang").to_pylist(), k, args.seed
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
        out = os.path.join(args.outdir, f"{name}.parquet")
        if name == "documents":
            n_files = write_docs_dir(tiled, out)
            print(
                f"{name}: {base.num_rows} -> {tiled.num_rows} rows "
                f"({n_files} files, 8192-row groups)"
            )
        else:
            pq.write_table(tiled, out, row_group_size=1 << 20)
            print(f"{name}: {base.num_rows} -> {tiled.num_rows} rows")

    # ---- documents_v2: the near-dup variant corpus (see module doc) ----
    v2_src = os.path.join(args.src, "documents_v2.parquet")
    base = (
        pq.read_table(v2_src)
        if os.path.exists(v2_src)
        else tables["documents"]
    )
    stride = int(pc.max(base.column("doc_id")).as_py()) + 1
    copies = []
    for k in range(args.mult):
        t = base
        idx = t.column_names.index("doc_id")
        shifted = pc.add(
            pc.cast(t.column("doc_id"), pa.int64()),
            pa.scalar(k * stride, pa.int64()),
        ).cast(t.schema.field("doc_id").type)
        t = t.set_column(idx, t.schema.field("doc_id"), shifted)
        if k > 0:
            texts = variant_texts(t.column("text").to_pylist(), k, args.seed)
            t = t.set_column(
                t.column_names.index("text"),
                t.schema.field("text"),
                pa.array(texts, pa.string()),
            )
            if "n_chars" in t.column_names:
                t = t.set_column(
                    t.column_names.index("n_chars"),
                    t.schema.field("n_chars"),
                    pa.array(
                        [None if x is None else len(x) for x in texts],
                        pa.int64(),
                    ),
                )
        copies.append(t)
    tiled = pa.concat_tables(copies)
    n_files = write_docs_dir(
        tiled, os.path.join(args.outdir, "documents_v2.parquet")
    )
    print(
        f"documents_v2: {base.num_rows} -> {tiled.num_rows} rows "
        f"({n_files} files, near-dup rate {ND_RATE}/copy)"
    )


if __name__ == "__main__":
    main()
