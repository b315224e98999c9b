"""Generate adversarial/seeded variants of the driver's testdata.

Round-3 lesson: the driver regenerates /root/testdata between rounds
(seed AND physical encodings drift), and one encoding assumption took
down 13 correctness rows. This tool derives variant datasets from an
existing sf dir so the catalog can be soak-tested against the drifts we
know how to anticipate:

- row order shuffled under a seed (exposes order-dependent plans);
- ``events.ts`` written as BOTH physical encodings (timestamp[us] and
  INT64 TIMESTAMP(NANOS));
- adversarial rows appended:
  * events: a 6th event_type, non-integer / non-numeric / null JSON
    ``k``, duplicate (tied) timestamps within a user, zero values;
  * documents: empty text, whitespace-only, unicode (CJK + emoji),
    regex metacharacters, an exact duplicate, a 10k-char doc;
  * embeddings: a zero vector and an exact-duplicate vector.

Usage:
    python tools/make_variant_data.py OUTDIR [--src SF_DIR] [--seed N]
        [--ts-encoding us|ns] [--adversarial]

Then:  python tools/check_oracle.py OUTDIR
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _shuffle(table: pa.Table, seed: int) -> pa.Table:
    """Shuffle row order AND physical column order: engines must bind
    columns by NAME, never by position."""
    rng = np.random.RandomState(seed)
    idx = rng.permutation(table.num_rows)
    table = table.take(pa.array(idx))
    cols = list(table.column_names)
    rng.shuffle(cols)
    return table.select(cols)


def _adversarial_events(table: pa.Table) -> pa.Table:
    ev = table.to_pydict()
    max_id = max(ev["event_id"]) if ev["event_id"] else 0
    base_ts = ev["ts"][0]
    tie_ts = ev["ts"][min(5, len(ev["ts"]) - 1)]
    extra = [
        # 6th event_type: both engines must agree on the catch-all bucket
        (max_id + 1, base_ts, 7, "gdpr_audit", 1.25, '{"k": 3}'),
        (max_id + 2, base_ts, 7, "gdpr_audit", 0.0, '{"k": 4}'),
        # non-integer / non-numeric / absent / null JSON k
        (max_id + 3, base_ts, 8, "click", 2.5, '{"k": "1.5"}'),
        (max_id + 4, base_ts, 8, "view", 2.5, '{"k": "abc"}'),
        (max_id + 5, base_ts, 8, "purchase", 2.5, "{}"),
        (max_id + 6, base_ts, 8, "signup", 2.5, '{"k": null}'),
        (max_id + 7, base_ts, 8, "error", 2.5, None),
        # exact timestamp ties within one user (sessions tie-break)
        (max_id + 8, tie_ts, 9, "click", 1.0, '{"k": 1}'),
        (max_id + 9, tie_ts, 9, "click", 1.0, '{"k": 2}'),
        (max_id + 10, tie_ts, 9, "view", 1.0, '{"k": 3}'),
        # NULLs where the schema permits them: engines DISAGREE on default
        # NULL placement in ORDER BY (Spark nulls-first asc, DuckDB
        # nulls-last), so any window/sort query must handle these
        (max_id + 11, None, 9, "click", 1.0, '{"k": 4}'),
        (max_id + 12, base_ts, 9, None, None, '{"k": 5}'),
    ]
    for eid, ts, uid, et, val, props in extra:
        ev["event_id"].append(eid)
        ev["ts"].append(ts)
        ev["user_id"].append(uid)
        ev["event_type"].append(et)
        ev["value"].append(val)
        ev["props"].append(props)
    return pa.table(ev, schema=table.schema)


def _adversarial_documents(table: pa.Table) -> pa.Table:
    docs = table.to_pydict()
    max_id = max(docs["doc_id"])
    cols = set(table.column_names)
    extra_texts = [
        (max_id + 1, ""),
        (max_id + 2, "   \t  \n "),
        (max_id + 3, "漢字テキスト 🚀 mixed unicode Ünïcödé"),
        (max_id + 4, "regex meta [a-z]+ (\\d{3}) $^ .* literal"),
        (max_id + 5, docs["text"][0]),  # exact duplicate of doc 0
        (max_id + 6, "long " * 2000),
    ]
    for doc_id, text in extra_texts:
        for col in cols:
            if col == "doc_id":
                docs[col].append(doc_id)
            elif col == "text":
                docs[col].append(text)
            elif col == "n_chars":
                docs[col].append(len(text))
            else:
                docs[col].append(docs[col][0])
    return pa.table(docs, schema=table.schema)


def _adversarial_embeddings(table: pa.Table) -> pa.Table:
    em = table.to_pydict()
    max_id = max(em["vec_id"])
    dim = len(em["embedding"][0])
    extras = [
        (max_id + 1, [0.0] * dim),  # zero vector
        (max_id + 2, list(em["embedding"][1])),  # exact duplicate
    ]
    for vec_id, emb in extras:
        for col in table.column_names:
            if col == "vec_id":
                em[col].append(vec_id)
            elif col == "embedding":
                em[col].append(emb)
            else:
                em[col].append(em[col][0])
    return pa.table(em, schema=table.schema)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--ts-encoding", choices=["us", "ns"], default="us")
    ap.add_argument("--adversarial", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    for name in TABLES:
        table = pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        if args.adversarial:
            if name == "events":
                table = _adversarial_events(table)
            elif name == "documents":
                table = _adversarial_documents(table)
            elif name == "embeddings":
                table = _adversarial_embeddings(table)
        table = _shuffle(table, args.seed)
        out = os.path.join(args.outdir, f"{name}.parquet")
        if name == "events" and args.ts_encoding == "ns":
            idx = table.column_names.index("ts")
            table = table.set_column(
                idx,
                pa.field("ts", pa.timestamp("ns")),
                table.column("ts").cast(pa.timestamp("ns")),
            )
            # write INT64 TIMESTAMP(NANOS) physical encoding
            pq.write_table(table, out, store_schema=False)
        else:
            pq.write_table(table, out)
    print(f"variant written: {args.outdir} "
          f"(seed={args.seed}, ts={args.ts_encoding}, "
          f"adversarial={args.adversarial})")


if __name__ == "__main__":
    main()
