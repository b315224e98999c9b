"""Lane-scale Bloom screen LIFECYCLE datum (round-16 verdict ask #6).

The sf10 bench cells price one build and one probe; this tool proves
the multi-batch story end to end through the packaged CLI over the
derived sf10 corpus (500k docs): screen batch A (first bitmap delta)
-> screen batch B against A's bitmap (second delta) -> compact-index
(row-concatenating fold into one base partition; the read path ORs
bitmap rows, so the fold is semantics-preserving by construction) ->
re-screen the FULL corpus against the folded base under a fresh batch
id. Bloom filters have no false negatives, so every document inserted
by A or B MUST hit the folded bitmap: the lifecycle assertion is
novel(re-screen) == 0, exactly — any miss means the fold lost bits.

Prints one JSON line with per-phase wall-times and the assertion
verdicts; the recorded datum lives in SCALE.md.

Usage: python tools/lane_bloom_lifecycle.py [SF10_DIR]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import duckdb

    sf10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/s3f2-sf10-bench"
    docs = os.path.join(sf10, "documents.parquet")
    if not os.path.exists(docs):
        raise SystemExit(f"no sf10 corpus at {docs} (run bench.py once)")
    src = docs if os.path.isfile(docs) else os.path.join(docs, "*.parquet")
    work = tempfile.mkdtemp(prefix="s3f2-lane-bloom-")
    try:
        n_total = duckdb.sql(
            f"SELECT count(*) FROM '{src}'"
        ).fetchone()[0]
        # two arrival batches: doc_id parity (deterministic, no order
        # dependence on the lane corpus layout)
        for name, pred in (("a", "doc_id % 2 = 0"), ("b", "doc_id % 2 = 1")):
            d = os.path.join(work, f"batch_{name}")
            os.makedirs(d)
            duckdb.sql(
                f"COPY (SELECT * FROM '{src}' WHERE {pred}) TO "
                f"'{d}/part-0.parquet' (FORMAT parquet)"
            )

        from amazon_s3_find_and_forget_spark.cli import main as cli_main

        idx = os.path.join(work, "idx")
        nov = os.path.join(work, "novel")
        state = os.path.join(work, "state")

        def screen(inp: str, batch_id: str, *extra: str) -> float:
            t0 = time.perf_counter()
            cli_main(
                ["--state-dir", state, "--cpus", "32", "dedup-screen",
                 "--mode", "bloom", "--input", inp, "--index-dir", idx,
                 "--novel-out", nov, "--batch-id", batch_id] + list(extra)
            )
            return round(time.perf_counter() - t0, 1)

        t_a = screen(os.path.join(work, "batch_a"), "b1",
                     "--bloom-capacity", str(n_total))
        t_b = screen(os.path.join(work, "batch_b"), "b2")

        def count(batch_id: str) -> int:
            return duckdb.sql(
                f"SELECT count(*) FROM "
                f"'{nov}/batch={batch_id}/*.parquet'"
            ).fetchone()[0]

        novel_a, novel_b = count("b1"), count("b2")

        t0 = time.perf_counter()
        cli_main(["--state-dir", state, "--cpus", "32",
                  "compact-index", "--index-dir", idx])
        t_compact = round(time.perf_counter() - t0, 1)
        dirs_after = sorted(
            d for d in os.listdir(idx) if d.startswith("batch")
        )

        # the lifecycle claim: everything A and B inserted must hit the
        # FOLDED bitmap — re-screen the whole corpus as a fresh batch
        full = os.path.join(work, "full")
        os.makedirs(full)
        duckdb.sql(
            f"COPY (SELECT * FROM '{src}') TO "
            f"'{full}/part-0.parquet' (FORMAT parquet)"
        )
        t_rescreen = screen(full, "rescreen")
        novel_rescreen = count("rescreen")

        out = {
            "sf10_dir": sf10,
            "corpus_rows": n_total,
            "screen_a_sec": t_a,
            "screen_b_sec": t_b,
            "compact_sec": t_compact,
            "rescreen_sec": t_rescreen,
            "novel_a": novel_a,
            "novel_b": novel_b,
            "index_dirs_after_compact": dirs_after,
            "novel_after_compact": novel_rescreen,
            "lifecycle_ok": (
                novel_rescreen == 0
                and len(dirs_after) == 1
                and dirs_after[0].startswith("batch=base-")
            ),
        }
        print(json.dumps(out))
        if not out["lifecycle_ok"]:
            raise SystemExit(
                f"LIFECYCLE FAILED: {novel_rescreen} docs re-admitted "
                f"after compaction (index dirs: {dirs_after})"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
