"""Lane-scale datum for the PACKAGED curate chain (r14 verdict ask #5).

The deploy smoke proves the spark-submit plumbing on a toy corpus; this
tool prices it at lane scale and proves result identity: the same
curate chain (exact-dedup -> decontaminate -> gopher -> split) runs
(a) through a REAL ``spark-submit --py-files s3f2.zip
deploy/submit_cli.py`` and (b) in-process through ``cli.main`` — the
identical operator code driven both ways — over the derived sf10
corpus (500k docs), and the outputs must match row-for-row
(doc_id, text, split). Prints one JSON line with both wall-times and
the identity verdict; the recorded datum lives in SCALE.md.

Usage: python tools/lane_curate_cli.py [SF10_DIR]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/s3f2-sf10-bench"
    docs = os.path.join(sf10, "documents.parquet")
    if not os.path.exists(docs):
        raise SystemExit(f"no sf10 corpus at {docs} (run bench.py once)")
    work = tempfile.mkdtemp(prefix="s3f2-lane-curate-")
    try:
        # benchmark relation: every 50th doc (the catalog convention)
        import duckdb

        src = docs if os.path.isfile(docs) else os.path.join(
            docs, "*.parquet"
        )
        bench_dir = os.path.join(work, "bench")
        os.makedirs(bench_dir)
        duckdb.sql(
            f"COPY (SELECT * FROM '{src}' WHERE doc_id % 50 = 0) TO "
            f"'{bench_dir}/part-0.parquet' (FORMAT parquet)"
        )

        subprocess.run(
            ["zip", "-qr", os.path.join(work, "s3f2.zip"),
             "amazon_s3_find_and_forget_spark"],
            cwd=REPO, check=True,
        )
        args = [
            "curate", "--input", docs, "--benchmark", bench_dir,
            "--steps", "exact-dedup,decontaminate,gopher,split",
            "--ngram", "8", "--salt", "lane15",
        ]

        # (a) the packaged path: real spark-submit, package via --py-files
        t0 = time.perf_counter()
        sub = subprocess.run(
            [
                os.environ.get("SPARK_SUBMIT", "spark-submit"),
                "--master", "local[32]",
                "--conf", "spark.sql.shuffle.partitions=32",
                "--conf", "spark.sql.adaptive.enabled=true",
                "--conf", "spark.ui.enabled=false",
                "--py-files", os.path.join(work, "s3f2.zip"),
                os.path.join(REPO, "deploy", "submit_cli.py"),
                "--state-dir", os.path.join(work, "state-sub"),
                "--cpus", "32",
            ] + args + ["--out", os.path.join(work, "out-sub")],
            capture_output=True, text=True, check=True,
        )
        t_submit = round(time.perf_counter() - t0, 1)
        # the CLI report is pretty-printed multi-line JSON on stdout
        report_sub = json.loads(sub.stdout[sub.stdout.index("{"):])

        # (b) the in-process path: same CLI code, library session
        from amazon_s3_find_and_forget_spark.cli import main as cli_main

        t0 = time.perf_counter()
        cli_main(
            ["--state-dir", os.path.join(work, "state-in"),
             "--cpus", "32"]
            + args + ["--out", os.path.join(work, "out-in")]
        )
        t_inproc = round(time.perf_counter() - t0, 1)

        # identity: row-for-row over (doc_id, text, split)
        q = (
            "SELECT count(*) FROM ("
            "SELECT doc_id, text, split FROM '{a}/**/*.parquet' "
            "EXCEPT SELECT doc_id, text, split FROM '{b}/**/*.parquet')"
        )
        a, b = os.path.join(work, "out-sub"), os.path.join(work, "out-in")
        d1 = duckdb.sql(q.format(a=a, b=b)).fetchone()[0]
        d2 = duckdb.sql(q.format(a=b, b=a)).fetchone()[0]
        n = duckdb.sql(
            f"SELECT count(*) FROM '{a}/**/*.parquet'"
        ).fetchone()[0]
        print(json.dumps({
            "sf10_dir": sf10,
            "submit_sec": t_submit,
            "inprocess_sec": t_inproc,
            "output_rows": n,
            "identical": (d1 == 0 and d2 == 0),
            "report": {k: report_sub[k] for k in
                       ("InputRows", "ExactSurvivors",
                        "ContaminatedTokensRemoved", "GopherSurvivors",
                        "OutputRows") if k in report_sub},
        }))
        if d1 or d2:
            raise SystemExit(
                f"IDENTITY FAILED: {d1} rows only in submit output, "
                f"{d2} only in in-process output"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
