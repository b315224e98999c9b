#!/usr/bin/env bash
# CI-style smoke test: package the engine, run the flagship deletion job
# through a REAL spark-submit (not pytest's in-process session), assert
# the job completes and the matches are gone. Mirrors the cluster recipe
# in deploy/README.md at local[*] scale.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
SF_DIR="${SPARK_GRAFT_SMOKE_SF:-/root/testdata/sf0.001}"
WORK="$(mktemp -d /tmp/s3f2-smoke-XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

# package exactly what a cluster submit would ship
(cd "$REPO" && zip -qr "$WORK/s3f2.zip" amazon_s3_find_and_forget_spark)

# a writable copy of the test lake (never touch the source)
mkdir -p "$WORK/lake" "$WORK/state"
cp "$SF_DIR/lineitem.parquet" "$WORK/lake/lineitem.parquet"

SUBMIT="${SPARK_SUBMIT:-spark-submit}"
OUT="$("$SUBMIT" \
    --master "local[4]" \
    --conf spark.sql.shuffle.partitions=4 \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.ui.enabled=false \
    --py-files "$WORK/s3f2.zip" \
    "$REPO/deploy/submit_job.py" \
    --state-dir "$WORK/state" \
    --mapper "lineitem=$WORK/lake:l_orderkey:parquet" \
    --match-id 1 --match-id 7 \
    2>"$WORK/submit.log" | tail -1)"

echo "$OUT"
python3 - "$OUT" "$WORK" <<'PY'
import json, sys, glob
job = json.loads(sys.argv[1])
assert job["JobStatus"] == "COMPLETED", job
assert job["TotalObjectUpdatedCount"] >= 1, job
assert job["TotalQueryFailedCount"] == 0, job
print("SMOKE OK:", f"updated={job['TotalObjectUpdatedCount']}")
PY

# survivors check through a second, independent submit (dry-run Find):
# the deleted match ids must no longer hit any file
OUT2="$("$SUBMIT" \
    --master "local[4]" \
    --conf spark.sql.shuffle.partitions=4 \
    --conf spark.ui.enabled=false \
    --py-files "$WORK/s3f2.zip" \
    "$REPO/deploy/submit_job.py" \
    --state-dir "$WORK/state" \
    --match-id 1 --match-id 7 --dry-run \
    2>>"$WORK/submit.log" | tail -1)"
echo "$OUT2"
python3 - "$OUT2" <<'PY'
import json, sys
doc = json.loads(sys.argv[1])
assert doc["DryRun"] is True
assert doc["Mappers"]["lineitem"]["AffectedFiles"] == 0, doc
print("SMOKE OK: post-delete dry-run finds 0 affected files")
PY
# the dry-run must not have touched the persistent deletion queue
QOUT="$(python3 -m amazon_s3_find_and_forget_spark --state-dir "$WORK/state" list-queue 2>/dev/null | tail -1)"
python3 - "$QOUT" <<'PY'
import json, sys
q = json.loads(sys.argv[1])
assert q == [], f"dry-run leaked into the deletion queue: {q}"
print("SMOKE OK: dry-run left the deletion queue empty")
PY
echo "ALL SMOKE CHECKS PASSED"
