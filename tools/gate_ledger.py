"""Gate-rotation ledger (round-16 verdict ask #5).

Computes, for every catalog registry row, the last round in which the
DRIVER's 50-row correctness gate checked it — read directly from the
committed ``CORRECTNESS_r*.json`` artifacts, so the ledger cannot
drift from what actually ran — plus whether the row is in the CURRENT
window and whether it carries a full oracle. Prints a markdown table
(pasted into COVERAGE.md each round) and a staleness summary the
rotation policy is judged by.

Usage: python tools/gate_ledger.py [--current-round N]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def last_gated() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        n = int(os.path.basename(f).split("_r")[1].split(".")[0])
        try:
            d = json.load(open(f))
        except Exception:
            continue
        for k in d:
            last[k] = max(last.get(k, 0), n)
    return last


def main() -> None:
    cur = None
    if "--current-round" in sys.argv:
        cur = int(sys.argv[sys.argv.index("--current-round") + 1])
    from amazon_s3_find_and_forget_spark.catalog import (
        GATE_ORDER,
        ORACLES,
        TAIL_ORDER,
    )

    last = last_gated()
    rows = []
    for r in GATE_ORDER + TAIL_ORDER:
        lg = cur if (cur and r in GATE_ORDER) else last.get(r, 0)
        rows.append((lg, r, r in GATE_ORDER, r in ORACLES))
    rows.sort(key=lambda t: (t[0], t[1]))
    print("| last gated | row | in window now | oracle |")
    print("|---|---|---|---|")
    for lg, r, ing, orc in rows:
        print(
            f"| {'never' if lg == 0 else f'r{lg}'} | {r} | "
            f"{'yes' if ing else ''} | {'full' if orc else 'rows-only'} |"
        )
    gated_rounds = [lg for lg, _, _, orc in rows if orc]
    n_stale = sum(1 for lg in gated_rounds if cur and cur - lg > 4)
    print(
        f"\noracle rows: {len(gated_rounds)}; "
        f"un-gated >4 rounds{f' at r{cur}' if cur else ''}: {n_stale}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
