#!/usr/bin/env python
"""Regenerate BASELINE.md's standing per-query table from a full bench run
and print box-noise percentiles from a same-code twin run (VERDICT r09 ask
#5: the standing table becomes repeat=2 min-of, and "within noise" becomes
a measured number).

Usage:
    python scripts/regen_baseline_table.py BENCH_r10_local.json BENCH_r10_localB.json

Replaces the `| query | sec |` block in BASELINE.md with run A's rows
(run A should be `python bench.py --repeat 2` on a quiet box) and prints
the per-query |A-B|/min(A,B) distribution (p50/p90/max) between the two
same-code runs — paste the numbers into the narrative. Narrative text
around the table is NOT rewritten; update totals/dates by hand.
"""

from __future__ import annotations

import json
import re
import sys

A, B = sys.argv[1], sys.argv[2]
MD = "/root/repo/BASELINE.md"

with open(A) as f:
    ra = json.load(f)
with open(B) as f:
    rb = json.load(f)
qa, qb = ra["queries"], rb["queries"]


def _num(name: str) -> int:
    m = re.match(r"q(\d+)", name)
    return int(m.group(1))


rows = "\n".join(f"| {q} | {qa[q]} |" for q in sorted(qa, key=_num))
with open(MD) as f:
    md = f.read()
pattern = re.compile(r"\| query \| sec \|\n\|---\|---\|\n(?:\| q\d+\w* \| [\d.]+ \|\n)+")
new_block = f"| query | sec |\n|---|---|\n{rows}\n"
assert pattern.search(md), "standing table block not found"
md = pattern.sub(new_block, md, count=1)
with open(MD, "w") as f:
    f.write(md)

common = sorted(set(qa) & set(qb))
deltas = sorted(abs(qa[q] - qb[q]) / min(qa[q], qb[q]) for q in common if min(qa[q], qb[q]) > 0)


def _pct(p: float) -> float:
    return round(deltas[min(len(deltas) - 1, int(p * len(deltas)))], 3)


print(
    json.dumps(
        {
            "table_rows": len(qa),
            "total_A": round(sum(qa.values()), 1),
            "total_B": round(sum(qb.values()), 1),
            "noise_p50": _pct(0.50),
            "noise_p90": _pct(0.90),
            "noise_max": round(deltas[-1], 3),
            "worst_queries": {
                q: (qa[q], qb[q])
                for q in sorted(common, key=lambda q: -abs(qa[q] - qb[q]) / min(qa[q], qb[q]))[:5]
            },
        },
        indent=1,
    )
)
