#!/usr/bin/env python
"""Merge a bench_scale --factors 1,100 run (/tmp/bench_x100.json by
default) into BENCH_SCALE.json as the x100 section (VERDICT r07 ask #3):
adds factors.x100, the x1->x100 exponents, and the >=1.3 flag list with
justification slots for the exact-truth paths."""

from __future__ import annotations

import json
import math
import sys

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_x100.json"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/BENCH_SCALE.json"

with open(SRC) as f:
    run = json.load(f)
with open(DST) as f:
    doc = json.load(f)

x1 = run["factors"]["x1"]["wall_sec"]
x100 = run["factors"]["x100"]["wall_sec"]
exps = {
    q: round(math.log(x100[q] / x1[q]) / math.log(100), 3)
    for q in x1
    if q in x100 and x1[q] > 0
}
flagged = sorted(q for q, e in exps.items() if e >= 1.3)

doc["factors"]["x100"] = run["factors"]["x100"]
doc["x100"] = {
    "repeat": 1,
    "queries": sorted(x100),
    "scaling_exponent_x1_x100": exps,
    "flag_threshold": 1.3,
    "flagged": flagged,
    "notes": (
        "x100 = 500k docs / 200k vectors (scripts/gen_scale.py, planted "
        "truth incl. containment scores). repeat=1 (one ~40 min sweep; x1 "
        "noise shifts an exponent by at most log(1.4)/log(100) ~= 0.07). "
        "q21 (blocked-GEMM exact cosine) deliberately excluded: its "
        "quadratic asymptote is measured and documented at x30; q72 is "
        "the sub-quadratic replacement and IS included."
    ),
}
with open(DST, "w") as f:
    json.dump(doc, f, indent=1)
print(json.dumps({"exponents": exps, "flagged": flagged}, indent=1))
