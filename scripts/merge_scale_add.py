#!/usr/bin/env python
"""Merge a bench_scale --queries SUBSET run into the standing
BENCH_SCALE.json WITHOUT clobbering existing queries (merge_x100.py
REPLACES the x100 sections — correct for the full-family refresh, wrong
for adding new operators): per factor key present in the run, update that
factor's wall_sec/checks entries; extend scaling_exponent_overall /
scaling_exponent_last_step over the run's factor span; if the run includes
x1 AND x100, extend the x100 section's queries/exponents/flags too.

Usage: python scripts/merge_scale_add.py /tmp/run.json [BENCH_SCALE.json]
"""

from __future__ import annotations

import json
import math
import sys

SRC = sys.argv[1]
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/BENCH_SCALE.json"

with open(SRC) as f:
    run = json.load(f)
with open(DST) as f:
    doc = json.load(f)

fkeys = sorted(run["factors"], key=lambda k: float(k[1:]))
for fk in fkeys:
    dst_f = doc["factors"].setdefault(fk, {"wall_sec": {}, "checks": {}})
    dst_f.setdefault("wall_sec", {}).update(run["factors"][fk]["wall_sec"])
    dst_f.setdefault("checks", {}).update(run["factors"][fk]["checks"])


def _exps(lo_k: str, hi_k: str) -> dict[str, float]:
    lo_f, hi_f = float(lo_k[1:]), float(hi_k[1:])
    lo = run["factors"][lo_k]["wall_sec"]
    hi = run["factors"][hi_k]["wall_sec"]
    return {
        q: round(math.log(hi[q] / lo[q]) / math.log(hi_f / lo_f), 3)
        for q in lo
        if q in hi and lo[q] > 0
    }


added = {}
if len(fkeys) >= 2 and fkeys != ["x1", "x100"]:
    overall = _exps(fkeys[0], fkeys[-1])
    last = _exps(fkeys[-2], fkeys[-1])
    doc["scaling_exponent_overall"].update(overall)
    doc["scaling_exponent_last_step"].update(last)
    added["overall"] = overall
    added["last_step"] = last

if "x1" in fkeys and "x100" in fkeys:
    exps = _exps("x1", "x100")
    sec = doc["x100"]
    sec["scaling_exponent_x1_x100"].update(exps)
    sec["queries"] = sorted(set(sec["queries"]) | set(exps))
    sec["flagged"] = sorted(
        q for q, e in sec["scaling_exponent_x1_x100"].items() if e >= sec["flag_threshold"]
    )
    added["x100_exponents"] = exps
    added["x100_flagged"] = sec["flagged"]

with open(DST, "w") as f:
    json.dump(doc, f, indent=1)
print(json.dumps(added, indent=1))
