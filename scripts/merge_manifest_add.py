#!/usr/bin/env python
"""Merge a bench_manifest_scale --queries SUBSET run into the standing
BENCH_SCALE.json manifest section (round-workflow step 5b, scripted):
updates per-run-dir wall_sec/rows/failures for the subset queries,
recomputes total_sec / n_queries / flagged / all_succeeded, extends
scaling_exponent, and appends a provenance note.

Usage: python scripts/merge_manifest_add.py /tmp/sub10.json manifest [note]
       python scripts/merge_manifest_add.py /tmp/sub30.json manifest_x30
"""

from __future__ import annotations

import json
import sys

SRC, KEY = sys.argv[1], sys.argv[2]
NOTE = sys.argv[3] if len(sys.argv) > 3 else None
DST = "/root/repo/BENCH_SCALE.json"

with open(SRC) as f:
    run = json.load(f)
# bench_manifest_scale --out wraps its section under a "manifest" key
# regardless of factor; unwrap if present
if "manifest" in run and "results" not in run:
    run = run["manifest"]
with open(DST) as f:
    doc = json.load(f)

sec = doc[KEY]
assert run["factor"] == sec["factor"], (run["factor"], sec["factor"])
for rk, rv in run["results"].items():
    dsec = sec["results"][rk]
    dsec["wall_sec"].update(rv["wall_sec"])
    dsec["rows"].update(rv["rows"])
    rf = rv.get("failures") or {}
    df_ = dsec.get("failures")
    if isinstance(df_, dict):
        df_.update(rf if isinstance(rf, dict) else dict.fromkeys(rf, "failed"))
    elif isinstance(df_, list):
        # some standing sections record failures as a name list
        dsec["failures"] = sorted(set(df_) | set(rf))
    else:
        dsec["failures"] = rf
    dsec["total_sec"] = round(sum(dsec["wall_sec"].values()), 2)
sec["scaling_exponent"].update(run["scaling_exponent"])
sec["n_queries"] = len(sec["results"]["x1"]["wall_sec"])
sec["flagged"] = sorted(
    q for q, e in sec["scaling_exponent"].items() if e >= sec["flag_threshold"]
)
sec["all_succeeded"] = all(not r.get("failures") for r in sec["results"].values())
if NOTE:
    sec["notes"] = (sec.get("notes", "") + " " + NOTE).strip()

with open(DST, "w") as f:
    json.dump(doc, f, indent=1)
print(
    json.dumps(
        {
            "merged": sorted(run["scaling_exponent"]),
            "exponents": run["scaling_exponent"],
            "n_queries": sec["n_queries"],
            "flagged": sec["flagged"],
        },
        indent=1,
    )
)
