"""The reference's application plugins, re-expressed as Python Map/Reduce
pairs for the MR-compat surface (`mr.py`) and the CLI (`__main__.py`).

The reference loads apps as Go .so plugins (/root/reference/mr-main/
mrworker.go:34-51); here they are a registry of (mapf, reducef) pairs with
the same signatures (mr/worker.go:32-33):

    mapf(filename: str, contents: str) -> list[(key, value)]
    reducef(key: str, values: list[str]) -> str

Only the three REAL data apps are here (wc, indexer, credit). The other six
reference "apps" are framework probes (crash/jobcount/timing) whose behavior
is covered by tests, not user-facing programs — see SURVEY.md §2B.

These module-level functions are pickled by reference, so the package must
be importable on executors: the CLI calls `ensure_shipped(spark)` before
running (same mechanism as the @query wrapper).
"""

from __future__ import annotations

import re


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^A-Za-z]+", text) if t]


# --- wc: /root/reference/mr-main/mrapps/wc.go:21-42 ------------------------


def wc_map(filename: str, contents: str):
    return [(w, "1") for w in _tokens(contents)]


def wc_reduce(key: str, values: list[str]) -> str:
    return str(len(values))


# --- indexer: /root/reference/mr-main/mrapps/indexer.go:21-40 --------------


def indexer_map(filename: str, contents: str):
    # map-side de-dup (indexer.go:22-27)
    return [(w, filename) for w in set(_tokens(contents))]


def indexer_reduce(key: str, values: list[str]) -> str:
    values = sorted(values)
    return f"{len(values)} {','.join(values)}"


# --- credit: /root/reference/mr-main/mrapps/credit.go:21-58 ----------------


def credit_map(filename: str, contents: str):
    out = []
    for i, line in enumerate(contents.splitlines()):
        if i == 0:
            continue  # header skip (credit.go:25-27)
        fields = line.split(",")
        if len(fields) < 4:
            continue  # short row dropped (credit.go:30-32)
        try:
            year = int(fields[2])
            score = int(fields[3])
        except ValueError:
            continue  # non-integer dropped (credit.go:34-41)
        if year == 2023 and score > 400:  # predicate (credit.go:43)
            out.append((fields[1], fields[0]))
    return out


def credit_reduce(key: str, values: list[str]) -> str:
    return str(len(values))


APPS = {
    "wc": (wc_map, wc_reduce),
    "indexer": (indexer_map, indexer_reduce),
    "credit": (credit_map, credit_reduce),
}
