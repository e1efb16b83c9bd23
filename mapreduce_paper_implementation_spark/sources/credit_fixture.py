"""Deterministic `credit_scores` fixture generator.

FIXTURES.md §2 requires a table analogous to the reference's
`data/credit-score/*.csv` corpus (/root/reference/mr/README.md:139-155,
parsed at /root/reference/mr-main/mrapps/credit.go:23-47) but the driver's
testdata does not include it, so the repo generates it deterministically
(seed 42) under fixtures/credit/sf*/.

Two artifacts per scale factor, agreeing with each other:
- credit_scores.parquet  — well-formed rows only (the relational truth)
- credit_scores.csv      — header + the same rows interleaved with ~1%
  malformed lines (short rows, non-integer year/score), exercising the
  reference's drop-malformed parse semantics (credit.go:30-41).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

AGENCIES = ["Equifax", "Experian", "TransUnion", "Yellow Banana"]
SEED = 42
ROWS_PER_SF = 200_000  # sf0.01 -> 2,000 rows (FIXTURES.md §2 scale note)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fixture_dir(sf: float) -> str:
    return os.path.join(REPO_ROOT, "fixtures", "credit", f"sf{sf:g}")


def sf_from_dir(sf_dir: str) -> float:
    """Extract the scale factor from a testdata dir like /root/testdata/sf0.01."""
    base = os.path.basename(sf_dir.rstrip("/"))
    return float(base.removeprefix("sf"))


def credit_paths(sf_dir: str) -> tuple[str, str]:
    """(parquet_path, csv_path) for the credit fixture matching a testdata sf
    dir. Tiers above sf0.1 are NOT committed (ADVICE r10: the sf10 tier alone
    was 64 MB of deterministically regenerable bytes in git history) — they
    are generated on demand here, exactly like scale_data/: seed-42
    deterministic, so an on-demand build is bit-identical to a committed one."""
    sf = sf_from_dir(sf_dir)
    d = fixture_dir(sf)
    pq_path = os.path.join(d, "credit_scores.parquet")
    csv_path = os.path.join(d, "credit_scores.csv")
    if not (os.path.exists(pq_path) and os.path.exists(csv_path)):
        generate(sf)
    return pq_path, csv_path


def generate(sf: float) -> str:
    rng = np.random.RandomState(SEED)
    n = max(200, int(ROWS_PER_SF * sf))
    user_id = np.arange(1, n + 1, dtype=np.int64)
    agency = rng.choice(len(AGENCIES), size=n).astype(np.int32)
    year = rng.randint(2019, 2025, size=n).astype(np.int32)
    score = rng.randint(300, 851, size=n).astype(np.int32)

    out = fixture_dir(sf)
    os.makedirs(out, exist_ok=True)

    table = pa.table(
        {
            "user_id": pa.array(user_id, pa.int64()),
            "agency": pa.array([AGENCIES[i] for i in agency], pa.string()),
            "year": pa.array(year, pa.int32()),
            "credit_score": pa.array(score, pa.int32()),
        }
    )
    pq_path = os.path.join(out, "credit_scores.parquet")
    pq.write_table(table, pq_path)

    # CSV with ~1% malformed lines interleaved deterministically.
    csv_path = os.path.join(out, "credit_scores.csv")
    malformed_cycle = [
        "{uid},Equifax",  # short row (credit.go:30-32 guard)
        "{uid},Experian,not_a_year,512",  # non-integer year (credit.go:34-36)
        "{uid},TransUnion,2023,not_a_score",  # non-integer score (credit.go:38-41)
    ]
    with open(csv_path, "w") as f:
        f.write("user_id,agency,year,credit_score\n")
        for i in range(n):
            f.write(f"{user_id[i]},{AGENCIES[agency[i]]},{year[i]},{score[i]}\n")
            if i % 100 == 99:  # deterministic ~1% malformed
                f.write(malformed_cycle[(i // 100) % 3].format(uid=900_000_000 + i) + "\n")
    return out


def generate_all() -> None:
    for sf in (0.001, 0.01, 0.1):
        print("generated", generate(sf))


if __name__ == "__main__":
    generate_all()
