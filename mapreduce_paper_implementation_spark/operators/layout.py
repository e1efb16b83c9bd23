"""Z-order (Morton) data layout: multi-dimensional file clustering for
min/max pruning.

Parquet readers prune files and row groups whose column [min, max] ranges
miss the predicate. A layout sorted on one column makes its OWN ranges
tight but leaves every other column's range spanning the full domain —
filters on the second column prune nothing. Interleaving the bits of both
columns into one Morton key and range-partitioning + sorting on it gives
every file a tight range on EVERY interleaved column (~domain/sqrt(n_files)
per dimension for 2-D), so selective predicates on either column skip most
of a 100 TB table at the file listing / footer stage — the technique behind
Delta/Iceberg's OPTIMIZE ZORDER, here as a plain Spark writer.

Everything is JVM-side codegen: the Morton key is a literal expression tree
of shifts/masks (no HOF, no Python), the placement is one
repartitionByRange shuffle (range boundaries from Spark's sampling) plus a
per-partition sort — exactly the TeraSort shape the engine already uses for
q47.

Reference provenance: the reference has no storage layout control at all —
its sink is fixed per-reduce-task text files (/root/reference/
mr/worker.go:148-157). This module belongs to the engine's 100 TB
table-layout surface (SURVEY.md §2C scans/sinks row), alongside the
partitioned/bucketed writers exercised in tests/test_sinks.py and
tests/test_bucketing.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Z = "__zorder_key"


def morton_key(cols: Sequence[str | Column], bits_per_dim: int = 21) -> Column:
    """Interleave the low `bits_per_dim` bits of each (non-negative
    integral) column into one Morton key — bit i of dimension d lands at
    position i * n_dims + d. 2 dims x 21 bits fills 42 bits of the long;
    values are masked to the bit budget first, so out-of-range inputs
    degrade to coarser (wrapped) clustering rather than erroring.

    Built as a literal OR/shift expression tree (n_dims * bits_per_dim
    terms): stays inside whole-stage codegen; a higher-order-function
    formulation would evaluate interpreted (SURVEY.md §8.1)."""
    n_dims = len(cols)
    if n_dims * bits_per_dim > 62:
        raise ValueError(
            f"{n_dims} dims x {bits_per_dim} bits exceeds the 62-bit budget"
        )
    key = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for d, c in enumerate(cols):
        v = (F.col(c) if isinstance(c, str) else c).cast("long").bitwiseAND(
            F.lit((1 << bits_per_dim) - 1).cast("long")
        )
        for i in range(bits_per_dim):
            bit = F.shiftright(v, i).bitwiseAND(one)
            key = key.bitwiseOR(F.shiftleft(bit, i * n_dims + d))
    return key


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    n_files: int,
    bits_per_dim: int = 21,
    mode: str = "overwrite",
) -> None:
    """Write `df` as `n_files` parquet files clustered by the Z-order of
    `cols`: one repartitionByRange shuffle on the Morton key (range
    boundaries via Spark's reservoir sample — the q47 TeraSort placement),
    a per-partition sort so row groups inside each file are tight too, then
    the key is dropped before writing. Readers need no special support —
    ordinary parquet min/max pruning on the original columns does the
    skipping."""
    (
        df.withColumn(_Z, morton_key(cols, bits_per_dim))
        .repartitionByRange(n_files, _Z)
        .sortWithinPartitions(_Z)
        .drop(_Z)
        .write.mode(mode)
        .parquet(path)
    )
