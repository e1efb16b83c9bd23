"""Z-order layout writer (operators/layout.py): the written files must be
tight in EVERY interleaved dimension, so min/max pruning works for
predicates on either column — the property a single-column sort cannot
give."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from mapreduce_paper_implementation_spark.operators.layout import morton_key, zorder_write

DOMAIN = 1 << 10  # x, y in [0, 1024)


def _py_morton(vals, bits):
    key = 0
    for d, v in enumerate(vals):
        v &= (1 << bits) - 1
        for i in range(bits):
            key |= ((v >> i) & 1) << (i * len(vals) + d)
    return key


def test_morton_key_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (1023, 1), (123456, 654321)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", morton_key(["x", "y"], 21).alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_morton([x, y], 21), (x, y)


def _file_ranges(path, col):
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                    hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
        out.append((lo, hi))
    return out


def test_zorder_files_are_tight_in_both_dims_and_prune(spark, tmp_path):
    df = spark.range(0, 20_000).select(
        (F.xxhash64("id", F.lit(1)) % DOMAIN).alias("x"),
        (F.xxhash64("id", F.lit(2)) % DOMAIN).alias("y"),
    ).select(F.abs("x").alias("x"), F.abs("y").alias("y"))

    zpath, xpath = str(tmp_path / "zorder"), str(tmp_path / "xsort")
    zorder_write(df, ["x", "y"], zpath, n_files=16)
    # single-column layout for contrast: tight in x, blind in y
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xpath)

    def spreads(path, col):
        return [hi - lo for lo, hi in _file_ranges(path, col)]

    z_x, z_y = spreads(zpath, "x"), spreads(zpath, "y")
    s_x, s_y = spreads(xpath, "x"), spreads(xpath, "y")
    avg = lambda xs: sum(xs) / len(xs)  # noqa: E731
    # 16 files in 2-D -> each covers ~1/4 of EACH dimension (plus boundary
    # slack); a single-column sort leaves the other dimension full-domain
    assert avg(z_x) < 0.55 * DOMAIN, avg(z_x)
    assert avg(z_y) < 0.55 * DOMAIN, avg(z_y)
    assert avg(s_x) < 0.25 * DOMAIN, avg(s_x)
    assert avg(s_y) > 0.85 * DOMAIN, avg(s_y)

    # pruning a y-only predicate: files whose [min,max] intersect the band
    band = (400, 459)
    hit = lambda rngs: sum(  # noqa: E731
        1 for lo, hi in rngs if not (hi < band[0] or lo > band[1])
    )
    z_hits, s_hits = hit(_file_ranges(zpath, "y")), hit(_file_ranges(xpath, "y"))
    assert s_hits == 16, s_hits              # x-sort: every file must be read
    assert z_hits <= 8, (z_hits, s_hits)     # z-order: most files skipped

    # layout changes bytes placement only, never content
    assert spark.read.parquet(zpath).count() == 20_000
    a = spark.read.parquet(zpath).groupBy().agg(F.sum("x"), F.sum("y")).collect()
    b = df.groupBy().agg(F.sum("x"), F.sum("y")).collect()
    assert a == b
