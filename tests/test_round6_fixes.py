"""Round-6 hardening (VERDICT r05 asks): occupancy-derived GEMM tile
counts (ask #3) — a hot cell must yield MORE tiles, never bigger ones —
and the auto-B default for the batch blocked-GEMM operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_paper_implementation_spark.operators.dedup import derive_gemm_blocks
from mapreduce_paper_implementation_spark.streaming.ann_index import (
    AnnIndexMaintainer,
    derive_tile_blocks,
)


def test_derive_tile_blocks_hot_cell_gets_more_tiles_not_bigger():
    batch = {0: 10, 1: 500}
    total = {0: 10, 1: 5000, 2: 999}  # cell 1 is hot in history; 2 untouched
    blocks = derive_tile_blocks(batch, total, rows_per_tile=100)
    assert blocks[0] == (1, 1)
    assert blocks[1] == (5, 50)  # 10x occupancy -> 10x R tiles
    assert 2 not in blocks  # batch never touched it: pruned, no tiles
    # operand bound: ceil-split means every block holds <= rows_per_tile rows
    for cell, (bl, br) in blocks.items():
        assert -(-batch[cell] // bl) <= 100
        assert -(-total[cell] // br) <= 100


def test_derive_tile_blocks_growth_changes_count_only():
    """The invariant the r05 verdict asked for, stated directly: as a cell's
    occupancy grows between retrains, rows-per-tile stays bounded and the
    tile COUNT absorbs the growth."""
    for occupancy in (100, 1000, 10_000, 100_000):
        (bl, br) = derive_tile_blocks({7: 200}, {7: occupancy}, 2048)[7]
        assert -(-occupancy // br) <= 2048
        assert bl == 1  # batch side unchanged
    assert derive_tile_blocks({7: 200}, {7: 100_000}, 2048)[7][1] == 49


def test_derive_gemm_blocks_memory_bounds():
    mem = 64 << 20
    for n, dim in ((0, 64), (100, 64), (20_000, 64), (60_000, 64), (5_000, 4096)):
        b = derive_gemm_blocks(n, dim, mem)
        assert b >= 1
        if n:
            assert (n / b) ** 2 * 8 <= mem  # score tile fits
            assert 2 * (n / b) * dim * 8 <= mem  # operands fit
    # monotone in n: a bigger corpus never gets fewer blocks
    assert derive_gemm_blocks(40_000, 64) >= derive_gemm_blocks(20_000, 64)


def test_ann_maintainer_multi_tile_path_equals_one_shot(spark, sf_dir, tmp_path):
    """Force the multi-tile path (tiny rows_per_tile -> every cell splits
    into several L/R blocks) and check the per-batch union still equals the
    one-shot operator with the same frozen centroids — the tile split must
    be invisible in the output."""
    from mapreduce_paper_implementation_spark.operators.dedup import (
        semantic_dedup_pairs,
    )
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    m = AnnIndexMaintainer(
        spark,
        str(tmp_path / "state"),
        n_cells=8,
        nassign=2,
        threshold=0.45,
        rows_per_tile=16,
    )
    got = {}
    for bid in range(3):
        out = m.update(emb.where(F.col("vec_id") % 3 == bid), bid)
        for r in out.collect():
            got[(r["id_a"], r["id_b"])] = r["cos_sim"]
    full = semantic_dedup_pairs(emb, centroids=m.centroids(), nassign=2, threshold=0.45)
    expected = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in full.collect()}
    assert got == expected and expected


def test_ann_maintainer_occupancy_sidecar(spark, sf_dir, tmp_path):
    """occupancy() must equal a direct count over the assignment store, stay
    correct across compact() (sidecar fold) and replay, and never require
    scanning the vector column."""
    from mapreduce_paper_implementation_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    m = AnnIndexMaintainer(
        spark, str(tmp_path / "state"), n_cells=8, nassign=2, threshold=0.45
    )
    for bid in range(3):
        m.update(emb.where(F.col("vec_id") % 3 == bid), bid)

    def direct():
        return {
            r["cell"]: r["n"]
            for r in m.cells().groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
        }

    assert m.occupancy() == direct()
    m.compact()
    assert m.occupancy() == direct()
    m.update(emb.where(F.col("vec_id") % 3 == 0), 1)  # replay: no-op
    assert m.occupancy() == direct()
