"""Connected components over a pair graph — the step that turns near-dup
PAIRS into dedup CLUSTERS (pick one representative per component).

Iterative min-label propagation (the Pregel/GraphX pattern expressed in
DataFrames): every vertex starts labeled with itself; each round every
vertex adopts the minimum label among itself and its neighbors; converged
when no label changes. Rounds needed = graph diameter (near-dup clusters
are small and dense, so typically 2-4).

Scale notes:
- each round is one self-contained join + aggregate on the edge list —
  shuffle size O(|E|), no driver-side data;
- `localCheckpoint` truncates the lineage each round, without it the plan
  doubles every iteration and the job dies on plan-compile time long before
  data size matters;
- the convergence check is a driver-side count of changed labels (a scalar
  per round, not a collect of data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every vertex appearing in `pairs`; component =
    min vertex id reachable. Deterministic for any edge order."""
    # Symmetrize in ONE pass over `pairs` (explode of the two directions),
    # not a self-union — a union's two branches each re-evaluate the
    # upstream pair pipeline (for near-dup graphs that is the full
    # shingle/similarity join, the most expensive stage of the query).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src_col).alias("a"), F.col(dst_col).alias("b")),
                    F.struct(F.col(dst_col).alias("a"), F.col(src_col).alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
        .localCheckpoint()
    )
    # Initial label = min(self, direct neighbors): one aggregate over the
    # edge list, which IS the first propagation round — the loop below then
    # only runs the remaining (diameter - 1) rounds.
    labels = edges.groupBy("a").agg(
        F.least(F.col("a"), F.min("b")).alias("lbl")
    ).select(F.col("a").alias("id"), "lbl")
    # Convergence metric: labels only ever decrease, so sum(lbl) is strictly
    # monotone until the fixpoint — one cheap scalar aggregate per round
    # instead of a join-and-count of changed rows.
    prev_sum: int | None = None
    converged = False
    for _ in range(max_iter):
        # candidate label per vertex: min over neighbors' labels and its own
        neighbor_lbl = (
            edges.join(labels, edges["b"] == labels["id"])
            .select(F.col("a").alias("id"), "lbl")
        )
        labels = (
            labels.unionByName(neighbor_lbl)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("lbl")).first()[0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Returning silently here would emit SPLIT clusters (wrong labels)
        # on chain-shaped graphs with diameter > max_iter. Fail loudly.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds (labels still changing) — the pair graph has diameter > "
            f"{max_iter}; raise max_iter"
        )
    return labels.select("id", F.col("lbl").alias("component"))


def dedup_clusters(pairs: DataFrame, src_col: str = "id_a", dst_col: str = "id_b") -> DataFrame:
    """Cluster summary: (component representative, member count, members
    sorted) — the 'keep one per cluster' artifact of a dedup pipeline."""
    cc = connected_components(pairs, src_col, dst_col)
    return (
        cc.groupBy("component")
        .agg(
            F.count("*").alias("n_members"),
            F.concat_ws(",", F.sort_array(F.collect_list(F.col("id").cast("string")))).alias(
                "members"
            ),
        )
        .orderBy("component")
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    scale: int = 10**12,
    damping_pct: int = 85,
    checkpoint_every: int = 8,
) -> DataFrame:
    """PageRank with EXACT scaled-integer arithmetic: (node, rank_scaled,
    rank) after `iters` synchronous iterations at damping d =
    damping_pct/100, rank mass scaled by `scale`.

    The MapReduce paper's canonical iterative workload (mapreduce-paper.pdf
    names web-graph ranking as the motivating large computation; §2.3's
    reverse web-link graph — our q66 — builds exactly the structure PageRank
    consumes). The reference cannot express iteration at all (one map +
    one reduce per job, /root/reference/mr/coordinator.go:135); chaining
    jobs by hand is the workaround its model implies.

    Why scaled integers: float PageRank sums contributions per target in a
    nondeterministic order, so double results differ between engines (and
    between runs at different parallelism) by accumulation order. With
    rank as BIGINT(scale * value) and per-edge contributions computed by
    integer division `(d_num * rank) div (d_den * outdeg)`, every operation
    is exact and associative — any summation order gives the SAME integer,
    so a DuckDB replay hash-matches bit-for-bit. Dropped remainders are
    < 1/scale per edge (1e-12 of total mass) — quantization, not float
    noise: deterministic everywhere.

    Semantics (simple variant, mirrored exactly by the oracle): nodes =
    endpoints of `edges`; rank_0 = floor(scale/N); rank_{i+1}(v) =
    floor((1-d)*scale/N) + sum over in-edges (u,v) of
    floor(d*rank_i(u) / outdeg(u)); dangling mass is dropped (not
    redistributed).

    Scale shape per iteration: ranks join edges on src (shuffle O(|E|)),
    partial-aggregated sum per dst, left join back to the node list —
    the Pregel message-passing round as two shuffles. N enters as a
    single-row broadcast (the q49/q57 pattern), never a driver round-trip.
    `localCheckpoint` every `checkpoint_every` rounds truncates lineage so
    deep iteration counts don't blow up plan compilation (same discipline
    as connected_components); the default never triggers at iters=3.
    """
    src, dst = F.col(src_col), F.col(dst_col)
    # edges/nodes/outdeg are loop-invariant; localCheckpoint them so each
    # iteration's lineage reads the materialized frames instead of
    # re-deriving them from the raw scan once per reference (the audited
    # plan showed 22 source scans for 3 iterations without this).
    e = edges.select(src.alias("src"), dst.alias("dst")).distinct().localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint()
    )
    n_row = F.broadcast(nodes.agg(F.count("*").alias("n")))
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    d_num, d_den = damping_pct, 100
    base = F.expr(f"({(d_den - d_num)} * {scale}) div ({d_den} * n)")
    ranks = nodes.crossJoin(n_row).select(
        "node", "n", F.expr(f"{scale} div n").alias("r")
    )
    for i in range(1, iters + 1):
        contribs = (
            ranks.join(e, ranks["node"] == e["src"])
            .join(outdeg, "src")
            .select("dst", F.expr(f"({d_num} * r) div ({d_den} * od)").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.crossJoin(n_row)
            .join(contribs, nodes["node"] == contribs["dst"], "left")
            .select("node", "n", (base + F.coalesce("s", F.lit(0))).alias("r"))
        )
        if i % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        "node",
        F.col("r").alias("rank_scaled"),
        (F.col("r").cast("double") / F.lit(float(scale))).alias("rank"),
    )


def count_triangles(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, n_tri) — per-node triangle participation counts over the
    UNDIRECTED simple graph underlying `edges` (direction and multiplicity
    dropped, self-loops ignored); only nodes in >= 1 triangle appear.

    The MapReduce-era wedge-check algorithm (Suri & Vassilvitskii 2011,
    "Counting Triangles and the Curse of the Last Reducer") with the
    degree-based orientation that tames that curse: orient every undirected
    edge from the endpoint that is SMALLER under the total order
    (degree, id) to the larger. The oriented out-degree of every vertex —
    hub or not — is O(sqrt(|E|)), so wedge enumeration per vertex is
    bounded even on Zipf-skewed graphs, where the naive lowest-id
    orientation hands one reducer the whole hub neighborhood. Each triangle
    is counted exactly once: the orientation is acyclic, and the wedge is
    anchored at the triangle's unique source-of-both vertex.

    Scale shape: degree join + orientation are O(|E|); the wedge self-join
    shuffles oriented edges on the anchor u once; the closing join shuffles
    wedge pairs against oriented edges on (v, w) — O(#wedges), the
    algorithm's intrinsic cost, bounded by the orientation. No driver-side
    data, no cartesian, no per-row Python.
    """
    s, d = F.col(src_col), F.col(dst_col)
    und = (
        edges.where(s != d)
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
        .localCheckpoint()  # degree + both orientation references reuse it
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select("b"))
        .groupBy("node")
        .agg(F.count("*").alias("dg"))
    )
    with_deg = (
        und.join(deg.withColumnRenamed("node", "a").withColumnRenamed("dg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("dg", "db"), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint()  # wedge join + closing join both reuse it
    l, r = oriented.alias("l"), oriented.alias("r")
    wedges = l.join(r, "u").where(
        (F.col("l.dv") < F.col("r.dv"))
        | ((F.col("l.dv") == F.col("r.dv")) & (F.col("l.v") < F.col("r.v")))
    ).select("u", F.col("l.v").alias("v"), F.col("r.v").alias("w"))
    tris = wedges.join(
        oriented.select(F.col("u").alias("v"), F.col("v").alias("w")),
        ["v", "w"],
    )
    return (
        tris.select(
            F.explode(F.array(F.col("u"), F.col("v"), F.col("w"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_tri"))
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """(node, hop) — minimum number of directed edges from any seed, for
    every reachable node. Seeds themselves are hop 0.

    Frontier exhaustion (an empty next wave) is the PRIMARY termination;
    `max_hops` is an optional radius cap for neighborhood queries
    (max_hops=None traverses to the full reachable set, e.g. a
    high-diameter chain runs exactly diameter+1 rounds).

    Frontier-based BFS expressed as DataFrame joins (the Pregel traversal
    pattern, like connected_components above but level-synchronous):

        frontier_0 = seeds
        frontier_{k+1} = neighbors(frontier_k) - visited

    Scale notes (same discipline as pagerank/connected_components):
    - each round shuffles O(|frontier| x avg-degree) then distincts — the
      frontier, not the full vertex set, so late rounds on a high-diameter
      graph cost only what the wave touches;
    - the anti-join against `visited` keeps the frontier minimal (a node is
      expanded exactly once — without it a dense graph re-expands the same
      nodes every round and work grows geometrically);
    - `localCheckpoint` per FRONTIER truncates lineage (plan-compile time,
      not data, is what kills unbounded iteration). `visited` is a flat
      union of those checkpointed, mutually DISJOINT frontiers — never
      re-checkpointed per round, so executor storage holds each visited
      node's block exactly once (a per-round visited checkpoint would
      accumulate O(rounds x |visited|) superseded copies for the life of
      the session);
    - early exit on an empty frontier is a scalar isEmpty() per round.

    Reference analog: iterative jobs are out of scope for the one-shot
    MapReduce runtime (/root/reference/mr-main/mr/coordinator.go runs a
    single map/reduce barrier); this is the multi-job chaining pattern the
    paper's §3.5 "iterates until convergence" discussion sketches.
    """
    import itertools

    e = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .where(F.col("d").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    visited = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .select("node", F.lit(0).cast("long").alias("hop"))
        .localCheckpoint()
    )
    frontier = visited.select("node")
    hops = itertools.count(1) if max_hops is None else range(1, max_hops + 1)
    for k in hops:
        nxt = (
            frontier.join(e, frontier["node"] == e["s"])
            .select(F.col("d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.union(
            nxt.select("node", F.lit(k).cast("long").alias("hop"))
        )
        frontier = nxt
    return visited


def pagerank_fixpoint(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = 10**12,
    damping_pct: int = 85,
    r0: DataFrame | None = None,
    max_iter: int = 200,
) -> tuple[DataFrame, int | None]:
    """PageRank iterated to the exact integer FIXPOINT: returns
    ((node, rank_scaled, rank), n_iters) where n_iters is the first
    iteration whose output is BIT-EQUAL to its input (None if max_iter
    rounds never reach one). Same exact scaled-integer arithmetic and
    per-iteration shape as `pagerank` (two O(|E|) shuffles per round).

    "Converged" is bit-testable precisely because the arithmetic is
    integer: consecutive iterates either differ in some BIGINT or are the
    SAME vector — no epsilon. The damping contraction shrinks differences
    geometrically until they sit inside the floor-quantization lattice,
    where the map goes stationary (measured: 26 rounds cold on the sf0.01
    events graph).

    `r0` (node, r) warm-starts the iteration — the incremental-serving
    path (streaming/pagerank_index.py): after a small edge delta the old
    rank vector is already inside the contraction's terminal region, so
    the fixpoint arrives in measurably fewer rounds than from uniform.
    QUANTIZATION CAVEAT (measured, documented): the integer fixpoint is
    unique only up to the floor-quantization cell — warm and cold starts
    can land on fixpoints differing by ~tens of units at scale 1e12
    (≈1e-11 of total mass on the events graph). Exact q74 parity
    therefore comes from the fixed-iteration `pagerank` over maintained
    graph state, while THIS path serves converged ranks with a bounded
    quantization envelope (tests/test_pagerank_index.py pins both).

    Nodes absent from r0 (delta-new vertices) start at the uniform
    floor(scale/n). Per round: contribution join/agg exactly as
    `pagerank`, plus one O(|nodes|) equality probe for the stop test;
    localCheckpoint per round truncates lineage (deep iteration counts).
    """
    src, dst = F.col(src_col), F.col(dst_col)
    e = edges.select(src.alias("src"), dst.alias("dst")).distinct().localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint()
    )
    n_row = F.broadcast(nodes.agg(F.count("*").alias("n")))
    outdeg = e.groupBy("src").agg(F.count("*").alias("od")).localCheckpoint()
    d_num, d_den = damping_pct, 100
    base = F.expr(f"({(d_den - d_num)} * {scale}) div ({d_den} * n)")
    uniform = F.expr(f"{scale} div n")
    if r0 is None:
        ranks = nodes.crossJoin(n_row).select("node", uniform.alias("r"))
    else:
        ranks = (
            nodes.join(r0.select("node", F.col("r").alias("r0")), "node", "left")
            .crossJoin(n_row)
            .select("node", F.coalesce("r0", uniform).alias("r"))
        )
    ranks = ranks.localCheckpoint()

    def _out(fr: DataFrame) -> DataFrame:
        return fr.select(
            "node",
            F.col("r").alias("rank_scaled"),
            (F.col("r").cast("double") / F.lit(float(scale))).alias("rank"),
        )

    for i in range(1, max_iter + 1):
        contribs = (
            ranks.join(e, ranks["node"] == e["src"])
            .join(outdeg, "src")
            .select("dst", F.expr(f"({d_num} * r) div ({d_den} * od)").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        new_ranks = (
            nodes.crossJoin(n_row)
            .join(contribs, nodes["node"] == contribs["dst"], "left")
            .select("node", (base + F.coalesce("s", F.lit(0))).alias("r"))
            .localCheckpoint()
        )
        moved = (
            new_ranks.withColumnRenamed("r", "nr")
            .join(ranks, "node")
            .where(F.col("nr") != F.col("r"))
        )
        ranks = new_ranks
        if moved.isEmpty():
            return _out(ranks), i
    return _out(ranks), None
