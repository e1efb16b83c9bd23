#!/usr/bin/env python
"""Deterministic scale-corpus generator for the dedup/ANN stress bench.

Derives an N-times-sf0.1-sized `documents` + `embeddings` table pair with
KNOWN ground truth, so the 100 TB design claims (bucketed dedup, blocked
GEMM, IVF probing) can be load-verified instead of only plan-verified:

- documents: synthetic Zipf-token docs over a 4,000-word letters-only vocab
  (the engine tokenizer splits on ``[^A-Za-z]+`` — functions/text.py — so
  every vocab word must be pure ASCII letters). Near-dup clusters are
  PLANTED: consecutive-id groups of 2–5 docs where each variant is the seed
  doc with a few seeded token substitutions. True 3-gram-shingle Jaccard for
  every within-cluster pair is computed here with the same tokenizer/shingle
  definition, giving an exact expected-output set for any threshold. Docs
  outside a cluster are independent Zipf draws: the chance of two
  independent docs sharing enough trigrams for J >= 0.1 is ~0 (validated by
  a sampled cross-pair check at generation time), so the planted pairs ARE
  the ground truth. Sources are Zipf-skewed (src0 ~30% of the corpus) per
  the production shape.

- embeddings: unit vectors in R^64. Planted clusters: variant =
  normalize(seed + sigma*noise) with sigma in [0.03, 0.08] -> cosine in
  ~[0.85, 0.98]; exact planted cosines recorded. Two independent 64-d unit
  vectors have cos ~ N(0, 1/8), so P(cos >= 0.85) ~ 5e-12 — no unplanned
  positives at any factor tested here.

Pairs whose true score lies within EPS of a bench threshold are recorded so
the bench can treat them as don't-care (Spark rounds HALF_UP at 6 decimals
before comparing; Python rounds half-even — a pair exactly on the boundary
is not a correctness signal either way).

Everything is keyed on one seed; same (factor, seed) -> byte-identical
parquet. No RNG at query time anywhere.

Usage:
    python scripts/gen_scale.py --factor 10 --out-dir scale_data
writes scale_data/x10/{documents.parquet,embeddings.parquet,truth.json}.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# sf0.1 fixture sizes (TESTDATA.md): documents=5000, embeddings=2000.
BASE_DOCS = 5000
BASE_VECS = 2000
VOCAB_SIZE = 4000
ZIPF_ALPHA = 0.8  # token draw skew; top-word p ~ 3.8% -> hot-but-cappable trigrams
SOURCE_ALPHA = 1.2  # source skew: src0 gets ~30% of docs
N_SOURCES = 20
LANGS = ("en", "de", "fr", "zh", "es")
DIM = 64
DOC_CLUSTER_FRAC = 0.06  # ~6% of docs live in a planted near-dup cluster
VEC_CLUSTER_FRAC = 0.05
EPS = 1e-4  # don't-care band half-width around any bench threshold


def _base26(i: int) -> str:
    """Letters-only id encoding (the tokenizer would split digits away)."""
    s = ""
    i += 1
    while i > 0:
        i, r = divmod(i - 1, 26)
        s = chr(ord("a") + r) + s
    return s


def _zipf_probs(n: int, alpha: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** alpha
    return w / w.sum()


def _shingles(toks: list[str], n: int = 3) -> frozenset:
    """Mirror functions/text.py:word_shingles — distinct space-joined
    trigrams, empty when fewer than n tokens."""
    if len(toks) < n:
        return frozenset()
    return frozenset(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))


def _jaccard(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _containment(a: frozenset, b: frozenset) -> float:
    """Overlap coefficient inter/min(|A|,|B|) — mirrors
    operators/dedup.py:ngram_containment_pairs (q105)."""
    if not a or not b:
        return 0.0
    return len(a & b) / min(len(a), len(b))


def _plan_clusters(
    rng: np.random.Generator, n_items: int, frac: float, min_sz: int, max_sz: int
) -> list[list[int]]:
    """Consecutive-id planted clusters covering ~frac of all items.

    Consecutive ids matter: the incremental-dedup bench splits the corpus by
    id parity, so every cluster of size >= 2 contributes cross-parity pairs."""
    clusters: list[list[int]] = []
    budget = int(n_items * frac)
    nxt = 0
    while budget >= min_sz and nxt + max_sz <= n_items:
        size = int(rng.integers(min_sz, max_sz + 1))
        # spread clusters through the id space: jump ahead a seeded gap
        gap = int(rng.integers(5, max(6, int(n_items * (1 - frac) / max(1, budget)))))
        start = nxt + gap
        if start + size > n_items:
            break
        clusters.append(list(range(start, start + size)))
        nxt = start + size
        budget -= size
    return clusters


def gen_documents(n_docs: int, seed: int):
    rng = np.random.default_rng(seed)
    vocab = np.array(["v" + _base26(i) for i in range(VOCAB_SIZE)])
    word_p = _zipf_probs(VOCAB_SIZE, ZIPF_ALPHA)
    source_p = _zipf_probs(N_SOURCES, SOURCE_ALPHA)

    clusters = _plan_clusters(rng, n_docs, DOC_CLUSTER_FRAC, 2, 5)
    variant_of: dict[int, int] = {}
    for c in clusters:
        for m in c[1:]:
            variant_of[m] = c[0]

    lengths = rng.integers(40, 201, size=n_docs)
    sources = rng.choice(N_SOURCES, size=n_docs, p=source_p)
    texts: list[str] = [""] * n_docs
    toks_cache: dict[int, list[str]] = {}

    for i in range(n_docs):
        if i in variant_of:
            seed_toks = list(toks_cache[variant_of[i]])
            # m substitutions, each killing <=3 trigrams of ~L-2: sized so
            # most variants land at J >= 0.8, some deliberately borderline.
            m = int(rng.integers(1, max(2, len(seed_toks) // 30)))
            pos = rng.choice(len(seed_toks), size=min(m, len(seed_toks)), replace=False)
            repl = rng.choice(VOCAB_SIZE, size=len(pos), p=word_p)
            for p_, r_ in zip(pos, repl):
                seed_toks[p_] = vocab[r_]
            toks = seed_toks
        else:
            toks = list(vocab[rng.choice(VOCAB_SIZE, size=int(lengths[i]), p=word_p)])
        toks_cache[i] = toks
        texts[i] = " ".join(toks)

    # exact ground truth for every within-cluster pair (jaccard for
    # q18/q20/q41/q70, containment for q105 — same pair set, two scores)
    doc_pairs = []
    doc_pairs_cont = []
    sh_cache = {i: _shingles(toks_cache[i]) for c in clusters for i in c}
    for c in clusters:
        for x in range(len(c)):
            for y in range(x + 1, len(c)):
                a, b = c[x], c[y]
                doc_pairs.append((a, b, _jaccard(sh_cache[a], sh_cache[b])))
                doc_pairs_cont.append(
                    (a, b, _containment(sh_cache[a], sh_cache[b]))
                )

    # sampled independence check: no unplanned near-dups lurking.
    # Skip only same-cluster pairs (those are the planted positives).
    cluster_id = {m: ci for ci, c in enumerate(clusters) for m in c}
    n_chk = min(4000, n_docs * 2)
    ia = rng.integers(0, n_docs, size=n_chk)
    ib = rng.integers(0, n_docs, size=n_chk)
    worst = 0.0
    worst_cont = 0.0
    for a, b in zip(ia, ib):
        a, b = int(a), int(b)
        if a == b or cluster_id.get(a, -1) == cluster_id.get(b, -2):
            continue
        sa, sb = _shingles(toks_cache[a]), _shingles(toks_cache[b])
        worst = max(worst, _jaccard(sa, sb))
        worst_cont = max(worst_cont, _containment(sa, sb))
    if worst >= 0.1:
        raise AssertionError(
            f"cross-pair Jaccard sample hit {worst:.3f} — construction no longer "
            "guarantees planted pairs are the only positives"
        )
    if worst_cont >= 0.4:
        raise AssertionError(
            f"cross-pair containment sample hit {worst_cont:.3f} — the q105 "
            "bench threshold (0.5) would no longer separate planted pairs"
        )

    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[i % len(LANGS)] for i in range(n_docs)], pa.string()),
            "source": pa.array([f"src{int(s)}" for s in sources], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    return table, clusters, doc_pairs, doc_pairs_cont, worst, worst_cont


def gen_embeddings(n_vecs: int, seed: int):
    rng = np.random.default_rng(seed + 1)
    clusters = _plan_clusters(rng, n_vecs, VEC_CLUSTER_FRAC, 2, 3)
    variant_of: dict[int, int] = {}
    for c in clusters:
        for m in c[1:]:
            variant_of[m] = c[0]

    vecs = rng.standard_normal((n_vecs, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    for i in range(n_vecs):
        if i in variant_of:
            sigma = float(rng.uniform(0.03, 0.08))
            v = vecs[variant_of[i]] + sigma * rng.standard_normal(DIM)
            vecs[i] = v / np.linalg.norm(v)

    vec_pairs = []
    for c in clusters:
        for x in range(len(c)):
            for y in range(x + 1, len(c)):
                a, b = c[x], c[y]
                vec_pairs.append((a, b, float(vecs[a] @ vecs[b])))

    f32 = vecs.astype(np.float32)
    table = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(list(f32), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n_vecs), pa.int32()),
        }
    )
    return table, clusters, vec_pairs, f32


def generate(factor: float, out_dir: str, seed: int = 2026) -> str:
    """Write documents/embeddings parquet + truth.json for one factor.
    Returns the dataset directory. Idempotent: same inputs, same bytes."""
    n_docs = int(BASE_DOCS * factor)
    n_vecs = int(BASE_VECS * factor)
    tag = f"x{factor:g}"
    ds_dir = os.path.join(out_dir, tag)
    os.makedirs(ds_dir, exist_ok=True)

    docs_tbl, doc_clusters, doc_pairs, doc_pairs_cont, worst_cross, worst_cont = (
        gen_documents(n_docs, seed)
    )
    emb_tbl, vec_clusters, vec_pairs, _ = gen_embeddings(n_vecs, seed)
    pq.write_table(docs_tbl, os.path.join(ds_dir, "documents.parquet"))
    pq.write_table(emb_tbl, os.path.join(ds_dir, "embeddings.parquet"))

    truth = {
        "factor": factor,
        "seed": seed,
        "n_docs": n_docs,
        "n_vecs": n_vecs,
        "eps": EPS,
        "worst_sampled_cross_jaccard": worst_cross,
        "worst_sampled_cross_containment": worst_cont,
        "doc_clusters": doc_clusters,
        "doc_pairs": [[a, b, round(j, 8)] for a, b, j in doc_pairs],
        "doc_pairs_cont": [[a, b, round(c, 8)] for a, b, c in doc_pairs_cont],
        "vec_clusters": vec_clusters,
        "vec_pairs": [[a, b, round(c, 8)] for a, b, c in vec_pairs],
    }
    with open(os.path.join(ds_dir, "truth.json"), "w") as f:
        json.dump(truth, f)
    return ds_dir


# ---------------------------------------------------------------------------
# Relational-table scaling (VERDICT r05 ask #1): derive a FULL sf-style
# directory — all 10 catalog tables — at N times the sf0.1 fixture, so the
# entire query manifest (not just the dedup/ANN family) can replay at scale.
#
# Strategy: replicate-with-offset, not resynthesize. Each copy c of a fact
# table gets every surrogate key shifted by c*stride (stride = the base
# table's dense key count), so FK integrity is EXACT by construction — copy
# c's lineitem rows point at copy c's orders/part/supplier rows, which exist
# and are unique. Value distributions (prices, dates, statuses, the Zipf
# event skew over user_id) are preserved verbatim because every copy carries
# the original values.
#
# events is the one deliberate exception: user_id is NOT offset — each copy
# keeps the original user population, so the global per-user Zipf skew is
# preserved EXACTLY (hot users get factor-times hotter, matching how a real
# event stream scales over time), and ts is shifted per copy by the base
# window rounded up to whole days (copy c = days [c*W, (c+1)*W)) so copies
# read as successive time periods: daily-rollup group counts scale with the
# factor instead of every copy piling onto the same 30 days, and no
# (user_id, ts) collisions are introduced.
#
# region/nation are fixed-size dimensions at every TPC-H scale factor and
# are copied unchanged. documents/embeddings come from the synthetic
# planted-truth generators above (replicating fixture text verbatim would
# make every doc an exact k-way duplicate and turn the dedup queries into a
# degenerate workload).
#
# The output directory is named sf{0.1*factor:g} (e.g. factor 10 -> sf1) so
# every sf-dir-parsing path (credit_paths, bench.py's sf field) works
# unchanged.
# ---------------------------------------------------------------------------

BASE_SF_DIR = "/root/testdata/sf0.1"
BASE_SF = 0.1
_DAY_US = 86_400_000_000

# table -> {key column -> stride table}; stride = row count of that table's
# base fixture (keys are dense 0..N-1 — asserted at generation time).
_REL_OFFSETS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events"},
}


def _offset_col(tbl: "pa.Table", col: str, delta: int) -> "pa.Table":
    import pyarrow.compute as pc

    idx = tbl.schema.get_field_index(col)
    field = tbl.schema.field(col)
    arr = pc.add(tbl.column(col), pa.scalar(delta, field.type))
    return tbl.set_column(idx, field, arr)


def _shift_ts(tbl: "pa.Table", col: str, delta_us: int) -> "pa.Table":
    import pyarrow.compute as pc

    idx = tbl.schema.get_field_index(col)
    field = tbl.schema.field(col)
    arr = pc.add(tbl.column(col).cast(pa.int64()), delta_us).cast(field.type)
    return tbl.set_column(idx, field, arr)


def generate_relational(
    factor: int, out_dir: str, base_dir: str = BASE_SF_DIR, seed: int = 2026
) -> str:
    """Write a full sf{0.1*factor}-style directory under out_dir.

    Idempotent and deterministic: replication math has no RNG; the
    documents/embeddings tables are the seeded synthetic generators (same
    seed -> byte-identical to the scale_data/x{factor} stress corpora)."""
    k = int(factor)
    if k < 1:
        raise ValueError("relational scaling is whole-copy replication: factor >= 1")
    tag = f"sf{BASE_SF * k:g}"
    ds_dir = os.path.join(out_dir, tag)
    os.makedirs(ds_dir, exist_ok=True)

    base: dict[str, pa.Table] = {}
    strides: dict[str, int] = {}
    for name in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events"):
        base[name] = pq.read_table(os.path.join(base_dir, f"{name}.parquet"))
        strides[name] = base[name].num_rows

    # dense-key precondition for the stride math
    import pyarrow.compute as pc

    for name, keycol in (
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
    ):
        mx = pc.max(base[name].column(keycol)).as_py()
        if mx != strides[name] - 1:
            raise AssertionError(
                f"{name}.{keycol} max {mx} != rows-1 {strides[name] - 1}; "
                "fixture keys are no longer dense — stride replication unsafe"
            )

    ev_ts = base["events"].column("ts").cast(pa.int64())
    span_us = (
        (pc.max(ev_ts).as_py() - pc.min(ev_ts).as_py()) // _DAY_US + 1
    ) * _DAY_US

    for name in ("region", "nation"):
        pq.write_table(base[name], os.path.join(ds_dir, f"{name}.parquet"))

    for name, offsets in _REL_OFFSETS.items():
        copies = []
        for c in range(k):
            t = base[name]
            for col, stride_tbl in offsets.items():
                if c:
                    t = _offset_col(t, col, c * strides[stride_tbl])
            if name == "events" and c:
                t = _shift_ts(t, "ts", c * span_us)
            copies.append(t)
        pq.write_table(
            pa.concat_tables(copies), os.path.join(ds_dir, f"{name}.parquet")
        )

    # synthetic planted-truth corpora for the text/vector tables (reuse the
    # x{k} stress corpus when it's already on disk — same seed, same bytes)
    stress_dir = os.path.join(out_dir, f"x{k:g}")
    if not os.path.exists(os.path.join(stress_dir, "truth.json")):
        generate(float(k), out_dir, seed)
    import shutil

    for fname in ("documents.parquet", "embeddings.parquet", "truth.json"):
        shutil.copyfile(os.path.join(stress_dir, fname), os.path.join(ds_dir, fname))

    # q03 reads the credit fixture keyed off the sf-dir name; make sure the
    # matching scale exists.
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mapreduce_paper_implementation_spark.sources.credit_fixture import (
        generate as gen_credit,
    )

    gen_credit(BASE_SF * k)
    return ds_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=float, default=10.0)
    ap.add_argument("--out-dir", default="scale_data")
    ap.add_argument("--seed", type=int, default=2026)
    ap.add_argument(
        "--relational",
        action="store_true",
        help="also derive the full sf{0.1*factor} relational directory",
    )
    args = ap.parse_args()
    if args.relational:
        rd = generate_relational(int(args.factor), args.out_dir, seed=args.seed)
        print(json.dumps({"relational_dir": rd}))
    ds = generate(args.factor, args.out_dir, args.seed)
    with open(os.path.join(ds, "truth.json")) as f:
        t = json.load(f)
    print(
        json.dumps(
            {
                "dir": ds,
                "n_docs": t["n_docs"],
                "n_vecs": t["n_vecs"],
                "doc_clusters": len(t["doc_clusters"]),
                "doc_pairs": len(t["doc_pairs"]),
                "vec_pairs": len(t["vec_pairs"]),
                "worst_sampled_cross_jaccard": t["worst_sampled_cross_jaccard"],
            }
        )
    )


if __name__ == "__main__":
    main()
