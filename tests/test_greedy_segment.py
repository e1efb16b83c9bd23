"""Greedy longest-match segmentation (operators/tokenizer.py:greedy_segment,
the q122 apply operator) vs a pure-Python replay — both the property gate
over hypothesis-generated vocabularies/words and the train->apply
differential under a q121 EM-TRAINED piece table (the surface the DuckDB
oracle cannot reach, since the trained table itself is Viterbi-derived)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _py_greedy(w: str, vocab: set[str], max_len: int) -> list[str]:
    """Reference replay: longest vocabulary piece prefixing the remainder,
    advance, repeat (Wu et al. 2016 §4.1). Single chars always present."""
    out, p = [], 0
    while p < len(w):
        for l in range(min(max_len, len(w) - p), 0, -1):
            if w[p : p + l] in vocab:
                out.append(w[p : p + l])
                p += l
                break
        else:  # pragma: no cover - unreachable when chars are in vocab
            raise AssertionError(f"no piece at {w!r}:{p}")
    return out


WORDS = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=12), min_size=1, max_size=8
)
PIECES = st.lists(
    st.text(alphabet="abc", min_size=2, max_size=4), min_size=0, max_size=10
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(words=WORDS, pieces=PIECES)
def test_greedy_segment_matches_python(spark, words, pieces):
    from mapreduce_paper_implementation_spark.operators.tokenizer import (
        greedy_segment,
    )

    words = sorted(set(words))
    vocab = set(pieces) | {ch for w in words for ch in w}
    wdf = spark.createDataFrame([(w,) for w in words], "w string")
    vdf = spark.createDataFrame([(p,) for p in sorted(vocab)], "piece string")
    got = {
        r["w"]: list(r["subwords"])
        for r in greedy_segment(wdf, vdf, max_len=4).collect()
    }
    assert set(got) == set(words)
    for w in words:
        exp = _py_greedy(w, vocab, 4)
        assert got[w] == exp, (w, got[w], exp)
        assert "".join(got[w]) == w  # concatenation invariant


def test_greedy_segment_under_trained_unigram_table(spark, sf_dir):
    """Train->apply link: segment the corpus word types under the q121
    EM-trained piece table with the SAME operator q122 uses, and replay in
    Python — the trained vocabulary keeps every single character, so the
    greedy walk is total under it too."""
    from mapreduce_paper_implementation_spark.operators.tokenizer import (
        greedy_segment,
        unigram_train,
        word_freq,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    wc = word_freq(docs).localCheckpoint()
    trained = unigram_train(wc, vocab_size=80, max_len=4, em_rounds=1)
    vocab = {r["piece"] for r in trained.collect()}
    got = {
        r["w"]: list(r["subwords"])
        for r in greedy_segment(
            wc.select("w"), trained.select("piece"), max_len=4
        ).collect()
    }
    words = [r["w"] for r in wc.select("w").collect()]
    assert set(got) == set(words)
    for w in words:
        assert got[w] == _py_greedy(w, vocab, 4), w


def test_q122_plan_broadcasts_vocab_no_python(spark, sf_dir):
    """The q122 apply path keeps the piece table broadcast and the whole
    pipeline JVM-side: no BatchEvalPython/ArrowEval anywhere, at least one
    broadcast exchange (the vocab join), and no cartesian fallback."""
    from mapreduce_paper_implementation_spark.plans.queries import QUERIES

    df = QUERIES["q122_greedy_segment"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_greedy_segment_raises_on_incomplete_vocab(spark):
    """The UNIFORM corruption guard (ADVICE r11): a vocabulary that cannot
    cover a word raises — whether it misses SOME characters (holes in the
    step array misalign the fold) or ALL of them (the left join keeps the
    word with NULL steps, which poison the fold) — never a silent drop or
    a segmentation that doesn't concatenate back to the word. Empty-string
    words are filtered."""
    import pytest

    from mapreduce_paper_implementation_spark.operators.tokenizer import (
        greedy_segment,
    )

    words = spark.createDataFrame([("abc",), ("",)], "w string")
    # vocab covers 'a','c' but not 'b': position 1 has no step -> guard
    vocab = spark.createDataFrame([("a",), ("c",)], "piece string")
    with pytest.raises(Exception, match="vocabulary misses characters"):
        greedy_segment(words, vocab, max_len=4).collect()
    # a word matching NOTHING raises too (uniform contract, not a drop)
    none_vocab = spark.createDataFrame([("z",)], "piece string")
    with pytest.raises(Exception, match="vocabulary misses characters"):
        greedy_segment(words, none_vocab, max_len=4).collect()
    # empty-string input rows are filtered, never raised on
    empties = spark.createDataFrame([("",)], "w string")
    assert greedy_segment(empties, vocab, max_len=4).count() == 0


def test_greedy_segment_preserves_duplicate_input_rows(spark):
    """Row contract (ADVICE r11): one output row per non-empty input row —
    duplicate words are NOT deduplicated away (the jump table is computed
    per word type, then joined back to the input frame)."""
    from mapreduce_paper_implementation_spark.operators.tokenizer import (
        greedy_segment,
    )

    words = spark.createDataFrame([("ab",), ("ab",), ("b",)], "w string")
    vocab = spark.createDataFrame([("a",), ("b",), ("ab",)], "piece string")
    rows = sorted(
        (r["w"], tuple(r["subwords"]))
        for r in greedy_segment(words, vocab, max_len=2).collect()
    )
    assert rows == [("ab", ("ab",)), ("ab", ("ab",)), ("b", ("b",))]
