"""CLI parity tests: the reference's three entry points
(mrsequential / mrcoordinator+mrworker, /root/reference/mr-main/) mapped to
`python -m mapreduce_paper_implementation_spark {sequential,run,query,list}`.
The session is injected so the suite shares one JVM."""

from __future__ import annotations

import os
from collections import Counter

from mapreduce_paper_implementation_spark.__main__ import main


def _write_corpus(tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("the quick brown fox the")
    (d / "b.txt").write_text("quick quick lazy dog")
    return str(d)


def test_cli_sequential_wc(spark, tmp_path):
    corpus = _write_corpus(tmp_path)
    out = str(tmp_path / "seq")
    assert main(["sequential", "wc", corpus, "-o", out], spark=spark) == 0
    lines = open(os.path.join(out, "mr-out-0")).read().splitlines()
    got = dict(line.split(" ", 1) for line in lines)
    assert got == {"brown": "1", "dog": "1", "fox": "1", "lazy": "1", "quick": "3", "the": "2"}
    assert lines == sorted(lines)  # mrsequential output is globally sorted


def test_cli_run_partitioned_wc(spark, tmp_path):
    corpus = _write_corpus(tmp_path)
    out = str(tmp_path / "dist")
    assert main(["run", "wc", corpus, "-o", out, "--n-reduce", "4"], spark=spark) == 0
    # correctness on the sorted union of all part files (test-mr.sh:58)
    union = []
    for f in sorted(os.listdir(out)):
        if f.startswith("part-"):
            union += open(os.path.join(out, f)).read().splitlines()
    counts = Counter(dict(line.split(" ", 1) for line in union))
    assert dict(counts) == {
        "brown": "1", "dog": "1", "fox": "1", "lazy": "1", "quick": "3", "the": "2"
    }


def test_cli_list_and_query(spark, sf_dir, capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "wc" in out and "q01_wordcount  [oracle]" in out

    assert main(["query", "q05_event_counts", "--sf-dir", sf_dir], spark=spark) == 0
    out = capsys.readouterr().out
    assert "event_type" in out

    assert main(["query", "nonexistent", "--sf-dir", sf_dir], spark=spark) == 2


def test_cli_explain(spark, sf_dir, capsys):
    assert main(["explain", "q06_filtered_agg", "--sf-dir", sf_dir], spark=spark) == 0
    out = capsys.readouterr().out
    assert "PushedFilters" in out  # formatted plan shows scan pushdown
    assert main(["explain", "nonexistent", "--sf-dir", sf_dir], spark=spark) == 2
