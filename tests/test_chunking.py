"""Token-window chunking (operators/chunking.py) vs a python reference;
coverage/overlap invariants and the zero-shuffle plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.chunking import chunk_documents


def py_chunks(text: str, chunk: int, stride: int, min_tail: int = 1):
    toks = text.split(" ")
    out = []
    i = 0
    while i * stride < len(toks):
        c = toks[i * stride : i * stride + chunk]
        if len(c) >= min_tail:
            out.append((i, " ".join(c), len(c)))
        i += 1
    return out


@pytest.fixture(scope="module")
def docs(spark):
    texts = [
        "t0",  # single token
        " ".join(f"w{i}" for i in range(7)),  # shorter than one chunk? depends
        " ".join(f"x{i}" for i in range(16)),  # exact multiple
        " ".join(f"y{i}" for i in range(21)),  # ragged tail
    ]
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


@pytest.mark.parametrize("chunk,stride", [(8, 8), (8, 4), (8, 1), (5, 5), (16, 8)])
def test_matches_python_reference(spark, docs, chunk, stride):
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(docs, chunk_tokens=chunk, stride=stride).collect()
    }
    want = {}
    for row in docs.collect():
        for i, text, n in py_chunks(row.text, chunk, stride):
            want[(row.doc_id, i)] = (text, n)
    assert got == want


def test_disjoint_chunks_reassemble_exactly(spark, docs):
    out = chunk_documents(docs, chunk_tokens=8).orderBy("doc_id", "chunk_idx")
    joined = (
        out.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("re")
        )
        .collect()
    )
    orig = {r.doc_id: r.text for r in docs.collect()}
    assert all(r.re == orig[r.doc_id] for r in joined)


def test_every_token_covered_with_overlap(spark, docs):
    out = chunk_documents(docs, chunk_tokens=8, stride=3).collect()
    per_doc: dict[int, set[str]] = {}
    for r in out:
        per_doc.setdefault(r.doc_id, set()).update(r.chunk_text.split(" "))
    for row in docs.collect():
        assert set(row.text.split(" ")) <= per_doc[row.doc_id]


def test_min_tail_drops_only_contained_windows(spark, docs):
    full = chunk_documents(docs, chunk_tokens=8, stride=4)
    floored = chunk_documents(docs, chunk_tokens=8, stride=4, min_tail_tokens=5)
    dropped = full.join(floored, ["doc_id", "chunk_idx"], "left_anti").collect()
    assert all(r.n_chunk_tokens < 5 for r in dropped)
    # overlapping regime: dropped tails are suffixes of the previous window
    full_rows = {(r.doc_id, r.chunk_idx): r.chunk_text for r in full.collect()}
    for r in dropped:
        prev = full_rows[(r.doc_id, r.chunk_idx - 1)]
        assert prev.endswith(r.chunk_text)


def test_argument_guards(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, stride=5)


def test_zero_shuffle_plan(spark, docs):
    plan = (
        chunk_documents(docs, chunk_tokens=8, stride=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
