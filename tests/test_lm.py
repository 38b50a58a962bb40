"""Bigram-LM training + perplexity (operators/lm.py) vs a from-scratch
Python oracle, incl. disjoint-corpus scoring (unseen words) and the
zero-Python / broadcast-model plan contract."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.lm import perplexity, train_bigram_lm

TRAIN = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown cat sleeps",
    "a lazy dog sleeps all day",
    "the dog jumps and the fox sleeps",
]
SCORE = [
    "the quick brown fox sleeps",  # fluent under the model
    "zebra quark flux the unseen",  # mostly unseen mass
    "single",  # one token: no pairs -> no row
    "",  # wordless -> no row
]
K = 0.5


def py_model(train):
    big: Counter = Counter()
    words = set()
    for t in train:
        toks = [w for w in t.split(" ") if w]
        words.update(toks)
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] += 1
    ctx: Counter = Counter()
    for (a, _), n in big.items():
        ctx[a] += n
    return big, ctx, len(words)


def py_ppl(text, big, ctx, v, k=K):
    toks = [w for w in text.split(" ") if w]
    pairs = list(zip(toks, toks[1:]))
    if not pairs:
        return None
    lps = [
        math.log((big.get(p, 0) + k) / (ctx.get(p[0], 0) + k * v)) for p in pairs
    ]
    h = -sum(lps) / len(lps)
    return len(pairs), round(h, 6), round(math.exp(h), 4)


@pytest.fixture(scope="module")
def model(spark):
    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    return train_bigram_lm(train)


def test_counts_match_python(spark, model):
    bigrams, contexts, vocab = model
    big, ctx, v = py_model(TRAIN)
    assert {(r.w1, r.w2): r.n for r in bigrams.collect()} == dict(big)
    assert {r.w1: r.n_ctx for r in contexts.collect()} == dict(ctx)
    assert vocab.collect()[0].v == v


@pytest.mark.parametrize("corpus", [TRAIN, SCORE], ids=["self", "disjoint"])
def test_perplexity_matches_python(spark, model, corpus):
    docs = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_pairs, r.cross_entropy, r.ppl)
        for r in perplexity(docs, *model).collect()
    }
    big, ctx, v = py_model(TRAIN)
    want = {
        i: py_ppl(t, big, ctx, v) for i, t in enumerate(corpus) if py_ppl(t, big, ctx, v)
    }
    assert got == want


def test_fluent_beats_unseen(spark, model):
    docs = spark.createDataFrame(list(enumerate(SCORE)), "doc_id long, text string")
    ppl = {r.doc_id: r.ppl for r in perplexity(docs, *model).collect()}
    assert ppl[0] < ppl[1]  # in-domain text scores lower perplexity
    assert 2 not in ppl and 3 not in ppl  # <2 tokens: unscoreable


def test_k_guard(spark, model):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        perplexity(docs, *model, k=0)


def test_real_corpus_self_scoring(spark, sf_dir):
    from etfconstituentextractor_spark.sources.tables import load

    d = load(spark, str(sf_dir), "documents")
    model = train_bigram_lm(d)
    out = perplexity(d.limit(50), *model).collect()
    assert len(out) == 50
    assert all(r.ppl > 1.0 and r.n_pairs >= 1 for r in out)


def test_plan_zero_python_broadcast_model(spark, model):
    docs = spark.createDataFrame(list(enumerate(TRAIN)), "doc_id long, text string")
    plan = (
        perplexity(docs, *model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    # contexts + vocab ride broadcasts; the pair-key join may shuffle
    assert plan.count("BroadcastExchange") >= 2, plan[:1500]
