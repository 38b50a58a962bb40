"""operators/lm.py Kneser-Ney half — distributed == pure-Python
replay, the San-Francisco continuation property, and the
unknown-mass floor (pytest tier by the iterative/LM-training
precedent; the add-k legs carry q80's SQL oracle)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from etfconstituentextractor_spark.operators.lm import (
    kn_perplexity,
    train_kn_bigram_lm,
)

CORPUS = [
    (1, "we eat fish in san francisco"),
    (2, "we eat bread in the city"),
    (3, "they eat fish and bread"),
    (4, "san francisco is the city we love"),
    (5, "san francisco fish is good"),
    (6, "the city we love is good"),
]


def _py_kn(train_texts):
    big = Counter()
    for t in train_texts:
        w = [x for x in t.split(" ") if x]
        for a, b in zip(w, w[1:]):
            big[(a, b)] += 1
    n_ctx = Counter()
    n_types = Counter()
    cont = Counter()
    for (a, b), n in big.items():
        n_ctx[a] += n
        n_types[a] += 1
        cont[b] += 1
    t = len(big)
    vocab = {x for txt in train_texts for x in txt.split(" ") if x}
    v = len(vocab)
    n1 = sum(1 for n in big.values() if n == 1)
    n2 = sum(1 for n in big.values() if n == 2)
    d = n1 / (n1 + 2 * n2) if n1 > 0 else 0.75

    def pc(w2):
        return (cont.get(w2, 0) + 1) / (t + v)

    def p(w1, w2):
        c = n_ctx.get(w1, 0)
        if c == 0:
            return pc(w2)
        return (max(big.get((w1, w2), 0) - d, 0) + d * n_types[w1] * pc(w2)) / c

    return p


def test_kn_matches_python_replay(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    model = train_kn_bigram_lm(docs)
    got = {
        r["doc_id"]: (r["n_pairs"], r["cross_entropy"])
        for r in kn_perplexity(docs, model).collect()
    }
    p = _py_kn([t for _, t in CORPUS])
    for doc_id, text in CORPUS:
        w = [x for x in text.split(" ") if x]
        lps = [math.log(p(a, b)) for a, b in zip(w, w[1:])]
        ce = -sum(lps) / len(lps)
        assert got[doc_id][0] == len(lps)
        assert abs(got[doc_id][1] - ce) < 1e-6, doc_id


def test_kn_continuation_beats_frequency(spark):
    """The KN property itself: 'francisco' is FREQUENT but continues
    only 'san'; 'good' is rarer but follows many contexts. After an
    unseen context ('bread'), KN must prefer the many-context word —
    add-k, backing off to frequency, cannot make this distinction."""
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    model = train_kn_bigram_lm(docs)
    probe = spark.createDataFrame(
        [(100, "bread francisco"), (101, "bread the")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["ppl"] for r in kn_perplexity(probe, model).collect()}
    # lower perplexity == higher probability: 'the' continues two
    # distinct contexts (in-the, is-the) while 'francisco', for all
    # its frequency, continues only 'san' — KN must prefer 'the'
    assert got[101] < got[100]


def test_kn_oov_tokens_stay_finite(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    model = train_kn_bigram_lm(docs)
    probe = spark.createDataFrame(
        [(200, "zzz qqq www")], "doc_id bigint, text string"
    )
    row = kn_perplexity(probe, model).collect()[0]
    assert math.isfinite(row["ppl"]) and row["ppl"] > 0


def test_kn_fluent_beats_shuffled(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    model = train_kn_bigram_lm(docs)
    probe = spark.createDataFrame(
        [(300, "we eat fish in the city"), (301, "city fish the we in eat")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["ppl"] for r in kn_perplexity(probe, model).collect()}
    assert got[300] < got[301]
