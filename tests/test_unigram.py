"""Unigram-LM tokenizer (operators/unigram.py): Viterbi DP against
hand-computed segmentations, encodability/roundtrip invariants,
hard-EM monotonicity, pruning contract, and distributed == pure-Python
equality on the corpus."""

from __future__ import annotations

import math

import pytest

from etfconstituentextractor_spark.operators.unigram import (
    _viterbi,
    em_round,
    prune,
    seed_vocab,
    train_unigram,
    viterbi_encode,
    word_counts,
)


def test_viterbi_hand_cases():
    logp = {"a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.4), "abc": math.log(0.05), "c": math.log(0.05)}
    # 'ab' as one piece (0.4) beats 'a'+'b' (0.06)
    assert _viterbi("ab", logp, 6) == ["ab"]
    # 'abc': 'ab'+'c' (0.02) beats 'abc' (0.05)? no: single piece 0.05
    # > 0.4*0.05=0.02 -> ['abc']
    assert _viterbi("abc", logp, 6) == ["abc"]
    # tie-break: equal probability -> fewer pieces wins
    logp2 = {"x": math.log(0.5), "xx": math.log(0.25)}
    assert _viterbi("xx", logp2, 6) == ["xx"]
    # lexicographic tie-break at equal (prob, count): y*zz = yz*z =
    # 0.125, both 2 pieces -> the lexico-smallest sequence wins
    logp3 = {"y": math.log(0.5), "yz": math.log(0.25), "z": math.log(0.5), "zz": math.log(0.25)}
    got = _viterbi("yzz", logp3, 6)
    assert got == ["y", "zz"]
    # missing char -> None
    assert _viterbi("aq", logp, 6) is None
    # max_len window respected
    assert _viterbi("abc", {"abc": 0.0, "a": -1.0, "b": -1.0, "c": -1.0}, 2) == ["a", "b", "c"]


def test_seed_and_train_invariants(spark):
    docs = spark.createDataFrame(
        [(i, "spark spark sparkly park " + ("tokenize " * (i % 3))) for i in range(30)],
        "doc_id bigint, text string",
    )
    vocab = train_unigram(docs, vocab_size=40, rounds=2, max_piece_len=5, seed_size=200)
    # every single character of the corpus is in the vocab
    chars = {c for c in "sparklytokenize"}
    assert chars <= {p for p in vocab if len(p) == 1}
    assert len([p for p in vocab if len(p) > 1]) <= 40
    # frequent substrings survive training
    assert any(p in vocab for p in ("spark", "park", "ark", "spar"))
    # probs normalize-ish (log-space, after flooring they needn't sum
    # to exactly 1 — but must be finite and negative)
    assert all(v < 0 and math.isfinite(v) for v in vocab.values())

    enc = viterbi_encode(docs, vocab, max_piece_len=5)
    rows = enc.collect()
    texts = {r.doc_id: r for r in rows}
    for did, text in [(r.doc_id, r.text) for r in docs.collect()]:
        joined = "".join(texts[did].pieces)
        assert joined == text.replace(" ", "")  # roundtrip, sans spaces
        assert texts[did].n_pieces == len(texts[did].pieces)


def test_hard_em_is_monotone(spark):
    docs = spark.createDataFrame(
        [(1, "aa ab aa ab abab baba abba"), (2, "ab ab aa bb abab")],
        "doc_id bigint, text string",
    )
    words = word_counts(docs)
    logp = seed_vocab(words, max_piece_len=4, seed_size=50)
    lp1, ll1 = em_round(words, logp, max_piece_len=4)
    lp2, ll2 = em_round(words, lp1, max_piece_len=4)
    _, ll3 = em_round(words, lp2, max_piece_len=4)
    assert ll2 >= ll1 - 1e-9
    assert ll3 >= ll2 - 1e-9


def test_prune_keeps_chars(spark):
    logp = {"a": -1.0, "b": -9.0, "ab": -0.5, "ba": -8.0, "aba": -7.0}
    kept = prune(logp, vocab_size=3)
    assert {"a", "b"} <= set(kept)          # chars exempt
    assert "ab" in kept and "ba" not in kept  # only the best multi fits


def test_distributed_matches_pure_python(spark, sf_dir):
    """The corpus EM round must equal a pure-Python walk over the same
    word counts (the kmeans-style exact-replay pin)."""
    from collections import Counter

    from etfconstituentextractor_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").limit(80)
    words = word_counts(docs)
    wc = {r.word: r.n for r in words.collect()}
    logp = seed_vocab(words, max_piece_len=4, seed_size=150)

    got_lp, got_ll = em_round(words, logp, max_piece_len=4)

    cnt: Counter = Counter()
    ll = 0.0
    for w, n in wc.items():
        seg = _viterbi(w, logp, 4)
        for p in seg:
            cnt[p] += n
            ll += logp[p] * n
    total = sum(cnt.values())
    want_lp = {
        p: math.log(max(cnt.get(p, 0), 1) / total)
        for p in logp
        if cnt.get(p, 0) > 0 or len(p) == 1
    }
    assert got_ll == pytest.approx(ll, rel=1e-12)
    assert set(got_lp) == set(want_lp)
    for p in want_lp:
        assert got_lp[p] == pytest.approx(want_lp[p], rel=1e-12), p


def test_viterbi_encode_string_ids(spark):
    """id_col type is derived from the input schema — string ids (the
    WARC/crawl pipeline's URLs) must work (review r7)."""
    from etfconstituentextractor_spark.operators.unigram import viterbi_encode

    df = spark.createDataFrame(
        [("http://a/x", "ab ab"), ("http://a/y", "ba")], "url string, text string"
    )
    logp = {"a": -1.0, "b": -1.0, "ab": -0.5}
    got = {r.url: r.pieces for r in viterbi_encode(df, logp, id_col="url", text_col="text").collect()}
    assert got == {"http://a/x": ["ab", "ab"], "http://a/y": ["b", "a"]}


def test_soft_em_monotone_and_matches_python(spark):
    """Soft EM: the MARGINAL log-likelihood must be non-decreasing
    across rounds (the classic EM guarantee, which hard EM only has
    for the Viterbi objective), and the distributed expected counts
    must equal a pure-Python forward-backward walk."""
    import math as _math

    from etfconstituentextractor_spark.operators.unigram import (
        _forward_backward,
        soft_em_round,
    )

    docs = spark.createDataFrame(
        [(1, "abab abba aabb ab ab ba"), (2, "ab ba abab bb aa")],
        "doc_id bigint, text string",
    )
    words = word_counts(docs)
    logp = seed_vocab(words, max_piece_len=3, seed_size=60)
    lp1, ll1 = soft_em_round(words, logp, max_piece_len=3)
    lp2, ll2 = soft_em_round(words, lp1, max_piece_len=3)
    _, ll3 = soft_em_round(words, lp2, max_piece_len=3)
    assert ll2 >= ll1 - 1e-9
    assert ll3 >= ll2 - 1e-9

    # distributed == pure python at tight tolerance
    wc = {r.word: r.n for r in words.collect()}
    got_lp, got_ll = soft_em_round(words, logp, max_piece_len=3)
    counts: dict = {}
    ll = 0.0
    for w, n in wc.items():
        exp_counts, word_ll = _forward_backward(w, logp, 3)
        for p, e in exp_counts.items():
            counts[p] = counts.get(p, 0.0) + e * n
        ll += word_ll * n
    total = sum(counts.values())
    assert got_ll == pytest.approx(ll, rel=1e-9)
    for p, c in counts.items():
        if c > 1e-12:
            assert got_lp[p] == pytest.approx(_math.log(c / total), rel=1e-9), p

    # per-word sanity: expected counts sum to the expected number of
    # pieces, which lies between n_chars/max_len and n_chars
    for w in wc:
        exp_counts, _ = _forward_backward(w, logp, 3)
        s = sum(exp_counts.values())
        assert len(w) / 3 - 1e-9 <= s <= len(w) + 1e-9, (w, s)
