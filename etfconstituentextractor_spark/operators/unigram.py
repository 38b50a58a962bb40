"""Unigram-LM subword tokenizer — training + Viterbi encode
(SURVEY.md §2B "LLM-pipeline — tokenizer" family: the OTHER standard
subword scheme beside BPE (`operators/bpe.py`) — SentencePiece's
unigram model, Kudo 2018 — as the HARD-EM (Viterbi-count) variant:
deterministic, monotonic in the Viterbi objective, and the form whose
distributed restatement stays honest).

Training loop (iterative — pytest-only by the BPE/k-means/components
precedent; each round is control-plane over a vocab-sized table):

1. distinct words + counts — ONE shuffle of (word, count), reused
   every round (the corpus is never re-read);
2. seed vocab: all substrings up to ``max_piece_len`` of the distinct
   words scored by count·len, top ``seed_size``, plus every single
   character (so any word stays encodable, always);
3. E-step: per-word Viterbi segmentation under current piece
   log-probs (mapInPandas over the words frame — words are the
   embarrassingly parallel unit; the piece table broadcasts as a
   plain dict, it IS control-plane data), emitting piece counts
   weighted by word count;
4. M-step: renormalize counts into probs (groupBy piece + one
   vocab-sized collect — the only driver data, same shape as BPE's
   argmax row and kmeans' k×d matrix);
5. prune to ``vocab_size`` by probability, single characters exempt.

Viterbi determinism: maximize (sum of log-probs, then FEWER pieces,
then lexicographically smallest piece sequence) — total order, no
float ties left to chance beyond the log-prob sums themselves, which
are identical floats on every executor.

``viterbi_encode`` is the serving half: encode a corpus against a
COMMITTED piece table (the artifact a training run publishes), same
mapInPandas shape.

No reference counterpart; tests pin hand-computed micro-vocabs,
encodability/roundtrip invariants, Viterbi-objective monotonicity
across EM rounds, and distributed == pure-Python equality.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Mapping

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.text import nonempty_tokens


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over whitespace tokens — the one corpus shuffle every
    EM round reuses."""
    return (
        docs.select(F.explode(F.expr(nonempty_tokens(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def seed_vocab(
    words: DataFrame, *, max_piece_len: int = 6, seed_size: int = 1000
) -> dict[str, float]:
    """Initial piece log-probs: top substrings by count·len + all
    single chars; probabilities proportional to that score."""
    if max_piece_len < 1 or seed_size < 1:
        raise ValueError("max_piece_len and seed_size must be >= 1")
    subs = (
        words.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, char_length(word)), i -> "
                    f"transform(sequence(i, least(char_length(word), i + {max_piece_len} - 1)), "
                    "j -> substring(word, i, j - i + 1))))"
                )
            ).alias("piece"),
            "n",
        )
        .groupBy("piece")
        .agg(F.sum(F.col("n") * F.length("piece")).cast("bigint").alias("score"))
    )
    subs = subs.persist()  # two collects below — one aggregation job
    try:
        chars = {r.piece: r.score for r in subs.filter(F.length("piece") == 1).collect()}
        top = {
            r.piece: r.score
            for r in subs.filter(F.length("piece") > 1)
            .orderBy(F.col("score").desc(), "piece")
            .limit(seed_size)
            .collect()
        }
    finally:
        subs.unpersist()
    scores = {**chars, **top}
    total = sum(scores.values())
    return {p: math.log(s / total) for p, s in scores.items()}


def _viterbi(word: str, logp: Mapping[str, float], max_len: int) -> list[str] | None:
    """Best segmentation under (max log-prob, fewer pieces, lexico
    smallest sequence); None when some character is missing from the
    vocab (cannot happen for trainer-produced vocabs)."""
    n = len(word)
    # best[i] = (neg_logp, n_pieces, pieces_tuple) for word[:i]
    best: list[tuple[float, int, tuple[str, ...]] | None] = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            prev = best[j]
            c = (prev[0] - lp, prev[1] + 1, prev[2] + (piece,))
            if cand is None or (c[0], c[1], c[2]) < (cand[0], cand[1], cand[2]):
                cand = c
        best[i] = cand
    return list(best[n][2]) if best[n] is not None else None


def em_round(
    words: DataFrame, logp: Mapping[str, float], *, max_piece_len: int = 6
) -> tuple[dict[str, float], float]:
    """One hard-EM round: Viterbi counts (E) + renormalize (M).
    Returns (new log-probs, total Viterbi log-likelihood) — the
    objective the round must not decrease."""
    lp = dict(logp)
    ml = max_piece_len

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, int] = {}
            ll = 0.0
            for word, n in zip(pdf["word"], pdf["n"]):
                seg = _viterbi(word, lp, ml)
                if seg is None:  # unencodable: skip (never for our vocabs)
                    continue
                for piece in seg:
                    out[piece] = out.get(piece, 0) + int(n)
                    ll += lp[piece] * int(n)
            rows = [(p, c, 0.0) for p, c in out.items()]
            # the objective travels OUT-OF-BAND as a NULL piece — an
            # in-band sentinel string could collide with a real piece
            rows.append((None, 0, ll))
            yield pd.DataFrame(rows, columns=["piece", "c", "ll"])

    agg = (
        words.mapInPandas(gen, "piece string, c long, ll double")
        .groupBy("piece")
        .agg(F.sum("c").alias("c"), F.sum("ll").alias("ll"))
        .collect()
    )
    ll_total = sum(r.ll for r in agg if r.piece is None)
    counts = {r.piece: r.c for r in agg if r.piece is not None}
    total = sum(counts.values())
    if total == 0:
        raise ValueError("no piece was used — empty corpus or vocab")
    new = {}
    for p in lp:
        c = counts.get(p, 0)
        if c > 0 or len(p) == 1:  # chars survive with a floor
            new[p] = math.log(max(c, 1) / total)
    return new, ll_total


def prune(logp: Mapping[str, float], vocab_size: int) -> dict[str, float]:
    """Keep the ``vocab_size`` highest-probability pieces; single
    characters are exempt (encodability invariant)."""
    chars = {p: v for p, v in logp.items() if len(p) == 1}
    multi = sorted(
        ((p, v) for p, v in logp.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    keep = dict(multi[: max(0, vocab_size - len(chars))])
    return {**chars, **keep}


def train_unigram(
    docs: DataFrame,
    *,
    vocab_size: int = 200,
    rounds: int = 3,
    max_piece_len: int = 6,
    seed_size: int = 1000,
    text_col: str = "text",
) -> dict[str, float]:
    """Full loop: seed → (EM, prune) × rounds. Returns piece →
    log-prob, the committed artifact `viterbi_encode` serves."""
    words = word_counts(docs, text_col).persist()
    try:
        logp = seed_vocab(words, max_piece_len=max_piece_len, seed_size=seed_size)
        for _ in range(rounds):
            logp, _ = em_round(words, logp, max_piece_len=max_piece_len)
            logp = prune(logp, vocab_size)
    finally:
        words.unpersist()
    return logp


def viterbi_encode(
    docs: DataFrame,
    logp: Mapping[str, float],
    *,
    max_piece_len: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pieces array, n_pieces) per document under a committed
    piece table — the serving path (mapInPandas; pieces broadcast as
    a dict, documents the parallel unit)."""
    lp = dict(logp)
    ml = max_piece_len
    id_type = docs.schema[id_col].dataType.simpleString()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                pieces: list[str] = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    seg = _viterbi(w, lp, ml)
                    if seg is None:
                        seg = list(w)  # charset fallback for foreign chars
                    pieces.extend(seg)
                rows.append((did, pieces, len(pieces)))
            yield pd.DataFrame(rows, columns=[id_col, "pieces", "n_pieces"])

    return docs.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} {id_type}, pieces array<string>, n_pieces int"
    )


def _forward_backward(
    word: str, logp: Mapping[str, float], max_len: int
) -> tuple[dict[str, float], float] | None:
    """Expected piece counts (posterior over ALL segmentations) and
    the marginal log-likelihood of one word; None when unencodable."""
    n = len(word)
    NEG = float("-inf")

    def lse(a: float, b: float) -> float:
        if a == NEG:
            return b
        if b == NEG:
            return a
        m = a if a > b else b
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is not None and alpha[j] != NEG:
                alpha[i] = lse(alpha[i], alpha[j] + lp)
    if alpha[n] == NEG:
        return None
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for j in range(n - 1, -1, -1):
        for i in range(j + 1, min(n, j + max_len) + 1):
            lp = logp.get(word[j:i])
            if lp is not None and beta[i] != NEG:
                beta[j] = lse(beta[j], lp + beta[i])
    out: dict[str, float] = {}
    for j in range(n):
        for i in range(j + 1, min(n, j + max_len) + 1):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or alpha[j] == NEG or beta[i] == NEG:
                continue
            e = math.exp(alpha[j] + lp + beta[i] - alpha[n])
            if e > 0.0:
                out[piece] = out.get(piece, 0.0) + e
    return out, alpha[n]


def soft_em_round(
    words: DataFrame, logp: Mapping[str, float], *, max_piece_len: int = 6
) -> tuple[dict[str, float], float]:
    """One SOFT-EM round (Kudo 2018 proper): forward-backward expected
    counts over every segmentation (E) + renormalize (M). Returns
    (new log-probs, total MARGINAL log-likelihood) — the objective
    classic EM is guaranteed not to decrease, pinned by tests. Same
    distributed shape as the hard round: per-word DP in mapInPandas,
    one vocab-sized collect."""
    lp = dict(logp)
    ml = max_piece_len

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, float] = {}
            ll = 0.0
            for word, n in zip(pdf["word"], pdf["n"]):
                fb = _forward_backward(word, lp, ml)
                if fb is None:
                    continue
                exp_counts, word_ll = fb
                for piece, e in exp_counts.items():
                    out[piece] = out.get(piece, 0.0) + e * int(n)
                ll += word_ll * int(n)
            rows = [(p, c, 0.0) for p, c in out.items()]
            rows.append((None, 0.0, ll))  # objective, out-of-band
            yield pd.DataFrame(rows, columns=["piece", "c", "ll"])

    agg = (
        words.mapInPandas(gen, "piece string, c double, ll double")
        .groupBy("piece")
        .agg(F.sum("c").alias("c"), F.sum("ll").alias("ll"))
        .collect()
    )
    ll_total = sum(r.ll for r in agg if r.piece is None)
    counts = {r.piece: r.c for r in agg if r.piece is not None}
    total = sum(counts.values())
    if total == 0:
        raise ValueError("no piece had posterior mass — empty corpus or vocab")
    floor = 1e-12
    new = {}
    for p in lp:
        c = counts.get(p, 0.0)
        if c > floor or len(p) == 1:
            new[p] = math.log(max(c, floor) / total)
    return new, ll_total
