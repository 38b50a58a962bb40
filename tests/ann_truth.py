"""ONE definition of the exact-cosine ground truth the ANN recall
floors measure against (round-9 review: two inline copies of the
(score, -id) tie-break construction would drift independently —
whichever file changed the convention, the other would silently
measure a different 'exact' set)."""

from __future__ import annotations

import numpy as np


def exact_topk(vecs: dict, nq: int, k: int) -> set:
    """{(query_id, candidate_id)} of the exact cosine top-k per query
    (queries: vec_id < nq; candidates: the rest). Ties break toward
    the LOWEST candidate id — the engines' shared 9dp/argmin
    convention."""
    nrm = {i: np.linalg.norm(v) for i, v in vecs.items()}
    qs = sorted(v for v in vecs if v < nq)
    cs = sorted(v for v in vecs if v >= nq)
    out = set()
    for q in qs:
        top = sorted(
            ((float(vecs[q] @ vecs[c] / (nrm[q] * nrm[c])), -c) for c in cs),
            reverse=True,
        )[:k]
        out |= {(q, -c) for _, c in top}
    return out
