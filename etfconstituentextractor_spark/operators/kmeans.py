"""Distributed Lloyd k-means over an embedding column — the
full-corpus refinement step behind every centroid consumer in the
engine (semdedup's learned blocking key, ann.py's IVF cells, pq.py's
codebooks — each of which today uses seeds or a driver-side sample).

Iterative-algorithm posture (the connected-components / BPE-training
precedent): each round is ONE distributed pass —

  assign:   centroids ship as a broadcast literal frame (k rows);
            every vector scores against them in codegen (cosine,
            rounded at ``score_dp`` so ties are deterministic) and a
            map-side-complete max_by picks its cell — the vector side
            never shuffles for scoring.
  reduce:   new centroids are element-wise means, computed by
            exploding (cell, dim, value) — the one exchange carries
            k·d scalar partials, nothing vector-sized — and only the
            k×d centroid matrix returns to the driver (the "one
            scalar row per round" control-plane discipline).

Determinism: init is the hash-ordered first-k discipline
(semdedup.semantic_seeds), iteration count is fixed, assignment
scores round at ``score_dp`` with ties to the lowest cell, and each
new centroid component rounds at ``centroid_dp`` — so the pure-Python
replay in tests reproduces every round's centroids EXACTLY (the
rounding absorbs engine-level summation-order noise), not just
approximately. Empty cells keep their previous centroid.

Pytest-only by design (iterative, like BPE training); the downstream
ASSIGNMENT/dedup/search operators are the oracle-checked surface.
No reference counterpart (the reference has no vector data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.semdedup import semantic_seeds

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"


def lloyd_kmeans(
    vectors: DataFrame,
    k: int,
    iters: int,
    *,
    id_col: str = "vec_id",
    score_dp: int = 9,
    centroid_dp: int = 6,
) -> DataFrame:
    """Refined centroid frame (cell, cv, cn) after ``iters`` rounds of
    cosine Lloyd over (id_col, v array<double>, nrm double) — drop-in
    for ``semdedup.assign_clusters``'s seeds argument.
    """
    if k < 1 or iters < 0:
        raise ValueError(f"need k >= 1 and iters >= 0, got k={k} iters={iters}")
    spark = vectors.sparkSession
    cents = [
        (int(r["cell"]), [float(x) for x in r["cv"]])
        for r in semantic_seeds(vectors, k, id_col).collect()
    ]
    if len(cents) < k:
        raise ValueError(f"corpus has only {len(cents)} rows < k={k}")
    dim = len(cents[0][1])

    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(c, v) for c, v in cents], "cell bigint, cv array<double>"
        ).withColumn(
            "cn", F.sqrt(F.expr(_DOT.format(a="cv", b="cv")))
        )
        cos = F.round(
            F.expr(_DOT.format(a="v", b="cv")) / (F.col("nrm") * F.col("cn")),
            score_dp,
        )
        assigned = (
            vectors.crossJoin(F.broadcast(cdf))
            .select(id_col, "v", cos.alias("cos_c"), "cell")
            .groupBy(id_col)
            .agg(
                F.first("v").alias("v"),
                F.max_by(
                    "cell", F.struct(F.col("cos_c"), (-F.col("cell")).alias("tb"))
                ).alias("cell"),
            )
        )
        means = (
            assigned.select(
                "cell", F.posexplode("v").alias("dim", "val")
            )
            .groupBy("cell", "dim")
            .agg(F.round(F.avg("val"), centroid_dp).alias("m"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m"))
                ).alias("dm")
            )
            .select("cell", F.col("dm.m").alias("cv"))
            .collect()
        )
        got = {int(r["cell"]): [float(x) for x in r["cv"]] for r in means}
        for r in got.values():
            assert len(r) == dim
        cents = [(c, got.get(c, v)) for c, v in cents]

    return spark.createDataFrame(
        cents, "cell bigint, cv array<double>"
    ).withColumn("cn", F.sqrt(F.expr(_DOT.format(a="cv", b="cv"))))


def py_lloyd_oracle(
    vectors: dict[int, list[float]],
    k: int,
    iters: int,
    score_dp: int = 9,
    centroid_dp: int = 6,
) -> list[tuple[int, list[float]]]:
    """From-scratch scalar replay of lloyd_kmeans: same hash-ordered
    init, same per-round rounding gates — must reproduce the
    distributed centroids EXACTLY."""
    import hashlib

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    seed_ids = sorted(
        vectors, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:k]
    cents = [(i, list(vectors[i])) for i in seed_ids]
    nrm = {i: dot(v, v) ** 0.5 for i, v in vectors.items()}
    for _ in range(iters):
        cn = {c: dot(cv, cv) ** 0.5 for c, cv in cents}
        members: dict[int, list[list[float]]] = {c: [] for c, _ in cents}
        for i, v in vectors.items():
            best = max(
                cents,
                key=lambda cv: (
                    round(dot(v, cv[1]) / (nrm[i] * cn[cv[0]]), score_dp),
                    -cv[0],
                ),
            )[0]
            members[best].append(v)
        cents = [
            (
                c,
                [
                    round(sum(m[t] for m in ms) / len(ms), centroid_dp)
                    for t in range(len(cv))
                ]
                if ms
                else cv,
            )
            for (c, cv), ms in ((cc, members[cc[0]]) for cc in cents)
        ]
    return cents
