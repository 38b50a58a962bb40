"""Distributed Lloyd k-means (operators/kmeans.py): per-round
centroids must match the from-scratch scalar replay EXACTLY (the
rounding gates make cross-engine summation order irrelevant), the
refinement must actually improve cluster affinity over raw seeds,
and the assign stage must broadcast the centroid frame."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.kmeans import lloyd_kmeans, py_lloyd_oracle
from etfconstituentextractor_spark.operators.semdedup import (
    assign_clusters,
    semantic_seeds,
)
from etfconstituentextractor_spark.sources.tables import load

K, ITERS = 8, 3


def _vec(df):
    return df.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    ).withColumn(
        "nrm",
        F.sqrt(F.expr("aggregate(transform(v, x -> x * x), 0D, (acc, x) -> acc + x)")),
    )


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    return _vec(load(spark, sf_dir, "embeddings"))


def test_lloyd_matches_python_replay_exactly(spark, vectors):
    got = {
        int(r["cell"]): [float(x) for x in r["cv"]]
        for r in lloyd_kmeans(vectors, K, ITERS).collect()
    }
    vecs = {r["vec_id"]: list(r["v"]) for r in vectors.collect()}
    want = dict(py_lloyd_oracle(vecs, K, ITERS))
    assert set(got) == set(want)
    for c in want:
        assert got[c] == want[c], c
    # the refinement must have moved at least one centroid off its seed
    seeds = {r["cell"]: list(r["cv"]) for r in semantic_seeds(vectors, K).collect()}
    assert any(got[c] != seeds[c] for c in got)


def test_lloyd_zero_iters_returns_seeds(spark, vectors):
    got = {r["cell"]: list(r["cv"]) for r in lloyd_kmeans(vectors, K, 0).collect()}
    seeds = {r["cell"]: list(r["cv"]) for r in semantic_seeds(vectors, K).collect()}
    assert got == seeds


def test_lloyd_refinement_improves_affinity(spark, vectors):
    """The point of refining: mean cosine-to-own-centroid must not
    decrease vs raw seeds (on this corpus it strictly increases)."""
    def mean_affinity(cent):
        rows = assign_clusters(vectors, cent).agg(F.avg("cent_cos")).collect()
        return rows[0][0]

    seeds_aff = mean_affinity(semantic_seeds(vectors, K))
    refined_aff = mean_affinity(lloyd_kmeans(vectors, K, ITERS))
    assert refined_aff > seeds_aff


def test_lloyd_guards(spark, vectors):
    with pytest.raises(ValueError, match="k >= 1"):
        lloyd_kmeans(vectors, 0, 1)
    with pytest.raises(ValueError, match="rows < k"):
        lloyd_kmeans(vectors.limit(3), 5, 1)
