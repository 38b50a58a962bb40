"""Int8 embedding quantization (operators/quantize.py): reconstruction
error bound, scale-cancellation property, recall against the exact
float ranking on the real embeddings table, and plan hygiene."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.quantize import (
    dequantize,
    int8_cosine_topk,
    quantize_int8,
)
from etfconstituentextractor_spark.sources.tables import load

_TOP_K = 10
_N_QUERIES = 8


def _vecs(spark, sf_dir):
    return (
        load(spark, sf_dir, "embeddings")
        .select(
            F.col("vec_id").alias("id"),
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
        )
    )


def test_roundtrip_error_bound(spark, sf_dir):
    rows = (
        dequantize(quantize_int8(_vecs(spark, sf_dir).limit(50)))
        .select("v", "scale", "deq")
        .collect()
    )
    assert rows
    for r in rows:
        # symmetric scalar quantization: per-element error <= scale/(2*127)
        bound = r.scale / 254 + 1e-12
        for x, d in zip(r.v, r.deq):
            assert abs(x - d) <= bound, (x, d, r.scale)


def test_zero_vector_safe(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])], "id bigint, v array<double>"
    )
    out = {r.id: r for r in dequantize(quantize_int8(df)).collect()}
    assert out[1].scale == 0.0 and list(out[1].q) == [0, 0, 0]
    assert out[1].deq == [0.0, 0.0, 0.0]
    assert out[2].scale == 2.0 and out[2].q[1] == -127


def test_scale_cancels_in_cosine(spark):
    # cosine over the int8 codes equals cosine over the DEQUANTIZED
    # floats exactly (scales cancel) — the property that makes the
    # quantized hot path scale-free.
    df = quantize_int8(
        spark.createDataFrame(
            [(1, [0.1, 0.5, -0.3]), (2, [30.0, -1.0, 4.0])], "id bigint, v array<double>"
        )
    )
    rows = {r.id: r for r in dequantize(df).collect()}
    a, b = rows[1], rows[2]

    def cos(x, y):
        d = sum(p * q for p, q in zip(x, y))
        return d / (math.sqrt(sum(p * p for p in x)) * math.sqrt(sum(q * q for q in y)))

    assert abs(cos(a.q, b.q) - cos(a.deq, b.deq)) < 1e-12


def test_recall_vs_exact_float_ranking(spark, sf_dir):
    vecs = _vecs(spark, sf_dir)
    quant = quantize_int8(vecs).select("id", "q")
    queries = quant.filter(F.col("id") < _N_QUERIES).select(
        F.col("id").alias("qid"), "q"
    )
    approx = int8_cosine_topk(quant, queries, _TOP_K)

    # exact float top-k (the q70 construction)
    qv = F.broadcast(
        vecs.filter(F.col("id") < _N_QUERIES).select(
            F.col("id").alias("qid"), F.col("v").alias("qv")
        )
    )
    dot = "aggregate(zip_with(v, qv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    nrm = "sqrt(aggregate(transform({c}, x -> x * x), 0D, (acc, x) -> acc + x))"
    from pyspark.sql import Window as W

    cos = F.expr(dot) / (F.expr(nrm.format(c="v")) * F.expr(nrm.format(c="qv")))
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("candidate_id"))
    exact = (
        vecs.crossJoin(qv)
        .select("qid", F.col("id").alias("candidate_id"), cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
    )

    a = {(r.qid, r.candidate_id) for r in approx.collect()}
    e = {(r.qid, r.candidate_id) for r in exact.collect()}
    recall = len(a & e) / len(e)
    # int8 keeps ~2 decimal digits per element; top-k overlap stays high
    assert recall >= 0.8, recall


def test_quantize_plan_is_python_free(spark, sf_dir):
    plan = (
        int8_cosine_topk(
            quantize_int8(_vecs(spark, sf_dir)).select("id", "q"),
            quantize_int8(_vecs(spark, sf_dir).limit(2)).select(
                F.col("id").alias("qid"), "q"
            ),
            5,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_quantize_roundtrip_fuzz(spark):
    """Hypothesis: for arbitrary float vectors (negatives, tiny and
    huge magnitudes, zeros), quantize→dequantize stays within the
    scale/254 bound and codes stay in [-127, 127]."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    finite = st.floats(
        min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(vec=st.lists(finite, min_size=1, max_size=12))
    def inner(vec):
        df = spark.createDataFrame([(1, vec)], "id bigint, v array<double>")
        r = dequantize(quantize_int8(df)).collect()[0]
        assert all(-127 <= c <= 127 for c in r.q)
        bound = r.scale / 254 + abs(r.scale) * 1e-12
        for x, d in zip(vec, r.deq):
            assert abs(x - d) <= bound, (x, d, r.scale)

    inner()


def test_quantized_vectors_compose_with_ivf(spark, sf_dir):
    """The at-scale composition: int8 codes (4x smaller index) feed the
    IVF index/search unchanged — scales cancel in cosine, so cell
    assignment and rerank run on the codes cast to double. The contract
    isolates QUANTIZATION loss: quantized-IVF vs float-IVF at the same
    nprobe must overlap almost completely (measured 0.98 at nprobe=2;
    IVF's own pruning loss is the ANN operator's concern, not this
    one's)."""
    from etfconstituentextractor_spark.operators.ann import ivf_index, ivf_topk

    vecs = _vecs(spark, sf_dir)
    codes = quantize_int8(vecs).select(
        "id", F.expr("transform(q, x -> CAST(x AS DOUBLE))").alias("v")
    )

    def ivf_results(src):
        centroids = src.filter(F.col("id") % 7 == 3).limit(8).select(
            F.col("id").alias("cell"), F.col("v").alias("cv")
        )
        indexed = ivf_index(src, centroids)
        queries = src.filter(F.col("id") < 5).select(
            F.col("id").alias("qid"), F.col("v").alias("qv")
        )
        return {
            (r.qid, r.id)
            for r in ivf_topk(indexed, queries, centroids, k=10, nprobe=2).collect()
        }

    quant = ivf_results(codes)
    exact = ivf_results(vecs)
    assert len(quant & exact) / len(exact) >= 0.9, len(quant & exact) / len(exact)
