"""IVF-PQ composition (operators/ivfpq.py): residual encode must
match a scalar replay built on the already-bit-matched pq pieces,
search must scan only probed cells with correct ADC ranking, nprobe=K
must degrade to scanning everything, and the plans must stay
broadcast + codegen."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.ivfpq import ivfpq_index, ivfpq_topk
from etfconstituentextractor_spark.sources.tables import load

M, KSUB, N_CELLS, TOP_K = 4, 8, 8, 5


def _vec(df):
    return df.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )


@pytest.fixture(scope="module")
def ivfpq_setup(spark, sf_dir):
    e = _vec(load(spark, sf_dir, "embeddings"))
    cent = e.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 10 + N_CELLS)).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv")
    )
    vectors = e.filter(F.col("vec_id") >= 10).select(F.col("vec_id").alias("id"), "v")
    encoded, cb = ivfpq_index(vectors, cent, m=M, ksub=KSUB, sample_n=64, iters=2)
    return e, cent, vectors, encoded, cb


def test_ivfpq_residual_encode_matches_scalar_replay(spark, ivfpq_setup):
    e, cent, vectors, encoded, cb = ivfpq_setup
    cents = {r["cell"]: np.asarray(r["cv"]) for r in cent.collect()}
    rows = encoded.collect()
    vecs = {r["id"]: np.asarray(r["v"]) for r in vectors.collect()}
    assert set(vecs) == {r["id"] for r in rows}
    for r in rows:
        resid = vecs[r["id"]] - cents[r["cell"]]
        dsub = len(resid) // M
        for j, code in enumerate(r["pq_codes"]):
            sub = resid[j * dsub : (j + 1) * dsub]
            d2 = ((cb[j] - sub) ** 2).sum(axis=1)
            # scalar argmin with lowest-index ties == the plan's
            # array_position(array_min) rule
            want = int(np.flatnonzero(d2 == d2.min())[0])
            assert code == want, (r["id"], j)


def test_ivfpq_search_ranks_by_adc_and_prunes_cells(spark, ivfpq_setup):
    e, cent, vectors, encoded, cb = ivfpq_setup
    queries = [(r["vec_id"], list(r["v"])) for r in e.filter(F.col("vec_id") < 3).collect()]
    nprobe = 2
    top = ivfpq_topk(encoded, queries, cent, cb, k=TOP_K, nprobe=nprobe)
    rows = top.collect()
    cents = {r["cell"]: np.asarray(r["cv"]) for r in cent.collect()}
    codes = {r["id"]: (r["cell"], list(r["pq_codes"])) for r in encoded.collect()}
    dsub = 64 // M
    for qid, qv in queries:
        q = np.asarray(qv)
        probed = sorted(cents, key=lambda c: (((q - cents[c]) ** 2).sum(), c))[:nprobe]
        # scalar ADC over exactly the probed cells
        adc = {}
        for vid, (cell, cs) in codes.items():
            if cell not in probed:
                continue
            r = q - cents[cell]
            adc[vid] = round(
                sum(((cb[j][cs[j]] - r[j * dsub : (j + 1) * dsub]) ** 2).sum() for j in range(M)),
                10,
            )
        want = sorted(adc.items(), key=lambda kv: (kv[1], kv[0]))[:TOP_K]
        got = sorted(
            [(r["id"], r["adc_dist"]) for r in rows if r["qid"] == qid],
            key=lambda kv: (kv[1], kv[0]),
        )
        assert got == want, qid
        # pruning: every hit lives in a probed cell
        assert all(codes[vid][0] in probed for vid, _ in got)


def test_ivfpq_nprobe_all_scans_everything(spark, ivfpq_setup):
    e, cent, vectors, encoded, cb = ivfpq_setup
    queries = [(0, list(e.filter(F.col("vec_id") == 0).collect()[0]["v"]))]
    full = ivfpq_topk(encoded, queries, cent, cb, k=10_000, nprobe=N_CELLS)
    assert full.count() == encoded.count()


def test_ivfpq_plans_stay_codegen_and_broadcast(spark, ivfpq_setup):
    e, cent, vectors, encoded, cb = ivfpq_setup
    queries = [(0, [0.0] * 64)]
    plan = (
        ivfpq_topk(encoded, queries, cent, cb, k=5, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
