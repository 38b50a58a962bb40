"""IVF-PQ: the composed index layout large-scale ANN systems
actually serve from (Jégou et al. 2011; the FAISS `IVFx,PQy` shape) —
an inverted file partitions the corpus into cells (operators/ann.py)
and each vector's RESIDUAL against its cell centroid is
product-quantized (operators/pq.py), so a 100 TB store holds
m·log2(ksub) bits per vector co-located by cell, and a query scans
only its ``nprobe`` cells with per-cell lookup tables.

Spark-first composition — nothing here is new machinery, which is the
point; the test pins that the pieces compose correctly:

- **index**: cells assigned by squared-L2 ``min_by`` over broadcast
  centroids (``_l2_assign`` — the SAME metric the residual codebooks,
  ADC tables, and cell probe use; a cosine assignment would misroute
  vectors whose norms differ); residuals are one ``zip_with(v, cv, (x, y) -> x - y)``
  map; ``pq_encode`` turns them into codes with codebook literals —
  all codegen, and the encoded frame can be written
  ``partitionBy(cell)`` so a cell probe is a partition-pruned scan.
- **search**: per (query, probed cell), the ADC lookup table is built
  against the RESIDUAL query (q − cell centroid) — tables are
  (nprobe · m · ksub) floats per query, shipped as a broadcast
  frame; each candidate costs m array lookups + a sum, exactly
  pq_adc_join_topk's cost model but cell-aware.

Residual codebooks are trained on the hash-ordered sample of
residuals (train_pq_codebooks), shared across cells — the standard
single-codebook IVF-PQ variant; per-cell codebooks would be a dict of
literals with the same plan shape.

Pytest-only by design (the training is iterative and the exact-path
pieces q70/q72 already carry the oracle); the test replays encode and
search scalar-side and pins the no-Python / broadcast plan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.pq import (
    pq_encode,
    train_pq_codebooks,
)

_RESID = "zip_with(v, cv, (x, y) -> x - y)"
_SQL_D2 = (
    "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, t) -> acc + t)"
)


def _l2_assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment by SQUARED L2 — the metric the
    whole IVF-PQ path speaks (residual codebooks and ADC tables are
    L2 objects; ann.ivf_index's cosine assignment would send a
    vector's true L2-nearest neighbors to cells the L2-ranked probe
    never visits when norms vary). Broadcast centroids + map-side-
    complete min_by; distances round at 9 dp, ties to the lowest
    cell."""
    c = F.broadcast(centroids.select("cell", "cv"))
    d2 = F.round(F.expr(_SQL_D2), 9)
    return (
        vectors.crossJoin(c)
        .select("id", "v", "cell", d2.alias("__d2"))
        .groupBy("id")
        .agg(
            F.first("v").alias("v"),
            F.min_by("cell", F.struct(F.col("__d2"), F.col("cell"))).alias("cell"),
        )
    )


def ivfpq_index(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    m: int,
    ksub: int,
    sample_n: int = 256,
    iters: int = 3,
) -> tuple[DataFrame, np.ndarray]:
    """(encoded, codebooks): cell-assigned, residual-PQ-encoded corpus.

    vectors:   (id bigint, v array<double>)
    centroids: (cell bigint, cv array<double>)
    encoded:   (id, cell, pq_codes array<int>) — the frame a
               deployment writes partitionBy('cell').
    """
    assigned = _l2_assign(vectors, centroids).join(
        F.broadcast(centroids.select("cell", "cv")), "cell"
    )
    resid = assigned.select("id", "cell", F.expr(_RESID).alias("r"))
    codebooks = train_pq_codebooks(
        resid, m=m, ksub=ksub, id_col="id", vec_col="r", sample_n=sample_n, iters=iters
    )
    return (
        pq_encode(resid, codebooks, vec_col="r").select("id", "cell", "pq_codes"),
        codebooks,
    )


def ivfpq_topk(
    encoded: DataFrame,
    queries: list[tuple[int, list[float]]],
    centroids: DataFrame,
    codebooks: np.ndarray,
    k: int,
    nprobe: int,
) -> DataFrame:
    """(qid, id, adc_dist, rn) — ADC top-k probing ``nprobe`` cells.

    Cell ranking and the per-(query, cell) residual lookup tables are
    built driver-side from the collected centroid frame (K·dim floats
    — control-plane sized) and ship as ONE broadcast frame of
    (qid, cell, lut) rows; the join against the encoded corpus prunes
    to probed cells before any scoring. Distances round at 10 dp
    before the rank window; ties break on the lowest id.
    """
    m, _, dsub = codebooks.shape
    cents = {int(r["cell"]): np.asarray(r["cv"], dtype=np.float64) for r in centroids.collect()}
    spark = encoded.sparkSession
    probe_rows = []
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        ranked = sorted(
            cents.items(), key=lambda cv: (((q - cv[1]) ** 2).sum(), cv[0])
        )[:nprobe]
        for cell, cv in ranked:
            r = q - cv
            lut = [
                [float(((codebooks[j][c] - r[j * dsub : (j + 1) * dsub]) ** 2).sum()) for c in range(codebooks.shape[1])]
                for j in range(m)
            ]
            probe_rows.append((qid, cell, lut))
    probes = spark.createDataFrame(
        probe_rows, "qid bigint, cell bigint, lut array<array<double>>"
    )
    adc = F.expr(
        "aggregate(zip_with(lut, pq_codes, (t, c) -> element_at(t, c + 1)), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    w = W.partitionBy("qid").orderBy(F.col("adc_dist").asc(), F.col("id"))
    return (
        encoded.join(F.broadcast(probes), "cell")
        .select("qid", "id", F.round(adc, 10).alias("adc_dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
