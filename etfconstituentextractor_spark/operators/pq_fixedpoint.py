"""Fixed-point product quantization with fully DISTRIBUTED, in-plan
k-means training (SURVEY.md §2B "LLM-pipeline — similarity search";
the companion of operators/pq.py, which trains driver-side in numpy
on a hash-ordered sample and is pytest-pinned by design).

This module exists for the property pq.py deliberately trades away:
a TRAINED index under the cross-engine hash oracle. Training here
is part of the lazy plan — no driver collect at all — and every
arithmetic step is integer, so DuckDB re-derives codebook, codes,
and ADC ranks bit-for-bit (q74). At 100 TB the split is: pq.py's
sample-trained codebook when a driver-side sample is acceptable;
this module when training itself must be distributed (codebook from
the FULL corpus) or auditable across engines.

A 64-dim float vector (256 bytes) becomes M=8 one-byte codes: split
each vector into M contiguous subvectors, train a K=16-centroid
k-means codebook per subvector position, and store only the nearest
code per subvector. Search is asymmetric distance computation (ADC,
Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011): per query, precompute the K×M table of exact
query-subvector↔centroid distances, then each candidate's
approximate distance is M table lookups + a sum — no candidate
vector is ever read at query time.

Bit-reproducibility (what puts a TRAINED index under the full hash
oracle, not rows-only): every arithmetic step is integer.
- Vectors enter as fixed-point: ``floor(x * scale + 0.5)`` (one
  IEEE-double multiply + floor — identical in any engine; no
  round-half banker's exposure).
- Distances are integer sums of squared integer differences.
- Centroid updates are ``floor(sum / count)`` with the division in
  doubles (exact: |sum| < 2^53 by construction).
- Lloyd's iterations run a FIXED count from a deterministic seed
  (the K hash-smallest vec_ids), ties in assignment break on the
  lowest code, empty clusters keep their previous centroid.
So two engines replay the identical codebook, codes, and ADC ranks
— DuckDB re-derives the whole index bit-for-bit (q74).

Scale posture (the 100 TB story):
- **Assignment never shuffles the corpus.** The codebook (M×K rows)
  packs into one array-of-structs row per subvector position and
  broadcasts; each candidate computes its argmin code IN-ROW with
  higher-order functions (``array_min(transform(...))`` — codegen,
  no fanout join, no per-candidate shuffle).
- Training reduces carry (sub_id, code, pos, value) ints only —
  never vectors; the map-side partial-agg combines them.
- The seed selection is a rank-filter the optimizer prunes
  map-side (WindowGroupLimit: each input partition keeps at most K
  rows before the single-partition final rank). At 100 TB you'd
  train on a TABLESAMPLE; the seed rule is sample-stable (hash
  order, not position order).
- ADC search shuffles (query, candidate, partial-sum) ints; the
  final top-k is a rank window WindowGroupLimit prunes map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "fixed_point_subvectors",
    "pack_codebook",
    "pqfp_train",
    "pqfp_assign",
    "pqfp_adc_topk",
]


def _sqdist(a: str, b: str) -> str:
    """Integer squared L2 between two equal-length bigint arrays."""
    return f"aggregate(zip_with({a}, {b}, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"


def fixed_point_subvectors(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    dsub: int = 8,
    scale: int = 1000,
) -> DataFrame:
    """(id, sub_id, sv: array<bigint>) — fixed-point subvector rows.

    ``floor(x * scale + 0.5)`` is round-half-up in one double op —
    the engine-portable quantizer (Spark ROUND and DuckDB ROUND are
    both half-away-from-zero, but floor(+0.5) needs no such
    alignment footnote and handles negatives identically in IEEE).
    """
    iv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(scale) + F.lit(0.5)),
    )
    subs = F.array(
        *[
            F.struct(
                F.lit(mm).cast("long").alias("sub_id"),
                F.slice(F.col("__iv"), mm * dsub + 1, dsub).alias("sv"),
            )
            for mm in range(m)
        ]
    )
    return (
        df.select(F.col(id_col).alias("vec_id"), iv.alias("__iv"))
        .select("vec_id", F.inline(subs))
    )


def pack_codebook(codebook: DataFrame) -> DataFrame:
    """(sub_id, cbook: array<struct<code, cv>> sorted by code) — the
    broadcastable in-row shape of a codebook (M rows total). The
    pack itself is one aggregation of an M*K-row frame — pack once
    and reuse when assigning several frames against one codebook."""
    return codebook.groupBy("sub_id").agg(
        F.array_sort(F.collect_list(F.struct("code", "cv"))).alias("cbook")
    )


def pqfp_assign(points: DataFrame, codebook: DataFrame) -> DataFrame:
    """(vec_id, sub_id, code, sv) — nearest-code assignment.

    The argmin over the K codes happens inside one row against the
    broadcast packed codebook: ``array_min`` over (distance, code)
    structs is lexicographic, so ties break on the lowest code — the
    same rule the oracle's ``ORDER BY d, code`` row_number spells.
    No fanout join, no shuffle of the points frame.
    """
    best = F.expr(
        "array_min(transform(cbook, c -> "
        f"struct({_sqdist('sv', 'c.cv')} AS d, c.code AS code)))"
    )
    packed = codebook if "cbook" in codebook.columns else pack_codebook(codebook)
    return (
        points.join(F.broadcast(packed), "sub_id")
        .select("vec_id", "sub_id", best.getField("code").alias("code"), "sv")
    )


def pqfp_train(
    points: DataFrame,
    k: int = 16,
    iters: int = 3,
    dsub: int = 8,
    truncate_lineage: bool = True,
) -> DataFrame:
    """(sub_id, code, cv: array<bigint>) — K-centroid codebook per
    subvector position after ``iters`` Lloyd rounds.

    Seeding: codes 0..k-1 are the subvectors of the k vec_ids with
    the smallest ``md5(vec_id)`` — deterministic, position-free
    (stable under reordering the input), and rank-filter-prunable.
    Updates floor the per-dimension mean to keep centroids integral;
    a code that captures no points keeps its previous centroid.

    The codebook is ``localCheckpoint``-ed per round (the
    components.py iterative-operator precedent): each round's
    lineage references the previous codebook TWICE (assignment +
    empty-cluster carry), so an un-truncated plan re-derives the
    points pipeline 2^iters times. The checkpoint materializes M*K
    rows — index state, never corpus data. ``truncate_lineage=False``
    keeps the fully lazy plan (tiny inputs / plan-inspection tests).
    """
    # each Lloyd round is its own checkpoint job re-reading the points
    # frame — cache it for the duration of training (at 100 TB you
    # train on a TABLESAMPLE, which is exactly what you'd cache);
    # skipped in the fully-lazy mode, where no per-round jobs run.
    # The training rounds reduce to an M*K-row codebook: pin FEW
    # shuffle partitions for the loop (the components.py convention —
    # per-round cost is fixed per-partition overhead, and the round's
    # output is 128 rows) and restore the session setting after.
    spark = points.sparkSession
    old_sp: str | None = None
    if truncate_lineage:
        points = points.persist()
        old_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    seeds = (
        points.select("vec_id")
        .distinct()
        .withColumn(
            "code",
            F.row_number().over(
                W.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
            )
            - 1,
        )
        .filter(F.col("code") < k)
    )
    cb = points.join(F.broadcast(seeds), "vec_id").select(
        "sub_id", "code", F.col("sv").alias("cv")
    )
    for _ in range(iters):
        assigned = pqfp_assign(points, cb)
        # ONE map-combinable shuffle per round: per-dimension sums as
        # dsub scalar aggregates (no posexplode fanout, no second
        # groupBy to reassemble the array)
        agg = assigned.groupBy("sub_id", "code").agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.sum(F.col("sv").getItem(i)).alias(f"__s{i}") for i in range(dsub)],
        )
        newcb = agg.select(
            "sub_id",
            "code",
            F.array(
                *[
                    F.floor(F.col(f"__s{i}").cast("double") / F.col("__n"))
                    for i in range(dsub)
                ]
            ).alias("cv"),
        )
        cb = (
            cb.alias("g")
            .join(newcb.alias("n"), ["sub_id", "code"], "left")
            .select(
                "sub_id",
                "code",
                F.coalesce(F.col("n.cv"), F.col("g.cv")).alias("cv"),
            )
        )
        if truncate_lineage:
            # the codebook is M*K rows: one partition, one tiny job
            cb = cb.coalesce(1).localCheckpoint(eager=True)
    if truncate_lineage:
        points.unpersist()
        if old_sp is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
    return cb


def pqfp_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebook: DataFrame,
    k: int = 10,
) -> DataFrame:
    """(qid, vec_id, adc_dist, rn) — asymmetric-distance top-k.

    ``codes`` is the encoded corpus (vec_id, sub_id, code);
    ``queries`` is (qid, sub_id, qv) in the same fixed-point space.
    The per-query distance table (M×K exact query↔centroid integer
    distances) broadcasts; candidates join it on (sub_id, code) and
    reduce to a per-(query, candidate) sum — the only shuffle, all
    ints, map-side combinable. Ties rank by candidate id.
    """
    dt = queries.join(F.broadcast(codebook), "sub_id").select(
        "qid", "sub_id", "code", F.expr(_sqdist("qv", "cv")).alias("d")
    )
    scored = (
        codes.join(F.broadcast(dt), ["sub_id", "code"])
        .groupBy("qid", "vec_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    w = W.partitionBy("qid").orderBy("adc_dist", "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )
