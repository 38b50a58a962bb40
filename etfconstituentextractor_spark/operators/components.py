"""Connected components by iterative min-label propagation — the
clustering step of near-duplicate dedup (SURVEY.md §2B "LLM-pipeline —
near-dup": candidate PAIRS from MinHash/Jaccard become duplicate
GROUPS, and each group keeps one representative).

Algorithm (the standard large-graph formulation, e.g. hash-to-min):
every node starts labeled with itself; each round, every node adopts
the minimum label among itself and its neighbors; converged when no
label changes. Each round is one shuffle (groupBy node); the label
frame is localCheckpoint()ed per round to truncate lineage — without
that, iteration k replays all k-1 prior shuffles and the plan grows
without bound. Convergence needs at most diameter(graph) rounds;
near-dup clusters are shallow (stars/cliques), so 3-5 rounds is
typical. The per-round changed-label count is an Observation metric
read from the checkpoint materialization itself — one scalar per
round reaches the driver, zero extra jobs, no data collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Label each node of the undirected graph ``edges`` with the
    smallest node id in its component. Returns (node, component).
    Isolated nodes don't appear in edges and so are their own
    (implicit) components; callers union them in if needed.

    Raises RuntimeError if labels are still changing after ``max_iter``
    rounds — partially-propagated labels are silently WRONG, so the
    caller must raise max_iter (graph diameter bounds the rounds
    needed) rather than consume a truncated result.

    ``shuffle_partitions`` temporarily pins the session's shuffle
    partitioning for the propagation loop. The per-round cost is
    dominated by fixed per-partition overhead (each round materializes
    a localCheckpoint), so a near-dup pair graph —
    tiny relative to its corpus — wants FEW partitions: 32→8 measured
    2x faster on a 256-edge graph. Size it to pair volume, not corpus
    volume; None leaves the session setting untouched.
    """
    spark = edges.sparkSession
    old_sp: str | None = None
    if shuffle_partitions is not None:
        old_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        return _propagate(edges, src, dst, max_iter)
    finally:
        if old_sp is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def _propagate(edges: DataFrame, src: str, dst: str, max_iter: int) -> DataFrame:
    from pyspark.sql import Observation

    # sym is re-joined on `b` EVERY round: partition it by the join key
    # once, so each round's join reads the persisted layout exchange-
    # free. labels is born partitioned on `node` (groupBy key below)
    # and every later version inherits that through the node-keyed
    # joins + localCheckpoint — the per-round plan then carries exactly
    # ONE exchange (the groupBy(a) re-aggregation), not three.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .repartition(F.col("b"))
        .persist()
    )
    # Seed with round 1's result directly: component = min(self, all
    # neighbors) — one aggregation instead of an identity-labels frame
    # plus a full join round. The seed stays LAZY (round-14
    # optimization, guide §1.2 "the distributed algorithm" / §5
    # driver): checkpointing it was one whole extra driver job per CC
    # call, and near-dup graphs (stars/cliques) usually converge AT
    # the seed — measured at sf0.1: 256 pairs, changed=0 in round 1 —
    # so the first propagation round is pure verification. Fusing
    # seed + round 1 into the round's own checkpoint job (the seed
    # subtree's exchange is reused across its two references) and
    # reading the changed-count via Observation from the SAME
    # materialization (no per-round count job) takes the loop from
    # 1 + 2·rounds driver jobs to exactly `rounds`.
    labels = sym.groupBy(F.col("a").alias("node")).agg(
        F.least(F.first("a"), F.min("b")).alias("component")
    )

    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        obs = Observation()
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.col("component").alias("old_component"),
                F.least(
                    "component", F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
            # count(when(...)) not sum(...): count is 0 on an empty
            # frame where sum is NULL — the no-edges graph must read
            # as converged, not crash the int comparison below
            .observe(
                obs,
                F.count(
                    F.when(F.col("component") != F.col("old_component"), 1)
                ).alias("changed"),
            )
            .localCheckpoint()
        )
        changed = int(obs.get["changed"])
        labels = updated.drop("old_component")
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            f"rounds ({changed} labels still changing); raise max_iter"
        )
    return labels
