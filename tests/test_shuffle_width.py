"""RUNTIME shuffle-content proof for the text-never-shuffles family:
plan-string pins (tests/test_plans.py) show the shape; this file
walks the EXECUTED plan (AQE final stages) and asserts, from the
exchanges' actual output attributes and SQL metrics, that (a) no
shuffle carries the text column and (b) every shuffled row is
fixed-width.

Why row WIDTH and not byte volume: a per-token hash stream (q60's
substring legs) legitimately shuffles MORE bytes than the raw text
(measured ~11x at sf0.01 — ~60 fixed bytes per token vs ~6 text
bytes), and that is fine at scale because the rows are bounded and
skew-proof; what must never appear is an UNBOUNDED text column.

The one deliberate text-bearing exchange in the registered queries is
`sources/tables.py:fanout` — the small-SF work-spreader that
repartitions the scan when it has fewer splits than the cluster has
cores, self-documented as a no-op at real scale — so the operator
claims are asserted on the operators WITHOUT fanout.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etfconstituentextractor_spark.plans.registry import QUERIES, load_catalog
from etfconstituentextractor_spark.sources.tables import load

load_catalog()

#: registered queries whose shuffles must all be text-free and
#: fixed-width (none of these fanout their scan)
_FIXED_WIDTH_QUERIES = [
    "q60_dedup_exact_family",
    "q85_sequence_packing",
    "q86_snapshot_diff",
]

#: fixed-width bound: ids + two 32-hex hashes + a few numerics fit
#: comfortably; a text row is ~330+ bytes even on this small-doc
#: corpus and kilobytes on a real one
_MAX_AVG_ROW_BYTES = 200


def _shuffle_stats(df) -> list[tuple[str, str, int, int]]:
    """[(partitioning, output, dataSize, records)] for every
    non-broadcast exchange of the EXECUTED plan."""
    df.collect()
    out: list[tuple[str, str, int, int]] = []

    def walk(node):
        cls = node.getClass().getSimpleName()
        name = node.nodeName()
        if "Exchange" in name and "Broadcast" not in name:
            m = node.metrics()
            ds = m.apply("dataSize").value() if m.contains("dataSize") else 0
            rec = (
                m.apply("shuffleRecordsWritten").value()
                if m.contains("shuffleRecordsWritten")
                else 0
            )
            out.append(
                (
                    str(node.outputPartitioning()),
                    node.output().toList().toString(),
                    ds,
                    rec,
                )
            )
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if "QueryStageExec" in cls:
            walk(node.plan())
            return
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def _assert_text_free_fixed_width(stats, label):
    assert stats, f"{label}: expected at least one exchange"
    for part, output, ds, rec in stats:
        assert "text#" not in output, (label, part, output)
        if rec == 0:
            continue  # empty stage (e.g. a leg with no delta rows)
        avg = ds / rec
        assert avg <= _MAX_AVG_ROW_BYTES, (label, part, ds, rec, avg)


@pytest.mark.parametrize("name", _FIXED_WIDTH_QUERIES)
def test_registered_query_shuffles_are_text_free(spark, sf_dir, name):
    _assert_text_free_fixed_width(_shuffle_stats(QUERIES[name](spark, sf_dir)), name)


def test_strip_boilerplate_operator_shuffles_no_text(spark, sf_dir):
    """The operator-level claim behind q87, without the small-SF
    fanout repartition the registered query adds for parallelism:
    only the per-doc-distinct line-hash counts ever shuffle."""
    from etfconstituentextractor_spark.operators.boilerplate import strip_boilerplate
    from etfconstituentextractor_spark.plans.llm_text import planted_boilerplate

    docs = planted_boilerplate(load(spark, sf_dir, "documents"))
    out = strip_boilerplate(docs, min_docs=5).select("doc_id", "n_lines", "n_kept")
    _assert_text_free_fixed_width(_shuffle_stats(out), "strip_boilerplate")


def test_pii_scrub_truly_shuffles_nothing(spark, sf_dir):
    """q84's zero-Exchange plan pin, confirmed with runtime metrics:
    not one shuffled byte."""
    stats = _shuffle_stats(QUERIES["q84_pii_scrub"](spark, sf_dir))
    assert stats == []


def test_bloom_prefilter_reduces_shuffled_probe_records(spark, sf_dir):
    """q22 'bloom' leg's scale claim, proven on executed-plan shuffle
    metrics: with broadcast off (the fact-fact regime the operator
    exists for), pre-filtering the probe through the build side's
    Bloom filter cuts the probe-side shuffleRecordsWritten to the
    survivor count — the rows that provably cannot match never enter
    the exchange."""
    from etfconstituentextractor_spark.operators.bloom import (
        bloom_build,
        bloom_params,
        bloom_prefilter,
    )

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    n_build = o.count()
    m, k = bloom_params(max(64, n_build), 1e-2)
    blob = bloom_build(o, "l_orderkey", m_bits=m, k=k)

    def probe_shuffled(probe) -> int:
        j = (
            probe.join(o, ["l_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("q"))  # keeps l_quantity un-pruned
        )
        # the probe-side exchange is the one carrying l_quantity
        recs = [
            rec for _, output, _, rec in _shuffle_stats(j) if "l_quantity#" in output
        ]
        assert recs, "expected a probe-side exchange with broadcast off"
        return sum(recs)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain = probe_shuffled(li)
        reduced = probe_shuffled(bloom_prefilter(li, blob, "l_orderkey", m_bits=m, k=k))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    survivors = li.join(o, ["l_orderkey"], "left_semi").count()
    assert plain == li.count()  # every probe row shuffles without the filter
    assert survivors <= reduced  # no false negatives at the exchange either
    # ~20% true match rate + 1% fp headroom: the shuffle really shrank
    assert reduced < 0.5 * plain, (reduced, plain)


def test_fanout_is_the_only_text_exchange_in_q87(spark, sf_dir):
    """The registered q87 DOES repartition (doc_id, text) once — the
    documented fanout work-spreader, a no-op at real scale — and
    nothing else text-bearing."""
    stats = _shuffle_stats(QUERIES["q87_boilerplate_strip"](spark, sf_dir))
    text_bearing = [s for s in stats if "text#" in s[1]]
    assert len(text_bearing) <= 2  # the fanout exchange (+ its reuse)
    for part, _, _, _ in text_bearing:
        assert "doc_id#" in part  # the fanout's repartition key
