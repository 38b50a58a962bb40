"""End-to-end corpus curation (pipeline/curation.py): the composed
quality → exact-dedup → near-dup-group → survivors plan, checked for
its pipeline-level invariants on the real corpus plus a planted
fixture where every verdict is known exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from etfconstituentextractor_spark.pipeline.curation import curate
from etfconstituentextractor_spark.plans.llm_dedup import lsh_pairs
from etfconstituentextractor_spark.sources.tables import load


def test_curate_invariants_on_corpus(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    audited = curate(docs)
    rows = audited.collect()

    # one auditable verdict per input document
    assert len(rows) == docs.count()
    assert {r.verdict for r in rows} <= {"kept", "quality", "exact_dup", "near_dup"}
    kept = [r for r in rows if r.verdict == "kept"]
    assert kept, "pipeline must keep something"

    # no two survivors share content
    hashes = [r.content_hash for r in kept]
    assert len(hashes) == len(set(hashes))

    # no two survivors form a verified near-dup pair
    kept_df = audited.filter(F.col("verdict") == "kept").select("doc_id")
    pairs = lsh_pairs(
        docs.join(kept_df, "doc_id", "left_semi").select("doc_id", "text")
    )
    assert pairs.count() == 0

    # every exact_dup names a smaller-id doc with identical content
    by_hash = {}
    for r in rows:
        by_hash.setdefault(r.content_hash, []).append(r)
    for r in rows:
        if r.verdict == "exact_dup":
            assert any(
                o.doc_id < r.doc_id and o.quality_pass for o in by_hash[r.content_hash]
            )


def test_curate_planted_fixture(spark):
    """Hand-built corpus where each gate fires on a known doc:
    - 1/2 identical quality text -> 2 is exact_dup;
    - 3 near-identical to 1 (one token changed) -> near_dup of 1;
    - 4 too short -> quality;
    - 5 long but stopword-free -> quality;
    - 6 unrelated good text -> kept."""
    base = "the quick brown fox jumps over a lazy dog and the dog is of sound mind " * 3
    near = base.replace("sound", "curious", 1)
    rows = [
        (1, base),
        (2, base),
        (3, near),
        (4, "too short"),
        (5, "lorem ipsum dolor sit amet " * 10),
        (6, "every engine needs a second corpus and this is it with the usual words " * 3),
    ]
    audited = curate(spark.createDataFrame(rows, "doc_id bigint, text string"))
    verdicts = {r.doc_id: r.verdict for r in audited.collect()}
    assert verdicts == {
        1: "kept",
        2: "exact_dup",
        3: "near_dup",
        4: "quality",
        5: "quality",
        6: "kept",
    }


def test_curate_contamination_and_mixture_gates(spark):
    """Full-pipeline fixture with the optional gates on:
    - 6 and 8 are verbatim copies of a benchmark doc -> both
      'contaminated' (precedence beats exact_dup: neither may survive
      as the pair's representative);
    - 7 is clean and unique but its stratum's mix rate is 0.0 ->
      'downsampled';
    - the q60/q62 verdicts from the base fixture are unchanged."""
    base = "the quick brown fox jumps over a lazy dog and the dog is of sound mind " * 3
    near = base.replace("sound", "curious", 1)
    bench = "every engine needs a second corpus and this is it with the usual words " * 3
    rows = [
        (1, base, "y"),
        (2, base, "y"),
        (3, near, "y"),
        (4, "too short", "y"),
        (5, "lorem ipsum dolor sit amet " * 10, "y"),
        (6, bench, "y"),
        (7, "a third corpus of the usual words that is not like the others at all " * 3, "x"),
        (8, bench, "y"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    eval_docs = spark.createDataFrame([(100, bench)], "doc_id bigint, text string")
    audited = curate(
        docs,
        eval_docs=eval_docs,
        contaminated_at=3,
        mix_rates={"y": 1.0, "x": 0.0},
        strat_col="lang",
    )
    verdicts = {r.doc_id: r.verdict for r in audited.collect()}
    assert verdicts == {
        1: "kept",
        2: "exact_dup",
        3: "near_dup",
        4: "quality",
        5: "quality",
        6: "contaminated",
        7: "downsampled",
        8: "contaminated",
    }


def test_write_survivors_partitioned_layout(spark, sf_dir, tmp_path):
    """The save stage writes one directory per stratum containing
    exactly the kept documents, readable back with partition pruning
    (the R22 one-file-per-date semantic, distributed)."""
    import os

    from etfconstituentextractor_spark.pipeline.curation import write_survivors
    from etfconstituentextractor_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    audited = curate(docs)
    out = str(tmp_path / "survivors")
    write_survivors(audited, docs, out, partition_by="lang")

    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert dirs == {f"lang={lg}" for lg in langs}

    back = spark.read.parquet(out)
    kept_ids = {
        r.doc_id for r in audited.filter(F.col("verdict") == "kept").collect()
    }
    assert {r.doc_id for r in back.collect()} == kept_ids
    # partition pruning: a one-language read must scan one directory
    one = back.filter(F.col("lang") == sorted(langs)[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
