"""Streaming LSH index maintenance (streaming/dedup_index.py): after
draining a chunked document stream, the accumulated pair set must
EQUAL the full-corpus batch build's pairs — every near-dup found
exactly once, at the arrival of its later member, however the corpus
was chunked — and the standing index must equal the batch band
build."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etfconstituentextractor_spark.plans.llm_dedup import lsh_pairs
from etfconstituentextractor_spark.sources.tables import load
from etfconstituentextractor_spark.streaming.dedup_index import run_stream_dedup

N_CHUNKS = 3


@pytest.fixture(scope="module")
def drained(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_dedup")
    src = str(root / "src")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # deterministic chunking: doc_id mod N — near-dup family members
    # land in DIFFERENT chunks, so cross-batch probing is exercised
    for i in range(N_CHUNKS):
        (
            docs.filter(F.col("doc_id") % N_CHUNKS == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(root / f"stage{i}"))
        )
    # stage chunks as individual files in one source dir
    import glob
    import os
    import shutil

    os.makedirs(src, exist_ok=True)
    # FileStreamSource orders batches by modification TIME (path only
    # breaks ties) — pin strictly increasing mtimes so chunk i is
    # batch i, which the later-member assertion depends on
    base = 1_600_000_000
    for i in range(N_CHUNKS):
        part = glob.glob(str(root / f"stage{i}") + "/part-*.parquet")[0]
        dst = f"{src}/chunk_{i}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, times=(base + i * 10, base + i * 10))
    index_dir = str(root / "index")
    pairs_dir = str(root / "pairs")
    run_stream_dedup(spark, src, index_dir, pairs_dir, str(root / "ckpt"))
    return docs, index_dir, pairs_dir


def test_streamed_pairs_equal_full_batch_build(spark, drained):
    docs, _, pairs_dir = drained
    got_rows = spark.read.parquet(pairs_dir).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard_sim"] for r in got_rows}
    assert len(got) == len(got_rows), "a pair was emitted twice"
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard_sim"]
        for r in lsh_pairs(docs).collect()
    }
    assert got == want
    assert want, "corpus must contain near-dup pairs for this test to bite"


def test_pairs_found_at_later_members_batch(spark, drained):
    """Each pair's batch_id is the arrival batch of its LATER member
    under the doc_id%N chunking (batches arrive in chunk order)."""
    docs, _, pairs_dir = drained
    rows = spark.read.parquet(pairs_dir).collect()
    order = {}  # doc_id -> chunk index
    for r in docs.select("doc_id").collect():
        order[r["doc_id"]] = r["doc_id"] % N_CHUNKS
    for r in rows:
        assert r["batch_id"] == max(order[r["doc_a"]], order[r["doc_b"]]), r


def test_standing_index_matches_batch_band_build(spark, drained):
    from etfconstituentextractor_spark.plans.llm_dedup import _shingle_and_bands

    docs, index_dir, _ = drained
    _, bands = _shingle_and_bands(docs)
    want = {(r["doc_id"], r["band"], r["sig"]) for r in bands.collect()}
    got = {
        (r["doc_id"], r["band"], r["sig"])
        for r in spark.read.parquet(f"{index_dir}/bands").collect()
    }
    assert got == want


def test_batch_retry_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch may re-run a batch after a crash: re-invoking the
    handler with the same (batch_df, batch_id) must leave pairs and
    index state EXACTLY as a single run would — per-batch overwrite
    subdirectories, with the re-delivery anti-join dropping docs whose
    shingles already committed."""
    from etfconstituentextractor_spark.streaming.dedup_index import (
        lsh_index_batch_handler,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    index_dir, pairs_dir = str(tmp_path / "idx"), str(tmp_path / "pairs")
    handle = lsh_index_batch_handler(index_dir, pairs_dir)
    handle(b0, 0)
    handle(b0, 0)  # crash-retry of the SAME batch
    handle(b1, 1)
    handle(b1, 1)

    got_rows = spark.read.parquet(pairs_dir).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in got_rows}
    assert len(got) == len(got_rows), "retry doubled a pair"
    want = {(r["doc_a"], r["doc_b"]) for r in lsh_pairs(docs).collect()}
    assert got == want
    bands = spark.read.parquet(f"{index_dir}/bands").collect()
    assert len({(r["doc_id"], r["band"]) for r in bands}) == len(bands)
