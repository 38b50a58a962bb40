"""Streaming LSH index maintenance (streaming/dedup_index.py): after
draining a chunked document stream, the accumulated pair set must
EQUAL the full-corpus batch build's pairs — every near-dup found
exactly once, at the arrival of its later member, however the corpus
was chunked — and the standing index must equal the batch band
build. Round 9 folded the per-batch state into ONE
partitionBy("kind") commit; the retry test exercises the new
invariant (a batch derives only from ingest_batch < batch_id, then
statically overwrites its own directory)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etfconstituentextractor_spark.plans.llm_dedup import lsh_pairs
from etfconstituentextractor_spark.sources.tables import load
from etfconstituentextractor_spark.streaming.dedup_index import (
    read_bands,
    read_pairs,
    run_stream_dedup,
)

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
    state_dir = str(root / "state")
    run_stream_dedup(spark, src, state_dir, str(root / "ckpt"))
    return docs, state_dir


def test_streamed_pairs_equal_full_batch_build(spark, drained):
    docs, state_dir = drained
    got_rows = read_pairs(spark, state_dir).collect()
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
    docs, state_dir = drained
    rows = read_pairs(spark, state_dir).collect()
    order = {}  # doc_id -> chunk index
    for r in docs.select("doc_id").collect():
        order[r["doc_id"]] = r["doc_id"] % N_CHUNKS
    for r in rows:
        assert r["batch_id"] == max(order[r["doc_a"]], order[r["doc_b"]]), r


def test_standing_index_matches_batch_band_build(spark, drained):
    from etfconstituentextractor_spark.plans.llm_dedup import _shingle_and_bands

    docs, state_dir = drained
    _, bands = _shingle_and_bands(docs)
    want = {(r["doc_id"], r["band"], r["sig"]) for r in bands.collect()}
    got = {
        (r["doc_id"], r["band"], r["sig"])
        for r in read_bands(spark, state_dir).collect()
    }
    assert got == want


def test_one_commit_per_batch_layout(spark, drained):
    """The round-9 fold: each batch commits exactly one parquet file
    per kind under its own ingest_batch=N/kind=... directory (one
    write job, three partition dirs), and _SUCCESS markers sit at the
    batch level — not three independent job commits."""
    import glob
    import os

    _, state_dir = drained
    batch_dirs = sorted(glob.glob(f"{state_dir}/ingest_batch=*"))
    assert len(batch_dirs) == N_CHUNKS
    for b in batch_dirs:
        kinds = sorted(
            e.name for e in os.scandir(b) if e.name.startswith("kind=")
        )
        # pairs kind may be absent for a batch that introduced none —
        # but bands+shingles always land, and batch 0 has no pairs dir
        # only if the first chunk contains no intra-chunk near-dups
        assert "kind=bands" in kinds and "kind=shingles" in kinds
        for k in kinds:
            files = glob.glob(f"{b}/{k}/part-*.parquet")
            assert len(files) == 1, (b, k, files)
        # ONE job commit per batch: a single _SUCCESS at the batch root
        assert os.path.exists(f"{b}/_SUCCESS")


def test_batch_retry_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch may re-run a batch after a crash: re-invoking the
    handler with the same (batch_df, batch_id) must leave pairs and
    index state EXACTLY as a single run would — the batch derives
    only from ingest_batch < batch_id, so the retry recomputes the
    identical output and statically overwrites its own directory."""
    from etfconstituentextractor_spark.streaming.dedup_index import (
        lsh_index_batch_handler,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    state_dir = str(tmp_path / "state")
    handle = lsh_index_batch_handler(state_dir)
    handle(b0, 0)
    handle(b0, 0)  # crash-retry of the SAME batch
    handle(b1, 1)
    handle(b1, 1)

    got_rows = read_pairs(spark, state_dir).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in got_rows}
    assert len(got) == len(got_rows), "retry doubled a pair"
    want = {(r["doc_a"], r["doc_b"]) for r in lsh_pairs(docs).collect()}
    assert got == want
    bands = read_bands(spark, state_dir).collect()
    assert len({(r["doc_id"], r["band"]) for r in bands}) == len(bands)


def test_redelivery_under_new_batch_id_is_dropped(spark, sf_dir, tmp_path):
    """An at-least-once source may re-deliver committed docs under a
    NEW batch_id: the anti-join against earlier batches' shingles must
    drop them (no doubled index rows, no duplicate pairs), and the
    empty remainder must NOT truncate anything."""
    from etfconstituentextractor_spark.streaming.dedup_index import (
        lsh_index_batch_handler,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    state_dir = str(tmp_path / "state")
    handle = lsh_index_batch_handler(state_dir)
    handle(b0, 0)
    before = {(r["doc_a"], r["doc_b"]) for r in read_pairs(spark, state_dir).collect()}
    handle(b0, 1)  # full re-delivery as a new batch
    after_rows = read_pairs(spark, state_dir).collect()
    after = {(r["doc_a"], r["doc_b"]) for r in after_rows}
    assert len(after) == len(after_rows), "re-delivery doubled a pair"
    assert after == before
    bands = read_bands(spark, state_dir).collect()
    assert len({(r["doc_id"], r["band"]) for r in bands}) == len(bands)


def test_load_state_rejects_nonlocal_scheme(spark):
    """Round-10 advice regression: _load_state's first-batch-bootstrap
    detection is os.path-based, so with an hdfs:// (or any non-file)
    state_dir it returns None FOREVER — every batch silently probes an
    empty index and appends anyway, the exact invariant violation the
    docstring says must propagate. Non-local schemes must raise until
    the checks go through the Hadoop FileSystem API; file:// is the
    local filesystem and keeps working."""
    from etfconstituentextractor_spark.streaming.dedup_index import (
        _load_state,
        _require_local,
    )

    for uri in ("hdfs://nn:8020/state", "s3a://bucket/state", "abfss://c@a/state"):
        with pytest.raises(NotImplementedError, match="local"):
            _load_state(spark, uri)
        with pytest.raises(NotImplementedError, match="local"):
            read_pairs(spark, uri)
    # file: strips to the local path — including the single-slash
    # 'file:/x' form Hadoop Path.toString emits (round-10 review: a
    # '://'-only regex passed it through unstripped, reinstating the
    # silent empty-bootstrap); a missing dir is still the legitimate
    # first-batch bootstrap (None), not an error
    assert _load_state(spark, "file:///nonexistent/etfce-dedup-state") is None
    assert _require_local("file:///tmp/x", "t") == "/tmp/x"
    assert _require_local("file:/tmp/x", "t") == "/tmp/x"
    # percent-encoded URIs decode (Hadoop URIs encode spaces; an
    # undecoded path fails os.path existence forever — max review)
    assert _require_local("file:/tmp/dedup%20state", "t") == "/tmp/dedup state"
    assert _require_local("file://localhost/tmp/x", "t") == "/tmp/x"
    with pytest.raises(NotImplementedError, match="authority"):
        _require_local("file://otherhost/tmp/x", "t")
    assert _require_local("/plain/path", "t") == "/plain/path"
    assert _require_local("relative/path", "t") == "relative/path"


def test_stage_doc_chunks_refuses_split_task_output(spark, tmp_path):
    """Round-10 advice regression: stage_doc_chunks assumes each
    chunk dir holds exactly ONE part file (repartition(n, "chunk") =
    one task per chunk). spark.sql.files.maxRecordsPerFile splits a
    task's output into many files; silently moving one would DROP
    documents and moving all would change the micro-batch count — the
    failure must be a loud error naming the assumption, not an opaque
    unpack ValueError."""
    from etfconstituentextractor_spark.streaming.dedup_index import stage_doc_chunks

    docs = spark.range(20).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("doc "), F.col("id")).alias("text")
    )
    prev = spark.conf.get("spark.sql.files.maxRecordsPerFile", None)
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "3")
    try:
        with pytest.raises(RuntimeError, match="maxRecordsPerFile"):
            stage_doc_chunks(docs, str(tmp_path / "dst"), 2, F.col("doc_id") % 2)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.files.maxRecordsPerFile")
        else:
            spark.conf.set("spark.sql.files.maxRecordsPerFile", prev)
