"""Streaming near-dup detection with a persistent LSH index —
q62's incremental leg turned into a continuously-running pipeline:
documents arrive as a stream, each micro-batch re-hashes ONLY its own
documents, probes the standing band index for collisions, emits the
near-dup pairs it introduces, and appends itself to the index.

This is the maintenance loop a 100 TB ingest actually runs (batch
backfill builds the index once; the stream keeps it current), and it
composes three existing proven pieces rather than new machinery:
``plans.llm_dedup._shingle_and_bands`` (the band build),
``plans.llm_dedup.lsh_incremental_pairs`` (delta-probe semantics,
property-tested against a full rebuild), and Structured Streaming's
``foreachBatch`` (insert-only state directories here; the keyed-
UPSERT variant of the pattern is proven separately in
tests/test_stateful_streaming.py).

State layout (plain parquet directories — swap for a table format
with atomic commits in production):
  <index_dir>/bands     (doc_id, band, sig)      — the probe target
  <index_dir>/shingles  (doc_id, shingles)       — for exact-Jaccard verify
  <pairs_dir>           (doc_a, doc_b, jaccard_sim, batch_id)

Exactly-once posture: re-delivered doc_ids are dropped via an
anti-join against the standing index (insert-only ingest — plain
parquet cannot retract a superseded signature, and a doubled doc
would fan out duplicate pairs through the verify joins; CDC updates
belong to the batch path or a transactional table). All three state
writes are idempotent per-batch OVERWRITE subdirectories committed
pairs → bands → shingles — the re-delivery anti-join keys on
shingles, the LAST write, so a crash at any point leaves the batch
fully re-processable and its retry overwrites rather than doubles. The invariant the test pins: after the
stream drains, the pair set equals the FULL-corpus batch build's —
every near-dup pair is found exactly once, at the arrival of its
LATER member, regardless of how documents were chunked into batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("sig", T.StringType()),
    ]
)
_SHINGLES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shingles", T.ArrayType(T.StringType())),
    ]
)


def _load_or_empty(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Empty frame ONLY when the index doesn't exist yet (first
    batch bootstrap). Any other read failure propagates: silently
    probing an EMPTY index after a transient IO error would drop all
    cross-batch pairs for the batch and then append it anyway —
    permanently violating the full-rebuild-equivalence invariant with
    no error surfaced. The state layout is per-batch subdirectories
    (ingest_batch=N); the partition column Spark appends on read is
    projected away."""
    import os

    if not os.path.isdir(path) or not any(
        e.name.startswith("ingest_batch=") for e in os.scandir(path)
    ):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(path).select(
        *[f.name for f in schema.fields]
    )


def lsh_index_batch_handler(index_dir: str, pairs_dir: str):
    """foreachBatch handler maintaining the LSH index.

    Batch work is |batch| shingle/hash cost + a broadcast probe of
    the standing index — never a rebuild. Returns the handler
    function for ``writeStream.foreachBatch``.
    """
    from etfconstituentextractor_spark.plans.llm_dedup import (
        _shingle_and_bands,
        lsh_incremental_pairs,
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # The standing index reloads from parquet each batch — an
        # in-memory union-of-checkpoints cache was MEASURED SLOWER
        # here (4.4s vs 3.6s per 2-batch drain): the state files are
        # tiny, OS-page-cached, and carry parquet stats, while the
        # growing union plan costs more to analyze and scan than the
        # re-read saves. Revisit only if state reads show up hot at
        # real index sizes.
        spark = batch_df.sparkSession
        docs = batch_df.select("doc_id", "text")
        base_sh = _load_or_empty(spark, f"{index_dir}/shingles", _SHINGLES_SCHEMA)
        base_bands = _load_or_empty(spark, f"{index_dir}/bands", _BANDS_SCHEMA)
        # INSERT-ONLY ingest: a re-delivered doc_id (retry, at-least-
        # once source) is dropped rather than appended — plain parquet
        # cannot retract the old bands/shingles, and a doubled doc
        # would fan out duplicate contradictory pairs through the
        # verify joins. CDC UPDATES belong to the batch path
        # (lsh_incremental_pairs over a snapshot_diff delta) or a
        # transactional table format with real upserts.
        docs = docs.join(
            base_sh.select("doc_id"), "doc_id", "left_anti"
        )
        # _shingle_and_bands fans out and checkpoints the shingle
        # stage itself; the BAND frame is additionally checkpointed
        # because its salt-hash + min derivation (the expensive part)
        # otherwise re-runs for each of its three consumers (probe
        # x-side, probe y-union, index append).
        sh_d, bands_d = _shingle_and_bands(docs)
        # LOAD-BEARING emptiness guard: a crash-retry of a FULLY
        # committed batch arrives with every doc already in the
        # shingle index — the anti-join empties it, and proceeding
        # would OVERWRITE the batch's committed pairs/bands with
        # empty partitions (observed in test_batch_retry_is_
        # idempotent). Checking the CHECKPOINTED shingle frame makes
        # the guard read materialized blocks instead of re-running
        # the anti-join the way a pre-build take(1) did. (A batch
        # whose every doc is sub-shingle-length also returns here:
        # with no shingles there is nothing to probe or append.)
        if not sh_d.take(1):
            return
        bands_d = bands_d.localCheckpoint()
        base_index = (base_sh, base_bands)
        pairs = lsh_incremental_pairs(None, docs, base_index=base_index, delta_index=(sh_d, bands_d))
        # Idempotent per-batch OVERWRITE subdirectories, in commit
        # order pairs -> bands -> shingles: the anti-join keys on
        # SHINGLES, which commit last, so a crash anywhere earlier
        # leaves the batch fully re-processable and the retry
        # overwrites (never doubles) whatever did land. batch_id /
        # ingest_batch come back as partition columns on read.
        # One file per state dir per batch: the frames carry the
        # fanout/checkpoint partitioning (up to a core-count of
        # near-empty partitions), and writing that width costs ~32
        # task commits per dir while making every later batch's base
        # read list dozens of KB-sized files (measured ~1s/drain).
        # A micro-batch delta is one file's worth of state by
        # construction; a deployment whose deltas outgrow that sizes
        # this by delta volume or runs the compaction operator
        # (operators/compaction.py) over the state dirs. pairs must
        # use repartition(1), NOT coalesce: its plan still contains
        # the probe + verify joins, and coalesce(1) would collapse
        # that whole computation into the single write task (the
        # replay.py:_write_chunk lesson — measured 3-4x on batch 0);
        # the two index frames are already checkpointed, so coalesce
        # there merely merges materialized partitions at write time.
        pairs.repartition(1).write.mode("overwrite").parquet(
            f"{pairs_dir}/batch_id={batch_id}"
        )
        bands_d.select("doc_id", "band", "sig").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/bands/ingest_batch={batch_id}")
        sh_d.select("doc_id", "shingles").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/shingles/ingest_batch={batch_id}")

    return handle


def stage_doc_chunks(
    docs: DataFrame,
    dest: str,
    n_chunks: int,
    chunk_of,
) -> str:
    """Write a (doc_id, text) frame as ``n_chunks`` single parquet
    files with strictly increasing mtimes (FileStreamSource orders
    micro-batches by modification time), ``chunk_of`` being an int
    Column in [0, n_chunks) assigning each doc its arrival batch.
    Returns ``dest``."""
    import os

    from etfconstituentextractor_spark.streaming.replay import _write_chunk

    os.makedirs(dest, exist_ok=True)
    base = 1_600_000_000.0
    for i in range(n_chunks):
        _write_chunk(docs.filter(chunk_of == i), dest, i, base + 10 * i)
    return dest


def run_stream_dedup(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain a parquet-file document stream (one file per micro-batch)
    through the index-maintenance loop until no files remain."""
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    q = (
        stream.writeStream.foreachBatch(lsh_index_batch_handler(index_dir, pairs_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
