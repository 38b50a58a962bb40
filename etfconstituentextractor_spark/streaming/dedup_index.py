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
``foreachBatch`` (the keyed-upsert sink pattern proven in
tests/test_stateful_streaming.py).

State layout (plain parquet directories — swap for a table format
with atomic commits in production):
  <index_dir>/bands     (doc_id, band, sig)      — the probe target
  <index_dir>/shingles  (doc_id, shingles)       — for exact-Jaccard verify
  <pairs_dir>           (doc_a, doc_b, jaccard_sim, batch_id)

Exactly-once caveat (documented, inherent to foreachBatch + plain
parquet): a batch retried after a mid-write crash can append twice;
production pins idempotency by writing per-(batch_id) subdirectories
or a transactional table. The invariant the test pins: after the
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
    try:
        return spark.read.schema(schema).parquet(path)
    except Exception:
        return spark.createDataFrame([], schema)


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
        spark = batch_df.sparkSession
        docs = batch_df.select("doc_id", "text")
        if not docs.take(1):
            return
        sh_d, bands_d = _shingle_and_bands(docs)
        base_index = (
            _load_or_empty(spark, f"{index_dir}/shingles", _SHINGLES_SCHEMA),
            _load_or_empty(spark, f"{index_dir}/bands", _BANDS_SCHEMA),
        )
        pairs = lsh_incremental_pairs(None, docs, base_index=base_index, delta_index=(sh_d, bands_d))
        (
            pairs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(pairs_dir)
        )
        bands_d.select("doc_id", "band", "sig").write.mode("append").parquet(
            f"{index_dir}/bands"
        )
        sh_d.select("doc_id", "shingles").write.mode("append").parquet(
            f"{index_dir}/shingles"
        )

    return handle


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
