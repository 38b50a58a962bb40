"""End-to-end multimodal near-dup: the same grouping pipeline text
dedup uses (pairs → connected components → keep-first survivors),
fed by the MULTIMODAL fingerprint operators — DCT pHash across image
codecs and Haitsma-Kalker fingerprints across audio compression. The
pipeline must merge cross-codec duplicates into groups and keep
exactly one survivor per group, with distinct content untouched."""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.adpcm import pack_adpcm
from etfconstituentextractor_spark.operators.audio_fp import (
    audio_fingerprints,
    fingerprint_ber,
)
from etfconstituentextractor_spark.operators.components import connected_components
from etfconstituentextractor_spark.operators.jpeg import encode_jpeg
from etfconstituentextractor_spark.operators.media import pack_audio
from etfconstituentextractor_spark.operators.phash import phash_blobs, phash_pairs
from etfconstituentextractor_spark.operators.png import encode_png
from tests.test_audio_fp import _clip
from tests.test_phash import _photo, _wrap


def test_multimodal_groups_and_survivors(spark):
    # images: 1 & 2 are the SAME picture in different codecs; 3 differs
    img_a, img_b = _photo(seed=1), _photo(seed=9)
    image_rows = [
        (1, _wrap(encode_png(img_a))),
        (2, _wrap(encode_jpeg(img_a, quality=85))),
        (3, _wrap(encode_jpeg(img_b, quality=85))),
    ]
    # audio: 11 & 12 are the SAME clip raw vs ADPCM-compressed; 13 differs
    s_x, s_y = _clip(3), _clip(9)
    audio_rows = [
        (11, pack_audio(8000, 1, struct.pack(f"<{len(s_x)}h", *s_x))),
        (12, pack_adpcm(8000, s_x)),
        (13, pack_adpcm(8000, s_y)),
    ]

    img_df = spark.createDataFrame(image_rows, "doc_id bigint, blob binary")
    aud_df = spark.createDataFrame(audio_rows, "doc_id bigint, blob binary")

    img_pairs = phash_pairs(phash_blobs(img_df), max_hamming=8).select(
        "doc_a", "doc_b"
    )
    fps = audio_fingerprints(aud_df)
    a = fps.select(F.col("doc_id").alias("doc_a"), F.col("fingerprint").alias("fa"))
    b = fps.select(F.col("doc_id").alias("doc_b"), F.col("fingerprint").alias("fb"))
    aud_pairs = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("ber", fingerprint_ber("fa", "fb"))
        .filter(F.col("ber") < 0.25)
        .select("doc_a", "doc_b")
    )
    pairs = img_pairs.unionByName(aud_pairs)

    labels = connected_components(pairs, src="doc_a", dst="doc_b", shuffle_partitions=4)
    groups: dict[int, set[int]] = {}
    for r in labels.collect():
        groups.setdefault(r["component"], set()).add(r["node"])
    assert set(map(frozenset, groups.values())) == {
        frozenset({1, 2}),
        frozenset({11, 12}),
    }
    # keep-first survivors: the smallest id per group; distinct docs
    # (3, 13) never entered the pair graph and survive by absence
    survivors = {min(g) for g in groups.values()} | {3, 13}
    assert survivors == {1, 3, 11, 13}
