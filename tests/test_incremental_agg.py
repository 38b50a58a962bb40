"""Incremental grouped-aggregate maintenance (operators/
incremental_agg.py): maintenance == recompute on micro-frames
covering every change kind, on the corpus-scale q86 fixture, and the
corrupt-base guard raises instead of rotting the view."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.incremental_agg import (
    apply_group_delta,
    cdc_group_delta,
)


def _agg(df):
    # COALESCE(.., 0): the operator's documented measure semantics
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.coalesce(F.expr("length(text)"), F.lit(0))).cast("bigint").alias("m"),
    )


def _maintained(spark, old_rows, new_rows):
    old = spark.createDataFrame(old_rows, "doc_id bigint, lang string, text string")
    new = spark.createDataFrame(new_rows, "doc_id bigint, lang string, text string")
    delta = cdc_group_delta(
        old, new, key_col="doc_id", group_col="lang", measure_expr="length(text)"
    )
    got = {
        r.lang: (r.n, r.m)
        for r in apply_group_delta(_agg(old), delta, group_col="lang").collect()
    }
    want = {r.lang: (r.n, r.m) for r in _agg(new).collect()}
    return got, want


def test_maintenance_equals_recompute_micro(spark):
    old = [
        (1, "en", "aaaa"),
        (2, "en", "bb"),
        (3, "de", "ccc"),
        (4, "fr", "dddd"),
        (5, "fr", "e"),
    ]
    new = [
        (1, "en", "aaaa"),          # untouched
        (2, "de", "bb"),            # group-moving update
        (3, "de", "cccccc"),        # measure update within group
        (5, "fr", "e"),             # untouched; doc 4 deleted
        (6, "zh", "ff"),            # insert into a NEW group
    ]
    got, want = _maintained(spark, old, new)
    assert got == want
    assert "zh" in got  # new group appears


def test_group_vanishes_when_count_hits_zero(spark):
    old = [(1, "en", "x"), (2, "de", "yy")]
    new = [(2, "de", "yy")]
    got, want = _maintained(spark, old, new)
    assert got == want and "en" not in got


def test_unchanged_contribution_is_not_a_change(spark):
    """A text revision that keeps length and lang contributes nothing:
    the delta frame must be EMPTY (aggregate-relevant CDC, not row
    CDC)."""
    old = spark.createDataFrame([(1, "en", "abcd")], "doc_id bigint, lang string, text string")
    new = spark.createDataFrame([(1, "en", "wxyz")], "doc_id bigint, lang string, text string")
    delta = cdc_group_delta(
        old, new, key_col="doc_id", group_col="lang", measure_expr="length(text)"
    )
    assert delta.count() == 0


def test_corrupt_base_raises(spark):
    old = spark.createDataFrame([(1, "en", "abc")], "doc_id bigint, lang string, text string")
    new = spark.createDataFrame([], "doc_id bigint, lang string, text string")
    delta = cdc_group_delta(
        old, new, key_col="doc_id", group_col="lang", measure_expr="length(text)"
    )
    bad_base = spark.createDataFrame([("en", 0, 0)], "lang string, n bigint, m bigint")
    with pytest.raises(Exception, match="negative"):
        apply_group_delta(bad_base, delta, group_col="lang").collect()


def test_maintenance_equals_recompute_on_corpus(spark, sf_dir):
    """The q86 fixture at corpus scale: v1 -> v2 with deletes,
    revisions, and keyed re-inserts; maintained aggregate must equal
    the recompute exactly."""
    from etfconstituentextractor_spark.sources.tables import load

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    v2 = (
        d.filter(F.col("doc_id") % 17 != 0)
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 13 == 0, F.concat("text", F.lit(" (rev2)"))).otherwise(
                F.col("text")
            ),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                "lang",
                F.concat(F.lit("fresh "), F.col("text")).alias("text"),
            )
        )
    )
    delta = cdc_group_delta(
        d, v2, key_col="doc_id", group_col="lang", measure_expr="length(text)"
    )
    got = {
        r.lang: (r.n, r.m)
        for r in apply_group_delta(_agg(d), delta, group_col="lang").collect()
    }
    want = {r.lang: (r.n, r.m) for r in _agg(v2).collect()}
    assert got == want and len(got) > 0
    # the CDC point — only changed keys contribute: the pre-aggregation
    # changed-key set is exactly deletes + contribution-changing
    # revisions + inserts, a strict minority of the corpus
    total = d.count()
    changed = (
        d.filter("doc_id % 17 = 0").count()                       # deleted
        + d.filter("doc_id % 17 != 0 AND doc_id % 13 = 0").count()  # revised (len changes)
        + d.filter("doc_id % 11 = 0").count()                     # inserted
    )
    assert 0 < changed < 0.5 * total


def test_null_group_is_one_group(spark):
    """A NULL group must maintain as ONE group (null-safe join), not
    split into a base row and a delta row."""
    old = [(1, None, "aa"), (2, None, "b"), (3, "en", "ccc")]
    new = [(1, None, "aaaa"), (3, "en", "ccc"), (4, None, "dd")]
    got, want = _maintained(spark, old, new)
    assert got == want
    assert None in got and got[None] == (2, 6)


def test_null_measure_counts_as_zero(spark):
    """Documented semantics: SUM(COALESCE(measure, 0)) — an all-NULL
    group maintains to 0 (matching the COALESCE recompute), and a
    NULL<->value flip IS a contribution change."""
    old = [(1, "xx", None), (2, "xx", None), (3, "en", "abc")]
    new = [(2, "xx", None), (3, "en", "abc"), (4, "xx", None), (5, "xx", "yy")]
    got, want = _maintained(spark, old, new)
    assert got == want
    assert got["xx"] == (3, 2)

    o = spark.createDataFrame([(1, "en", None)], "doc_id bigint, lang string, text string")
    n = spark.createDataFrame([(1, "en", "abc")], "doc_id bigint, lang string, text string")
    delta = cdc_group_delta(
        o, n, key_col="doc_id", group_col="lang", measure_expr="length(text)"
    )
    assert [(r.d_count, r.d_measure) for r in delta.collect()] == [(0, 3)]
