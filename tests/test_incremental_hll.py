"""operators/incremental_hll.py — distinct-count MV maintenance
through a CDC feed: the maintained register state must equal a full
recompute REGISTER-FOR-REGISTER (stronger than estimate equality),
across insert-only and mixed update/delete/group-moving histories."""

from __future__ import annotations

from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.hll import (
    hll_distinct,
    hll_finalize,
    hll_registers,
)
from etfconstituentextractor_spark.operators.incremental_hll import (
    hll_cdc_maintain,
    hll_merge_registers,
)
from etfconstituentextractor_spark.sources.snapshot_table import (
    snapshot_changes,
    snapshot_commit,
    snapshot_delete,
    snapshot_merge,
    snapshot_read,
)

P = 6  # small registers so collisions/buckets actually collide


def _regs_set(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def _v0(spark, tmp_path):
    t = str(tmp_path / "tbl")
    rows = [(i, ["en", "de", "fr"][i % 3], f"val{i % 17}") for i in range(60)]
    snapshot_commit(
        spark.createDataFrame(rows, "id bigint, lang string, token string"),
        t,
        mode="overwrite",
        stats_cols=["id"],
    )
    return t


def test_merge_registers_equals_union_build(spark):
    rows = [(i % 4, f"v{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "g int, x string")
    a, b = df.filter("x < 'v5'"), df.filter("x >= 'v5'")
    merged = hll_merge_registers(
        hll_registers(a, ["g"], "x", P), hll_registers(b, ["g"], "x", P), ["g"]
    )
    assert _regs_set(merged) == _regs_set(hll_registers(df, ["g"], "x", P))


def test_insert_only_maintenance_is_exact(spark, tmp_path):
    t = _v0(spark, tmp_path)
    new = spark.createDataFrame(
        [(100 + i, "en", f"fresh{i}") for i in range(9)],
        "id bigint, lang string, token string",
    )
    snapshot_commit(new, t, mode="append")
    state0 = hll_registers(snapshot_read(spark, t, 0), ["lang"], "token", P)
    feed = snapshot_changes(spark, t, 0, 1, keys=["id"], include_values=True)
    state1 = hll_cdc_maintain(
        state0,
        feed,
        snapshot_read(spark, t, 0),
        snapshot_read(spark, t, 1),
        keys=["id"],
        group_cols=["lang"],
        value_col="token",
        p=P,
    )
    expect = hll_registers(snapshot_read(spark, t, 1), ["lang"], "token", P)
    assert _regs_set(state1) == _regs_set(expect)


def test_mixed_feed_maintenance_matches_recompute(spark, tmp_path):
    t = _v0(spark, tmp_path)
    # updates that REVISE tokens, an update that MOVES a row between
    # groups (lang change — dirties both old and new group), inserts,
    # and deletes that empty no group but shrink several
    src = spark.createDataFrame(
        [
            (3, "en", "revised3"),
            (6, "de", "val6"),  # id 6 moves lang en -> de
            (200, "fr", "fresh200"),
        ],
        "id bigint, lang string, token string",
    )
    snapshot_merge(src, t, key="id")
    snapshot_delete(spark, t, where=("id", "<", 2))
    state = hll_registers(snapshot_read(spark, t, 0), ["lang"], "token", P)
    for v in (1, 2):
        feed = snapshot_changes(spark, t, v - 1, v, keys=["id"], include_values=True)
        state = hll_cdc_maintain(
            state,
            feed,
            snapshot_read(spark, t, v - 1),
            snapshot_read(spark, t, v),
            keys=["id"],
            group_cols=["lang"],
            value_col="token",
            p=P,
        ).localCheckpoint()
    expect = hll_registers(snapshot_read(spark, t, 2), ["lang"], "token", P)
    assert _regs_set(state) == _regs_set(expect)
    # and the finalized estimates agree with the one-shot sketch
    est_m = hll_finalize(state, ["lang"], P)
    est_f = hll_distinct(snapshot_read(spark, t, 2), ["lang"], "token", P)
    assert _regs_set(est_m) == _regs_set(est_f)


def test_fully_deleted_group_drops_from_state(spark, tmp_path):
    t = str(tmp_path / "tbl")
    rows = [(1, "solo", "a"), (2, "solo", "b"), (3, "big", "c"), (4, "big", "d")]
    snapshot_commit(
        spark.createDataFrame(rows, "id bigint, lang string, token string"),
        t,
        mode="overwrite",
    )
    snapshot_delete(spark, t, where=("id", "<=", 2))  # all of group 'solo'
    state0 = hll_registers(snapshot_read(spark, t, 0), ["lang"], "token", P)
    feed = snapshot_changes(spark, t, 0, 1, keys=["id"], include_values=True)
    state1 = hll_cdc_maintain(
        state0,
        feed,
        snapshot_read(spark, t, 0),
        snapshot_read(spark, t, 1),
        keys=["id"],
        group_cols=["lang"],
        value_col="token",
        p=P,
    )
    assert [r["lang"] for r in state1.select("lang").distinct().collect()] == ["big"]


def test_null_group_maintenance_is_exact(spark, tmp_path):
    """Round-11 review: NULL is a real group — dirty-group joins must
    be null-SAFE or a dirty NULL group strands stale registers, and
    the register merge must not duplicate NULL-group buckets."""
    t = str(tmp_path / "tbl")
    rows = [(1, None, "a"), (2, None, "b"), (3, "en", "c"), (4, None, "d")]
    snapshot_commit(
        spark.createDataFrame(rows, "id bigint, lang string, token string"),
        t,
        mode="overwrite",
    )
    # delete one NULL-group row, update another, insert a fresh one
    snapshot_merge(
        spark.createDataFrame(
            [(2, None, "b-rev"), (9, None, "fresh")],
            "id bigint, lang string, token string",
        ),
        t,
        key="id",
    )
    snapshot_delete(spark, t, where=("id", "=", 1))
    state = hll_registers(snapshot_read(spark, t, 0), ["lang"], "token", P)
    for v in (1, 2):
        feed = snapshot_changes(spark, t, v - 1, v, keys=["id"], include_values=True)
        state = hll_cdc_maintain(
            state,
            feed,
            snapshot_read(spark, t, v - 1),
            snapshot_read(spark, t, v),
            keys=["id"],
            group_cols=["lang"],
            value_col="token",
            p=P,
        ).localCheckpoint()
    expect = hll_registers(snapshot_read(spark, t, 2), ["lang"], "token", P)
    assert _regs_set(state) == _regs_set(expect)


def test_null_key_feed_rows_are_dropped(spark, tmp_path):
    """Round-12 advice: snapshot_diff emits phantom inserted+deleted
    pairs for null-KEYED rows (keys, not groups), and the dirty-key
    semi-joins use null-rejecting equality — such rows must be
    filtered out of the feed, mirroring snapshot_replicate. The
    maintained state over the non-null-keyed rows stays exact."""
    t = str(tmp_path / "tbl")
    rows = [(1, "en", "a"), (None, "en", "ghost"), (2, "de", "b")]
    snapshot_commit(
        spark.createDataFrame(rows, "id bigint, lang string, token string"),
        t,
        mode="overwrite",
    )
    # v1: overwrite that revises the null-keyed row's token (its
    # change surfaces in the diff ONLY as a NULL-key phantom pair)
    # and updates a real key
    snapshot_commit(
        spark.createDataFrame(
            [(1, "en", "a2"), (None, "en", "ghost2"), (2, "de", "b")],
            "id bigint, lang string, token string",
        ),
        t,
        mode="overwrite",
    )
    state0 = hll_registers(snapshot_read(spark, t, 0), ["lang"], "token", P)
    feed = snapshot_changes(spark, t, 0, 1, keys=["id"], include_values=True)
    # the phantom pair is present in the raw feed...
    assert feed.filter(F.col("id").isNull()).count() > 0
    state1 = hll_cdc_maintain(
        state0,
        feed,
        snapshot_read(spark, t, 0),
        snapshot_read(spark, t, 1),
        keys=["id"],
        group_cols=["lang"],
        value_col="token",
        p=P,
    )
    # ...but maintenance neither crashes nor churns: id=1's group
    # rebuilt (token a->a2 visible), and the result equals a full
    # recompute over v1 (the null-keyed row's values enter via the
    # dirty-group REBUILD from `current`, which reads the table, not
    # the feed — so the estimate stays exact even for its group)
    expect = hll_registers(snapshot_read(spark, t, 1), ["lang"], "token", P)
    assert _regs_set(state1) == _regs_set(expect)
