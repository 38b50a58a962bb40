"""SCD2 history build (operators/scd2.py): gaps-and-islands interval
semantics hand-checked on a toy version sequence (insert, update,
delete, delete+re-insert, multi-revision), hash-framing agreement
with snapshot_diff, guards, and the narrow-shuffle plan posture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.scd2 import scd2_history
from etfconstituentextractor_spark.operators.snapshot_diff import snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k int, payload string")


@pytest.fixture(scope="module")
def toy(spark):
    # k=1 stable; k=2 revised in v2; k=3 deleted after v1;
    # k=4 deleted after v1, re-inserted (same content!) in v3;
    # k=5 revised every version; k=6 born in v3.
    v1 = _snap(spark, [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e1")])
    v2 = _snap(spark, [(1, "a"), (2, "b2"), (5, "e2")])
    v3 = _snap(spark, [(1, "a"), (2, "b2"), (4, "d"), (5, "e3"), (6, "f")])
    return v1, v2, v3


def test_scd2_intervals_hand_checked(spark, toy):
    v1, v2, v3 = toy
    out = scd2_history([(1, v1), (2, v2), (3, v3)], keys=["k"]).collect()
    got = {
        (r["k"], r["valid_from"]): (r["valid_to"], r["is_current"]) for r in out
    }
    assert got == {
        (1, 1): (3, True),     # stable across all versions
        (2, 1): (1, False),    # 'b' closed by the v2 revision
        (2, 2): (3, True),     # 'b2' current
        (3, 1): (1, False),    # deleted, never returns
        (4, 1): (1, False),    # identical content, but the absence
        (4, 3): (3, True),     #   gap still splits the interval
        (5, 1): (1, False),
        (5, 2): (2, False),
        (5, 3): (3, True),     # one interval per revision
        (6, 3): (3, True),     # late insert
    }
    assert len(out) == len(got)


def test_scd2_hash_framing_matches_snapshot_diff(spark, toy):
    """The two CDC operators must agree on content identity: an scd2
    interval's row_hash for a key equals the hash snapshot_diff
    computes for the same row."""
    v1, v2, _ = toy
    d_hash = {
        r["k"]: r["old_hash"]
        for r in snapshot_diff(v1, v2, keys=["k"]).collect()
        if r["old_hash"] is not None
    }
    s_hash = {
        (r["k"], r["valid_from"]): r["row_hash"]
        for r in scd2_history([(1, v1), (2, v2)], keys=["k"]).collect()
    }
    for k, h in d_hash.items():
        assert s_hash[(k, 1)] == h


def test_scd2_null_payload_distinct_from_absent(spark):
    """A NULL compared column is a VALUE (sentinel-framed), not an
    absent row: transitioning 'x' -> NULL opens a new interval."""
    v1 = _snap(spark, [(1, "x")])
    v2 = _snap(spark, [(1, None)])
    out = sorted(
        scd2_history([(1, v1), (2, v2)], keys=["k"]).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [(r["valid_from"], r["valid_to"], r["is_current"]) for r in out] == [
        (1, 1, False),
        (2, 2, True),
    ]
    assert out[0]["row_hash"] != out[1]["row_hash"]


def test_scd2_guards(spark, toy):
    v1, v2, _ = toy
    with pytest.raises(ValueError, match="at least one"):
        scd2_history([], keys=["k"])
    with pytest.raises(ValueError, match="duplicate"):
        scd2_history([(1, v1), (1, v2)], keys=["k"])
    with pytest.raises(ValueError, match="no columns"):
        scd2_history([(1, v1.select("k"))], keys=["k"])


def test_scd2_shuffles_hashes_only(spark, toy):
    """The exchange must carry (key, version, 32-byte hash) — never
    the payload column — and no Python appears anywhere."""
    v1, v2, v3 = toy
    plan = (
        scd2_history([(1, v1), (2, v2), (3, v3)], keys=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "payload" not in plan.split("Exchange hashpartitioning", 1)[1].split("\n")[0]
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
