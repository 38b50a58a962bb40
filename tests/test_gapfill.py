"""operators/gapfill.py — dense-axis gap filling: LOCF + linear
interpolation edge semantics, hand-checked against a fixture series
(the q42 'gapfill' leg pins the distributed == DuckDB identity; these
pin the CONTRACT: no extrapolation, leading/trailing edges, exact
interpolation arithmetic)."""

from __future__ import annotations

import pyspark.sql.functions as F

from etfconstituentextractor_spark.operators.gapfill import gapfill


def _fixture(spark):
    # key "a": observed at buckets 2 (10.0) and 5 (40.0) → interior
    #          gaps at 3, 4; leading gap at 0-1; trailing gap at 6-7.
    # key "b": single observation at bucket 7 (5.0) → everything
    #          before is leading (locf NULL, interp NULL).
    # Global axis: [0, 7] (min/max over ALL keys).
    rows = [("a", 2, 10.0), ("a", 5, 40.0), ("b", 7, 5.0), ("b", 0, 1.0)]
    return spark.createDataFrame(rows, "k string, b int, v double")


def test_gapfill_dense_axis_and_flags(spark):
    out = gapfill(_fixture(spark), key_col="k", bucket_col="b", value_col="v")
    rows = {(r["k"], r["b"]): r for r in out.collect()}
    # dense: every key gets every bucket of the global range
    assert len(rows) == 2 * 8
    assert rows[("a", 2)]["gap"] is False and rows[("a", 3)]["gap"] is True
    # observed rows carry their value in all three columns
    r = rows[("a", 2)]
    assert r["v_obs"] == r["v_locf"] == r["v_interp"] == 10.0


def test_gapfill_locf_carries_forward_never_backward(spark):
    out = gapfill(_fixture(spark), key_col="k", bucket_col="b", value_col="v")
    rows = {(r["k"], r["b"]): r for r in out.collect()}
    # leading edge: nothing observed yet → NULL
    assert rows[("a", 0)]["v_locf"] is None
    assert rows[("a", 1)]["v_locf"] is None
    # interior + trailing: last observation carries forward
    assert rows[("a", 3)]["v_locf"] == 10.0
    assert rows[("a", 4)]["v_locf"] == 10.0
    assert rows[("a", 6)]["v_locf"] == 40.0
    assert rows[("a", 7)]["v_locf"] == 40.0


def test_gapfill_interpolation_exact_and_no_extrapolation(spark):
    out = gapfill(_fixture(spark), key_col="k", bucket_col="b", value_col="v")
    rows = {(r["k"], r["b"]): r for r in out.collect()}
    # interior: linear between (2, 10.0) and (5, 40.0)
    assert rows[("a", 3)]["v_interp"] == 20.0
    assert rows[("a", 4)]["v_interp"] == 30.0
    # edges: either endpoint missing → NULL, never extrapolated
    assert rows[("a", 0)]["v_interp"] is None
    assert rows[("a", 7)]["v_interp"] is None
    # key "b": between (0, 1.0) and (7, 5.0) — fractional slope
    assert rows[("b", 1)]["v_interp"] == round(1.0 + 4.0 * (1 / 7), 9)
    assert rows[("b", 6)]["v_interp"] == round(1.0 + 4.0 * (6 / 7), 9)


def test_q42_gapfill_leg_slice_stays_sparse(spark, sf_dir):
    """Tripwire: the q42 leg only demonstrates gap filling while the
    user_id % 997 slice actually leaves gaps — a corpus refresh that
    densifies it should fail HERE, not silently weaken the leg."""
    from etfconstituentextractor_spark.plans.registry import QUERIES, load_catalog

    load_catalog()
    gf = QUERIES["q42_window_trailing_range"](spark, sf_dir).filter(
        F.col("leg") == "gapfill"
    )
    agg = gf.agg(
        F.sum(F.col("gap").cast("int")).alias("gaps"),
        F.sum((F.col("gap") & F.col("v_interp").isNotNull()).cast("int")).alias(
            "interior"
        ),
        F.sum((F.col("gap") & F.col("v_locf").isNull()).cast("int")).alias("leading"),
    ).first()
    assert agg["gaps"] > 0, "slice produced a dense series — no gaps to fill"
    assert agg["interior"] > 0, "no interior gaps — interpolation path unexercised"
    assert agg["leading"] > 0, "no leading edges — the NULL-edge path unexercised"


def test_gapfill_per_key_bounds_stays_inside_each_keys_life(spark):
    """Round-12 verdict nit: bounds='per_key' densifies each key only
    over ITS OWN observed [min, max] — a short-lived key emits no
    rows outside its range (the global mode stays the oracle-checked
    default)."""
    import pytest

    out = gapfill(
        _fixture(spark), key_col="k", bucket_col="b", value_col="v",
        bounds="per_key",
    )
    rows = {(r["k"], r["b"]): r for r in out.collect()}
    # key "a" lives [2, 5] -> 4 rows; key "b" lives [0, 7] -> 8 rows
    assert len(rows) == 4 + 8
    assert {b for (k, b) in rows if k == "a"} == {2, 3, 4, 5}
    # fills agree with the global mode on the shared buckets
    g = {
        (r["k"], r["b"]): r
        for r in gapfill(
            _fixture(spark), key_col="k", bucket_col="b", value_col="v"
        ).collect()
    }
    for kk in rows:
        assert rows[kk]["v_locf"] == g[kk]["v_locf"]
        assert rows[kk]["v_interp"] == g[kk]["v_interp"]
        assert rows[kk]["gap"] == g[kk]["gap"]
    # per-key mode has no leading/trailing edge rows at all: every
    # locf is non-NULL (the range starts at an observation)
    assert all(r["v_locf"] is not None for r in rows.values())
    # round 13: per_key_view derives the SAME result from the global
    # fill (one fill pass serves both legs — the q42 wiring)
    from etfconstituentextractor_spark.operators.gapfill import per_key_view

    filled = gapfill(
        _fixture(spark), key_col="k", bucket_col="b", value_col="v"
    ).localCheckpoint()
    derived = {
        (r["k"], r["b"]): r
        for r in per_key_view(filled, key_col="k", bucket_col="b").collect()
    }
    assert set(derived) == set(rows)
    for kk in rows:
        for c in ("v_obs", "gap", "v_locf", "v_interp"):
            assert derived[kk][c] == rows[kk][c], (kk, c)
    with pytest.raises(ValueError, match="per_key"):
        gapfill(_fixture(spark), key_col="k", bucket_col="b", value_col="v",
                bounds="weekly")


def test_gapfill_null_valued_edge_observation_keeps_per_key_equivalence(spark):
    """Round-14 advice: ``gap`` means "no usable VALUE", which also
    flags NULL-valued observations — per_key_view's bounds used to
    come from ~gap, so a key whose edge (or only) observation carried
    a NULL value derived a narrower (or empty) view than the direct
    bounds='per_key' mode, whose axis counts every observation ROW.
    The output now carries ``observed`` (row presence, independent of
    value nullness) and the view derives its bounds from it — the
    documented equivalence holds for NULL-valued observations too."""
    from etfconstituentextractor_spark.operators.gapfill import per_key_view

    rows = [
        # key "a": NULL-valued observations at BOTH edges (buckets 1
        # and 6), real values inside — the advice's exact hazard
        ("a", 1, None), ("a", 3, 10.0), ("a", 4, 20.0), ("a", 6, None),
        # key "c": its ONLY observation is NULL-valued — the derived
        # view used to come out EMPTY for it
        ("c", 2, None),
        # key "d": spans the global range so the axis is [1, 6]
        ("d", 1, 1.0), ("d", 6, 6.0),
    ]
    series = spark.createDataFrame(rows, "k string, b int, v double")
    direct = {
        (r["k"], r["b"]): r
        for r in gapfill(
            series, key_col="k", bucket_col="b", value_col="v",
            bounds="per_key",
        ).collect()
    }
    # direct mode: "a" lives [1, 6] (NULL edges count), "c" lives [2, 2]
    assert {b for (k, b) in direct if k == "a"} == {1, 2, 3, 4, 5, 6}
    assert {b for (k, b) in direct if k == "c"} == {2}
    # observed vs gap: they differ exactly on NULL-valued observations
    assert direct[("a", 1)]["observed"] is True
    assert direct[("a", 1)]["gap"] is True  # no usable value
    assert direct[("a", 2)]["observed"] is False
    assert direct[("a", 3)]["observed"] is True
    assert direct[("a", 3)]["gap"] is False
    # derived view from the global fill: identical set AND values
    filled = gapfill(
        series, key_col="k", bucket_col="b", value_col="v"
    ).localCheckpoint()
    derived = {
        (r["k"], r["b"]): r
        for r in per_key_view(filled, key_col="k", bucket_col="b").collect()
    }
    assert set(derived) == set(direct)
    for kk in direct:
        for c in ("v_obs", "gap", "observed", "v_locf", "v_interp"):
            assert derived[kk][c] == direct[kk][c], (kk, c)


def test_gapfill_matches_python_model_on_seeded_random_series(spark):
    """Model-based check (the lifecycle-test shape): seeded random
    sparse series run through gapfill(global) and a pure-Python
    reference; every (key, bucket) cell must agree on v_obs/gap/
    v_locf/v_interp — the enumeration-by-hand tests above pin edges,
    this pins the general case across shapes no fixture enumerates."""
    import random

    for seed in (7, 1009, 424242):
        rng = random.Random(seed)
        keys = [f"k{i}" for i in range(rng.randint(1, 4))]
        rows = []
        seen = set()
        for _ in range(rng.randint(3, 18)):
            k = rng.choice(keys)
            b = rng.randint(0, 14)
            if (k, b) in seen:
                continue
            seen.add((k, b))
            rows.append((k, b, round(rng.uniform(-50, 50), 3)))
        if not rows:
            continue
        # python model over the global [min, max] bucket axis
        lo = min(b for _, b, _ in rows)
        hi = max(b for _, b, _ in rows)
        obs = {(k, b): v for k, b, v in rows}
        expect = {}
        for k in {k for k, _, _ in rows}:
            kbs = sorted((b, v) for kk, b, v in rows if kk == k)
            for b in range(lo, hi + 1):
                v = obs.get((k, b))
                prev = max(((bb, vv) for bb, vv in kbs if bb <= b), default=None)
                nxt = min(((bb, vv) for bb, vv in kbs if bb >= b), default=None)
                locf = prev[1] if prev else None
                if v is not None:
                    interp = v
                elif prev and nxt:
                    interp = round(
                        prev[1] + (nxt[1] - prev[1]) * (b - prev[0]) / (nxt[0] - prev[0]),
                        9,
                    )
                else:
                    interp = None
                expect[(k, b)] = (v, v is None, locf, interp)
        out = gapfill(
            spark.createDataFrame(rows, "k string, b int, v double"),
            key_col="k", bucket_col="b", value_col="v",
        )
        got = {
            (r["k"], r["b"]): (r["v_obs"], r["gap"], r["v_locf"], r["v_interp"])
            for r in out.collect()
        }
        assert set(got) == set(expect), f"axis mismatch (seed {seed})"
        for cell in expect:
            g, e = got[cell], expect[cell]
            assert g[0] == e[0] and g[1] == e[1] and g[2] == e[2], (seed, cell, g, e)
            if e[3] is None:
                assert g[3] is None, (seed, cell, g, e)
            else:
                assert abs(g[3] - e[3]) < 1e-9, (seed, cell, g, e)
