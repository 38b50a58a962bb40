#!/usr/bin/env python
"""Validate (and reproduce the fit behind) bench.py's round-13
per-class probe normalization: for every archived sf0.1 window
carrying the python-worker probe, compute the damped normalized total
with the COMMITTED betas and compare its cross-window spread to the
raw total's. The verdict's done-criterion is "normalized spread beats
raw spread"; run this after each round's windows land to check the
betas still hold out-of-sample (they were fitted on the six
attributable round-12/13 windows — run_20260816T104941 is excluded
from the fit report because it predates the io probe, so its disk
throttle is unattributable by construction).

Round-14 status: the verdict at HEAD of round 13 read FAIL (raw
28.4% -> normalized 39.7% over the full-probe windows), and the --cv
split below showed WHY no refit can rescue it: two folds over all 23
full-vector windows picked contradictory dominant classes (jvm-only
vs py-only) — the start-of-window probe vector cannot describe bursty
mid-window throttles, so the 4-parameter damping fit is structurally
underdetermined at this window count. The payload field was demoted
to ``value_normalized_vector_experimental`` (bench.py) and the raw
rev-coherent minwin is the only quotable cross-window number. This
tool keeps running every round: if the archive ever accumulates
enough windows that --cv PASSES on both folds, promotion back is an
explicit decision with the evidence in hand.

Usage: python tools/validate_normalization.py [--fit] [--cv]
  --fit  re-run the coordinate grid search and print the best betas
         beside the committed ones (drift here means the committed
         constants no longer describe the fleet's noise classes).
  --cv   2-fold cross-validation: fit betas on even-indexed full-
         vector windows, evaluate on odd (and swap) — the committed
         betas are only trustworthy if BOTH folds generalize.
"""
from __future__ import annotations

import glob
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

OUTDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_runs")


def _ratios(r):
    c32 = r["calibration32_sec"] / bench._REF_CALIBRATION32_SEC
    py = r["calibration_py_sec"] / bench._REF_CALIBRATION_PY_SEC
    io = (
        bench._REF_CALIBRATION_IO_MBPS / r["calibration_io_mbps"]
        if r.get("calibration_io_mbps")
        else None
    )
    return c32, py, io


def spread(xs):
    return (max(xs) - min(xs)) / (sum(xs) / len(xs))


def _load_runs():
    runs = []
    for p in sorted(glob.glob(os.path.join(OUTDIR, "run_*.json"))):
        r = json.loads(open(p).readline())
        if r.get("sf") == 0.1 and r.get("calibration_py_sec") and r.get("calibration32_sec"):
            runs.append((os.path.basename(p), r))
    return runs


def verdict() -> str:
    """The one-line PASS/FAIL verdict over every full-probe-vector
    window on disk — the exact sentence a round's closing state must
    quote (round-14 verdict ask #2: closing claims are generated from
    this, never typed)."""
    full = [(f, r) for f, r in _load_runs() if r.get("calibration_io_mbps")]
    if len(full) < 2:
        return "fewer than 2 full-vector windows — spread gate not yet decidable"
    raw = spread([r["value"] for _, r in full])
    norm = spread(
        [bench._normalized_vector(r["queries"], *_ratios(r))["total"] for _, r in full]
    )
    word = "PASS" if norm < raw else "FAIL (betas no longer hold)"
    return (
        f"raw {raw*100:.2f}% -> normalized {norm*100:.2f}% over "
        f"{len(full)} full-probe windows: {word}"
    )


def main():
    runs = _load_runs()
    # the spread comparison is only meaningful over windows carrying
    # the FULL probe vector (io landed late round 12): a window with a
    # missing probe can be throttled on exactly the unmeasured
    # resource, which is unattributable by construction — that is WHY
    # the probe was added, not a normalization failure
    full = [(f, r) for f, r in runs if r.get("calibration_io_mbps")]
    partial = [(f, r) for f, r in runs if not r.get("calibration_io_mbps")]
    for title, group in (("full probe vector", full), ("partial (io missing)", partial)):
        if not group:
            continue
        print(f"-- {title} --")
        print(f"{'window':38s} {'raw':>7s} {'norm':>7s}  ratios")
        for f, r in group:
            c32, py, io = _ratios(r)
            v = bench._normalized_vector(r["queries"], c32, py, io)
            print(f"{f:38s} {r['value']:7.1f} {v['total']:7.1f}  {v['class_ratios']}")
    if len(full) < 2:
        print("\nfewer than 2 full-vector windows — spread gate not yet decidable")
        return
    raw = [r["value"] for _, r in full]
    norm = [
        bench._normalized_vector(r["queries"], *_ratios(r))["total"] for _, r in full
    ]
    print(f"\nraw spread (full-vector windows):  {spread(raw)*100:.2f}%")
    print(f"normalized spread:                 {spread(norm)*100:.2f}%")
    print("PASS" if spread(norm) < spread(raw) else "FAIL (betas no longer hold)")

    if "--cv" in sys.argv:
        # the promotion gate (round 14): both folds must generalize
        grid = [x / 10 for x in range(0, 11)]

        def _fit(train):
            best = None
            for bj, bp, bs, bi in itertools.product(grid, repeat=4):
                betas = {"jvm": bj, "py": bp, "stream": bs, "io": bi}
                saved = dict(bench._CLASS_BETA)
                bench._CLASS_BETA.update(betas)
                s = spread(
                    [
                        bench._normalized_vector(r["queries"], *_ratios(r))["total"]
                        for _, r in train
                    ]
                )
                bench._CLASS_BETA.update(saved)
                if best is None or s < best[0]:
                    best = (s, betas)
            return best

        verdicts = []
        for name, (tr, te) in {
            "even->odd": (full[::2], full[1::2]),
            "odd->even": (full[1::2], full[::2]),
        }.items():
            s_tr, betas = _fit(tr)
            raw_te = spread([r["value"] for _, r in te])
            saved = dict(bench._CLASS_BETA)
            bench._CLASS_BETA.update(betas)
            s_te = spread(
                [
                    bench._normalized_vector(r["queries"], *_ratios(r))["total"]
                    for _, r in te
                ]
            )
            bench._CLASS_BETA.update(saved)
            ok = s_te < raw_te
            verdicts.append(ok)
            print(
                f"\ncv {name}: fit={betas} train {s_tr*100:.1f}% | "
                f"test raw {raw_te*100:.1f}% norm {s_te*100:.1f}% "
                f"{'PASS' if ok else 'FAIL'}"
            )
        print(
            "CV PASS — a refit may generalize; promotion is a decision"
            if all(verdicts)
            else "CV FAIL — the damping model is underdetermined; the field"
            " stays experimental"
        )

    if "--fit" in sys.argv:
        # refit on windows where every class's probe is attributable
        fitset = [r for _, r in runs if r.get("calibration_io_mbps")]
        # pre-io-probe windows are only attributable if no disk event —
        # keep the historically-vetted six by excluding known-throttled
        fitset += [
            r for f, r in runs
            if not r.get("calibration_io_mbps") and "104941" not in f
        ]
        grid = [x / 20 for x in range(0, 21)]
        best = None
        for bj, bp, bs, bi in itertools.product(grid, repeat=4):
            betas = {"jvm": bj, "py": bp, "stream": bs, "io": bi}
            saved = dict(bench._CLASS_BETA)
            bench._CLASS_BETA.update(betas)
            s = spread([
                bench._normalized_vector(r["queries"], *_ratios(r))["total"]
                for r in fitset
            ])
            bench._CLASS_BETA.update(saved)
            if best is None or s < best[0]:
                best = (s, betas)
        print(f"\nrefit over {len(fitset)} windows: spread {best[0]*100:.1f}% at {best[1]}")
        print(f"committed betas: {bench._CLASS_BETA}")


if __name__ == "__main__":
    main()
