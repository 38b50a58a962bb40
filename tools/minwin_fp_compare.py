#!/usr/bin/env python
"""Compare per-query coherent minima between two catalog fingerprints,
with each window set's host-calibration distribution alongside.

Round-14 closing evidence: the optimized fingerprint's minwin headline
reads ABOVE the pre-change baseline (57.9s vs 54.1s) even though every
direct A/B of the round's engine changes measured improvements. The
explanation must be auditable, not asserted: every window at the new
fingerprint ran under the measured daytime I/O throttle, while the old
fingerprint's set includes overnight samples. This tool recomputes both
sides' minima from the archived windows under the SAME coherence rules
as bench.py's minwin writer (sf + catalog_fp + bench_fp + order +
git_rev stamped) and summarizes each set's calibration probes, so a
reader can check (a) which queries moved, (b) whether the two sets are
host-comparable. It never touches engine source or the bench harness —
it aggregates already-recorded windows (outside both fingerprints by
design).

Usage:
  python tools/minwin_fp_compare.py OLD_FP NEW_FP [--sf 0.1]
        [--bench-fp 601d9fe1bfbe] [--order default] [--json OUT.json]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import signal
import statistics

signal.signal(signal.SIGPIPE, signal.SIG_DFL)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CAL_FIELDS = (
    "calibration_io_min_mbps",
    "calibration_io_mbps",
    "calibration_ratio",
    "calibration32_ratio",
    "calibration_py_ratio",
)


def _windows(fp: str, sf: float, bench_fp: str, order: str) -> list[tuple[str, dict]]:
    out = []
    for p in sorted(glob.glob(os.path.join(ROOT, "bench_runs", "run_*.json"))):
        try:
            with open(p) as fh:
                r = json.loads(fh.readline())
        except (OSError, ValueError):
            continue
        if (
            r.get("sf") == sf
            and r.get("catalog_fp") == fp
            and r.get("bench_fp") == bench_fp
            and r.get("order") == order
            and r.get("git_rev")
            and r.get("queries")
        ):
            out.append((os.path.basename(p), r))
    return out


def _mins(windows: list[tuple[str, dict]]) -> dict[str, float]:
    mins: dict[str, float] = {}
    for _, r in windows:
        for q, v in r["queries"].items():
            if q not in mins or v < mins[q]:
                mins[q] = v
    return mins


def _cal_summary(windows: list[tuple[str, dict]]) -> dict:
    out: dict = {"windows": len(windows)}
    for f in _CAL_FIELDS:
        vals = [r[f] for _, r in windows if isinstance(r.get(f), (int, float))]
        if vals:
            out[f] = {
                "median": round(statistics.median(vals), 3),
                "min": round(min(vals), 3),
                "max": round(max(vals), 3),
            }
    totals = [r["value"] for _, r in windows]
    if totals:
        out["window_total_sec"] = {
            "median": round(statistics.median(totals), 3),
            "min": round(min(totals), 3),
            "max": round(max(totals), 3),
        }
    return out


def compare(old_fp: str, new_fp: str, sf: float, bench_fp: str, order: str) -> dict:
    old_w = _windows(old_fp, sf, bench_fp, order)
    new_w = _windows(new_fp, sf, bench_fp, order)
    old, new = _mins(old_w), _mins(new_w)
    rows = []
    for q in sorted(set(old) | set(new)):
        o, n = old.get(q), new.get(q)
        rows.append(
            {
                "query": q,
                "old_min_sec": o,
                "new_min_sec": n,
                "ratio": round(n / o, 3) if o and n else None,
            }
        )
    return {
        "metric": "coherent_minwin_fp_comparison",
        "sf": sf,
        "bench_fp": bench_fp,
        "order": order,
        "old": {"catalog_fp": old_fp, "sum_of_mins_sec": round(sum(old.values()), 3),
                "host": _cal_summary(old_w)},
        "new": {"catalog_fp": new_fp, "sum_of_mins_sec": round(sum(new.values()), 3),
                "host": _cal_summary(new_w)},
        "queries": rows,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old_fp")
    ap.add_argument("new_fp")
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--bench-fp", default="601d9fe1bfbe")
    ap.add_argument("--order", default="default")
    ap.add_argument("--json", dest="json_out")
    args = ap.parse_args()
    doc = compare(args.old_fp, args.new_fp, args.sf, args.bench_fp, args.order)
    print(
        f"old fp {args.old_fp}: {doc['old']['host']['windows']} windows, "
        f"sum-of-mins {doc['old']['sum_of_mins_sec']}s"
    )
    print(
        f"new fp {args.new_fp}: {doc['new']['host']['windows']} windows, "
        f"sum-of-mins {doc['new']['sum_of_mins_sec']}s"
    )
    for side in ("old", "new"):
        h = doc[side]["host"]
        io = h.get("calibration_io_min_mbps", {})
        print(
            f"  {side} host: io_min median {io.get('median')} MB/s "
            f"(min {io.get('min')}, max {io.get('max')}), "
            f"window totals median {h.get('window_total_sec', {}).get('median')}s"
        )
    print(f"{'query':40s} {'old':>8s} {'new':>8s} {'ratio':>6s}")
    for r in sorted(doc["queries"], key=lambda r: -(r["ratio"] or 0)):
        o = f"{r['old_min_sec']:.3f}" if r["old_min_sec"] is not None else "-"
        n = f"{r['new_min_sec']:.3f}" if r["new_min_sec"] is not None else "-"
        print(f"{r['query']:40s} {o:>8s} {n:>8s} {r['ratio'] or 0:6.2f}")
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(doc, fh, indent=1)
        print(f"-> {args.json_out}")


if __name__ == "__main__":
    main()
