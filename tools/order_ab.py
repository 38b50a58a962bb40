#!/usr/bin/env python
"""Decide the bench default execution order from archived rotated
windows (round-14 verdict ask #3 / SURVEY round-13 candidate b).

The question: does the streaming class (q55/q58/q59) pay a measurable
tax for running at the suite TAIL (default order) versus right after
the flagship (stream_early)? Round 13's five-window A/B said the
driver of streaming swings is HOST state, not suite position; this
tool re-derives that comparison over every archived window, split by
recorded ``order``, with the quiet-window filter made explicit — so
the decision cites windows by name instead of a remembered
impression.

Reads bench_runs/run_*.json (sf0.1, order-stamped windows only; the
pre-round-13 archive predates order stamping and is excluded by
construction). Quiet = settle_load1 < 2.0 — the same informal bar the
round-13 note used, now written down.

Usage: python tools/order_ab.py [--all]  (--all includes loaded
windows in a second table for contrast)
"""
from __future__ import annotations

import glob
import json
import os
import sys

OUTDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_runs")
STREAM = ["q55_stream_tumbling_sliding", "q58_stream_dedup_watermark",
          "q59_stream_custom_sessionize"]
QUIET_LOAD1 = 2.0


def _windows():
    out = []
    for p in sorted(glob.glob(os.path.join(OUTDIR, "run_*.json"))):
        try:
            r = json.loads(open(p).readline())
        except (OSError, ValueError):
            continue
        if r.get("sf") == 0.1 and r.get("order") and r.get("queries"):
            out.append((os.path.basename(p), r))
    return out


def _table(rows, title):
    if not rows:
        print(f"-- {title}: no windows --")
        return {}
    print(f"-- {title} ({len(rows)} windows) --")
    print(f"{'window':38s} {'ord':>12s} {'load1':>5s} " + " ".join(f"{q.split('_')[0]:>6s}" for q in STREAM))
    mins: dict[str, dict[str, float]] = {}
    for f, r in rows:
        o = r["order"]
        print(
            f"{f:38s} {o:>12s} {r.get('settle_load1'):>5} "
            + " ".join(f"{r['queries'].get(q, float('nan')):6.2f}" for q in STREAM)
        )
        for q in STREAM:
            if q in r["queries"]:
                cur = mins.setdefault(q, {})
                cur[o] = min(cur.get(o, float("inf")), r["queries"][q])
    print("per-order MINIMA:")
    for q in STREAM:
        per = mins.get(q, {})
        line = "  ".join(f"{o}={v:.2f}" for o, v in sorted(per.items()))
        print(f"  {q}: {line}")
    return mins


def main() -> None:
    wins = _windows()
    quiet = [(f, r) for f, r in wins if (r.get("settle_load1") or 99) < QUIET_LOAD1]
    counts = {}
    for _, r in quiet:
        counts[r["order"]] = counts.get(r["order"], 0) + 1
    mins = _table(quiet, f"QUIET windows (settle_load1 < {QUIET_LOAD1})")
    if "--all" in sys.argv:
        _table(wins, "ALL order-stamped windows")
    # the decision rule from the verdict: the early-position floor must
    # HOLD (be faster) across >= 3 quiet windows per ordering to switch
    enough = all(counts.get(o, 0) >= 3 for o in ("default", "stream_early"))
    print(f"\nquiet windows per ordering: {counts}")
    if not enough:
        print("VERDICT: not enough quiet windows per ordering (need >= 3 each)"
              " — default stands, keep rotating.")
        return
    early_wins = sum(
        1 for q in STREAM
        if mins.get(q, {}).get("stream_early", float("inf"))
        < mins.get(q, {}).get("default", float("inf"))
    )
    if early_wins == len(STREAM):
        print("VERDICT: stream_early floor holds on every streaming query"
              " over >=3 quiet windows per ordering — switch the default"
              " (and re-fingerprint the harness).")
    else:
        print(f"VERDICT: stream_early is faster on only {early_wins}/3 streaming"
              " queries at the quiet-window floor — the position tax does not"
              " survive host-state control; the DEFAULT order stands.")


if __name__ == "__main__":
    main()
