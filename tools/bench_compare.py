#!/usr/bin/env python
"""Compare two bench JSON files (BENCH_r{N}.json or raw bench.py
output) per-query, with the calibration probe alongside so host-load
drift is readable at a glance (SURVEY.md §6: totals are only
comparable against the probe; single normalized numbers are noisier
than the raw+ratio pair).

Usage: python tools/bench_compare.py BENCH_r06.json BENCH_r07.json
"""

from __future__ import annotations

import json
import signal
import sys

# behave like a well-mannered CLI under `| head`
signal.signal(signal.SIGPIPE, signal.SIG_DFL)


def _load(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    # driver files wrap the bench line under "parsed"
    return doc.get("parsed", doc)


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    a, b = _load(sys.argv[1]), _load(sys.argv[2])
    qa, qb = a.get("queries", {}), b.get("queries", {})
    common = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))

    print(f"{'query':44s} {'A':>7s} {'B':>7s} {'delta':>7s} {'ratio':>6s}")
    for name in sorted(common, key=lambda n: qb[n] - qa[n], reverse=True):
        d = qb[name] - qa[name]
        r = qb[name] / qa[name] if qa[name] else float("inf")
        flag = " <<" if abs(d) > 0.5 and (r > 1.5 or r < 0.67) else ""
        print(f"{name:44s} {qa[name]:7.2f} {qb[name]:7.2f} {d:+7.2f} {r:6.2f}{flag}")

    ta = sum(qa[n] for n in common)
    tb = sum(qb[n] for n in common)
    if common and ta > 0:
        print(f"\ncommon-set total: {ta:.1f}s -> {tb:.1f}s ({tb - ta:+.1f}s, x{tb / ta:.2f})")
    else:
        print("\nno common queries (or zero-time baseline) — totals not comparable")
    print(
        f"calibration: A {a.get('calibration_sec', '?')} (ratio {a.get('calibration_ratio', '?')})"
        f" | B {b.get('calibration_sec', '?')} (ratio {b.get('calibration_ratio', '?')})"
    )
    if only_a:
        print(f"only in A: {', '.join(only_a)}")
    if only_b:
        print(f"only in B: {', '.join(only_b)}")


if __name__ == "__main__":
    main()
