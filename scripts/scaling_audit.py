#!/usr/bin/env python3
"""Two-point scaling audit (VERDICT r13 #3): read two full-bench BENCHLOG
JSON lines (sf0.01 and sf0.1), compute each query's empirical cost exponent

    e = log10(t_sf0.1 / t_sf0.01)        (the SFs differ exactly 10x)

and print a markdown table sorted by exponent, flagging every query whose
exponent exceeds the threshold (default 1.3 — meaningfully superlinear).
Sub-noise-floor lines (both timings under --floor seconds, default 1.0) are
exponent-meaningless (fixed per-query session overhead dominates; the box
noise band on such lines is +-50%) and are summarized, not flagged.

Usage: scaling_audit.py BENCHLOG.sf001.json BENCHLOG.json [--flag 1.3] [--floor 1.0]
"""
import json
import math
import sys


def load(path: str) -> dict:
    with open(path) as f:
        rec = json.loads(f.read().strip())
    return rec["queries"]


def main(argv):
    lo_path, hi_path = argv[1], argv[2]
    flag_at = float(argv[argv.index("--flag") + 1]) if "--flag" in argv else 1.3
    floor = float(argv[argv.index("--floor") + 1]) if "--floor" in argv else 1.0
    lo, hi = load(lo_path), load(hi_path)
    shared = sorted(set(lo) & set(hi))
    rows = []
    for q in shared:
        tl, th = lo[q], hi[q]
        e = math.log10(th / tl) if tl > 0 and th > 0 else float("nan")
        rows.append((q, tl, th, e))
    rows.sort(key=lambda r: -r[3])
    sub_floor = [r for r in rows if r[1] < floor and r[2] < floor]
    measurable = [r for r in rows if not (r[1] < floor and r[2] < floor)]
    flagged = [r for r in measurable if r[3] > flag_at]
    print(f"| query | sf0.01 s | sf0.1 s | exponent | flag |")
    print(f"|---|---|---|---|---|")
    for q, tl, th, e in measurable:
        mark = "**FLAG**" if e > flag_at else ""
        print(f"| {q} | {tl:.2f} | {th:.2f} | {e:+.2f} | {mark} |")
    print()
    print(f"{len(shared)} shared lines; {len(measurable)} above the "
          f"{floor:.1f}s noise floor at either SF; {len(flagged)} flagged "
          f"(exponent > {flag_at}).")
    if sub_floor:
        worst = max(sub_floor, key=lambda r: r[3])
        print(f"{len(sub_floor)} lines under the floor at BOTH SFs "
              f"(overhead-dominated; worst exponent among them: "
              f"{worst[0]} {worst[3]:+.2f}).")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
