#!/usr/bin/env python3
"""Two-point scaling audit (VERDICT r13 #3): read two full-bench BENCHLOG
JSON lines (sf0.01 and sf0.1), compute each query's empirical cost exponent

    e = log10(t_sf0.1 / t_sf0.01)        (the SFs differ exactly 10x)

and print a markdown table sorted by exponent, flagging every query whose
exponent exceeds the threshold (default 1.3 — meaningfully superlinear).
Sub-noise-floor lines (both timings under --floor seconds, default 1.0) are
exponent-meaningless (fixed per-query session overhead dominates; the box
noise band on such lines is +-50%) and are summarized, not flagged.

No silent caps (ADVICE r14): a line with a zero/absent timing on either
side cannot yield an exponent — such lines are FLAGGED explicitly (a zero
wall-clock in a bench artifact is itself a finding, never a skip), and
queries present in only one of the two logs are listed by name instead of
being dropped by the set intersection.

Usage: scaling_audit.py BENCHLOG.sf001.json BENCHLOG.json [--flag 1.3] [--floor 1.0]
Exit status: number of flagged lines (0 = clean), so the gate can chain it.
"""
import json
import math
import sys


def load(path: str) -> dict:
    with open(path) as f:
        rec = json.loads(f.read().strip())
    return rec


def describe_host(tag: str, rec: dict) -> None:
    # VERDICT r16 #1: surface the embedded calibration so the exponent
    # table is box-annotated from the artifact alone. Both logs come from
    # one session normally, so this mostly proves they DID; a mismatch
    # (e.g. one side rerun later on a loaded box) is visible immediately.
    h = rec.get("host")
    if not h:
        print(f"{tag}: no host calibration block (pre-r17 artifact)")
        return
    s, e = h.get("start", {}), h.get("end", {})
    print(f"{tag}: calib_cpu start={s.get('calib_cpu_ms')}ms "
          f"end={e.get('calib_cpu_ms')}ms loadavg={s.get('loadavg')} "
          f"cores={s.get('cores')} mhz={s.get('cpu_mhz_avg')}")


def main(argv):
    lo_path, hi_path = argv[1], argv[2]
    flag_at = float(argv[argv.index("--flag") + 1]) if "--flag" in argv else 1.3
    floor = float(argv[argv.index("--floor") + 1]) if "--floor" in argv else 1.0
    lo_rec, hi_rec = load(lo_path), load(hi_path)
    describe_host("sf-lo", lo_rec)
    describe_host("sf-hi", hi_rec)
    lo, hi = lo_rec["queries"], hi_rec["queries"]
    shared = sorted(set(lo) & set(hi))
    only_lo = sorted(set(lo) - set(hi))
    only_hi = sorted(set(hi) - set(lo))
    rows, degenerate = [], []
    for q in shared:
        tl, th = lo[q], hi[q]
        if tl > 0 and th > 0:
            rows.append((q, tl, th, math.log10(th / tl)))
        else:
            degenerate.append((q, tl, th))
    rows.sort(key=lambda r: -r[3])
    sub_floor = [r for r in rows if r[1] < floor and r[2] < floor]
    measurable = [r for r in rows if not (r[1] < floor and r[2] < floor)]
    flagged = [r for r in measurable if r[3] > flag_at]
    print(f"| query | sf0.01 s | sf0.1 s | exponent | flag |")
    print(f"|---|---|---|---|---|")
    for q, tl, th, e in measurable:
        mark = "**FLAG**" if e > flag_at else ""
        print(f"| {q} | {tl:.2f} | {th:.2f} | {e:+.2f} | {mark} |")
    for q, tl, th in degenerate:
        print(f"| {q} | {tl:.2f} | {th:.2f} | n/a | **FLAG (zero/absent "
              f"timing — no exponent computable)** |")
    print()
    print(f"{len(shared)} shared lines; {len(measurable)} above the "
          f"{floor:.1f}s noise floor at either SF; "
          f"{len(flagged) + len(degenerate)} flagged "
          f"(exponent > {flag_at} or degenerate timing).")
    if sub_floor:
        worst = max(sub_floor, key=lambda r: r[3])
        print(f"{len(sub_floor)} lines under the floor at BOTH SFs "
              f"(overhead-dominated; worst exponent among them: "
              f"{worst[0]} {worst[3]:+.2f}).")
    for name, qs in (("sf0.01-only", only_lo), ("sf0.1-only", only_hi)):
        if qs:
            print(f"{len(qs)} lines present {name} (no exponent, listed, "
                  f"not silently dropped): {', '.join(qs)}")
    # POSIX exit codes wrap modulo 256 — clamp so 256 flagged lines can
    # never read as exit 0 (ADVICE r15; the suite is past 270 lines).
    return min(len(flagged) + len(degenerate), 255)


if __name__ == "__main__":
    sys.exit(main(sys.argv))
