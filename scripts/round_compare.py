#!/usr/bin/env python3
"""Round-over-round bench comparison, CALIBRATED (VERDICT r16 #1).

The r16 driver run read 2.32x wall on byte-identical plans; adjudicating
it required three artifacts plus a judge-side rerun. With the `host`
block now embedded in every BENCHLOG line (fixed-work single-thread
calibration at run start and end + loadavg/cores/MHz), the comparison is
self-contained:

    box_factor   = mean(calib_cpu_ms of B) / mean(calib_cpu_ms of A)
    raw ratio    = wall_B / wall_A          (per line and total)
    calibrated   = raw ratio / box_factor   (what the CODE did)

A calibrated total ~1.0 under a raw 2.3x says "same code, slower box" —
the exact adjudication r16 needed. The start/end calib pair also exposes
mid-run degradation (end >> start).

Usage: round_compare.py OLD_BENCHLOG.json NEW_BENCHLOG.json [--top 10]
Exit 0 always (a reporting tool, not a gate — the 2x gate stays with the
judge, who now has the normalized number in hand).
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip())


def calib(rec):
    h = rec.get("host") or {}
    start, end = h.get("start") or {}, h.get("end") or {}
    vals = [v for v in (start.get("calib_cpu_ms"), end.get("calib_cpu_ms"))
            if v is not None]
    # a 0 ms calibration is a broken measurement, not a missing one —
    # treat it as absent so the divide below can't zero out
    vals = [v for v in vals if v > 0]
    if not vals:
        return None
    return {
        "cpu_ms": sum(vals) / len(vals),
        "start": start.get("calib_cpu_ms"),
        "end": end.get("calib_cpu_ms"),
        "loadavg": start.get("loadavg"),
        "cores": start.get("cores"),
        "mhz": start.get("cpu_mhz_avg"),
    }


def main(argv):
    old, new = load(argv[1]), load(argv[2])
    top = int(argv[argv.index("--top") + 1]) if "--top" in argv else 10
    co, cn = calib(old), calib(new)
    for tag, c, rec in (("old", co, old), ("new", cn, new)):
        # provenance stamp (VERDICT r17 #6): who produced this line —
        # mixed builder/driver comparisons must be visible up front
        prov = (f"producer={rec.get('producer', 'UNSTAMPED (pre-r18)')} "
                f"run_id={rec.get('run_id')}")
        if c:
            print(f"{tag}: {prov} calib_cpu start={c['start']}ms "
                  f"end={c['end']}ms loadavg={c['loadavg']} "
                  f"cores={c['cores']} mhz={c['mhz']} sf={rec.get('sf')}")
        else:
            print(f"{tag}: {prov} NO host calibration block "
                  f"(pre-r17 artifact) sf={rec.get('sf')}")
    po, pn = old.get("producer"), new.get("producer")
    if po and pn and po != pn:
        print("WARNING: MIXED PROVENANCE — the two lines came from "
              "different invokers (likely different box states); treat "
              "per-line ratios as indicative only.")
    box = (cn["cpu_ms"] / co["cpu_ms"]) if co and cn else None
    qo, qn = old["queries"], new["queries"]
    shared = sorted(set(qo) & set(qn))
    to = sum(qo[q] for q in shared)
    tn = sum(qn[q] for q in shared)
    raw = tn / to if to else float("nan")
    print(f"\n{len(shared)} shared lines; wall {to:.1f}s -> {tn:.1f}s, "
          f"raw ratio {raw:.2f}x")
    if box:
        print(f"box factor (calib cpu) {box:.2f}x -> CALIBRATED ratio "
              f"{raw / box:.2f}x")
        if (cn.get("end") or 0) > 2 * (cn.get("start") or float("inf")):
            print("WARNING: new run's end calibration is >2x its start — "
                  "the box degraded mid-run; per-line ratios are suspect.")
    else:
        print("no calibration on one side — raw ratio only "
              "(the pre-r17 adjudication gap).")
    rows = [(q, qo[q], qn[q], qn[q] / qo[q]) for q in shared if qo[q] > 0]
    rows.sort(key=lambda r: -r[3])
    print(f"\nworst {top} per-line raw ratios"
          + (f" (divide by {box:.2f} to calibrate):" if box else ":"))
    for q, a, b, r in rows[:top]:
        print(f"  {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    only = sorted(set(qn) - set(qo))
    if only:
        print(f"\n{len(only)} lines new-only (no ratio, listed, not "
              f"dropped): {', '.join(only[:20])}"
              + (" ..." if len(only) > 20 else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
