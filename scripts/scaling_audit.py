#!/usr/bin/env python3
"""Two-point scaling audit (VERDICT r13 #3), host-condition-aware
(VERDICT r17 #1), plan-fingerprint-first (VERDICT r18 #1): read two
full-bench BENCHLOG JSON lines (sf0.01 and sf0.1), compute each query's
empirical cost exponent

    e = log10(t_sf0.1 / t_sf0.01)        (the SFs differ exactly 10x)

and print a markdown table sorted by exponent, flagging every query whose
exponent exceeds the threshold (default 1.3 — meaningfully superlinear).
Sub-noise-floor lines (both timings under --floor seconds, default 1.0) are
exponent-meaningless (fixed per-query session overhead dominates; the box
noise band on such lines is +-50%) and are summarized, not flagged.

Signals, in order of trust:

 1. PLAN FINGERPRINTS ARE FIRST-CLASS (r18 #1 — they used to be consulted
    only to EXCUSE wall flags on mismatched pairs, never to RAISE flags;
    r18's own committed pair carried a +1.57 bytes/decade line behind a
    quiet 1.9 s wall and read "0 flagged"). For EVERY above-floor line on
    EVERY pair — comparable or not — the audit computes the shuffle-bytes
    and tasks exponents from the per-line `jvm` block and FLAGS any line
    whose bytes exponent exceeds the threshold, regardless of wall clock.
    Bytes and tasks are immune to contention AND to interpreted-codegen
    fallback, so a bytes flag is never environment-excusable. Tiny
    absolute movements are exponent-noise (a 20 KB -> 2 MB broadcast
    incidental is not a plan regression), so the bytes flag requires the
    sf-hi side to move at least --bytes-min (default 1 MiB); superlinear
    lines under that floor are LISTED by name (never silently dropped).

 2. WALL COMPARABILITY: wall-clock exponents only measure the CODE when
    both runs saw equivalent host conditions. A pair hard-gates only when
    both records carry the r18 `producer` stamp with the SAME value, the
    same core count, and OVERLAPPING calibration intervals (r18 #4): each
    run calibrates at start AND end, so its [min, max] calib_cpu_ms range
    IS its measured same-box drift; two runs whose ranges overlap (with a
    5% margin for single-sample jitter) bracket a common box speed. The
    old mean-ratio band [0.85, 1.20] failed the r18 committed pair
    (ratio 0.84) even though both runs bracketed the same speed — a
    drifting calibration straddled the band while the intervals plainly
    overlapped. Mixed or unstamped provenance, disjoint calib intervals,
    or a core mismatch => the pair is NOT COMPARABLE, loudly, with the
    reasons and both host blocks printed. Loadavg deltas are printed as
    context but never drive the verdict (start loadavg mostly carries the
    tail of whatever ran before; steal is invisible to it).

 3. CALIB CORRECTION: a `corrected` exponent column = raw exponent -
    log10(calib_cpu mean ratio) is printed beside the raw one — it
    removes genuine single-thread speed differences (throttling, slower
    box); it canNOT remove scheduler contention. On a COMPARABLE pair the
    wall flag fires on max(raw, corrected) (ADVICE r18: correcting a
    comparable pair's exponent DOWNWARD would silently discount a real
    regression that lands inside the band's log10 width).

 4. FINGERPRINT ADJUDICATION (not-comparable pairs only): a wall flag is
    EXPLAINED as environment inflation when the line's fingerprint scales
    at or below the flag threshold: same tasks + same bytes + exploded
    wall = the plan did identical work and the box delivered it slowly.
    A wall flag whose fingerprint is ALSO superlinear is real no matter
    the host and stays counted. A flagged line with no jvm block — or a
    jvm block MISSING the fingerprint fields (ADVICE r18: an entry whose
    fields are absent is not a 0-byte flat fingerprint, it is NO
    fingerprint) — cannot be adjudicated and stays counted.

No silent caps (ADVICE r14): a line with a zero/absent timing on either
side cannot yield an exponent — such lines are FLAGGED explicitly
regardless of host state, and queries present in only one of the two logs
are listed by name instead of being dropped by the set intersection.

Usage: scaling_audit.py BENCHLOG.sf001.json BENCHLOG.json
         [--flag 1.3] [--floor 1.0] [--bytes-min 1048576] [--strict]
--strict counts environment-explained wall flags in the exit status too.
Exit status: number of unexplained flagged lines (0 = clean), so the
gate can chain it.
"""
import json
import math
import sys


def load(path: str) -> dict:
    with open(path) as f:
        rec = json.loads(f.read().strip())
    return rec


def hostinfo(rec: dict) -> dict:
    h = rec.get("host") or {}
    s, e = h.get("start") or {}, h.get("end") or {}
    cal = [v for v in (s.get("calib_cpu_ms"), e.get("calib_cpu_ms"))
           if v is not None and v > 0]
    load_s = s.get("loadavg") or []
    load_e = e.get("loadavg") or []
    return {
        "present": bool(h),
        "calib": sum(cal) / len(cal) if cal else None,
        "calib_lo": min(cal) if cal else None,
        "calib_hi": max(cal) if cal else None,
        "load1_start": load_s[0] if load_s else None,
        "load1_end": load_e[0] if load_e else None,
        "cores": s.get("cores"),
        "producer": rec.get("producer"),
        "run_id": rec.get("run_id"),
    }


def describe_host(tag: str, hi: dict) -> None:
    prod = hi["producer"] or "UNSTAMPED (pre-r18)"
    if not hi["present"]:
        print(f"{tag}: no host calibration block (pre-r17 artifact); "
              f"producer={prod}")
        return
    calib = (f"[{hi['calib_lo']:.0f}, {hi['calib_hi']:.0f}]ms"
             if hi["calib"] else "broken (0/absent)")
    print(f"{tag}: producer={prod} run_id={hi['run_id']} "
          f"calib_cpu start/end={calib} loadavg1 {hi['load1_start']} -> "
          f"{hi['load1_end']} cores={hi['cores']}")


# single-sample jitter margin on each calib interval endpoint: a calib
# read is one 2^27-step measurement, not a distribution — 5% covers the
# observed same-box sample wobble without re-admitting genuinely
# different box speeds (a 0.84x mean ratio passes only when at least one
# run's own start->end drift actually spans toward the other's range)
CALIB_MARGIN = 0.05


def comparability(lo: dict, hi: dict):
    """(comparable, hard_reasons, context_notes). Hard reasons break
    comparability; context notes are printed but advisory."""
    reasons, notes = [], []
    if not (lo["producer"] and hi["producer"]):
        reasons.append("unstamped provenance on at least one side "
                       "(pre-r18 artifact) — host equivalence unverifiable")
    elif lo["producer"] != hi["producer"]:
        reasons.append(f"mixed provenance: {lo['producer']} vs "
                       f"{hi['producer']} (different invokers, likely "
                       f"different box states)")
    if lo["calib"] and hi["calib"]:
        # r18 #4: gate on the runs' OWN measured drift ranges, not on a
        # fixed ratio band around their means — each run calibrates at
        # start and end, so [calib_lo, calib_hi] is what the box actually
        # did during that run; overlapping ranges (with the sampling
        # margin) mean both runs bracket a common single-thread speed.
        a_lo, a_hi = (lo["calib_lo"] * (1 - CALIB_MARGIN),
                      lo["calib_hi"] * (1 + CALIB_MARGIN))
        b_lo, b_hi = (hi["calib_lo"] * (1 - CALIB_MARGIN),
                      hi["calib_hi"] * (1 + CALIB_MARGIN))
        if a_lo > b_hi or b_lo > a_hi:
            reasons.append(
                f"calib_cpu intervals disjoint: "
                f"[{lo['calib_lo']:.0f}, {lo['calib_hi']:.0f}]ms vs "
                f"[{hi['calib_lo']:.0f}, {hi['calib_hi']:.0f}]ms "
                f"(±{CALIB_MARGIN:.0%} margin) — single-thread speeds "
                f"never overlapped")
    else:
        # Broken/absent calibration is UNKNOWN host speed, not EVIDENCE
        # of a host difference. Downgrading to fingerprint adjudication
        # here would be the LENIENT direction (a wall-only CPU
        # regression — interpreted fallback, worse expression eval —
        # would be 'explained' away), so a same-producer stamped pair
        # stays hard-gated and the missing correction is only WARNED
        # about; the pair is non-comparable only when provenance is
        # also mixed/unstamped (already a reason above).
        notes.append("no usable calibration on at least one side (host "
                     "block missing, or calib_cpu_ms zero/absent) — the "
                     "corrected column equals the raw exponent and "
                     "box-speed differences cannot be divided out")
    if lo["cores"] and hi["cores"] and lo["cores"] != hi["cores"]:
        reasons.append(f"core counts differ: {lo['cores']} vs {hi['cores']}")
    if (lo["load1_start"] is not None and hi["load1_start"] is not None
            and abs(hi["load1_start"] - lo["load1_start"]) > 2.0):
        notes.append(f"start loadavg1 differs ({lo['load1_start']} vs "
                     f"{hi['load1_start']}) — advisory only (start loadavg "
                     f"carries the previous run's tail; steal is invisible "
                     f"to it)")
    return (not reasons), reasons, notes


def aux_exponent(jlo: dict, jhi: dict, *fields):
    """Exponent of a fingerprint component, or None when the component is
    not MEASURED. ADVICE r18: a jvm entry that exists but lacks the
    fields is absent instrumentation, not a 0-value flat fingerprint —
    summing missing fields as 0 let a mixed-provenance wall flag be
    marked EXPLAINED with no actual fingerprint data."""
    if any(f not in jlo or jlo[f] is None for f in fields) or \
            any(f not in jhi or jhi[f] is None for f in fields):
        return None
    a = sum(jlo[f] for f in fields)
    b = sum(jhi[f] for f in fields)
    if a > 0 and b > 0:
        return math.log10(b / a)
    if a == 0 and b == 0:
        return 0.0  # no work of this kind on either side: scales flat
    if a == 0 and b > 0:
        # 0 -> positive is the WORST scaling there is (a lost broadcast
        # moves 0 bytes at sf-lo and GBs at sf-hi) — it must read as
        # superlinear, never as "no fingerprint" (which the adjudicator
        # would drop, excusing the exact regression it exists to catch)
        return math.inf
    return -math.inf  # positive -> 0: strictly sublinear, never excuses


def main(argv):
    lo_path, hi_path = argv[1], argv[2]
    flag_at = float(argv[argv.index("--flag") + 1]) if "--flag" in argv else 1.3
    floor = float(argv[argv.index("--floor") + 1]) if "--floor" in argv else 1.0
    bytes_min = (float(argv[argv.index("--bytes-min") + 1])
                 if "--bytes-min" in argv else 1048576.0)
    strict = "--strict" in argv
    lo_rec, hi_rec = load(lo_path), load(hi_path)
    lo_host, hi_host = hostinfo(lo_rec), hostinfo(hi_rec)
    describe_host("sf-lo", lo_host)
    describe_host("sf-hi", hi_host)
    comparable, reasons, notes = comparability(lo_host, hi_host)
    box = (hi_host["calib"] / lo_host["calib"]
           if lo_host["calib"] and hi_host["calib"] else None)
    if box:
        print(f"calib box factor (hi/lo single-thread cpu mean): {box:.2f}x "
              f"— `corrected` column divides it out")
    for n in notes:
        print(f"note: {n}")
    if not comparable:
        print()
        print("=" * 72)
        print("HOST MISMATCH — this pair is NOT comparable for wall-clock "
              "exponents:")
        for r in reasons:
            print(f"  - {r}")
        print("Wall flags below are adjudicated against each line's plan "
              "fingerprint")
        print("(tasks + shuffle bytes — contention- and "
              "interpreter-immune); fingerprint-clean")
        print("wall flags are EXPLAINED (environment), not counted. BYTES "
              "flags are raised")
        print("from the fingerprint itself and are never "
              "environment-excusable. Re-run both")
        print("SFs in one quiet session to hard-gate walls.")
        print("=" * 72)
    lo, hi = lo_rec["queries"], hi_rec["queries"]
    jlo, jhi = lo_rec.get("jvm", {}), hi_rec.get("jvm", {})
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
    flagged, explained, bytes_flagged, bytes_noted = [], [], [], []
    print(f"| query | sf-lo s | sf-hi s | exponent | corrected | bytes "
          f"| tasks | flag |")
    print(f"|---|---|---|---|---|---|---|---|")
    for q, tl, th, e in measurable:
        corr = e - math.log10(box) if box else e
        have_jvm = q in jlo and q in jhi
        eb = (aux_exponent(jlo[q], jhi[q], "shuffle_read_bytes",
                           "shuffle_write_bytes") if have_jvm else None)
        et = aux_exponent(jlo[q], jhi[q], "tasks") if have_jvm else None
        ec = aux_exponent(jlo[q], jhi[q], "cpu_ms") if have_jvm else None
        marks = []
        # FINGERPRINT FLAG (r18 #1): raised on every pair, wall-blind,
        # never environment-excusable — bytes moved is the plan itself.
        if eb is not None and eb > flag_at:
            hi_bytes = (jhi[q].get("shuffle_read_bytes") or 0) + \
                       (jhi[q].get("shuffle_write_bytes") or 0)
            if hi_bytes >= bytes_min:
                bytes_flagged.append((q, eb))
                marks.append(f"**BYTES-FLAG** (shuffle bytes {_f(eb)}/decade"
                             f", {hi_bytes / 1048576.0:.1f} MiB at sf-hi)")
            else:
                bytes_noted.append((q, eb, hi_bytes))
        # WALL FLAG: on a comparable pair fire on max(raw, corrected)
        # (ADVICE r18 — the correction must never discount a raw flag on
        # a pair the gate itself declared speed-equivalent); on a
        # non-comparable pair the corrected exponent triggers and the
        # fingerprint adjudicates.
        wall_trigger = (max(e, corr) if comparable else (corr if box else e))
        if wall_trigger > flag_at:
            if have_jvm and eb is not None and et is not None:
                fp = [eb, et]
                detail = f"bytes={_f(eb)} tasks={_f(et)} cpu={_f(ec)}"
            else:
                # no per-line jvm block — or fingerprint fields absent —
                # on at least one side: there IS no fingerprint; never
                # print a fabricated one
                fp = []
                detail = ("no usable fingerprint on both sides "
                          "(jvm block or its fields absent) — unadjudicable")
            if not comparable and fp and all(x <= flag_at for x in fp):
                explained.append((q, e, detail))
                marks.append(f"EXPLAINED (environment: {detail})")
            else:
                flagged.append((q, e, detail))
                marks.append(f"**FLAG** ({detail})")
        print(f"| {q} | {tl:.2f} | {th:.2f} | {e:+.2f} | {corr:+.2f} "
              f"| {_f(eb)} | {_f(et)} | {' '.join(marks)} |")
    for q, tl, th in degenerate:
        print(f"| {q} | {tl:.2f} | {th:.2f} | n/a | n/a | n/a | n/a "
              f"| **FLAG (zero/absent timing — no exponent computable)** |")
    print()
    # exit counts LINES, not marks — a line both wall- and bytes-flagged
    # is one finding
    flagged_lines = ({q for q, _, _ in flagged} | {q for q, _ in bytes_flagged})
    n_counted = len(flagged_lines) + len(degenerate)
    print(f"{len(shared)} shared lines; {len(measurable)} above the "
          f"{floor:.1f}s noise floor at either SF; "
          f"{n_counted} flagged ({len(flagged)} wall, {len(bytes_flagged)} "
          f"fingerprint-bytes, {len(degenerate)} degenerate timing)"
          + (f"; {len(explained)} wall-only anomalies EXPLAINED by the "
             f"host mismatch (plan fingerprints scale <= {flag_at})."
             if explained else "."))
    if bytes_noted:
        noted = ", ".join(f"{q} ({_f(e)}, {b} B)" for q, e, b in bytes_noted)
        print(f"{len(bytes_noted)} bytes-superlinear lines under the "
              f"{bytes_min:.0f} B sf-hi floor — exponent noise on tiny "
              f"absolute movement, listed, not flagged: {noted}")
    if sub_floor:
        worst = max(sub_floor, key=lambda r: r[3])
        print(f"{len(sub_floor)} lines under the floor at BOTH SFs "
              f"(overhead-dominated; worst exponent among them: "
              f"{worst[0]} {worst[3]:+.2f}).")
    for name, qs in (("sf-lo-only", only_lo), ("sf-hi-only", only_hi)):
        if qs:
            print(f"{len(qs)} lines present {name} (no exponent, listed, "
                  f"not silently dropped): {', '.join(qs)}")
    n = n_counted + (len(explained) if strict else 0)
    # POSIX exit codes wrap modulo 256 — clamp so 256 flagged lines can
    # never read as exit 0 (ADVICE r15; the suite is past 270 lines).
    return min(n, 255)


def _f(x):
    return f"{x:+.2f}" if x is not None else "n/a"


if __name__ == "__main__":
    sys.exit(main(sys.argv))
