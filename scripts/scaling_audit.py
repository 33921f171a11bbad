#!/usr/bin/env python3
"""Two-point scaling audit (VERDICT r13 #3), host-condition-aware
(VERDICT r17 #1): read two full-bench BENCHLOG JSON lines (sf0.01 and
sf0.1), compute each query's empirical cost exponent

    e = log10(t_sf0.1 / t_sf0.01)        (the SFs differ exactly 10x)

and print a markdown table sorted by exponent, flagging every query whose
exponent exceeds the threshold (default 1.3 — meaningfully superlinear).
Sub-noise-floor lines (both timings under --floor seconds, default 1.0) are
exponent-meaningless (fixed per-query session overhead dominates; the box
noise band on such lines is +-50%) and are summarized, not flagged.

Host comparability (r17 #1 — the instrumentation r16 #1 embedded is now
CONSUMED, not just printed): wall-clock exponents only measure the CODE
when both runs saw equivalent host conditions. The r17 worktree pair
(quiet builder sf0.01 vs contention-inflated driver sf0.1) read 9
spurious wall flags led by d26 +2.43 where the same-code committed pair
read +0.76 — and nothing in loadavg/calib can QUANTIFY stolen vCPUs
(the driver run's calib_cpu stayed flat at ~307-326 ms while d26's wall
inflated 47x). So the audit layers three mechanisms:

 1. COMPARABILITY: a pair hard-gates only when both records carry the
    r18 `producer` stamp with the SAME value, the same core count, and a
    calibration ratio inside [0.85, 1.20] (single-thread speed
    equivalent). Mixed or unstamped provenance, calib drift, or a core
    mismatch => the pair is declared NOT COMPARABLE, loudly, with the
    reasons and both host blocks printed. Loadavg deltas are printed as
    context but never drive the verdict: /proc/loadavg at run start
    mostly carries the tail of whatever ran before (the committed CLEAN
    r17 pair has a 4.2 start-load delta), and steal is invisible to it.

 2. CALIB CORRECTION: a `corrected` exponent column = raw exponent -
    log10(calib_cpu ratio) is printed beside the raw one — it removes
    genuine single-thread speed differences (throttling, slower box) and
    is printed always; it canNOT remove scheduler contention (which the
    calibration explicitly measures as absent-from-CPU), which is why
    mechanism 3 exists.

 3. PLAN-FINGERPRINT ADJUDICATION (not-comparable pairs only): a wall
    flag is EXPLAINED as environment inflation when the line's plan
    fingerprint — tasks launched and shuffle bytes moved, both recorded
    per line in the `jvm` block, both immune to contention AND to
    interpreted-codegen fallback — scales at or below the flag
    threshold: same tasks + same bytes + exploded wall = the plan did
    identical work and the box delivered it slowly. A flag whose
    fingerprint is ALSO superlinear is real no matter the host and stays
    counted. A flagged line with no jvm block cannot be adjudicated and
    stays counted (never silently excused). On the r17 worktree pair all
    9 spurious lines adjudicate clean (fingerprints <= +1.02); a lost
    broadcast or accidental cartesian would not (bytes explode).

No silent caps (ADVICE r14): a line with a zero/absent timing on either
side cannot yield an exponent — such lines are FLAGGED explicitly
regardless of host state (a zero wall-clock in a bench artifact is itself
a finding, never a skip), and queries present in only one of the two logs
are listed by name instead of being dropped by the set intersection.

Usage: scaling_audit.py BENCHLOG.sf001.json BENCHLOG.json
         [--flag 1.3] [--floor 1.0] [--strict]
--strict counts environment-explained flags in the exit status too (for
a gate that refuses to pass on ANY mixed-provenance anomaly).
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
    calib = f"{hi['calib']:.0f}ms" if hi["calib"] else "broken (0/absent)"
    print(f"{tag}: producer={prod} run_id={hi['run_id']} "
          f"calib_cpu_mean={calib} loadavg1 {hi['load1_start']} -> "
          f"{hi['load1_end']} cores={hi['cores']}")


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
        r = hi["calib"] / lo["calib"]
        if not (0.85 <= r <= 1.20):
            reasons.append(f"calib_cpu ratio {r:.2f} outside [0.85, 1.20] "
                           f"— single-thread speeds differ")
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
    a = sum(jlo.get(f, 0) or 0 for f in fields)
    b = sum(jhi.get(f, 0) or 0 for f in fields)
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
    strict = "--strict" in argv
    lo_rec, hi_rec = load(lo_path), load(hi_path)
    lo_host, hi_host = hostinfo(lo_rec), hostinfo(hi_rec)
    describe_host("sf-lo", lo_host)
    describe_host("sf-hi", hi_host)
    comparable, reasons, notes = comparability(lo_host, hi_host)
    box = (hi_host["calib"] / lo_host["calib"]
           if lo_host["calib"] and hi_host["calib"] else None)
    if box:
        print(f"calib box factor (hi/lo single-thread cpu): {box:.2f}x — "
              f"`corrected` column divides it out")
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
        print("flags are EXPLAINED (environment), not counted. Re-run both "
              "SFs in one")
        print("quiet session to hard-gate.")
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
    flagged, explained = [], []
    print(f"| query | sf-lo s | sf-hi s | exponent | corrected | flag |")
    print(f"|---|---|---|---|---|---|")
    for q, tl, th, e in measurable:
        corr = e - math.log10(box) if box else e
        mark = ""
        if (corr if box else e) > flag_at:
            # adjudicate against the plan fingerprint when the pair is
            # not host-comparable; a comparable pair's flag is real.
            # A line with no per-line jvm block on either side canNOT be
            # adjudicated (a zero-shuffle line still records tasks — an
            # ABSENT entry means no fingerprint exists) and stays counted.
            have_jvm = q in jlo and q in jhi
            if have_jvm:
                eb = aux_exponent(jlo[q], jhi[q],
                                  "shuffle_read_bytes",
                                  "shuffle_write_bytes")
                et = aux_exponent(jlo[q], jhi[q], "tasks")
                ec = aux_exponent(jlo[q], jhi[q], "cpu_ms")
                fp = [eb, et]
                detail = f"bytes={_f(eb)} tasks={_f(et)} cpu={_f(ec)}"
            else:
                # no per-line jvm block on at least one side: there IS
                # no fingerprint — never print a fabricated one (sums
                # of {} read as 0 and would display as +inf)
                fp = []
                detail = "no jvm block on both sides — unadjudicable"
            if not comparable and fp and all(x <= flag_at for x in fp):
                explained.append((q, e, detail))
                mark = f"EXPLAINED (environment: {detail})"
            else:
                flagged.append((q, e, detail))
                mark = f"**FLAG** ({detail})"
        print(f"| {q} | {tl:.2f} | {th:.2f} | {e:+.2f} | {corr:+.2f} "
              f"| {mark} |")
    for q, tl, th in degenerate:
        print(f"| {q} | {tl:.2f} | {th:.2f} | n/a | n/a | **FLAG (zero/"
              f"absent timing — no exponent computable)** |")
    print()
    print(f"{len(shared)} shared lines; {len(measurable)} above the "
          f"{floor:.1f}s noise floor at either SF; "
          f"{len(flagged) + len(degenerate)} flagged "
          f"(exponent > {flag_at} or degenerate timing)"
          + (f"; {len(explained)} wall-only anomalies EXPLAINED by the "
             f"host mismatch (plan fingerprints scale <= {flag_at})."
             if explained else "."))
    if sub_floor:
        worst = max(sub_floor, key=lambda r: r[3])
        print(f"{len(sub_floor)} lines under the floor at BOTH SFs "
              f"(overhead-dominated; worst exponent among them: "
              f"{worst[0]} {worst[3]:+.2f}).")
    for name, qs in (("sf-lo-only", only_lo), ("sf-hi-only", only_hi)):
        if qs:
            print(f"{len(qs)} lines present {name} (no exponent, listed, "
                  f"not silently dropped): {', '.join(qs)}")
    n = len(flagged) + len(degenerate) + (len(explained) if strict else 0)
    # POSIX exit codes wrap modulo 256 — clamp so 256 flagged lines can
    # never read as exit 0 (ADVICE r15; the suite is past 270 lines).
    return min(n, 255)


def _f(x):
    return f"{x:+.2f}" if x is not None else "n/a"


if __name__ == "__main__":
    sys.exit(main(sys.argv))
