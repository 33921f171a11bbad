#!/usr/bin/env python3
"""Fixture test for scaling_audit.py's host-comparability and
plan-fingerprint paths (VERDICT r17 #1 "a fixture exercises the mismatch
path"; VERDICT r18 #1/#4 + ADVICE r18). Builds synthetic BENCHLOG pairs
and asserts, via subprocess, the exact contract the gate chains on:

  1. stamped same-producer pair, genuinely superlinear line (wall AND
     plan fingerprint superlinear)            -> exit 1, **FLAG**
  2. stamped same-producer pair, clean        -> exit 0, no banner
  3. MIXED-provenance pair, wall-inflated lines with linear fingerprints
     (the r17 contended-driver shape)         -> exit 0, HOST MISMATCH
     banner, EXPLAINED (environment) annotation
  4. mixed-provenance pair where one line's fingerprint is ALSO
     superlinear (a real regression under contention) -> exit 1: the
     adjudication never excuses a plan that moved more bytes
  5. zero timing                              -> counted always (exit 1),
     host state irrelevant
  6. unstamped flagged line with NO jvm block -> cannot adjudicate ->
     stays counted (never silently excused)
  7. --strict counts explained flags too
  8. QUIET WALL + superlinear shuffle bytes on a comparable pair ->
     BYTES-FLAG, exit 1 (r18 #1: fingerprints RAISE flags now, not just
     excuse them — the l150 shape: +1.57 bytes/decade behind a 1.9 s wall)
  9. within-run calibration drift: two same-producer runs whose
     start/end calib intervals OVERLAP hard-gate as comparable even when
     the mean ratio falls outside the old [0.85, 1.20] band (r18 #4 —
     the r18 committed pair's 0.84 shape); DISJOINT intervals stay
     non-comparable
 10. jvm block present but fingerprint FIELDS absent -> unadjudicable,
     flag stays counted (ADVICE r18: absent fields are not a flat
     0-byte fingerprint)
 11. comparable pair where only the RAW exponent crosses the threshold
     (corrected lands just below) -> still flagged (ADVICE r18: flag on
     max(raw, corrected) for comparable pairs)

Run: python3 scripts/test_scaling_audit.py   (exit 0 = all pass)
"""
import json
import os
import subprocess
import sys
import tempfile

AUDIT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "scaling_audit.py")


def host(load1_start=1.0, load1_end=2.0, calib=310, calib_end=None,
         cores=32):
    blk = {"calib_wall_ms": calib, "calib_cpu_ms": calib,
           "calib_checksum": "17f60f6d505fce59",
           "loadavg": [load1_start, 1.0, 1.0], "cores": cores,
           "cpu_mhz_avg": 2600.0}
    ce = calib if calib_end is None else calib_end
    end = dict(blk, loadavg=[load1_end, 1.0, 1.0], calib_wall_ms=ce,
               calib_cpu_ms=ce)
    return {"calib_iters": 1 << 27, "start": blk, "end": end}


def rec(queries, jvm=None, producer="builder-gate", run_id=1,
        with_host=True, **hostkw):
    r = {"metric": "total", "value": sum(queries.values()), "unit": "sec",
         "queries": queries, "sf": "synthetic"}
    if producer is not None:
        r["producer"] = producer
        r["run_id"] = run_id
    if jvm is not None:
        r["jvm"] = jvm
    if with_host:
        r["host"] = host(**hostkw)
    return r


def jline(tasks, bytes_rw, cpu_ms):
    return {"run_ms": cpu_ms, "gc_ms": 0, "peak_task_mem_bytes": 0,
            "shuffle_read_bytes": bytes_rw, "shuffle_write_bytes": 0,
            "spill_mem_bytes": 0, "spill_disk_bytes": 0, "tasks": tasks,
            "cpu_ms": cpu_ms, "fetch_wait_ms": 0}


def run(lo, hi, *extra):
    with tempfile.TemporaryDirectory() as d:
        lp, hp = os.path.join(d, "lo.json"), os.path.join(d, "hi.json")
        for p, r in ((lp, lo), (hp, hi)):
            with open(p, "w") as f:
                f.write(json.dumps(r) + "\n")
        p = subprocess.run([sys.executable, AUDIT, lp, hp, *extra],
                           capture_output=True, text=True)
        return p.returncode, p.stdout + p.stderr


def check(name, cond, out):
    if not cond:
        print(f"FAIL: {name}\n--- audit output ---\n{out}")
        sys.exit(1)
    print(f"ok: {name}")


def main():
    # 1. same producer, one line scales 100x in wall AND bytes -> real flag
    lo = rec({"q_lin": 2.0, "q_bad": 2.0},
             {"q_lin": jline(10, 1000, 2000), "q_bad": jline(10, 1000, 2000)})
    hi = rec({"q_lin": 20.0, "q_bad": 200.0},
             {"q_lin": jline(100, 10000, 20000),
              "q_bad": jline(1000, 100000, 200000)}, run_id=2)
    code, out = run(lo, hi)
    check("comparable pair: superlinear line flags (exit 1)",
          code == 1 and "**FLAG**" in out and "HOST MISMATCH" not in out, out)

    # 2. same producer, all linear -> clean
    hi2 = rec({"q_lin": 20.0, "q_bad": 20.0},
              {"q_lin": jline(100, 10000, 20000),
               "q_bad": jline(100, 10000, 20000)}, run_id=2)
    code, out = run(lo, hi2)
    check("comparable pair: linear lines pass (exit 0, no banner)",
          code == 0 and "HOST MISMATCH" not in out and "FLAG" not in out, out)

    # 3. mixed provenance, wall inflated 100x but fingerprint linear ->
    #    banner + EXPLAINED + exit 0 (the r17 contended-driver shape)
    hi3 = rec({"q_lin": 20.0, "q_bad": 200.0},
              {"q_lin": jline(100, 10000, 20000),
               "q_bad": jline(100, 10000, 2000000)},
              producer="driver", run_id=2, load1_start=6.0, load1_end=9.0)
    code, out = run(lo, hi3)
    check("mixed provenance + linear fingerprint: explained, exit 0",
          code == 0 and "HOST MISMATCH" in out
          and "EXPLAINED (environment" in out
          and "mixed provenance" in out, out)

    # 7. --strict counts the explained flag
    code, out = run(lo, hi3, "--strict")
    check("--strict counts explained flags (exit 1)", code == 1, out)

    # 4. mixed provenance but the fingerprint is ALSO superlinear ->
    #    the flag survives adjudication (a real regression under load)
    hi4 = rec({"q_lin": 20.0, "q_bad": 200.0},
              {"q_lin": jline(100, 10000, 20000),
               "q_bad": jline(5000, 900000, 2000000)},
              producer="driver", run_id=2)
    code, out = run(lo, hi4)
    check("mixed provenance + superlinear fingerprint: still flagged",
          code == 1 and "**FLAG**" in out and "HOST MISMATCH" in out, out)

    # 4b. mixed provenance, lost-broadcast shape: shuffle bytes 0 at
    #     sf-lo (broadcast plan) -> GBs at sf-hi (fell back to shuffle).
    #     The 0 -> positive jump must read superlinear, never drop out
    #     of the fingerprint and get excused as environment. The line is
    #     wall-flagged AND bytes-flagged but counts ONCE (exit counts
    #     lines, not marks).
    hi4b = rec({"q_lin": 20.0, "q_bad": 200.0},
               {"q_lin": jline(100, 10000, 20000),
                "q_bad": jline(100, 900000000, 2000000)},
               producer="driver", run_id=2)
    lo4b = rec({"q_lin": 2.0, "q_bad": 2.0},
               {"q_lin": jline(10, 1000, 2000),
                "q_bad": jline(10, 0, 2000)})
    code, out = run(lo4b, hi4b)
    check("lost broadcast (bytes 0 -> GBs) stays flagged under mismatch, "
          "double-marked line counts once",
          code == 1 and "**FLAG**" in out and "**BYTES-FLAG**" in out, out)

    # 4c. present host block but broken (zero) calibration on a SAME-
    #     producer stamped pair: unknown speed is not evidence of a host
    #     difference, and downgrading would be the LENIENT direction —
    #     the pair stays hard-gated (flag counts, exit 1) with a loud
    #     warning that no speed correction is possible
    lo4c = rec({"q_bad": 2.0}, {"q_bad": jline(10, 1000, 2000)}, calib=0)
    hi4c = rec({"q_bad": 200.0}, {"q_bad": jline(100, 10000, 20000)},
               run_id=2, calib=0)
    code, out = run(lo4c, hi4c)
    check("zero calib on a stamped pair stays hard-gated + warned",
          code == 1 and "**FLAG**" in out and "HOST MISMATCH" not in out
          and "no usable calibration" in out, out)

    # 5. zero timing flags regardless of host state
    hiz = rec({"q_lin": 20.0, "q_bad": 0.0},
              {"q_lin": jline(100, 10000, 20000),
               "q_bad": jline(100, 10000, 20000)}, run_id=2)
    code, out = run(lo, hiz)
    check("zero timing always flags (exit 1)",
          code == 1 and "zero/absent timing" in out, out)

    # 6. unstamped pair, flagged line with NO jvm block -> cannot
    #    adjudicate -> stays counted
    lo6 = rec({"q_bad": 2.0}, producer=None)
    hi6 = rec({"q_bad": 200.0}, producer=None)
    code, out = run(lo6, hi6)
    check("unadjudicable flag (no jvm block) stays counted and prints " +
          "'unadjudicable', never a fabricated fingerprint",
          code == 1 and "**FLAG**" in out and "HOST MISMATCH" in out
          and "unadjudicable" in out and "+inf" not in out, out)

    # 8. r18 #1 — the l150 shape: a comparable pair, wall quiet and
    #    sublinear (1.5 s -> 1.9 s), but shuffle bytes +2.18/decade with
    #    hundreds of MiB at sf-hi. The OLD audit read "0 flagged"; the
    #    fingerprint-first audit must flag it from the bytes alone.
    lo8 = rec({"q_lin": 2.0, "q_sneak": 1.5},
              {"q_lin": jline(10, 1000, 2000),
               "q_sneak": jline(40, 2000000, 1500)})
    hi8 = rec({"q_lin": 20.0, "q_sneak": 1.9},
              {"q_lin": jline(100, 10000, 20000),
               "q_sneak": jline(400, 300000000, 1900)}, run_id=2)
    code, out = run(lo8, hi8)
    check("quiet-wall superlinear-bytes line BYTES-FLAGs on a comparable "
          "pair (exit 1)",
          code == 1 and "**BYTES-FLAG**" in out and "q_sneak" in out
          and "HOST MISMATCH" not in out, out)

    # 8b. the same bytes exponent on a TINY absolute movement (2 KB ->
    #     300 KB at sf-hi, under the 1 MiB floor) is noise, not a plan
    #     regression: listed by name, not flagged, exit 0
    lo8b = rec({"q_lin": 2.0, "q_tiny": 1.5},
               {"q_lin": jline(10, 1000, 2000),
                "q_tiny": jline(40, 2000, 1500)})
    hi8b = rec({"q_lin": 20.0, "q_tiny": 1.9},
               {"q_lin": jline(100, 10000, 20000),
                "q_tiny": jline(400, 300000, 1900)}, run_id=2)
    code, out = run(lo8b, hi8b)
    check("sub-floor bytes movement is listed, never flagged (exit 0)",
          code == 0 and "BYTES-FLAG" not in out and "q_tiny" in out
          and "not flagged" in out, out)

    # 9. r18 #4 — within-run calibration drift: lo run drifted 310 -> 450
    #    (its own measured range), hi run sat at 315. Mean ratio
    #    315/380 = 0.83 fails the old [0.85, 1.20] band, but the
    #    intervals overlap — the pair must hard-gate as comparable.
    lo9 = rec({"q_lin": 2.0}, {"q_lin": jline(10, 1000, 2000)},
              calib=310, calib_end=450)
    hi9 = rec({"q_lin": 20.0}, {"q_lin": jline(100, 10000, 20000)},
              run_id=2, calib=315, calib_end=312)
    code, out = run(lo9, hi9)
    check("overlapping calib intervals hard-gate despite a 0.83 mean "
          "ratio (the r18 committed-pair shape)",
          code == 0 and "HOST MISMATCH" not in out, out)

    # 9b. DISJOINT calib intervals (genuinely different box speeds) stay
    #     non-comparable even with the same producer stamp
    lo9b = rec({"q_lin": 2.0}, {"q_lin": jline(10, 1000, 2000)},
               calib=300, calib_end=305)
    hi9b = rec({"q_lin": 20.0}, {"q_lin": jline(100, 10000, 20000)},
               run_id=2, calib=400, calib_end=410)
    code, out = run(lo9b, hi9b)
    check("disjoint calib intervals break comparability",
          code == 0 and "HOST MISMATCH" in out
          and "intervals disjoint" in out, out)

    # 10. ADVICE r18 — jvm entry EXISTS but lacks the fingerprint fields:
    #     that is absent instrumentation, not a 0-byte flat fingerprint;
    #     a mixed-provenance wall flag must stay counted (unadjudicable),
    #     never read EXPLAINED off fabricated zeros.
    lo10 = rec({"q_bad": 2.0}, {"q_bad": jline(10, 1000, 2000)})
    hi10 = rec({"q_bad": 200.0}, {"q_bad": {"run_ms": 200000, "gc_ms": 0}},
               producer="driver", run_id=2)
    code, out = run(lo10, hi10)
    check("absent fingerprint fields are unadjudicable, flag stays "
          "counted (exit 1)",
          code == 1 and "**FLAG**" in out and "unadjudicable" in out
          and "EXPLAINED (environment:" not in out, out)

    # 11. ADVICE r18 — comparable pair, raw exponent 1.33 over the 1.3
    #     threshold but the corrected column (box factor ~1.09 from
    #     overlapping-but-offset calib intervals) lands at ~1.29: the
    #     flag must fire on max(raw, corrected), not be discounted.
    lo11 = rec({"q_edge": 2.0}, {"q_edge": jline(10, 1000, 2000)},
               calib=300, calib_end=340)
    hi11 = rec({"q_edge": 42.8}, {"q_edge": jline(100, 10000, 428000)},
               run_id=2, calib=345, calib_end=350)
    code, out = run(lo11, hi11)
    check("comparable pair flags on max(raw, corrected) — the corrected "
          "discount cannot hide a raw crossing",
          code == 1 and "**FLAG**" in out and "HOST MISMATCH" not in out,
          out)

    print("all scaling_audit fixture checks pass")


if __name__ == "__main__":
    main()
