#!/usr/bin/env python3
"""Mechanical check of the VERDICT r13 #4 invariant: every declared query
name (a Verify output directory / CORRECTNESS key) appears in SURVEY.md,
and every backticked query name SURVEY.md claims exists is declared.

Usage: survey_check.py <verify_outdir>
(the outdir of a full `graft.Verify` run — directory names ARE the
declared keys; oracle_sql.json is skipped)
"""
import os
import re
import sys


def main(out_dir: str) -> int:
    declared = {d for d in os.listdir(out_dir)
                if os.path.isdir(os.path.join(out_dir, d))}
    text = open("SURVEY.md").read()
    # every `name` that looks like a declared query key (family prefix +
    # number + underscore suffix)
    claimed = set(re.findall(r"`([a-z]+\d+[a-z]?_[a-z0-9_]+)`", text))
    claimed = {c for c in claimed if re.match(r"^[abcdefghl]\d+", c)}
    missing_rows = sorted(declared - claimed)
    phantom = sorted(c for c in claimed if c not in declared)
    for q in missing_rows:
        print(f"DECLARED-BUT-NOT-IN-SURVEY: {q}")
    for q in phantom:
        print(f"SURVEY-CLAIMS-UNDECLARED: {q}")
    # VERDICT r16 #4: every `| Xn |` operator row must sit inside a HEADED
    # GFM table block — a row-run whose first two lines aren't
    # header + |---| separator renders as raw pipe text (the E13/E14
    # regression class). Walk contiguous runs of '|' lines.
    lines = text.split("\n")
    fragments = []
    i = 0
    while i < len(lines):
        if lines[i].lstrip().startswith("|"):
            j = i
            while j < len(lines) and lines[j].lstrip().startswith("|"):
                j += 1
            run = lines[i:j]
            headed = (len(run) >= 2 and
                      re.match(r"^\s*\|[\s:\-|]+\|\s*$", run[1]))
            op_rows = [r for r in run
                       if re.match(r"^\s*\|\s*[A-Lg]\d+\s*\|", r)]
            if op_rows and not headed:
                fragments.append((i + 1, op_rows[0][:60]))
            i = j
        else:
            i += 1
    for ln, row in fragments:
        print(f"HEADERLESS-TABLE-FRAGMENT at line {ln}: {row}")
    print(f"{len(declared)} declared, {len(claimed & declared)} matched, "
          f"{len(missing_rows)} missing rows, {len(phantom)} phantom claims, "
          f"{len(fragments)} headerless fragments")
    return 1 if missing_rows or phantom or fragments else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
