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
    print(f"{len(declared)} declared, {len(claimed & declared)} matched, "
          f"{len(missing_rows)} missing rows, {len(phantom)} phantom claims")
    return 1 if missing_rows or phantom else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
