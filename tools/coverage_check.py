#!/usr/bin/env python3
"""COVERAGE.md citation-invariant check (the r9 'scripted check', now
committed instead of ad-hoc).

Contract (COVERAGE.md header): the 'Current state' one-page index is
the authoritative checklist — every q_* CORRECTNESS row is cited from
EXACTLY ONE index row (wildcards like `q_dml_*` expand; the per-section
§2.x tables and per-round delta logs are detail/history, not the
checklist, so they don't count toward multi-citation — but a query
cited ONLY there and absent from the index is still 'missing from the
index').

Exit 1 on any missing-from-index or multi-cited-in-index query.
"""
import os
import re
import subprocess
import sys

# abspath-derived so `python coverage_check.py` from tools/ (or any
# relative invocation) still resolves the repo root
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def query_names():
    src = subprocess.run(
        ["grep", "-rhoE", '"q_[a-z0-9_]+" ->', f"{REPO}/src/main/scala/graft/queries/"],
        capture_output=True, text=True).stdout
    return sorted(set(re.findall(r'"(q_[a-z0-9_]+)"', src)))


def main():
    names = query_names()
    cov = open(f"{REPO}/COVERAGE.md").read()
    m = re.search(r"## Current state.*?(?=\n## (?!Current))", cov, re.S)
    if not m:
        sys.exit("no 'Current state' index section found")
    index_rows = [l for l in m.group(0).split("\n") if l.startswith("|")]

    cited_in_index = {}
    for i, row in enumerate(index_rows):
        for pat in set(re.findall(r"`(q_[a-z0-9_*]+)`", row)):
            rx = re.compile("^" + re.escape(pat).replace(r"\*", ".*") + "$")
            for n in names:
                if rx.match(n):
                    cited_in_index.setdefault(n, set()).add(i)

    # multi-citation counts only EXPLICIT (non-wildcard) index rows: a
    # family wildcard legitimately overlaps the explicit citation that
    # anchors one member at its home row
    explicit = {}
    for i, row in enumerate(index_rows):
        for pat in set(re.findall(r"`(q_[a-z0-9_]+)`", row)):
            if pat in names:
                explicit.setdefault(pat, set()).add(i)
    multi = {n: sorted(r) for n, r in explicit.items() if len(r) > 1}

    missing = [n for n in names if n not in cited_in_index]

    print(f"{len(names)} queries; {len(missing)} missing from index; "
          f"{len(multi)} multi-cited (explicit)")
    for n in missing:
        print(f"  MISSING  {n}")
    for n, rows in multi.items():
        print(f"  MULTI    {n} in index rows {rows}")
    sys.exit(1 if (missing or multi) else 0)


if __name__ == "__main__":
    main()
