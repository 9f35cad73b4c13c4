"""Per-query bench regression report.

Usage: python tools/bench_diff.py OLD_DETAIL.json [NEW_DETAIL.json]

Compares two `BENCH_DETAIL.json` snapshots (NEW defaults to the repo's
current one) and prints queries whose best-of timing moved by more
than THRESH_RATIO and THRESH_ABS_S — the feedback loop for "did this
round's change regress anything", which the single driver total can't
answer. Exit code 1 if any regression crosses both thresholds.
"""

from __future__ import annotations

import json
import os
import sys

THRESH_RATIO = 1.5
THRESH_ABS_S = 0.5

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(_REPO, "BENCH_DETAIL.json")
    )
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    old_errors = old.get("errors", {})
    new_errors = new.get("errors", {})
    regressions, improvements = [], []
    # worst regression class first: previously-timed query now ERRORS
    for name in sorted(set(oq) & set(new_errors)):
        print(f"[BROKEN]    {name}: {oq[name]:.2f}s -> error")
        regressions.append((name, oq[name], float("inf")))
    # errored-in-old queries are absent from oq — report their fate
    # explicitly instead of letting them masquerade as '[new]'
    for name in sorted(set(old_errors) & set(nq)):
        print(f"[recovered] {name}: error -> {nq[name]:.2f}s")
    for name in sorted(set(old_errors) & set(new_errors)):
        print(f"[still-broken] {name}: error in both snapshots")
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if b > a * THRESH_RATIO and b - a > THRESH_ABS_S:
            regressions.append((name, a, b))
        elif a > b * THRESH_RATIO and a - b > THRESH_ABS_S:
            improvements.append((name, a, b))
    for name in sorted(set(nq) - set(oq) - set(old_errors)):
        print(f"[new]       {name}: {nq[name]:.2f}s")
    for name in sorted(set(oq) - set(nq) - set(new_errors)):
        print(f"[gone]      {name} (was {oq[name]:.2f}s)")
    for name, a, b in improvements:
        print(f"[improved]  {name}: {a:.2f}s -> {b:.2f}s")
    for name, a, b in regressions:
        if b != float("inf"):  # BROKEN entries already printed above
            print(f"[REGRESSED] {name}: {a:.2f}s -> {b:.2f}s")
    print(
        f"total: {old.get('value')}s -> {new.get('value')}s "
        f"({len(oq)} -> {len(nq)} queries, "
        f"{len(regressions)} regressions / {len(improvements)} improvements)"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
