"""Grading-window rotation helper.

The correctness driver grades only the FIRST 50 registry entries per
round. This tool reports, across all CORRECTNESS_r*.json files, which
queries have a fully-green row somewhere (rows+schema+hash true, or a
rows-only pass for oracle-less queries), which failed, and which have
never been graded — i.e. the set that must rotate into `_GRADE_FIRST`
(api.py) next round.

Usage:  python tools/rotation_check.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    from etl_portfolio_project_spark import api

    green: set[str] = set()
    rows_only: set[str] = set()
    failed: dict[str, str] = {}
    graded: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, r in rows.items():
            graded.add(name)
            if r.get("err") == "no_oracle" and r.get("spark_rows") is not None:
                # rows-only by design iff the CURRENT spec ships no
                # oracle — then a recorded row count is the strongest
                # possible grade. A spec that has since gained an
                # oracle must still rotate in for a real hash grade.
                spec = api.REGISTRY.get(name)
                if spec is not None and spec.oracle is None:
                    rows_only.add(name)
                    green.add(name)
                    failed.pop(name, None)
                else:
                    failed.setdefault(
                        name,
                        f"{os.path.basename(path)}: graded rows-only but "
                        "spec now has an oracle — awaiting hash grade",
                    )
            elif r.get("err"):
                failed.setdefault(name, f"{os.path.basename(path)}: ERROR")
            elif r.get("hash_match") or (
                r.get("hash_match") is None and r.get("rows_match")
            ):
                green.add(name)
                failed.pop(name, None)
            else:
                failed.setdefault(
                    name, f"{os.path.basename(path)}: hash/schema mismatch"
                )

    names = list(api.REGISTRY)
    never = [n for n in names if n not in graded]
    still_red = {n: why for n, why in failed.items() if n not in green}
    front = names[:50]

    print(f"registry: {len(names)}  green-somewhere: {len(green)}  "
          f"(rows-only-by-design: {len(rows_only)})  "
          f"never-graded: {len(never)}  still-red: {len(still_red)}")
    if never:
        print("\nNEVER GRADED (rotate these forward):")
        for n in never:
            print("  ", n)
    if still_red:
        print("\nSTILL RED (fix + keep in window):")
        for n, why in still_red.items():
            print(f"   {n}  [{why}]")
    missing_from_front = [
        n for n in never + list(still_red) if n not in front
    ]
    if missing_from_front:
        print(f"\n{len(missing_from_front)} of those are NOT in the current "
              "front-50 — update _GRADE_FIRST in api.py")
    else:
        print("\nfront-50 already covers every never-graded/red query")
    return 0


if __name__ == "__main__":
    sys.exit(main())
