"""Grading-window rotation helper + changed-code regrade emitter.

The correctness driver grades only the FIRST 50 registry entries per
round. This tool:

1. (default) reports, across all CORRECTNESS_r*.json files, which
   queries have a fully-green row somewhere (via the single shared
   classifier `api.classify_verdict`), which failed, and which have
   never been graded — i.e. the set that must rotate to the front of
   the window next round (grading_window() in api.py does this
   automatically; padding comes from `_RECONFIRM` there).

2. (--emit-regrade) maps the git diff since the last grading commit
   (the newest commit touching CORRECTNESS_r*.json, or --since REF)
   to operator modules, then to registered queries via
   QuerySpec.module, and writes the must-regrade list to REGRADE.json
   at the repo root. api.grading_window() inserts those names right
   after the never-graded/red set — so a changed code path can no
   longer keep a stale green (r4 VERDICT #4). Run this before the
   end-of-round commit.

Usage:
    python tools/rotation_check.py
    python tools/rotation_check.py --emit-regrade [--since REF]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_PKG = "etl_portfolio_project_spark"

#: Package files whose changes can affect EVERY query (shared infra) —
#: mapping them to "all 148 regrade" would be useless with a 50-slot
#: window, so they are reported as a warning for manual judgement
#: instead of expanding the regrade list.
_INFRA_PREFIXES = (
    f"{_PKG}/session.py",
    f"{_PKG}/caches.py",
    f"{_PKG}/tmpdirs.py",
    f"{_PKG}/sources/",
)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=_REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def last_grading_commit() -> str:
    """Newest commit touching any CORRECTNESS_r*.json — the point the
    driver last graded, i.e. the natural diff base for 'what changed
    since my greens were earned'."""
    out = _git("log", "-1", "--format=%H", "--", "CORRECTNESS_r*.json")
    return out or _git("rev-list", "--max-parents=0", "HEAD")


def changed_package_files(base: str) -> list[str]:
    """Package .py files differing between BASE and the working tree
    (committed + staged + unstaged), plus untracked ones."""
    diff = _git("diff", "--name-only", base, "--", _PKG).splitlines()
    untracked = _git(
        "ls-files", "--others", "--exclude-standard", "--", _PKG
    ).splitlines()
    return sorted(
        {p for p in diff + untracked if p.endswith(".py")}
    )


def file_to_module(path: str) -> str:
    return path[: -len(".py")].replace("/", ".")


def emit_regrade(base: str | None) -> int:
    from etl_portfolio_project_spark import api

    base = base or last_grading_commit()
    files = changed_package_files(base)
    infra = [f for f in files if f.startswith(_INFRA_PREFIXES)]
    modules = {
        file_to_module(f)
        for f in files
        if f not in infra and not f.endswith("__init__.py")
    }
    queries = [
        n for n, spec in api.REGISTRY.items() if spec.module in modules
    ]
    # registration order, not window order, for a stable committed file
    order = {n: i for i, n in enumerate(api.REGISTRY)}
    queries.sort(key=order.__getitem__)
    payload = {
        "base": base,
        "changed_files": files,
        "infra_changed": infra,
        "queries": queries,
    }
    out = os.path.join(_REPO, "REGRADE.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"base: {base[:12]}  changed package files: {len(files)}  "
          f"→ regrade {len(queries)} queries → REGRADE.json")
    if infra:
        print("WARNING: shared-infra files changed — their blast radius is "
              "every query; review and pad _RECONFIRM manually if needed:")
        for f_ in infra:
            print("  ", f_)
    never_or_red = len(
        [n for n in api.REGISTRY if n not in api._graded_verdicts()[0]]
    )
    if never_or_red + len(queries) > 50:
        print(f"WARNING: never-graded/red ({never_or_red}) + regrades "
              f"({len(queries)}) exceed the 50-slot window — the overflow "
              "waits a round.")
    return 0


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
            verdict = api.classify_verdict(name, r)
            if verdict in ("green", "rows_only"):
                green.add(name)
                failed.pop(name, None)
                if verdict == "rows_only":
                    rows_only.add(name)
            else:
                why = (
                    "graded rows-only but spec now has an oracle — "
                    "awaiting hash grade"
                    if r.get("err") == "no_oracle"
                    else ("ERROR" if r.get("err") else "hash/schema mismatch")
                )
                failed.setdefault(name, f"{os.path.basename(path)}: {why}")

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
              "front-50 — update _RECONFIRM in api.py (the never-graded/red "
              "set should self-rotate; this firing means a bug)")
    else:
        print("\nfront-50 already covers every never-graded/red query")

    regrade = os.path.join(_REPO, "REGRADE.json")
    if os.path.exists(regrade):
        with open(regrade) as f:
            n_regrade = len(json.load(f).get("queries", []))
        print(f"REGRADE.json: {n_regrade} changed-path regrades queued "
              "(refresh with --emit-regrade before the end-of-round commit)")
    return 0


if __name__ == "__main__":
    if "--emit-regrade" in sys.argv:
        ref = None
        if "--since" in sys.argv:
            ref = sys.argv[sys.argv.index("--since") + 1]
        sys.exit(emit_regrade(ref))
    sys.exit(main())
