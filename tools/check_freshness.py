"""Official-row freshness invariant (VERDICT r9 item 7).

The external driver records CORRECTNESS rows for only the first 50
names in ``queries()`` order per round, so row age is governed by the
``registry._CHECK_WINDOW`` rotation.  The invariant the r8/r9 verdicts
converged on: **at round N's close, no query's latest official row may
predate round N-3.**  This tool fails loudly when the CURRENT window
cannot deliver that — i.e. when some query's latest row is already
N-4 or older and the query is NOT in the window about to be recorded.

Run it when setting a round's window (and in CI via
tests/test_artifacts.py)::

    python tools/check_freshness.py [--round N]

``--round`` defaults to ``registry._CHECK_WINDOW_ROUND`` — the round
whose window is actually staged in the registry (explicit, so
committing round N's CORRECTNESS artifact does not flip this check
before the N+1 window is staged — ADVICE r10).  Exit 0 = invariant
deliverable; exit 1 = violations printed, rotate the window.

Only LIVE queries (names in ``registry.QUERIES``) bind the invariant:
a retired/renamed name that can no longer appear in any window is
reported informationally, not as a violation (ADVICE r10).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_rows(repo: str = REPO) -> dict[str, int]:
    """name -> round of its latest official CORRECTNESS row."""
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(f) as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def check(round_n: int | None = None) -> list[str]:
    """Return violation messages (empty = invariant deliverable)."""
    sys.path.insert(0, REPO)
    from ema_bigdata_spark import registry

    registry.load_all()
    latest = latest_rows()
    if round_n is None:
        round_n = registry._CHECK_WINDOW_ROUND
    window = set(registry._CHECK_WINDOW)

    # Only live queries bind the invariant; a retired/renamed name can
    # never re-enter a window, so it is informational, not a violation.
    retired = sorted(set(latest) - set(registry.QUERIES))
    for name in retired:
        print(f"info: {name} has official rows but is not registered "
              f"(retired/renamed); excluded from the invariant")
        del latest[name]

    problems = [
        f"{name}: latest official row r{rnd} predates r{round_n - 3} "
        f"and the name is not in the staged r{round_n} window"
        for name, rnd in sorted(latest.items())
        if rnd < round_n - 3 and name not in window
    ]
    # a registered query with NO row at all is a harder violation
    problems += [
        f"{name}: registered but has no official row and is not in "
        f"the staged window"
        for name in sorted(set(registry.QUERIES) - set(latest))
        if name not in window
    ]
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    args = ap.parse_args()
    problems = check(args.round)
    if problems:
        print(f"FRESHNESS INVARIANT VIOLATED ({len(problems)}):")
        for p in problems:
            print(" -", p)
        return 1
    latest = latest_rows()
    print(
        f"freshness ok: {len(latest)} queries, oldest latest-row "
        f"r{min(latest.values())}, staged window covers the N-3 edge"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
