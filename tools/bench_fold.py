#!/usr/bin/env python
"""Fold multiple bench.py payloads into one best-evidence record
(VERDICT r9 item 2, first option: "publish per-query min across the
round's N gated sweeps" — the protocol the pins themselves use).

Per query, takes the MIN raw time and the MIN normalized time across
every input payload; totals are the sums of those mins.  Bias-free
for a steady-state-min estimator (extra samples only ever lower a
min) and strictly more honest than any single sweep on a machine with
bursty co-tenant steal: a query only needs ONE quiet reading across
the round to be priced fairly.  The fold records its inputs'
load-evidence fields so a reader can see what went in.

Usage: python tools/bench_fold.py out.json in1.json in2.json [...]
"""

from __future__ import annotations

import json
import sys


def fold(payloads: list[dict]) -> dict:
    queries: dict[str, float] = {}
    norm: dict[str, float] = {}
    norm_fallbacks: list[str] = []
    for p in payloads:
        for n, t in p.get("queries", {}).items():
            queries[n] = min(queries.get(n, t), t)
        for n, t in p.get("queries_normalized", {}).items():
            norm[n] = min(norm.get(n, t), t)
    # ADVICE r10: a sweep with a partial/missing normalized map must
    # not silently shrink the normalized fold (fewer summands reads as
    # faster).  Any name present in the raw fold but absent from every
    # normalized map falls back to its raw fold time, and the fallback
    # is recorded so the reader can see it.
    for n, t in queries.items():
        if n not in norm:
            norm[n] = t
            norm_fallbacks.append(n)
    # reading rule (r10 ledger §15/§16): `value` — the raw fold — is
    # THE headline: per-query best observed, no correction, fully
    # defensible.  `value_normalized` compounds two optimistic
    # operations (min across sweeps × division by the bracketing
    # probe) and may overcorrect BELOW honest steady state, so it is
    # published as a lower-bound ESTIMATE, never the claim.  The
    # quietest sweep's own totals ride along as context.
    def _probe_med(p):
        med = (p.get("calibration") or {}).get("probe_median")
        return med if med is not None else float("inf")

    quietest = min(payloads, key=_probe_med)
    return {
        "metric": "total_query_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "value_normalized": round(sum(norm.values()), 3),
        "queries_normalized": norm,
        "normalized_raw_fallbacks": sorted(norm_fallbacks),
        "sf": payloads[0].get("sf"),
        "protocol": (
            "per-query min across N gated sweeps (raw and normalized "
            "folded independently); see tools/bench_fold.py"
        ),
        "reading_rule": (
            "value (raw fold) is the headline — best observed, no "
            "correction; value_normalized is a lower-bound ESTIMATE "
            "that compounds min-across-sweeps with probe division "
            "and may overcorrect below steady state"
        ),
        "quietest_sweep": {
            "value": quietest.get("value"),
            "value_normalized": quietest.get("value_normalized"),
            "probe_median": (
                (quietest.get("calibration") or {}).get("probe_median")
            ),
        },
        "n_sweeps": len(payloads),
        "inputs": [
            {
                "value": p.get("value"),
                "value_normalized": p.get("value_normalized"),
                "load_poisoned": p.get("load_poisoned"),
                "calibration": p.get("calibration"),
            }
            for p in payloads
        ],
    }


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    out_path, in_paths = sys.argv[1], sys.argv[2:]
    payloads = []
    for p in in_paths:
        with open(p) as f:
            payloads.append(json.load(f))
    names = {frozenset(p["queries"]) for p in payloads}
    if len(names) != 1:
        raise SystemExit("input sweeps cover different query sets")
    rec = fold(payloads)
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({
        "value": rec["value"],
        "value_normalized": rec["value_normalized"],
        "n_sweeps": rec["n_sweeps"],
        "out": out_path,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
