"""Committed-artifact consistency pins (VERDICT r6 §Next-2).

The standing baseline (``BASELINE_LOCAL.json``) is the denominator of
every bench-vs-baseline ratio the external judge computes.  Its
``value`` field went stale in mid-r5 (81.116 vs a pin-dict summing to
114.4) and inflated the r6 headline ratio to 1.79x when the true raw
ratio was 1.27x.  These tests make the artifacts self-consistent at
commit time so the class cannot recur.
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(REPO, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not present")
    with open(path) as f:
        return json.load(f)


class TestBaselineConsistency:
    def test_value_equals_pin_sum(self):
        base = _load("BASELINE_LOCAL.json")
        pin_sum = round(sum(base["queries"].values()), 3)
        assert base["value"] == pytest.approx(pin_sum, abs=0.01), (
            f"BASELINE_LOCAL.json value={base['value']} != pin sum "
            f"{pin_sum}: update 'value' whenever pins change"
        )

    def test_calibration_pin_present(self):
        base = _load("BASELINE_LOCAL.json")
        assert base.get("calibration_sec", 0) > 0

    def test_pins_cover_registry(self):
        """Every registered query has a pin (new operators must be
        pinned in the same round they ship) and no pin is orphaned."""
        from ema_bigdata_spark import registry

        registry.load_all()
        base = _load("BASELINE_LOCAL.json")
        pins = set(base["queries"])
        registered = set(registry.QUERIES)
        missing = registered - pins
        assert not missing, f"registered queries without a pin: {missing}"
        # pins for synthetic bench-only fixtures (gmm_fit_10iter etc.)
        # are allowed; a pin matching NO registered query and NO known
        # fixture prefix is a rename leftover
        fixture_ok = {
            "gmm_fit_10iter",
            "gmm_fit_distributed_3iter_2Mbins",
            "dedup_cluster_distributed_510k_edges",
            "ngram_jaccard_skew_2k_boilerplate",
            # r12: the zipfian day-bucket sessionize entry got its
            # first pin from the r12 fold (added to bench.py by the
            # r12 ledger session, pinned by the optimization round)
            "sessionize_day_bucket_zipf_1M",
        }
        orphans = pins - registered - fixture_ok
        assert not orphans, f"pins with no registered query: {orphans}"


class TestBenchRecordConsistency:
    def test_bench_local_value_equals_sum(self):
        rec = _load("BENCH_LOCAL.json")
        assert rec["value"] == pytest.approx(
            round(sum(rec["queries"].values()), 3), abs=0.01
        )

    def test_bench_local_normalized_consistent(self):
        """r10 fields: the normalized total sums its map, covers the
        same query set as the raw map, and no normalized entry
        exceeds its raw one (the ratio is clipped at 1.0)."""
        rec = _load("BENCH_LOCAL.json")
        if "queries_normalized" not in rec:
            pytest.skip("pre-r10 record")
        norm = rec["queries_normalized"]
        assert set(norm) == set(rec["queries"])
        assert rec["value_normalized"] == pytest.approx(
            round(sum(norm.values()), 3), abs=0.01
        )
        over = {
            n for n, t in norm.items()
            if t > rec["queries"][n] + 1e-9
        }
        assert not over, f"normalized above raw: {over}"

    def test_fold_record_consistent(self):
        """The committed min-across-sweeps fold (if present) sums its
        maps and folds at-or-below every input sweep's totals."""
        try:
            rec = _load("BENCH_FOLD_r10.json")
        except FileNotFoundError:
            pytest.skip("no fold record")
        assert rec["value"] == pytest.approx(
            round(sum(rec["queries"].values()), 3), abs=0.01
        )
        assert rec["value_normalized"] == pytest.approx(
            round(sum(rec["queries_normalized"].values()), 3), abs=0.01
        )
        for inp in rec["inputs"]:
            assert rec["value"] <= inp["value"] + 1e-6
            assert (rec["value_normalized"]
                    <= inp["value_normalized"] + 1e-6)


class TestWindowFreshness:
    def test_staged_window_delivers_the_n_minus_3_invariant(self):
        """VERDICT r9 item 7: at round close no query's latest
        official CORRECTNESS row may predate N-3.  Fails at
        window-setting time, not at judge time."""
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        from tools.check_freshness import check

        assert check() == []
