"""Pins for bench.py's round-16 per-query drift adjudication: the
local-drift interpolation and the mechanical verdict rule (VERDICT r15
directive #4). Pure driver-side logic — no Spark session."""

from __future__ import annotations

import bench


class TestDriftAt:
    REF = bench.CALIBRATION_REF_SEC

    def test_interpolates_between_bracketing_probes(self):
        events = [(0.0, 0.6), (10.0, 1.2)]
        # midpoint: (0.6 + 1.2)/2 = 0.9 over REF
        assert abs(bench._drift_at(5.0, events) - 0.9 / self.REF) < 1e-9
        # quarter point
        assert abs(bench._drift_at(2.5, events) - 0.75 / self.REF) < 1e-9

    def test_clamps_to_nearest_outside_span(self):
        events = [(10.0, 0.9), (20.0, 0.3)]
        assert abs(bench._drift_at(1.0, events) - 0.9 / self.REF) < 1e-9
        assert abs(bench._drift_at(99.0, events) - 0.3 / self.REF) < 1e-9

    def test_single_probe(self):
        assert abs(bench._drift_at(7.0, [(3.0, 0.6)]) - 0.6 / self.REF) < 1e-9


class TestVerdictRule:
    """The rule as documented: drift-corrected vs drift-corrected
    (<0.85 improved, <=1.15 flat), a raw value still inside the
    previous round's own observed per-query spread (+5%) is ambient,
    everything else regressed. Exercised through the same arithmetic
    main() applies (kept inline there; this mirrors it 1:1 so a rule
    change must touch both — intentional friction for a grading
    surface)."""

    @staticmethod
    def verdict(norm_now, raw_now, base, spread_max):
        cmp = norm_now / base
        if cmp < 0.85:
            return "improved"
        if cmp <= 1.15:
            return "flat"
        if spread_max and raw_now <= spread_max * 1.05:
            return "ambient"
        return "regressed"

    def test_rule_partitions(self):
        assert self.verdict(0.4, 0.4, 0.5, 0.6) == "improved"
        assert self.verdict(0.52, 0.52, 0.5, 0.6) == "flat"
        # 40% over base but within last round's burst range
        assert self.verdict(0.7, 0.58, 0.5, 0.58) == "ambient"
        assert self.verdict(0.9, 0.9, 0.5, 0.58) == "regressed"


def test_previous_artifact_is_newest_round():
    prev = bench._previous_artifact_queries()
    # the repo carries BENCH_r01..r15 — the helper must pick the newest
    # with a parsed queries payload and expose spread for the verdicts
    assert prev is not None
    assert "queries" in prev and "spread" in prev
    assert "pricing_summary" in prev["queries"]
