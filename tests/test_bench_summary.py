"""The bench driver contract (VERDICT r4 item 1): the LAST stdout line must
always be a cumulative summary carrying every phase measured so far, with
the headline picked by priority (north star first once it lands), so an
external timeout can never erase the north-star metric from the recorded
line again (BENCH_r04.json rc=124 recorded only the narrowband line)."""

import io
import json
from contextlib import redirect_stdout

import bench


def _line(value, unit="frames/sec", vs=1.0):
    return {"metric": f"m-{value}", "value": value, "unit": unit,
            "vs_baseline": vs, "baseline": "target; >1 is better"}


class TestSummaryLine:
    def test_headline_priority_prefers_north_star(self):
        s = bench._summary_line({"device": _line(300.0),
                                 "north_star": _line(0.7, vs=0.07)})
        assert s["value"] == 0.7
        assert "north_star" in s["metric"]
        assert set(s["phases"]) == {"device", "north_star"}

    def test_earlier_phase_stands_in_before_north_star(self):
        s = bench._summary_line({"device": _line(300.0, vs=30.0)})
        assert s["value"] == 300.0
        assert "device" in s["metric"]

    def test_skipped_phase_never_headlines(self):
        s = bench._summary_line({
            "north_star": {"skipped": "budget"},
            "e2e": _line(0.5, vs=0.05),
        })
        assert s["value"] == 0.5
        assert "e2e" in s["metric"]
        assert s["phases"]["north_star"] == {"skipped": "budget"}

    def test_empty_results_still_valid_driver_line(self):
        s = bench._summary_line({})
        for k in ("metric", "value", "unit", "vs_baseline"):
            assert k in s

    def test_summary_is_json_serializable_and_has_driver_keys(self):
        s = bench._summary_line({"north_star": _line(0.9, vs=0.09)})
        parsed = json.loads(json.dumps(s))
        for k in ("metric", "value", "unit", "vs_baseline", "phases",
                  "wall_sec", "wall_budget_sec"):
            assert k in parsed


class TestEmitContract:
    def test_last_stdout_line_is_always_the_summary(self, monkeypatch):
        monkeypatch.setattr(bench, "_RESULTS", {})
        buf = io.StringIO()
        with redirect_stdout(buf):
            bench._emit("device", _line(250.0, vs=25.0))
            bench._emit("north_star", _line(0.8, vs=0.08))
        lines = [json.loads(ln) for ln in buf.getvalue().splitlines()]
        assert len(lines) == 4  # phase, summary, phase, summary
        last = lines[-1]
        assert last["value"] == 0.8  # north star headlines
        assert set(last["phases"]) == {"device", "north_star"}
        # the device phase's full record survives inside the summary
        assert last["phases"]["device"]["value"] == 250.0

    def test_skip_emits_summary_with_reason(self, monkeypatch, capsys):
        monkeypatch.setattr(bench, "_RESULTS", {})
        bench._emit("device", _line(250.0, vs=25.0))
        bench._skip("north_star", "no budget")
        out = capsys.readouterr().out.splitlines()
        last = json.loads(out[-1])
        assert last["phases"]["north_star"]["skipped"] == "no budget"
        assert last["value"] == 250.0  # falls back to the device line

    def test_vs_baseline_is_normalized_greater_is_better(self):
        # wall-clock lines must invert (target/wall), frame-rate lines
        # divide by the target: both read >1 = better. Spot-check the
        # arithmetic used by the phase emitters.
        assert round(10.0 / 21.0, 3) < 1.0  # slower-than-nominal wall
        assert round(301.8 / 10.0, 3) > 1.0  # faster-than-target fps


class TestBudget:
    def test_est_phase_sec_uses_band_floor(self):
        # unknown band -> assumes 30 MB/s; a MEASURED bad band is honored
        # down to the 0.5 MB/s floor (not rounded up to "fits")
        assert bench._est_phase_sec(300.0, {}, 1, 60.0) == 300.0 / 30.0 + 60.0
        est_bad = bench._est_phase_sec(300.0, {"h2d_mbps": 0.5}, 1, 60.0)
        assert est_bad == 300.0 / 0.5 + 60.0

    def test_est_phase_sec_measured_zero_band_is_not_unknown(self):
        # a probe that rounds to 0.0 MB/s must estimate at the floor, not
        # fall back to the optimistic 30 MB/s default (round-4 rc=124 trap)
        est = bench._est_phase_sec(300.0, {"h2d_mbps": 0.0}, 1, 60.0)
        assert est == 300.0 / 0.5 + 60.0

    def test_est_phase_sec_pack_discount_below_gate(self, monkeypatch):
        # packable phases ship ~55% of the raw wire below the pack gate
        # (mirrors io/ingest.py: 120 MB/s numpy / 500 native); at/above
        # the gate raw bytes ship unpacked
        monkeypatch.setattr(bench, "_pack_gate_mbps", lambda: 120.0)
        low = bench._est_phase_sec(1000.0, {"h2d_mbps": 60.0}, 1, 0.0,
                                   packable=True)
        assert low == 1000.0 * 0.55 / 60.0
        high = bench._est_phase_sec(1000.0, {"h2d_mbps": 200.0}, 1, 0.0,
                                    packable=True)
        assert high == 1000.0 / 200.0
        monkeypatch.setattr(bench, "_pack_gate_mbps", lambda: 500.0)
        mid = bench._est_phase_sec(1000.0, {"h2d_mbps": 200.0}, 1, 0.0,
                                   packable=True)
        assert mid == 1000.0 * 0.55 / 200.0

    def test_timing_stamp(self):
        assert bench._timing_stamp(3) == "warm best-of-3"
        assert "single pass" in bench._timing_stamp(1)
