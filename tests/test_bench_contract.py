"""The bench stdout contract: bench.py prints ONE compact JSON line the
driver's stdout-tail capture can always parse. Round 4 lost its entire
bench artifact (BENCH_r04.json "parsed": null) because pair-level evidence
(rep lists, ceiling brackets, method prose) moved inline and the line
outgrew the capture — compact_result pins that regression shut."""

from __future__ import annotations

import json

import bench


def _worst_case_full() -> dict:
    """A scaling blob fatter than any real run: 16 attempted pairs with
    full rep lists and reasons, 48 queries, long method prose."""
    pairs = [{
        "ceil_before": 0.976, "ceil_after": 1.025,
        "load1_before": 1.58, "load1_after": 1.74,
        "lo_tps": [101212, 111062, 127503, 113708],
        "hi_tps": [142673, 410908, 293641],
        "lo_best_gap": 0.108, "hi_best_gap": 0.653,
        "efficiency_raw": 0.806, "efficiency": 0.806,
        "accepted": i % 3 == 0,
        "reason": None if i % 3 == 0 else
        "hi best not reproduced: second-best hi sample >30% below the best",
    } for i in range(16)]
    return {
        "metric": "pit_backfill_total_sec", "value": 47.2, "unit": "sec",
        "queries": {f"query_with_a_long_descriptive_name_{i:02d}": 1.234
                    for i in range(48)},
        "sf": 0.1, "turns": 400000, "turns_per_sec": 361890,
        "scaling": {
            "local[1]_turns_per_sec": 136789,
            "local[4]_turns_per_sec": 410908,
            "efficiency": 0.852,
            "headline_is": "median of accepted (clean-window) pairs",
            "accepted_pair_efficiencies": [0.852, 0.81, 0.9, 0.83, 0.88, 0.86],
            "all_pair_efficiencies": [p["efficiency"] for p in pairs],
            "fallback_no_accepted_pair": False,
            "efficiency_best_pair": 0.9,
            "efficiency_ratio_of_bests": 0.852,
            "efficiency_vs_jvm_control": 1.31,
            "pairs": pairs,
            "ceilings_while_waiting": [0.61, 0.72, 0.55] * 10,
            "method": "A-B-A fresh-process probes (lo,hi,lo; warm passes "
                      "timed as extra downward-biased samples) with per-pair "
                      "busy-loop host-ceiling brackets; pair ratio = best-of "
                      "per level, accepted only if ceilings bracket clean, "
                      "each level's best is REPRODUCED by its second-best, "
                      "and efficiency<=1.05; headline = median of accepted",
            "jvm_control": {
                "local[1]_rows_per_sec": 25204374,
                "local[4]_rows_per_sec": 67247972,
                "speedup": 2.67, "parallel_efficiency": 0.667,
                "note": "pure-JVM hash aggregate, no Python: what the host "
                        "delivers to MEMORY-BANDWIDTH-bound work",
            },
        },
    }


def test_compact_line_fits_and_round_trips():
    full = _worst_case_full()
    compact = bench.compact_result(full, "BENCH_evidence_last.json")
    line = json.dumps(compact)
    assert len(line) < 4096, len(line)
    parsed = json.loads(line)
    # the gate's gradeables survive
    assert parsed["value"] == 47.2
    assert len(parsed["queries"]) == 48
    assert parsed["turns_per_sec"] == 361890
    sc = parsed["scaling"]
    assert sc["efficiency"] == 0.852
    assert sc["efficiency_vs_jvm_control"] == 1.31
    assert sc["jvm_control_parallel_efficiency"] == 0.667
    assert sc["n_pairs_attempted"] == 16
    assert sc["n_pairs_accepted"] == 6
    assert sc["evidence_file"] == "BENCH_evidence_last.json"
    # the fat stuff is gone from stdout (lives in the evidence file)
    assert "pairs" not in sc and "method" not in sc and "jvm_control" not in sc


def test_compact_line_handles_skipped_scaling():
    full = {"metric": "pit_backfill_total_sec", "value": 1.0, "unit": "sec",
            "queries": {"q": 1.0}, "sf": 0.01, "turns": 10,
            "turns_per_sec": 10, "scaling": {}}
    line = json.dumps(bench.compact_result(full, None))
    parsed = json.loads(line)
    assert parsed["scaling"] == {}
    full["scaling"] = {"skipped": "no probe completed inside the scaling budget"}
    parsed = json.loads(json.dumps(bench.compact_result(full, "e.json")))
    assert parsed["scaling"]["skipped"]


class _FakeTime:
    """Deterministic clock for measure_scaling: each time() call advances
    by ``step`` so the budget drains predictably without real sleeps."""

    def __init__(self, step):
        self.t, self.step = 0.0, step

    def time(self):
        self.t += self.step
        return self.t

    def sleep(self, s):
        self.t += s


def _run_scaling(monkeypatch, probe_seq, jvm_seq, ceil=1.0, budget="600",
                 step=300.0):
    """Drive measure_scaling with scripted probe results (no Spark)."""
    monkeypatch.setenv("SPARK_GRAFT_SCALING_BUDGET_SEC", budget)
    probes, jvms = list(probe_seq), list(jvm_seq)
    monkeypatch.setattr(bench, "_ceiling", lambda lo, hi, samples=2: ceil)
    monkeypatch.setattr(bench, "_run_probe",
                        lambda mode, cpus, *a: probes.pop(0) if probes else None)
    monkeypatch.setattr(bench, "_run_probe_scalar",
                        lambda mode, cpus, *a: jvms.pop(0) if jvms else None)
    monkeypatch.setattr(bench, "time", _FakeTime(step))
    return bench.measure_scaling()


def test_scaling_rejects_low_pair_in_degraded_window(monkeypatch):
    """r4 failure mode: clean busy-loop ceilings but the same window's
    pure-JVM control collapsed — an accepted-but-low pair must NOT happen;
    it is rejected with the control as evidence, and eff_vs_control is
    still recorded (weather-invariant number)."""
    # one attempt: lo [100, 99], hi [230, 225, 228], lo2 -> eff 0.575
    sc = _run_scaling(
        monkeypatch,
        probe_seq=[[100.0, 99.0], [230.0, 225.0, 228.0], [100.0, 98.0]],
        jvm_seq=[100.0, 266.8],  # control scales 2.668x/4 = 0.667 < 0.75
        budget="600",  # one attempt (clock step 300 drains it)
    )
    [pair] = sc["pairs"]
    assert pair["accepted"] is False
    assert "window degraded" in pair["reason"]
    assert pair["jvm_control_eff"] == 0.667
    assert pair["eff_vs_control"] == round((230 / 100 / 4) / 0.667, 3)
    assert sc["fallback_no_accepted_pair"] is True
    # headline vs-control survives the storm
    assert sc["efficiency_vs_jvm_control"] == pair["eff_vs_control"]


def test_scaling_accepts_clean_pair_and_stops(monkeypatch):
    """A single accepted >=0.8 pair (clean ceilings, reproduced bests,
    healthy same-window control) ends the loop — round-4 verdict #2."""
    sc = _run_scaling(
        monkeypatch,
        probe_seq=[[100.0, 99.0], [340.0, 335.0, 338.0], [100.0, 98.0],
                   # a second attempt's probes, which must NOT be consumed
                   [1.0], [1.0], [1.0]],
        jvm_seq=[100.0, 360.0, 100.0, 360.0],  # control 0.9
        budget="100000", step=30.0,
    )
    assert len(sc["pairs"]) == 1
    [pair] = sc["pairs"]
    assert pair["accepted"] is True
    assert pair["efficiency"] == 0.85
    assert sc["efficiency"] == 0.85
    assert sc["fallback_no_accepted_pair"] is False
    assert sc["jvm_control"]["parallel_efficiency"] == 0.9


def test_scaling_accepts_high_pair_despite_degraded_window(monkeypatch):
    """Out-scaling a degraded window is stronger evidence, not weaker:
    eff >= 0.8 accepts even when the control collapsed."""
    sc = _run_scaling(
        monkeypatch,
        probe_seq=[[100.0, 99.0], [340.0, 335.0, 338.0], [100.0, 98.0]],
        jvm_seq=[100.0, 266.8],
        budget="600",
    )
    [pair] = sc["pairs"]
    assert pair["accepted"] is True and pair["efficiency"] == 0.85
