"""bench.py orchestration units (no device, no heavy runs).

VERDICT r4 #1/#6: round 4's driver capture lost its on-chip artifact to a
tunnel flap (BENCH_r04.json = cpu_fallback 8.7x) because the bench had
probe-level resilience only and a silent fallback record.  These tests pin
the parent/child orchestration pieces that don't need the chip:

- the parent extracts exactly the child's final valid JSON line (a child
  killed mid-print must not yield a truncated artifact);
- the degraded CPU record carries the explicit not-a-TPU-measurement note;
- the probe's retry budget covers CLAUDE.md's measured ~8-10 min flap
  recovery (the round-4 failure mode was a budget shorter than the flap).
"""

import importlib.util
import json
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_final_json_line_picks_last_valid_record():
    out = "\n".join([
        '{"metric": "realtime_factor", "value": 1.0}',
        "some stray line",
        '{"metric": "realtime_factor", "value": 2.0, "device": "tpu"}',
    ])
    line = bench._final_json_line(out)
    assert json.loads(line)["value"] == 2.0


def test_final_json_line_rejects_truncated_tail():
    """A child killed mid-print leaves a truncated last line; the parent
    must fall back to the previous complete record (or None)."""
    good = '{"metric": "realtime_factor", "value": 3.0, "device": "tpu"}'
    out = good + '\n{"metric": "realtime_factor", "val'
    assert bench._final_json_line(out) == good
    assert bench._final_json_line('{"metric": "realtime') is None
    assert bench._final_json_line("no json at all\n# comment") is None


def test_fallback_record_is_flagged_not_a_tpu_measurement():
    rec = bench._fallback_record(8.7)
    assert rec["device"] == "cpu_fallback"
    assert "not a TPU" in rec["note"]
    assert rec["value"] == 8.7 and rec["metric"] == "realtime_factor"
    json.dumps(rec)  # one-line contract: must be JSON-serializable


def test_probe_retry_budget_covers_measured_flap_recovery():
    """CLAUDE.md: flap recovery measured ~8-10 min; VERDICT r4 #1 asks a
    total retry budget of >= 20 min.  Inspect the default waits."""
    import inspect

    sig = inspect.signature(bench._probe_device)
    waits = sig.parameters["waits_s"].default
    assert sum(waits) >= 1200, waits
    # escalating, and the longest single gap covers a short flap
    assert list(waits) == sorted(waits)
    assert max(waits) >= 480


def test_measure_flag_routes_to_measured_body(monkeypatch):
    called = []
    monkeypatch.setattr(bench, "measure", lambda: called.append(True))
    monkeypatch.setattr(sys, "argv", ["bench.py", "--measure"])
    bench.main()
    assert called == [True]


def test_mid_run_hang_retries_then_falls_back(monkeypatch):
    """The parent must warm compiles FIRST (a timed-out child must never
    be mid-remote-compile — killing one orphans the compile and stalls
    the device service), then retry a hung measured run (after a recovery
    wait + re-probe) and only then demote to the CPU fallback."""
    calls = {"measured": 0, "probe": 0, "fallback": 0, "sleep": [],
             "order": []}
    monkeypatch.setattr(bench, "_probe_device",
                        lambda **kw: calls.__setitem__(
                            "probe", calls["probe"] + 1) or True)
    monkeypatch.setattr(bench, "_warm_compiles",
                        lambda **kw: calls["order"].append("warm"))
    def _measured(t):
        calls["measured"] += 1
        calls["order"].append("measure")
        return False
    monkeypatch.setattr(bench, "_run_measured", _measured)
    monkeypatch.setattr(bench, "_cpu_fallback_bench",
                        lambda: calls.__setitem__("fallback", 1))
    monkeypatch.setattr(bench.time, "sleep", calls["sleep"].append)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    assert calls["order"][0] == "warm"  # compiles paid before any timeout
    assert calls["measured"] == 2     # one retry after the hang
    assert calls["probe"] >= 2        # initial probe + pre-retry re-probe
    assert calls["fallback"] == 1     # only after both attempts failed
    assert any(s >= 480 for s in calls["sleep"])  # waited out the flap
