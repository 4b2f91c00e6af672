"""bench.py outage guard: a wedged/unavailable TPU backend must degrade to
ONE machine-readable JSON line (error="tpu_unavailable") instead of a raw
traceback, keeping the round-over-round BENCH_r* record parseable across the
documented multi-hour tunnel outages (VERDICT r3 weak #2 / item 8)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["BENCH_PROBE_RETRY_S"] = "0.01"

import bench


def _parse_only_line(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, out
    return json.loads(out[0])


def test_probe_failure_emits_structured_line(capsys):
    def failing_probe():
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    rc = bench.run_guarded(probe_fn=failing_probe)
    assert rc == 0
    rec = _parse_only_line(capsys)
    assert rec["error"] == "tpu_unavailable"
    assert rec["metric"] == bench.METRIC
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert "UNAVAILABLE" in rec["reason"]


def test_probe_retries_are_bounded(capsys):
    calls = []

    def failing_probe():
        calls.append(time.monotonic())
        raise RuntimeError("down")

    bench.run_guarded(probe_fn=failing_probe)
    assert len(calls) == 3  # bounded retry window, then give up
    _parse_only_line(capsys)


def test_probe_success_then_main_failure_still_structured(capsys):
    def wedged_main():
        raise RuntimeError("TPU backend setup/compile error (Unavailable)")

    rc = bench.run_guarded(main_fn=wedged_main, probe_fn=lambda: None)
    assert rc == 0
    rec = _parse_only_line(capsys)
    assert rec["error"] == "tpu_unavailable"


def test_hang_watchdog_fires(capsys):
    def hanging_main():
        time.sleep(30)

    t0 = time.monotonic()
    bench.run_guarded(main_fn=hanging_main, probe_fn=lambda: None,
                      main_timeout_s=1)
    assert time.monotonic() - t0 < 10
    rec = _parse_only_line(capsys)
    assert rec["error"] == "tpu_unavailable"
    assert "watchdog" in rec["reason"]


def test_success_path_passes_through(capsys):
    def ok_main():
        print(json.dumps(dict(metric=bench.METRIC, value=1.0, unit="us",
                              vs_baseline=2000.0)))

    bench.run_guarded(main_fn=ok_main, probe_fn=lambda: None)
    rec = _parse_only_line(capsys)
    assert "error" not in rec
    assert rec["value"] == 1.0
