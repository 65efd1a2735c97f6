"""bench.py's supervisor must always emit one parseable JSON line.

Round 2's driver benchmark died at backend init ("Unable to initialize
backend 'axon': UNAVAILABLE") before printing anything — an entire round of
perf evidence lost to one flaky tunnel window.  Round 4's died differently:
the DRIVER's wall-clock limit killed the (healthy, still-measuring)
supervisor at rc=124, losing everything it had buffered.  The supervisor now
works against one absolute budget (SV3D_BENCH_BUDGET), STREAMS the child's
incremental JSON emissions through as they are produced (so a kill at any
point after the first emission still leaves a parseable artifact on the
driver's captured output), retries with budget-clipped backoff, and falls
back to an {"error": ...} JSON line if no attempt ever emitted JSON.  These
tests drive the child outcomes through the real subprocess path via the
SV3D_BENCH_TEST_MODE hook.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

BENCH = Path(__file__).resolve().parent.parent / "bench.py"


def _run(mode, attempts=2, budget=60):
    env = dict(
        os.environ,
        SV3D_BENCH_TEST_MODE=mode,
        SV3D_BENCH_ATTEMPTS=str(attempts),
        SV3D_BENCH_BUDGET=str(budget),
        SV3D_BENCH_SLEEPS="0,0",
    )
    env.pop("SV3D_BENCH_CHILD", None)
    return subprocess.run(
        [sys.executable, str(BENCH)],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )


def _json_line(stdout):
    lines = [l for l in stdout.splitlines() if l.strip().startswith("{")]
    assert lines, f"no JSON line in {stdout!r}"
    return json.loads(lines[-1])


def test_success_forwards_child_json():
    proc = _run("ok")
    assert proc.returncode == 0
    out = _json_line(proc.stdout)
    assert out["metric"] == "test"
    assert "error" not in out


def test_child_failure_emits_error_json():
    proc = _run("fail")
    assert proc.returncode == 1
    out = _json_line(proc.stdout)
    assert out["value"] == 0.0
    assert "all bench attempts failed" in out["error"]
    assert "rc=3" in out["error"]


def test_child_hang_times_out_and_emits_error_json():
    proc = _run("hang", attempts=2, budget=3)
    assert proc.returncode == 1
    out = _json_line(proc.stdout)
    assert "timed out" in out["error"]
    assert out["vs_baseline"] == 0.0


def test_partial_emission_survives_child_hang():
    """The r4 failure mode, fixed: a child that emitted its primary JSON and
    THEN hung must still land the partial artifact (streamed through before
    the watchdog kill) and exit 0 — a partial artifact IS the result."""
    proc = _run("partial_then_hang", attempts=1, budget=20)
    assert proc.returncode == 0
    out = _json_line(proc.stdout)
    assert out["value"] == 2.0
    assert "error" not in out
