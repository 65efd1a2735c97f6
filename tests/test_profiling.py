"""utils/profiling.py coverage: the --profiler simple/advanced machinery
(reference delegates to Lightning's --profiler flag, SURVEY.md §5)."""

import json
import time

from sv3d_tpu.utils.profiling import StepTimer, trace


def test_step_timer_sections_and_dump(tmp_path):
    t = StepTimer()
    for _ in range(3):
        with t.section("train"):
            time.sleep(0.002)
    with t.section("val"):
        pass
    s = t.summary()
    assert s["train"]["count"] == 3 and s["val"]["count"] == 1
    assert s["train"]["total_s"] >= 0.006
    assert s["train"]["mean_ms"] >= 2.0
    out = tmp_path / "profile.json"
    t.dump(out)
    assert json.loads(out.read_text())["train"]["count"] == 3


def test_step_timer_counts_exceptions(tmp_path):
    t = StepTimer()
    try:
        with t.section("boom"):
            raise RuntimeError
    except RuntimeError:
        pass
    assert t.summary()["boom"]["count"] == 1  # finally-path accounting


def test_trace_produces_profile_dir(tmp_path):
    import jax.numpy as jnp

    with trace(tmp_path):
        _ = jnp.ones((8, 8)).sum().block_until_ready()
    assert any(tmp_path.rglob("*.trace.json.gz")) or any(tmp_path.iterdir())
