"""Profiling/observability utilities (utils/profiling.py, utils/timers
.py) — the aux subsystem the reference lacks entirely (SURVEY.md §5).
Smoke-level: the trace context writes real artifacts and profile_steps
returns the north-star metrics."""

import glob
import os

import navierstokes3d_tpu as ns
from navierstokes3d_tpu.utils.profiling import profile_steps, trace


def test_profile_steps_summary_and_trace(tmp_path):
    cfg = ns.preset_multi(nx=9, nt=1, compat=False, dtype="float32")
    s = ns.ChorinSolver(cfg)
    state = s.init_state()
    state, _ = s.step_jit(state)   # warm (profile assumes compiled)
    out = profile_steps(s, state, n_steps=2, trace_dir=str(tmp_path / "tr"))
    assert out["poisson_iters_per_sec"] > 0
    assert out["time_per_step_s"] > 0
    assert out["roofline_iters_per_sec"] > 0
    assert 0 < out["roofline_fraction"]
    files = glob.glob(str(tmp_path / "tr" / "**" / "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace artifacts"


def test_trace_context_manager(tmp_path):
    import jax.numpy as jnp
    with trace(str(tmp_path / "t2")) as d:
        (jnp.ones((8, 8)) * 2).sum().block_until_ready()
    assert glob.glob(d + "/**/*", recursive=True)
