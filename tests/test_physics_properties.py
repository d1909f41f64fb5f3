"""Physics-property tests (the checks SURVEY.md §4 notes the reference
lacks): post-projection divergence reduction, BC idempotence, and the
pseudo-transient solver's convergence behavior.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

import navierstokes3d_tpu as ns
from navierstokes3d_tpu.bc import make_bc_fns
from navierstokes3d_tpu.grid import make_grid
from navierstokes3d_tpu.ops import physics as ph


def test_projection_reduces_divergence():
    """One full step must reduce the interior divergence of the velocity
    field by orders of magnitude (that is the point of the projection)."""
    # nx must keep dy/dx >= sqrt(3/3.1): the reference's CFLτ is over the
    # 3D stability limit on grids where ceil(0.6 nx) rounds up too far
    # (e.g. nx=31) — see docs/numerics.md. nx=30 gives dy/dx = 1 exactly.
    cfg = ns.preset_multi(nx=30, nt=1, compat=False)
    solver = ns.ChorinSolver(cfg)
    g = solver.grid
    rng = np.random.default_rng(5)
    # smooth random velocity field (rough RHS excites the marginal modes)
    def smooth(shape):
        a = rng.standard_normal(shape)
        for _ in range(4):
            for ax in range(3):
                a = 0.5 * a + 0.25 * (np.roll(a, 1, ax) + np.roll(a, -1, ax))
        return jnp.asarray(0.1 * a)
    st = solver.init_state()
    vx, vy, vz = (smooth(g.shape_vx), smooth(g.shape_vy),
                  smooth(g.shape_vz))
    divv = ph.update_divv(vx, vy, vz, g.dx, g.dy, g.dz)
    div0 = np.abs(np.asarray(divv)[1:-1, 1:-1, 1:-1]).max()
    # run the projection (Poisson solve + velocity correction) directly:
    # advection afterwards is not divergence-preserving for rough fields.
    pr, dpr, stats = solver.poisson_solve(st.pr, st.dprdtau, divv)
    vx2, vy2, vz2 = ph.correct_v(vx, vy, vz, pr, g.dt, cfg.physics.rho,
                                 g.dx, g.dy, g.dz)
    div1 = np.abs(np.asarray(ph.update_divv(
        vx2, vy2, vz2, g.dx, g.dy, g.dz))[1:-1, 1:-1, 1:-1]).max()
    assert float(stats.err) < cfg.numerics.eps_it
    assert div1 < 0.02 * div0, (div0, div1)


@pytest.mark.parametrize("variant", ["multi", "gpu"])
def test_bc_idempotence(variant):
    """Applying the BC orchestrators twice must equal applying them once
    (they are projections onto the BC-satisfying set)."""
    preset = ns.preset_multi if variant == "multi" else ns.preset_gpu
    cfg = preset(nx=10, nt=1, compat=False)
    grid = make_grid(cfg)
    set_bc_vel, set_bc_pr = make_bc_fns(cfg, grid)
    rng = np.random.default_rng(0)
    vx = jnp.asarray(rng.standard_normal(grid.shape_vx))
    vy = jnp.asarray(rng.standard_normal(grid.shape_vy))
    vz = jnp.asarray(rng.standard_normal(grid.shape_vz))
    pr = jnp.asarray(rng.standard_normal(grid.shape_c))
    once = set_bc_vel(vx, vy, vz)
    twice = set_bc_vel(*once)
    for a, b in zip(once, twice):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    pr1 = set_bc_pr(pr)
    pr2 = set_bc_pr(pr1)
    np.testing.assert_array_equal(np.asarray(pr1), np.asarray(pr2))


def test_poisson_converges_monotonically_for_smooth_rhs():
    """Residual history must decrease across checks for a smooth RHS
    (convergence-rate sanity for the damped pseudo-transient iteration)."""
    cfg = ns.preset_multi(nx=30, nt=1, compat=False)
    solver = ns.ChorinSolver(cfg)
    g = solver.grid
    x = np.linspace(0, np.pi, g.nx)[:, None, None]
    y = np.linspace(0, np.pi, g.ny)[None, :, None]
    z = np.linspace(0, np.pi, g.nz)[None, None, :]
    divv = jnp.asarray(0.05 * np.sin(x) * np.sin(y) * np.sin(z))
    pr0 = jnp.zeros(g.shape_c)
    dpr0 = jnp.zeros(g.shape_c)
    _, _, stats = solver.poisson_solve(pr0, dpr0, divv)
    hist = np.asarray(stats.err_hist)
    hist = hist[~np.isnan(hist)]
    assert len(hist) >= 2
    assert hist[-1] < cfg.numerics.eps_it
    # each subsequent check at least as small (allow 5% wiggle)
    assert np.all(hist[1:] <= hist[:-1] * 1.05), hist


def test_nan_guard_breaks_poisson_loop():
    """A non-finite residual must stop the Poisson loop at the first check
    (the reference's only resilience feature, gpu.jl:135)."""
    cfg = ns.preset_multi(nx=16, nt=1, compat=False)
    solver = ns.ChorinSolver(cfg)
    g = solver.grid
    divv = jnp.full(g.shape_c, jnp.nan)
    _, _, stats = solver.poisson_solve(jnp.zeros(g.shape_c),
                                       jnp.zeros(g.shape_c), divv)
    assert int(stats.iters) == g.nchk  # stopped at the first check
    assert not np.isfinite(float(stats.err))


def test_long_run_stability_multi():
    """100 steps of the multi preset stay bounded: velocities below ~2 vin,
    finite pressure, tracer within [0, 1+eps] (long-horizon regression the
    reference never had)."""
    cfg = ns.preset_multi(nx=30, nt=100, compat=False, dtype="float32")
    solver = ns.ChorinSolver(cfg)
    state = solver.init_state()
    for _ in range(100):
        state, stats = solver.step_jit(state)
    vmax = max(float(jnp.abs(getattr(state, f)).max())
               for f in ("vx", "vy", "vz"))
    assert np.isfinite(float(stats.err))
    assert vmax < 3.0, vmax
    c = np.asarray(state.c)
    assert np.isfinite(c).all()
    assert c.min() > -0.25 and c.max() < 1.25  # interpolation over/undershoot only
