"""Fused non-Poisson step kernels (kernels/fused_step.py) vs the jnp
chain (ops/physics.py + ops/cylinder.py + bc.py).

The kernels mirror the jnp chain's expression order and scalar rounding
(see the module docstring), but unlike the advect kernel's select-gated
accumulation, the predictor/corrector contain raw `v + s*f` updates that
XLA may or may not contract into FMAs per compilation — the jnp backend
differs from ITSELF across fusion splits the same way. The velocity
asserts are therefore per-element ulp bounds (measured: <=1 ulp on
<0.02% of points); the divergence gets an absolute bound scaled by the
cancellation amplification of its stencil. Interpret mode on CPU; f32
fields (the kernels' production dtype).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import navierstokes3d_tpu as ns
from navierstokes3d_tpu.kernels.fused_step import (build_correct,
                                                   build_predict)
from navierstokes3d_tpu.ops import physics as ph
from navierstokes3d_tpu.ops.cylinder import apply_cylinder


def _setup(nx, variant="gpu", compat=False):
    if variant == "gpu":
        cfg = ns.preset_gpu(nx=nx, nt=1, compat=compat, dtype="float32")
    else:
        cfg = ns.preset_multi(nx=nx, nt=1, compat=compat, dtype="float32")
    return ns.ChorinSolver(cfg)


def _fields(nx, ny, nz, seed=0):
    rng = np.random.default_rng(seed)
    f = np.float32
    vx = jnp.asarray(rng.normal(size=(nx + 1, ny, nz)).astype(f))
    vy = jnp.asarray(rng.normal(size=(nx, ny + 1, nz)).astype(f))
    vz = jnp.asarray(rng.normal(size=(nx, ny, nz + 1)).astype(f))
    pr = jnp.asarray(rng.normal(size=(nx, ny, nz)).astype(f))
    return vx, vy, vz, pr


@pytest.mark.parametrize("nx", [17, 24])
def test_predict_bitwise(nx):
    s = _setup(nx)
    g, phys = s.grid, s.cfg.physics
    ny, nz = g.ny, g.nz
    assert bool(np.asarray(s.masks.mask_vx).any()), "cylinder off-grid"
    vx, vy, vz, _ = _fields(nx, ny, nz)
    g_eff = 0.0 if s.pressure_split else phys.g
    fn = build_predict(nx, ny, nz, dt=g.dt, dx=g.dx, dy=g.dy, dz=g.dz,
                       mu=phys.mu, rho=phys.rho, g_eff=g_eff,
                       masks=s.masks, interpret=True)

    def ref(vx, vy, vz):
        taus = ph.update_tau(vx, vy, vz, phys.mu, g.dx, g.dy, g.dz)
        vx, vy, vz = ph.predict_v(vx, vy, vz, *taus, phys.rho, g_eff,
                                  g.dt, g.dx, g.dy, g.dz)
        _, vx, vy, vz = apply_cylinder(
            jnp.zeros((nx, ny, nz), jnp.float32), vx, vy, vz, s.masks)
        return vx, vy, vz, ph.update_divv(vx, vy, vz, g.dx, g.dy, g.dz)

    got = jax.jit(fn)(vx, vy, vz)
    want = jax.jit(ref)(vx, vy, vz)
    for name, a, b in zip("vx vy vz".split(), got[:3], want[:3]):
        np.testing.assert_array_almost_equal_nulp(
            np.asarray(a), np.asarray(b), nulp=4)
    # divv: the velocities are bit-exact, but the divergence is a DERIVED
    # contraction — XLA's per-compilation FMA/reassociation freedom makes
    # independently compiled evaluations of the same formula differ by a
    # few ulp (the jnp backend differs from itself across fusion splits
    # the same way — kernels/advect.py docstring). Assert a few-ulp bound
    # against both the ref-jit divv and the definition applied to the
    # kernel's own outputs.
    dv_def = jax.jit(lambda a, b, c: ph.update_divv(a, b, c, g.dx, g.dy,
                                                    g.dz))(*got[:3])
    scale = np.abs(np.asarray(dv_def)).max()
    for other in (dv_def, want[3]):
        np.testing.assert_allclose(np.asarray(got[3]), np.asarray(other),
                                   rtol=1e-5, atol=8 * 1.2e-7 * scale)


@pytest.mark.parametrize("variant", ["gpu", "multi"])
@pytest.mark.parametrize("nx", [17, 24])
def test_correct_bitwise(nx, variant):
    s = _setup(nx, variant=variant)
    g, phys = s.grid, s.cfg.physics
    ny, nz = g.ny, g.nz
    vx, vy, vz, pr = _fields(nx, ny, nz, seed=3)
    fn = build_correct(nx, ny, nz, dt=g.dt, dx=g.dx, dy=g.dy, dz=g.dz,
                       rho=phys.rho, masks=s.masks, interpret=True,
                       variant=variant, vin=phys.vin)

    def ref(vx, vy, vz, pr):
        vx, vy, vz = ph.correct_v(vx, vy, vz, pr, g.dt, phys.rho,
                                  g.dx, g.dy, g.dz)
        _, vx, vy, vz = apply_cylinder(
            jnp.zeros((nx, ny, nz), jnp.float32), vx, vy, vz, s.masks)
        return s.set_bc_vel(vx, vy, vz)

    got = jax.jit(fn)(vx, vy, vz, pr)
    want = jax.jit(ref)(vx, vy, vz, pr)
    for name, a, b in zip("vx vy vz".split(), got, want):
        np.testing.assert_array_almost_equal_nulp(
            np.asarray(a), np.asarray(b), nulp=4)


def test_predict_then_correct_matches_step_prelude():
    """Compose both kernels around a real Poisson solve input: the fused
    chain's divv equals the solver's predictor_divv on a developed
    state."""
    s = _setup(17)
    g = s.grid
    state = s.init_state()
    state, _ = s.step_jit(state)
    fn = build_predict(g.nx, g.ny, g.nz, dt=g.dt, dx=g.dx, dy=g.dy,
                       dz=g.dz, mu=s.cfg.physics.mu, rho=s.cfg.physics.rho,
                       g_eff=0.0 if s.pressure_split else s.cfg.physics.g,
                       masks=s.masks, interpret=True)
    _, _, _, divv = jax.jit(fn)(state.vx, state.vy, state.vz)
    want = jax.jit(s.predictor_divv)(state)
    np.testing.assert_allclose(np.asarray(divv), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("variant", ["gpu", "multi"])
def test_chained_step_wiring(variant, monkeypatch):
    """The full chained step (_step_chained: flat-layout handoffs
    between the predict, correct, and advect kernels, plus the tracer
    mask and clamp/pr_lo plumbing) runs in interpret mode on CPU via
    NS3D_FUSED_INTERPRET=1 and must reproduce the jnp step: a wiring
    bug (swapped operands, wrong unflat dims, dropped mask) is an O(1)
    physics change that shifts Poisson iteration counts and pr; the
    legitimate residue is per-program ulp rounding, chaotically
    amplified in the velocities by the advect discontinuity from the
    CFL_adv=1 init state (docs/numerics.md) but NOT in step-1's pr,
    which advection never touches."""
    monkeypatch.setenv("NS3D_FUSED_INTERPRET", "1")
    s1 = _setup(15, variant=variant)
    assert s1._advect_flat is not None, "chain not built under interpret"
    monkeypatch.delenv("NS3D_FUSED_INTERPRET")
    monkeypatch.setenv("NS3D_ADVECT", "selectshift")
    s0 = _setup(15, variant=variant)
    assert s0._fused_pre is None

    st1, st0 = s1.init_state(), s0.init_state()
    for step in range(2):
        st1, a = s1.step_jit(st1)
        st0, b = s0.step_jit(st0)
        assert int(a.iters) == int(b.iters), f"step {step} iters"
        ea = int(a.iters_ext or 0)
        eb = int(b.iters_ext or 0)
        assert ea == eb, f"step {step} iters_ext"
        for name in ("pr", "vx", "vy", "vz", "c"):
            assert np.isfinite(np.asarray(getattr(st1, name))).all(), name
        pa, pb = np.asarray(st1.pr), np.asarray(st0.pr)
        scale = max(1.0, np.abs(pb).max())
        tol = 1e-5 if step == 0 else 1e-3
        np.testing.assert_allclose(pa / scale, pb / scale, rtol=0,
                                   atol=tol, err_msg=f"pr step {step}")


# ---- lane-tiled kernels (wide-grid VMEM envelopes) ----

def test_lane_tiled_fused_kernels_bitwise():
    """The lane-tiled predict/correct kernels (tile halos fetched from
    neighbor lane blocks instead of full-row cyclic rolls) share one
    width-agnostic body with the untiled kernels, so in interpret mode
    they must be BIT-identical: only the data routing differs, and
    every lane a real output consumes carries true neighbor data."""
    from navierstokes3d_tpu.kernels.fused_step import CommonLayout
    s = _setup(24)
    g, phys = s.grid, s.cfg.physics
    nx, ny, nz = g.nx, g.ny, g.nz
    vx, vy, vz, pr = _fields(nx, ny, nz, seed=5)
    g_eff = 0.0 if s.pressure_split else phys.g
    outs = {}
    for tiles in (None, 3):
        lay = CommonLayout(nx, ny, nz, lane_tiles=tiles)
        if tiles:
            assert lay.T == tiles, (lay.T, lay.WT, lay.HW)
        pf = build_predict(nx, ny, nz, dt=g.dt, dx=g.dx, dy=g.dy,
                           dz=g.dz, mu=phys.mu, rho=phys.rho,
                           g_eff=g_eff, masks=s.masks, interpret=True,
                           layout=lay)
        cf = build_correct(nx, ny, nz, dt=g.dt, dx=g.dx, dy=g.dy,
                           dz=g.dz, rho=phys.rho, masks=s.masks,
                           interpret=True, variant="gpu",
                           vin=phys.vin, layout=lay)
        pvx, pvy, pvz, dv = jax.jit(pf)(vx, vy, vz)
        cvx, cvy, cvz = jax.jit(cf)(pvx, pvy, pvz, pr)
        outs[tiles] = (pvx, pvy, pvz, dv, cvx, cvy, cvz)
    for name, a, b in zip("pvx pvy pvz divv cvx cvy cvz".split(),
                          outs[3], outs[None]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_lane_tiled_advect_bitwise():
    """The lane-tiled flat advection kernel vs untiled: bit-identical
    outputs and exactly equal clamp counts (the tiled write mask zeroes
    its halo lanes so every real lane is counted once)."""
    from navierstokes3d_tpu.kernels.advect import build_advect_flat
    from navierstokes3d_tpu.kernels.fused_step import CommonLayout
    s = _setup(24)
    g = s.grid
    nx, ny, nz = g.nx, g.ny, g.nz
    vx, vy, vz, _ = _fields(nx, ny, nz, seed=8)
    c = jnp.asarray(np.random.default_rng(9).random(
        (nx, ny, nz)).astype(np.float32))
    # scale velocities so some departure points clamp (k exceeded)
    vx = vx * 3.0
    outs = {}
    for tiles in (None, 3):
        lay = CommonLayout(nx, ny, nz, lane_tiles=tiles,
                           halo_k=max(3, s.advect_k + 1))
        fn = build_advect_flat(nx, ny, nz, g.dt, g.dx, g.dy, g.dz,
                               k=s.advect_k, interpret=True, layout=lay)
        outs[tiles] = jax.jit(fn.on3d)(vx, vy, vz, c)
    a, b = outs[3], outs[None]
    assert int(a[4]) == int(b[4]) and int(a[4]) > 0, "clamp counts"
    for name, x, y in zip("vx vy vz c".split(), a[:4], b[:4]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)


def test_chained_step_lane_tiled(monkeypatch):
    """The full chained step with NS3D_FUSED_LANE_TILES=3 (interpret)
    vs the untiled chained step: identical Poisson iteration counts and
    bit-equal step-1 pressure (the tiled kernels are bit-identical, so
    unlike the jnp comparison above there is no per-program rounding
    residue in the chain itself)."""
    monkeypatch.setenv("NS3D_FUSED_INTERPRET", "1")
    s0 = _setup(15)
    monkeypatch.setenv("NS3D_FUSED_LANE_TILES", "3")
    s1 = _setup(15)
    assert s1._advect_flat is not None
    assert s1._advect_flat.layout.T == 3
    assert s0._advect_flat is not None and s0._advect_flat.layout.T == 1
    st1, st0 = s1.init_state(), s0.init_state()
    for step in range(2):
        st1, a = s1.step_jit(st1)
        st0, b = s0.step_jit(st0)
        assert int(a.iters) == int(b.iters), f"step {step} iters"
        assert int(a.advect_clamped or 0) == int(b.advect_clamped or 0)
        pa, pb = np.asarray(st1.pr), np.asarray(st0.pr)
        scale = max(1.0, np.abs(pb).max())
        np.testing.assert_allclose(pa / scale, pb / scale, rtol=0,
                                   atol=1e-6, err_msg=f"pr step {step}")
        for name in ("vx", "vy", "vz", "c"):
            assert np.isfinite(np.asarray(getattr(st1, name))).all()


def test_flat_state_step_equivalence(monkeypatch):
    """NumericsConfig.flat_state: the chained step on flat-carried state
    must be BIT-identical to the canonical-state chained step (the
    kernels already hand flat operands to each other inside one step;
    flat mode only removes the entry/exit relayouts, which are exact
    zero-pad embeddings), with stats equal and I/O boundaries seeing
    canonical 3D fields."""
    import dataclasses
    monkeypatch.setenv("NS3D_FUSED_INTERPRET", "1")
    s0 = _setup(15)
    cfg1 = dataclasses.replace(
        s0.cfg, numerics=dataclasses.replace(s0.cfg.numerics,
                                             flat_state=True))
    s1 = ns.ChorinSolver(cfg1)
    assert s1.flat_state and not s0.flat_state
    st0, st1 = s0.init_state(), s1.init_state()
    assert st1.vx.ndim == 2, "flat-state init must carry flat fields"
    # canonical view of the flat init == the canonical init, bitwise
    can1 = s1.canonical_state(st1)
    for name in ("vx", "vy", "vz", "c"):
        np.testing.assert_array_equal(np.asarray(getattr(can1, name)),
                                      np.asarray(getattr(st0, name)),
                                      err_msg=f"init {name}")
    for step in range(2):
        st0, a = s0.step_jit(st0)
        st1, b = s1.step_jit(st1)
        assert st1.vx.ndim == 2
        assert int(a.iters) == int(b.iters)
        assert int(a.advect_clamped or 0) == int(b.advect_clamped or 0)
        can1 = s1.canonical_state(st1)
        for name in ("pr", "vx", "vy", "vz", "c"):
            np.testing.assert_array_equal(
                np.asarray(getattr(can1, name)),
                np.asarray(getattr(st0, name)),
                err_msg=f"step {step} {name}")
    # gather_inner canonicalizes internally
    g0 = s0.gather_inner(st0)
    g1 = s1.gather_inner(st1)
    for a, b in zip(g0, g1):
        np.testing.assert_array_equal(a, b)
    # predictor_divv on the flat state matches the canonical one
    d0 = jax.jit(s0.predictor_divv)(st0)
    d1 = jax.jit(s1.predictor_divv)(st1)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
