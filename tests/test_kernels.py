"""Kernel-level validation: jnp slicing ops vs the scalar-loop oracle.

Grids use distinct nx/ny/nz to catch axis mixups. Agreement is required to
~1 ulp (identical expression trees evaluated by different engines).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import oracle_scalar as orc
from navierstokes3d_tpu import preset_gpu, preset_multi
from navierstokes3d_tpu.bc import make_bc_fns
from navierstokes3d_tpu.grid import make_grid
from navierstokes3d_tpu.models.chorin import ChorinSolver
from navierstokes3d_tpu.ops import physics as ph
from navierstokes3d_tpu.ops.advect import advect
from navierstokes3d_tpu.ops.cylinder import apply_cylinder, build_masks

NX, NY, NZ = 8, 6, 5
DX, DY, DZ = 0.11, 0.21, 0.31
RHO, MU, G, DT = 1000.0, 0.001, 9.81, 0.013
RNG = np.random.default_rng(42)


def rand(shape):
    return RNG.standard_normal(shape)


def fields():
    vx = rand((NX + 1, NY, NZ))
    vy = rand((NX, NY + 1, NZ))
    vz = rand((NX, NY, NZ + 1))
    return vx, vy, vz


def assert_close(a, b, tol=1e-13):
    np.testing.assert_allclose(np.asarray(a), b, rtol=tol, atol=tol)


def test_update_tau():
    vx, vy, vz = fields()
    ref = orc.update_tau(vx, vy, vz, MU, DX, DY, DZ)
    got = ph.update_tau(jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(vz),
                        MU, DX, DY, DZ)
    for g_, r_ in zip(got, ref):
        assert_close(g_, r_)


def test_predict_v():
    vx, vy, vz = fields()
    taus = orc.update_tau(vx, vy, vz, MU, DX, DY, DZ)
    ref = orc.predict_v(vx, vy, vz, *taus, RHO, G, DT, DX, DY, DZ)
    got = ph.predict_v(jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(vz),
                       *[jnp.asarray(t) for t in taus], RHO, G, DT, DX, DY, DZ)
    for g_, r_ in zip(got, ref):
        assert_close(g_, r_)


def test_divv():
    vx, vy, vz = fields()
    ref = orc.update_divv(vx, vy, vz, DX, DY, DZ)
    got = ph.update_divv(jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(vz),
                         DX, DY, DZ)
    assert_close(got, ref)


def test_poisson_iter_and_residual():
    pr = rand((NX, NY, NZ))
    divv = rand((NX, NY, NZ))
    dpr_inner = rand((NX - 2, NY - 2, NZ - 2))
    dtau, damp = 0.017, 2.0 / NX
    # full-shape dprdtau with zero ring == reference inner array
    dpr_full = np.zeros((NX, NY, NZ))
    dpr_full[1:-1, 1:-1, 1:-1] = dpr_inner
    pr_ref, dpr_ref = orc.poisson_iter(pr, dpr_inner, divv, RHO, DT, dtau,
                                       damp, DX, DY, DZ)
    pr_got, dpr_got = ph.poisson_iter(jnp.asarray(pr), jnp.asarray(dpr_full),
                                      jnp.asarray(divv), RHO, DT, dtau, damp,
                                      DX, DY, DZ)
    assert_close(pr_got, pr_ref)
    assert_close(dpr_got[1:-1, 1:-1, 1:-1], dpr_ref)
    # ring must remain exactly zero
    ring = np.asarray(dpr_got).copy()
    ring[1:-1, 1:-1, 1:-1] = 0.0
    assert np.all(ring == 0.0)

    rp_ref = orc.compute_res(pr_ref, divv, RHO, DT, DX, DY, DZ)
    rp_got = ph.poisson_residual(jnp.asarray(pr_ref), jnp.asarray(divv),
                                 RHO, DT, DX, DY, DZ)
    assert_close(rp_got, rp_ref)


def test_correct_v():
    vx, vy, vz = fields()
    pr = rand((NX, NY, NZ))
    ref = orc.correct_v(vx, vy, vz, pr, DT, RHO, DX, DY, DZ)
    got = ph.correct_v(jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(vz),
                       jnp.asarray(pr), DT, RHO, DX, DY, DZ)
    for g_, r_ in zip(got, ref):
        assert_close(g_, r_)


@pytest.mark.parametrize("compat", [True, False])
@pytest.mark.parametrize("method", ["gather", "selectshift"])
def test_advect(compat, method):
    # moderate velocities so departure points stay near (but some clamping
    # paths trigger at the domain edges); displacements stay within the
    # selectshift bound K=3
    vx, vy, vz = (0.8 * f for f in fields())
    c = rand((NX, NY, NZ))
    ref = orc.advect(vx, vy, vz, c, DT * 10, DX, DY, DZ, compat=compat)
    got = advect(jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(vz),
                 jnp.asarray(c), DT * 10, DX, DY, DZ, compat=compat,
                 method=method)
    for name, g_, r_ in zip("vx vy vz c".split(), got, ref):
        assert_close(g_, r_)


@pytest.mark.parametrize("variant", ["multi", "gpu"])
def test_cylinder(variant):
    cfg = (preset_multi if variant == "multi" else preset_gpu)(nx=24, nt=1)
    grid = make_grid(cfg)
    masks = build_masks(cfg, grid)
    vx = rand(grid.shape_vx)
    vy = rand(grid.shape_vy)
    vz = rand(grid.shape_vz)
    c = rand(grid.shape_c)
    phys = cfg.physics
    ref = orc.set_cylinder(c, vx, vy, vz, phys.a2, phys.b2, phys.ox, phys.oy,
                           np.sin(phys.beta), np.cos(phys.beta),
                           grid.lx, grid.ly, grid.lz,
                           grid.dx, grid.dy, grid.dz, variant=variant)
    got = apply_cylinder(jnp.asarray(c), jnp.asarray(vx), jnp.asarray(vy),
                         jnp.asarray(vz), masks)
    for g_, r_ in zip(got, ref):
        assert_close(g_, r_, tol=0)


@pytest.mark.parametrize("compat", [True, False])
def test_bc_multi(compat):
    cfg = preset_multi(nx=8, nt=1, compat=compat)
    grid = make_grid(cfg)
    set_bc_vel, set_bc_pr = make_bc_fns(cfg, grid)
    vx = rand(grid.shape_vx)
    vy = rand(grid.shape_vy)
    vz = rand(grid.shape_vz)
    pr = rand(grid.shape_c)
    ref = orc.set_bc_vel_multi(vx, vy, vz, cfg.physics.vin, compat=compat)
    got = set_bc_vel(jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(vz))
    for g_, r_ in zip(got, ref):
        assert_close(g_, r_, tol=0)
    assert_close(set_bc_pr(jnp.asarray(pr)), orc.set_bc_pr_multi(pr), tol=0)


def test_bc_gpu():
    cfg = preset_gpu(nx=8, nt=1)
    grid = make_grid(cfg)
    set_bc_vel, set_bc_pr = make_bc_fns(cfg, grid)
    vx = rand(grid.shape_vx)
    vy = rand(grid.shape_vy)
    vz = rand(grid.shape_vz)
    pr = rand(grid.shape_c)
    ref = orc.set_bc_vel_gpu(vx, vy, vz)
    got = set_bc_vel(jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(vz))
    for g_, r_ in zip(got, ref):
        assert_close(g_, r_, tol=0)
    ref_pr = orc.set_bc_pr_gpu(pr, grid.dz, grid.nz, cfg.physics.g,
                               cfg.physics.rho)
    assert_close(set_bc_pr(jnp.asarray(pr)), ref_pr, tol=0)


def test_advect_clamp_stat():
    """Select-shift displacements beyond SELECTSHIFT_K silently diverge from
    the reference's gather semantics; with_stats makes that observable.
    A manufactured |dt*v/dx| >> K field must trip the counter."""
    vx, vy, vz = (0.1 * f for f in fields())
    c = rand((NX, NY, NZ))

    def run(vx_, method):
        return advect(jnp.asarray(vx_), jnp.asarray(vy), jnp.asarray(vz),
                      jnp.asarray(c), DT * 10, DX, DY, DZ, compat=False,
                      method=method, with_stats=True)

    *_, n0 = run(vx, "selectshift")
    assert int(n0) == 0, "mild velocities must not clamp"
    big_vx = vx + 50.0 * DX / (DT * 10)  # displacement ~50 cells
    *_, n1 = run(big_vx, "selectshift")
    assert int(n1) > 0, "50-cell displacement must trip the clamp counter"
    *_, n2 = run(big_vx, "gather")
    assert int(n2) == 0, "gather backend is exact; reports no clamps"
