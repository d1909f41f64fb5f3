"""Pallas fused Poisson kernel vs the jnp oracle (interpret mode on CPU).

The kernel multiplies by precomputed 1/dx^2 while the oracle divides
(/dx/dx, the reference's exact order), so f32 results differ at rounding
level; from random input the marginally-stable iteration amplifies that
(see test_step_oracle.py). Correctness is asserted two ways: single
iteration at rounding tolerance, and 10 chained iterations staying at
least as close to an f64 oracle as the f32 jnp path itself.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import navierstokes3d_tpu as ns
from navierstokes3d_tpu.kernels.poisson import PoissonBCSpec, build_poisson_iter
from navierstokes3d_tpu.ops import physics as ph

RNG = np.random.default_rng(3)


def _setup(variant, nx=12):
    import dataclasses
    preset = ns.preset_multi if variant == "multi" else ns.preset_gpu
    cfg = preset(nx=nx, nt=1, compat=False, dtype="float32")
    # this file validates the UNSPLIT kernel formulation; the split +
    # extended pair have their own suite (test_precision.py)
    cfg = cfg.replace(numerics=dataclasses.replace(
        cfg.numerics, pressure_split=False, extended_precision=False))
    solver = ns.ChorinSolver(cfg.replace(use_pallas=False))
    g = solver.grid
    pr = RNG.standard_normal(g.shape_c)
    dpr = np.zeros(g.shape_c)
    dpr[1:-1, 1:-1, 1:-1] = RNG.standard_normal(
        (g.nx - 2, g.ny - 2, g.nz - 2))
    divv = RNG.standard_normal(g.shape_c)
    return cfg, solver, g, pr, dpr, divv


def _pallas_fn(cfg, g, slab=None, mode="blocked"):
    phys = cfg.physics
    nyz = g.ny * g.nz
    if cfg.variant == "multi":
        bc = PoissonBCSpec(True, None, np.zeros(nyz))
    else:
        iz = np.arange(1, g.nz + 1, dtype=np.float64)
        prof = phys.rho * phys.g * (g.nz - iz + 0.5) * g.dz
        prof2d = np.broadcast_to(prof[None, :], (g.ny, g.nz))
        bc = PoissonBCSpec(False, (prof2d + 100.0).ravel(), prof2d.ravel())
    return build_poisson_iter(g.nx, g.ny, g.nz, g.dx, g.dy, g.dz,
                              g.dtau, g.damp, bc, dtype=jnp.float32,
                              slab=slab, interpret=True, mode=mode)


@pytest.mark.parametrize("variant", ["multi", "gpu"])
@pytest.mark.parametrize("slab", [None, 4, 3])
@pytest.mark.parametrize("mode", ["blocked", "dma"])
def test_single_iteration_matches_jnp(variant, slab, mode):
    cfg, solver, g, pr, dpr, divv = _setup(variant)
    rho, dt = cfg.physics.rho, g.dt
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    pr1, dpr1 = ph.poisson_iter(f32(pr), f32(dpr), f32(divv), rho, dt,
                                g.dtau, g.damp, g.dx, g.dy, g.dz)
    pr1 = solver.set_bc_pr(pr1)
    iter_fn, pack, unpack = _pallas_fn(cfg, g, slab, mode)
    pp, df, rf = pack(f32(pr), f32(dpr), (rho / dt) * f32(divv))
    pr2, dpr2 = unpack(*iter_fn(pp, df, rf)[:2])
    scale = max(1.0, np.abs(np.asarray(pr1)).max())
    np.testing.assert_allclose(np.asarray(pr2) / scale,
                               np.asarray(pr1) / scale, rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dpr2), np.asarray(dpr1),
                               rtol=1e-4, atol=1e-3)
    # boundary ring of dprdtau must be exactly zero
    ring = np.asarray(dpr2).copy()
    ring[1:-1, 1:-1, 1:-1] = 0.0
    assert np.all(ring == 0.0)


def test_chained_iterations_track_f64_oracle():
    """10 chained kernel iterations must stay as close to the f64 oracle
    as the f32 jnp path does (catches pipeline/halo/aliasing bugs, which
    would produce O(1) divergence)."""
    jax.config.update("jax_enable_x64", True)
    cfg, solver, g, pr, dpr, divv = _setup("multi")
    rho, dt = cfg.physics.rho, g.dt

    p64, d64 = jnp.asarray(pr), jnp.asarray(dpr)
    dv64 = jnp.asarray(divv)
    p32, d32 = jnp.asarray(pr, jnp.float32), jnp.asarray(dpr, jnp.float32)
    dv32 = jnp.asarray(divv, jnp.float32)
    for _ in range(10):
        p64, d64 = ph.poisson_iter(p64, d64, dv64, rho, dt, g.dtau, g.damp,
                                   g.dx, g.dy, g.dz)
        p64 = solver.set_bc_pr(p64)
        p32, d32 = ph.poisson_iter(p32, d32, dv32, rho, dt, g.dtau, g.damp,
                                   g.dx, g.dy, g.dz)
        p32 = solver.set_bc_pr(p32)

    iter_fn, pack, unpack = _pallas_fn(cfg, g, slab=4, mode="dma")
    pp, df, rf = pack(jnp.asarray(pr, jnp.float32),
                      jnp.asarray(dpr, jnp.float32), (rho / dt) * dv32)
    for _ in range(10):
        pp, df = iter_fn(pp, df, rf)
    pk, _ = unpack(pp, df)

    err_jnp32 = np.abs(np.asarray(p32) - np.asarray(p64)).max()
    err_pallas = np.abs(np.asarray(pk) - np.asarray(p64)).max()
    assert err_pallas <= 3 * err_jnp32 + 1e-6, (err_pallas, err_jnp32)


def test_full_step_with_pallas_interpret():
    """Whole solver step with the Pallas Poisson path (interpret mode):
    same iteration counts and close fields vs the jnp path."""
    cfg = ns.preset_multi(nx=12, nt=1, compat=False, dtype="float32")
    s_ref = ns.ChorinSolver(cfg.replace(use_pallas=False))
    s_pal = ns.ChorinSolver(cfg.replace(use_pallas=True))
    assert s_pal._pallas is not None
    st_ref, stats_ref = s_ref.step_jit(s_ref.init_state())
    st_pal, stats_pal = s_pal.step_jit(s_pal.init_state())
    assert int(stats_ref.iters) == int(stats_pal.iters)
    for name in ("pr", "vx", "vy", "vz", "c"):
        a, b = np.asarray(getattr(st_ref, name)), np.asarray(getattr(st_pal, name))
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4, err_msg=name)


def test_blocked_ghost_rows_stay_inert():
    """With the default 8-row blocks, nx pads to NXP with ghost planes;
    they must stay exactly zero through chained iterations (any leak would
    corrupt the last real planes via the x-stencil)."""
    cfg, solver, g, pr, dpr, divv = _setup("multi")  # nx=12 -> NXP=16
    rho, dt = cfg.physics.rho, g.dt
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    iter_fn, pack, unpack = _pallas_fn(cfg, g, slab=None, mode="blocked")
    pp, df, rf = pack(f32(pr), f32(dpr), (rho / dt) * f32(divv))
    for _ in range(5):
        pp, df = iter_fn(pp, df, rf)[:2]
    assert np.all(np.asarray(pp)[g.nx:] == 0.0)
    assert np.all(np.asarray(df)[g.nx:] == 0.0)
    pr5, dpr5 = unpack(pp, df)
    assert np.isfinite(np.asarray(pr5)).all()


@pytest.mark.parametrize("variant", ["multi", "gpu"])
def test_folded_kernel_matches_jnp_folded_solve(variant):
    """The folded-BC kernel (non-compat default) implements the same
    numerics as _poisson_solve_jnp_folded: same iteration counts and
    rounding-level fields for a full solve from identical smooth inputs."""
    import dataclasses
    preset = ns.preset_multi if variant == "multi" else ns.preset_gpu
    cfg = preset(nx=20, nt=1, compat=False, dtype="float32")
    # plain folded kernel (no split/extended so both variants take the
    # same code path; split+extended covered by test_precision.py).
    # gpu unsplit f32 noise-floors near the default eps_it=1e-3 (the
    # hydrostatic offset), making the stall exit rounding-sensitive;
    # raise eps so both backends exit on the convergence criterion.
    cfg = cfg.replace(numerics=dataclasses.replace(
        cfg.numerics, pressure_split=False, extended_precision=False,
        eps_it=5e-3 if variant == "gpu" else 1e-3))
    s = ns.ChorinSolver(cfg.replace(use_pallas=True))
    assert s._pallas is not None and s._pallas_folded
    g = s.grid
    rng = np.random.default_rng(5)

    def smooth(shape, scale):
        a = rng.standard_normal(shape)
        for ax in range(3):
            a = 0.5 * a + 0.25 * (np.roll(a, 1, ax) + np.roll(a, -1, ax))
        return jnp.asarray(a * scale, jnp.float32)

    pr = smooth(g.shape_c, 10.0)
    dpr = jnp.zeros(g.shape_c, jnp.float32)
    divv = smooth(g.shape_c, 0.05)

    p1, d1, s1 = s._poisson_solve_pallas(pr, dpr, divv)
    p2, d2, s2 = s._poisson_solve_jnp_folded(pr, dpr, divv)
    assert int(s1.iters) == int(s2.iters), (int(s1.iters), int(s2.iters))
    scale = max(1.0, float(jnp.abs(p2).max()))
    np.testing.assert_allclose(np.asarray(p1) / scale,
                               np.asarray(p2) / scale, rtol=0, atol=2e-5)
    # dpr integrates the residual (steady state ~ dtau/damp * resid); the
    # backends' rounding-different-but-equivalent laps make its noise
    # ~eps*|p|/h^2 * dtau/damp — compare against that analytic bound
    h2 = min(g.dx, g.dy, g.dz) ** 2
    noise_d = (np.finfo(np.float32).eps * scale / h2) * (g.dtau / g.damp)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=0, atol=max(1e-3, 8 * noise_d))


def test_full_step_compat_with_pallas():
    """compat=True with the Pallas Poisson path: the kernel implements the
    exact update-then-BC sequence, so compat semantics hold on TPU too."""
    cfg = ns.preset_multi(nx=12, nt=1, compat=True, dtype="float32")
    s_ref = ns.ChorinSolver(cfg.replace(use_pallas=False))
    s_pal = ns.ChorinSolver(cfg.replace(use_pallas=True))
    assert s_pal._pallas is not None
    st_ref, stats_ref = s_ref.step_jit(s_ref.init_state())
    st_pal, stats_pal = s_pal.step_jit(s_pal.init_state())
    assert int(stats_ref.iters) == int(stats_pal.iters)
    for name in ("pr", "vx", "vy", "vz", "c"):
        a = np.asarray(getattr(st_ref, name))
        b = np.asarray(getattr(st_pal, name))
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4, err_msg=name)


@pytest.mark.parametrize("nit", [1, 3, 5])
def test_resident_chunk_matches_streaming(nit):
    """The VMEM-resident chunk kernel (nit in-place Jacobi sweeps per
    pallas call, kernels/poisson.py::make_resident) must reproduce nit
    streaming iter_fn calls: same pr/dPrdtau fields and the same emitted
    err (the masked max|resid| of the state ENTERING the final iteration
    — the flagged streaming call's value), to within per-program
    FMA-contraction rounding (1-2 f32 ULP — the same codegen-context
    tolerance the 2-sweep kernel documents, kernels/poisson.py:950-953).
    Interpret mode; a silent ordering/masking regression in the in-place
    sweep discipline shows as O(1) divergence here, far above the
    ULP-scale bound asserted."""
    nx, ny, nz = 20, 6, 6
    dx = dy = dz = 0.1
    bc = PoissonBCSpec(True, None, np.zeros(ny * nz))
    it, pack, unpack = build_poisson_iter(
        nx, ny, nz, dx, dy, dz, dtau=0.01, damp=0.9, bc=bc,
        dtype=jnp.float32, slab=5, interpret=True, mode="blocked",
        folded=True)
    res = getattr(it, "make_resident", None)
    assert res is not None, "folded T==1 branch must attach make_resident"
    res_fn = res(nit)
    assert res_fn is not None, "tiny grid must fit the VMEM budget"
    assert res(nit) is res_fn  # cached

    rng = np.random.default_rng(7)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    pr = f32(rng.standard_normal((nx, ny, nz)))
    dpr = np.zeros((nx, ny, nz))
    dpr[1:-1, 1:-1, 1:-1] = rng.standard_normal((nx - 2, ny - 2, nz - 2))
    dpr = f32(dpr)
    rhs = f32(rng.standard_normal((nx, ny, nz)))
    pp0, df0, rf = pack(pr, dpr, rhs)

    @jax.jit
    def run_stream(pp, df):
        for _ in range(nit - 1):
            pp, df, _ = it(pp, df, rf, False)
        pp, df, ec = it(pp, df, rf, True)
        return pp, df, jnp.max(ec)

    @jax.jit
    def run_res(pp, df):
        pp, df, ec = res_fn(pp, df, rf)
        return pp, df, ec.reshape(())

    p1, d1, e1 = run_stream(pp0, df0)
    p2, d2, e2 = run_res(pp0, df0)
    pa, da = unpack(p1, d1)
    pb, db = unpack(p2, d2)
    tol = dict(rtol=5e-7 * nit, atol=5e-7 * nit)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), **tol)
    np.testing.assert_allclose(np.asarray(da), np.asarray(db), **tol)
    np.testing.assert_allclose(float(e1), float(e2), **tol)


def test_resident_chunk_feeds_seeded_loop():
    """End-to-end contract: a resident pre-call with nit == nchk followed
    by the seeded flat loop reproduces the unseeded streaming loop's
    (iters, err, hist) — the composition ptloop.seed0 exists for.
    Iteration counts must match exactly; floats to ULP-scale tolerance
    (the resident kernel's fields differ from streaming by per-program
    FMA-contraction rounding, see test above)."""
    from navierstokes3d_tpu.ptloop import pt_loop_fused
    nx, ny, nz = 20, 6, 6
    dx = dy = dz = 0.1
    nchk, nchunks = 4, 6
    bc = PoissonBCSpec(True, None, np.zeros(ny * nz))
    it, pack, unpack = build_poisson_iter(
        nx, ny, nz, dx, dy, dz, dtau=0.01, damp=0.9, bc=bc,
        dtype=jnp.float32, slab=5, interpret=True, mode="blocked",
        folded=True)
    res_fn = it.make_resident(nchk)
    rng = np.random.default_rng(13)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    pr = f32(0.01 * rng.standard_normal((nx, ny, nz)))
    dpr = jnp.zeros((nx, ny, nz), jnp.float32)
    rhs = f32(0.01 * rng.standard_normal((nx, ny, nz)))
    pp0, df0, rf = pack(pr, dpr, rhs)
    eps = 1e-4

    def step_fn(carry, i):
        pp, df = carry
        do_chk = ((i + 1) % nchk) == 0
        pp, df, ec = it(pp, df, rf, do_chk)
        return (pp, df), jnp.max(ec), jnp.int32(1)

    @jax.jit
    def unseeded():
        return pt_loop_fused(step_fn, (pp0, df0), 0, nchunks * nchk,
                             nchk, nchunks, eps_it=eps, dtype=jnp.float32)

    @jax.jit
    def seeded():
        pp, df, ec = res_fn(pp0, df0, rf)
        return pt_loop_fused(step_fn, (pp, df), nchk, nchunks * nchk,
                             nchk, nchunks, eps_it=eps, dtype=jnp.float32,
                             err0=ec, seed0=True)

    (c1, it1, e1, h1), (c2, it2, e2, h2) = unseeded(), seeded()
    assert int(it1) == int(it2)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=1e-5, equal_nan=True)
    for a, b in zip(c1, c2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("extended", [False, True])
@pytest.mark.parametrize("mrows", [2, 4])
def test_folded_mrows_matches_m1(extended, mrows):
    """The M-row blocked fetch (M output slabs per grid step, Pr read as
    M+2 blocks -> (M+2)/M passes instead of 3) is a pure pipeline
    re-tiling: results must match the M=1 kernel to within compiler
    rounding (XLA may contract FMAs differently per program, so exact
    bitwise equality can miss by 1 ulp) over chained iterations — a halo
    or indexing bug would show as O(1) divergence. Grid sized so S=4
    exercises both M=2 and M=4."""
    nx, ny, nz = 20, 6, 6
    dx = dy = dz = 0.1
    bc = PoissonBCSpec(True, None, np.zeros(ny * nz))
    rng = np.random.default_rng(11)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    pr = f32(rng.standard_normal((nx, ny, nz)))
    dpr = np.zeros((nx, ny, nz))
    dpr[1:-1, 1:-1, 1:-1] = rng.standard_normal((nx - 2, ny - 2, nz - 2))
    dpr = f32(dpr)
    rhs = f32(rng.standard_normal((nx, ny, nz)))

    outs = []
    for m in (1, mrows):
        it, pack, unpack = build_poisson_iter(
            nx, ny, nz, dx, dy, dz, dtau=0.01, damp=0.9, bc=bc,
            dtype=jnp.float32, slab=5, interpret=True, mode="blocked",
            folded=True, extended=extended, mrows=m)
        assert it.mrows == m
        if extended:
            hi, lo, df, rf = pack(pr, dpr, rhs)
            for _ in range(3):
                hi, lo, df = it(hi, lo, df, rf)[:3]
            outs.append(unpack(hi, lo, df))
        else:
            pp, df, rf = pack(pr, dpr, rhs)
            for _ in range(3):
                pp, df = it(pp, df, rf)[:2]
            outs.append(unpack(pp, df))
    for a, b in zip(outs[0], outs[1]):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(a / scale, b / scale, rtol=0, atol=1e-6)


@pytest.mark.parametrize("nx", [13, 17])
def test_pallas_builds_for_prime_nx(nx):
    """Prime nx (e.g. the 127 midscale grid) must still get the Pallas
    path: blocked mode pads x to the slab multiple, so no divisor of nx
    is needed (a stale divisor gate silently dropped the kernel and fell
    back to the jnp path). Folded (non-compat) builds take any slab —
    the nx % B == 1 restriction is scoped to the exact zero-grad-x roll
    (compat multi), so e.g. nx=17 keeps B=8."""
    cfg = ns.preset_gpu(nx=nx, nt=1, compat=False, dtype="float32",
                        use_pallas=True)
    s = ns.ChorinSolver(cfg)
    assert s._pallas is not None
    assert s._pallas[0].slab % 8 == 0
    st, stats = s.step_jit(s.init_state())
    assert np.isfinite(np.asarray(st.pr)).all()
    assert int(stats.iters) > 0


def test_pallas_slab_roll_constraint_scoped():
    """nx ≡ 1 (mod 48) shapes (49, 97, 145, ...) — which admit no slab in
    (8,16,24) with nx % B != 1 — still get the Pallas path on folded
    (non-compat) builds, where the zero-grad-x roll never runs."""
    cfg = ns.preset_multi(nx=49, nt=1, compat=False, dtype="float32",
                          use_pallas=True)
    s = ns.ChorinSolver(cfg)
    assert s._pallas is not None
    st, stats = s.step_jit(s.init_state())
    assert np.isfinite(np.asarray(st.pr)).all()


def test_unroll2_loop_bitwise_equivalent(monkeypatch):
    """The 2x-unrolled convergence-loop body (ChorinSolver._unroll2;
    removes the while-carry's per-iteration pr copy by buffer ping-pong)
    must be a pure loop-structure change: identical kernel-call sequence
    and flags as the 1x loop, hence bit-identical fields and iteration
    counts. nx=17 gives nchk=10 (even) with rem=0, so both phase 1 and
    the defect-correction loop satisfy the parity gate and actually run
    unrolled."""
    import dataclasses
    # gpu preset: pressure split + defect accuracy, so phase 1 AND the
    # defect-correction loop both run (iters_ext > 0 asserted below)
    cfg = ns.preset_gpu(nx=17, nt=1, compat=False, dtype="float32",
                        use_pallas=True)

    def run():
        s = ns.ChorinSolver(cfg)
        assert s._pallas is not None and s._pallas_folded
        st, stats = s.step_jit(s.init_state())
        return st, stats

    s_probe = ns.ChorinSolver(cfg)
    assert s_probe._unroll2(s_probe.grid.niter
                            - s_probe.grid.niter % s_probe.grid.nchk)
    st2, stats2 = run()
    monkeypatch.setenv("NS3D_UNROLL2", "0")
    st1, stats1 = run()
    assert int(stats1.iters) == int(stats2.iters)
    assert (stats1.iters_ext is None) == (stats2.iters_ext is None)
    if stats1.iters_ext is not None:
        assert int(stats1.iters_ext) == int(stats2.iters_ext)
    np.testing.assert_array_equal(np.asarray(stats1.err),
                                  np.asarray(stats2.err))
    for name in ("pr", "vx", "vy", "vz", "c", "dprdtau"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st1, name)), np.asarray(getattr(st2, name)),
            err_msg=name)


# ---- temporal 2-sweep kernel ----

@pytest.mark.parametrize("zero_grad_x", [True, False])
@pytest.mark.parametrize("mrows", [1, 2])
def test_sweep2_matches_two_single_sweeps(zero_grad_x, mrows):
    """kernel2 (two damped Jacobi iterations per HBM round trip) must
    reproduce two single-sweep calls to within per-program compiler
    rounding (same slab math on the same values; XLA may contract FMAs
    differently per program — same standard as the M-row test above),
    and its emitted residual must equal the SECOND call's (the
    entering-iteration residual the convergence loop consumes)."""
    nx, ny, nz = 20, 6, 6
    dx = dy = dz = 0.1
    if zero_grad_x:
        bc = PoissonBCSpec(True, None, np.zeros(ny * nz))
    else:
        bc = PoissonBCSpec(False, np.full(ny * nz, 2.0),
                           np.zeros(ny * nz))
    rng = np.random.default_rng(5)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    pr = f32(rng.standard_normal((nx, ny, nz)))
    dpr = np.zeros((nx, ny, nz))
    dpr[1:-1, 1:-1, 1:-1] = rng.standard_normal((nx - 2, ny - 2, nz - 2))
    dpr = f32(dpr)
    rhs = f32(rng.standard_normal((nx, ny, nz)))

    it, pack, unpack = build_poisson_iter(
        nx, ny, nz, dx, dy, dz, dtau=0.01, damp=0.9, bc=bc,
        dtype=jnp.float32, slab=5, interpret=True, mode="blocked",
        folded=True, mrows=mrows)
    assert hasattr(it, "sweep2")
    pp, df, rf = pack(pr, dpr, rhs)

    @jax.jit
    def two_single(pp, df):
        pp, df, _ = it(pp, df, rf, False)
        return it(pp, df, rf, True)

    @jax.jit
    def one_double(pp, df):
        return it.sweep2(pp, df, rf, True)

    def close(a, b, msg):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(a / scale, b / scale, rtol=0,
                                   atol=1e-6, err_msg=msg)

    a1, a2, ae = two_single(pp, df)
    b1, b2, be = one_double(pp, df)
    close(a1, b1, "pr")
    close(a2, b2, "dpr")
    close(ae, be, "emitted residual")
    # chained: 3 double-sweeps == 6 singles
    pa, da = pp, df
    for _ in range(3):
        pa, da, _ = jax.jit(lambda p, d: it.sweep2(p, d, rf, False))(pa, da)
    pb, db = pp, df
    for _ in range(6):
        pb, db, _ = jax.jit(lambda p, d: it(p, d, rf, False))(pb, db)
    close(pa, pb, "pr chained")
    close(da, db, "dpr chained")


def test_solver_sweep2_step_equivalence(monkeypatch):
    """Full solver Poisson solve with the 4x temporal body (nchk=8 at
    nx=15) vs the same solve with NS3D_SWEEP2=0: iteration counts must
    match EXACTLY and fields to per-program compiler rounding (the mode
    only re-stages HBM traffic; FMA contraction may differ per program).
    The solve — not a full step — is compared: a full step ends in
    advection, whose floor() discontinuity legitimately amplifies 1-ulp
    pressure differences to O(cell) jumps on the CFL_adv=1 init state
    (see docs/roadmap.md)."""
    outs = []
    for flag in ("1", "0"):   # "1" opts IN (mode 4 is off by default)
        monkeypatch.setenv("NS3D_SWEEP2", flag)
        cfg = ns.preset_gpu(nx=15, nt=1, compat=False, dtype="float32",
                            use_pallas=True)
        s = ns.ChorinSolver(cfg)
        assert s._pallas is not None
        assert s.grid.nchk % 4 == 0 and s.grid.nchk >= 8
        if flag == "1":
            assert hasattr(s._pallas[0], "sweep2")
        st = s.init_state()
        divv = jax.jit(s.predictor_divv)(st)
        pr, dpr, stats = jax.jit(s.poisson_solve)(st.pr, st.dprdtau, divv)
        outs.append((pr, dpr, int(stats.iters),
                     int(stats.iters_ext or 0), float(stats.err)))
    (pr1, dpr1, it1, ext1, e1), (pr0, dpr0, it0, ext0, e0) = outs
    assert (it1, ext1) == (it0, ext0)
    # the reported err is max|resid| of a near-converged state —
    # cancellation-dominated, so ulp input differences move it by
    # ~1e-3 relative; the strong property is the iteration counts
    assert abs(e1 - e0) <= 1e-2 * max(abs(e0), 1e-30)
    # pr carries the answer; dprdtau at convergence is the damped
    # momentum of floor-level residual fluctuations (values ~1e-4 here),
    # which decorrelates under 1-ulp per-program rounding over hundreds
    # of iterations — not a meaningful equivalence target.
    a, b = np.asarray(pr1), np.asarray(pr0)
    scale = max(1.0, np.abs(b).max())
    np.testing.assert_allclose(a / scale, b / scale, rtol=0, atol=5e-6,
                               err_msg="pr")
    assert np.isfinite(np.asarray(dpr1)).all()


# ---- lane-tiled kernels (wide-grid traffic reduction) ----

@pytest.mark.parametrize("zero_grad_x", [True, False])
def test_lane_tiled_matches_untiled(zero_grad_x):
    """The lane-tiled folded kernel (tile halos fetched from neighbor
    blocks instead of full-row cyclic rolls) must be BIT-identical to
    the untiled kernel in interpret mode: the per-lane expressions and
    sum order are the same, only the data routing differs."""
    nx, ny, nz = 24, 20, 18
    dx = dy = dz = 0.1
    if zero_grad_x:
        bc = PoissonBCSpec(True, None, np.zeros(ny * nz))
    else:
        bc = PoissonBCSpec(False, np.full(ny * nz, 2.0),
                           np.zeros(ny * nz))
    rng = np.random.default_rng(7)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    pr = f32(rng.standard_normal((nx, ny, nz)))
    dpr = np.zeros((nx, ny, nz))
    dpr[1:-1, 1:-1, 1:-1] = rng.standard_normal((nx - 2, ny - 2, nz - 2))
    dpr = f32(dpr)
    rhs = f32(rng.standard_normal((nx, ny, nz)))
    kw = dict(dtau=0.01, damp=0.9, bc=bc, dtype=jnp.float32,
              interpret=True, mode="blocked", folded=True, mrows=1)
    it0, p0, u0 = build_poisson_iter(nx, ny, nz, dx, dy, dz, **kw)
    it3, p3, u3 = build_poisson_iter(nx, ny, nz, dx, dy, dz,
                                     lane_tiles=3, **kw)
    assert it0.lane_tiles == 1 and it3.lane_tiles == 3
    sA, sB = p0(pr, dpr, rhs), p3(pr, dpr, rhs)
    cA, cB = sA[:2], sB[:2]
    for i in range(3):
        oA = it0(*cA, sA[2], do_chk=1)
        oB = it3(*cB, sB[2], do_chk=1)
        cA, cB = oA[:2], oB[:2]
        np.testing.assert_array_equal(np.asarray(oA[2]),
                                      np.asarray(oB[2]),
                                      err_msg=f"err iter {i}")
    prA, dpA = u0(*cA)
    prB, dpB = u3(*cB)
    np.testing.assert_array_equal(np.asarray(prA), np.asarray(prB))
    np.testing.assert_array_equal(np.asarray(dpA), np.asarray(dpB))


@pytest.mark.parametrize("s", [2, 3, 4])
def test_tiled_sweep_matches_single_sweeps(s):
    """The tiled s-sweep kernel (s damped Jacobi iterations per HBM
    round trip) must reproduce s single-sweep calls to per-program
    compiler rounding, and its emitted residual must equal the LAST
    call's (the entering-iteration value the convergence loop
    consumes) exactly."""
    nx, ny, nz = 20, 20, 18
    bc = PoissonBCSpec(True, None, np.zeros(ny * nz))
    rng = np.random.default_rng(9)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    pr = f32(rng.standard_normal((nx, ny, nz)))
    dpr = np.zeros((nx, ny, nz))
    dpr[1:-1, 1:-1, 1:-1] = rng.standard_normal((nx - 2, ny - 2, nz - 2))
    dpr = f32(dpr)
    rhs = f32(rng.standard_normal((nx, ny, nz)))
    it, pack, unpack = build_poisson_iter(
        nx, ny, nz, 0.1, 0.1, 0.1, dtau=0.01, damp=0.9, bc=bc,
        dtype=jnp.float32, slab=5, interpret=True, mode="blocked",
        folded=True, mrows=2, lane_tiles=3, sweep_depth=4)
    assert s in it.sweep_fns
    pp, df, rf = pack(pr, dpr, rhs)
    cA = (pp, df)
    for i in range(s):
        oA = it(*cA, rf, do_chk=1 if i == s - 1 else 0)
        cA = oA[:2]
    oB = it.sweep_fns[s](pp, df, rf, do_chk=1)

    def close(a, b, msg):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(a / scale, b / scale, rtol=0,
                                   atol=2e-6, err_msg=msg)

    close(cA[0], oB[0], "pr")
    close(cA[1], oB[1], "dpr")
    np.testing.assert_array_equal(np.asarray(oA[2]), np.asarray(oB[2]),
                                  err_msg="emitted residual")


def test_solver_lane_tiled_solve_equivalence(monkeypatch):
    """Full solver Poisson solve with the lane-tiled kernel (nx=21,
    NS3D_LANE_TILES=3) vs the untiled default, twice:

    - sweeps OFF on both sides: the tiled kernel's data routing is
      bit-identical to the untiled kernel (the interpret-mode test
      above proves it), so the compiled solves must agree to the
      per-program rounding standard (atol 5e-6, as in the sweep2 test).
    - tiled default (temporal s-sweep bodies ON) vs untiled default:
      iteration counts must still match EXACTLY — the s-sweep emits the
      same entering-iteration residual — but the s-sweep reorders every
      iteration's FMA contractions, and near-unity damped-Jacobi
      contraction amplifies per-iteration ulp noise by ~1/(1-rho) over
      the ~200-iteration solve (measured 1.3e-4 here). Both states are
      converged below eps, so the principled bound on their difference
      is the convergence tolerance, not ulp."""
    outs = {}
    for tiles, sweeps in ((None, False), ("3", False), ("3", True)):
        if tiles:
            monkeypatch.setenv("NS3D_LANE_TILES", tiles)
        else:
            monkeypatch.delenv("NS3D_LANE_TILES", raising=False)
        monkeypatch.setenv("NS3D_SWEEP2", "1" if sweeps else "0")
        cfg = ns.preset_gpu(nx=21, nt=1, compat=False, dtype="float32",
                            use_pallas=True)
        s = ns.ChorinSolver(cfg)
        assert s._pallas is not None
        it = s._pallas[0]
        if tiles:
            assert it.lane_tiles == 3
            budget = s.grid.niter - s.grid.niter % s.grid.nchk
            assert (s._sweep_plan(it, budget) is not None) == sweeps
        st = s.init_state()
        divv = jax.jit(s.predictor_divv)(st)
        pr, dpr, stats = jax.jit(s.poisson_solve)(st.pr, st.dprdtau, divv)
        outs[(tiles, sweeps)] = (pr, int(stats.iters),
                                 int(stats.iters_ext or 0),
                                 float(stats.err))

    def compare(key_a, key_b, atol):
        pr1, it1, ext1, e1 = outs[key_a]
        pr0, it0, ext0, e0 = outs[key_b]
        assert (it1, ext1) == (it0, ext0)
        assert abs(e1 - e0) <= 1e-2 * max(abs(e0), 1e-30)
        a, b = np.asarray(pr1), np.asarray(pr0)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / scale, b / scale, rtol=0,
                                   atol=atol, err_msg="pr")

    compare(("3", False), (None, False), 5e-6)   # routing only
    compare(("3", True), (None, False), 5e-4)    # + sweep re-rounding


def test_sweep_depth_one_builds_no_sweep_kernels():
    """NS3D_SWEEP_DEPTH=1 sizes the tile halo for ONE sweep; no s>=2
    sweep kernel may be built (its chained reach would exceed the halo
    and read concat-edge garbage into interior lanes)."""
    bc = PoissonBCSpec(True, None, np.zeros(20 * 18))
    it, _, _ = build_poisson_iter(
        24, 20, 18, 0.1, 0.1, 0.1, dtau=0.01, damp=0.9, bc=bc,
        dtype=jnp.float32, interpret=True, mode="blocked", folded=True,
        mrows=1, lane_tiles=3, sweep_depth=1)
    assert it.lane_tiles == 3
    assert getattr(it, "sweep_fns", {}) == {}
    assert getattr(it, "sweep2", None) is None
