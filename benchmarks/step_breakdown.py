"""Break a full solver step into its cost components on the current
device: Poisson solve (kernel iterations + residual checks) vs the
non-Poisson ops (stress/predict/divergence/correct/BC/advect), and the
residual-check overhead in isolation (solve with checks every nchk vs a
fixed-iteration kernel loop at the same count).

Usage: python benchmarks/step_breakdown.py [--nx 255] [--steps 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax"))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *a, reps=1):
    out = fn(*a)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.time() - t0) / reps, out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=255)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args(argv)

    import navierstokes3d_tpu as ns
    from navierstokes3d_tpu.ops import physics as ph
    from navierstokes3d_tpu.ops.advect import advect
    from navierstokes3d_tpu.ops.cylinder import apply_cylinder

    cfg = ns.preset_gpu(nx=args.nx, nt=1, compat=False, dtype="float32")
    s = ns.ChorinSolver(cfg)
    g, phys = s.grid, cfg.physics
    print(f"grid {g.nx}x{g.ny}x{g.nz} niter={g.niter} nchk={g.nchk}",
          flush=True)

    # develop the flow a little so iteration counts are realistic
    state = s.init_state()
    for i in range(args.steps):
        state, stats = s.step_jit(state)
    jax.block_until_ready(state.pr)

    # step_jit donates its input, so time it chained (fresh state each call)
    t0 = time.time()
    state2, stats2 = s.step_jit(state)
    jax.block_until_ready(state2.pr)
    t_step = time.time() - t0
    state = state2
    it_tot = int(stats2.iters)
    it_ext = int(stats2.iters_ext) if stats2.iters_ext is not None else 0
    print(f"full step      : {t_step*1e3:8.1f} ms   "
          f"iters={it_tot} (ext={it_ext}) err={float(stats2.err):.2e}",
          flush=True)

    # Poisson solve alone, on this step's actual inputs
    g_eff = 0.0 if s.pressure_split else phys.g
    taus = ph.update_tau(state.vx, state.vy, state.vz, phys.mu,
                         g.dx, g.dy, g.dz)
    vx, vy, vz = ph.predict_v(state.vx, state.vy, state.vz, *taus,
                              phys.rho, g_eff, g.dt, g.dx, g.dy, g.dz)
    _, vx, vy, vz = apply_cylinder(state.c, vx, vy, vz, s.masks)
    divv = ph.update_divv(vx, vy, vz, g.dx, g.dy, g.dz)

    solve = jax.jit(s.poisson_solve)
    t_ps, out = timed(solve, state.pr, state.dprdtau, divv)
    it_s = int(out[2].iters)
    it_se = int(out[2].iters_ext) if out[2].iters_ext is not None else 0
    print(f"poisson_solve  : {t_ps*1e3:8.1f} ms   "
          f"iters={it_s} (ext={it_se})", flush=True)

    # non-Poisson chain (everything but the solve), via the PRODUCTION
    # path: the fused flat-layout kernel chain when the solver built it
    # (TPU f32 non-compat — _step_chained's exact sequence), else the
    # jnp ops. NOTE: wall times here include the axon dev tunnel's
    # ~30 ms/dispatch RPC overhead; device-traced component times are in
    # docs/architecture.md "Measured performance".
    if getattr(s, "_advect_flat", None) is not None:
        lay = s._advect_flat.layout

        def rest(state, pr, dprdtau):
            vxf = lay.flat(state.vx)
            vyf = lay.flat(state.vy)
            vzf = lay.flat(state.vz)
            vxf, vyf, vzf, dvf = s._fused_pre.run_flat(vxf, vyf, vzf)
            divv = lay.unflat(dvf, g.nx, g.ny, g.nz)
            cf = jnp.where(s._fused_pre.cmask_flat,
                           jnp.ones((), state.c.dtype), lay.flat(state.c))
            vxf, vyf, vzf = s._fused_post.run_flat(vxf, vyf, vzf,
                                                   lay.flat(pr))
            vxf, vyf, vzf, cf, ncl = s._advect_flat(vxf, vyf, vzf, cf)
            return (lay.unflat(vxf, g.nx + 1, g.ny, g.nz),
                    lay.unflat(vyf, g.nx, g.ny + 1, g.nz),
                    lay.unflat(vzf, g.nx, g.ny, g.nz + 1),
                    lay.unflat(cf, g.nx, g.ny, g.nz), divv)
        label = "non-poisson ops (fused chain)"
    else:
        # mirror _step_impl's dispatch exactly: fused pre/post kernels
        # when built (e.g. NS3D_ADVECT_K>3 disables only the advect
        # chain), the configured advection backend + window either way
        fused = getattr(s, "_fused_pre", None) is not None

        def rest(state, pr, dprdtau):
            if fused:
                vx, vy, vz, divv = s._fused_pre(state.vx, state.vy,
                                                state.vz)
                c = jnp.where(s.masks.mask_c[:, :, None],
                              jnp.ones((), state.c.dtype), state.c)
            else:
                taus = ph.update_tau(state.vx, state.vy, state.vz,
                                     phys.mu, g.dx, g.dy, g.dz)
                vx, vy, vz = ph.predict_v(state.vx, state.vy, state.vz,
                                          *taus, phys.rho, g_eff, g.dt,
                                          g.dx, g.dy, g.dz)
                c, vx, vy, vz = apply_cylinder(state.c, vx, vy, vz,
                                               s.masks)
                divv = ph.update_divv(vx, vy, vz, g.dx, g.dy, g.dz)
            if getattr(s, "_fused_post", None) is not None:
                vx, vy, vz = s._fused_post(vx, vy, vz, pr)
            else:
                vx, vy, vz = ph.correct_v(vx, vy, vz, pr, g.dt, phys.rho,
                                          g.dx, g.dy, g.dz)
                c, vx, vy, vz = apply_cylinder(c, vx, vy, vz, s.masks)
                vx, vy, vz = s.set_bc_vel(vx, vy, vz)
            if (s._advect_pallas is not None
                    and s.advect_method == "selectshift"):
                vx, vy, vz, c, ncl = s._advect_pallas(vx, vy, vz, c)
            else:
                vx, vy, vz, c, ncl = advect(vx, vy, vz, c, g.dt, g.dx,
                                            g.dy, g.dz,
                                            compat=cfg.compat,
                                            method=s.advect_method,
                                            with_stats=True,
                                            k=s.advect_k)
            return vx, vy, vz, c, divv
        label = ("non-poisson ops (fused pre/post + jnp advect)"
                 if fused else "non-poisson ops (jnp chain)")

    t_rest, _ = timed(jax.jit(rest), state, out[0], out[1], reps=3)
    print(f"{label}: {t_rest*1e3:8.1f} ms", flush=True)

    # fixed-iteration kernel loops at the same counts = pure kernel time;
    # solve time minus this = residual checks + chunking overhead
    if s._pallas is not None:
        from jax import lax
        iter_fn, pack, unpack = s._pallas
        rhs3d = (phys.rho / g.dt) * divv
        pp, df, rf = pack(state.pr, state.dprdtau, rhs3d)
        n_plain = max(it_s - it_se, 1)

        @jax.jit
        def plain_n(pp, df):
            return lax.fori_loop(0, n_plain,
                                 lambda _, c: iter_fn(*c, rf)[:2],
                                 (pp, df))

        t_k, _ = timed(plain_n, pp, df)
        line = (f"kernel x{n_plain} plain: {t_k*1e3:8.1f} ms "
                f"({t_k/n_plain*1e6:.0f} us/iter)")
        t_ke = 0.0
        if s._pallas_ext is not None and it_se:
            it_e, pack_e, _ = s._pallas_ext
            hi, lo, dpf, rhf = pack_e(state.pr, state.dprdtau, rhs3d)

            @jax.jit
            def ext_n(hi, lo, dpf):
                return lax.fori_loop(
                    0, it_se, lambda _, c: it_e(*c, rhf)[:3],
                    (hi, lo, dpf))

            t_ke, _ = timed(ext_n, hi, lo, dpf)
            line += (f" + x{it_se} ext: {t_ke*1e3:8.1f} ms "
                     f"({t_ke/it_se*1e6:.0f} us/iter)")
        print(line, flush=True)
        print(f"check+chunk overhead in solve: "
              f"{(t_ps - t_k - t_ke)*1e3:8.1f} ms "
              f"({it_s // g.nchk + 2} checks)", flush=True)
        print(f"unaccounted step overhead (step - solve - rest): "
              f"{(t_step - t_ps - t_rest)*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
