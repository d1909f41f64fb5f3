"""Benchmark: the reference's showcase config (255x153x153 cylinder flow,
NavierStokes3D_gpu.jl:44 / README.md:59) on one TPU chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no performance numbers (BASELINE.md), so
vs_baseline is measured against the analytic HBM roofline of the Poisson
hot loop — the fraction of speed-of-light achieved. Each damped
pseudo-transient iteration must move at minimum: read Pr + dprdtau + divv,
write Pr + dprdtau (5 full grids); the BC planes and residual checks are
amortized. Diagnostics go to stderr.
"""

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".cache", "jax"))
# The blocked Pallas kernel is the library default on TPU float32 (it is
# validated stable on the axon runtime); no env opt-in needed — the bench
# measures the as-shipped configuration.


def _device_healthy() -> bool:
    """Probe the accelerator in a subprocess: a wedged TPU runtime hangs
    forever on the first op, which must not take the benchmark down.

    The axon tunnel's first op can take 30-90 s normally and has been
    observed to stall for minutes when another client holds the tunnel,
    so the probe is adaptive: escalating timeouts with cooldowns, ~14 min
    total budget (override via NS3D_BENCH_PROBE_BUDGET_S) before giving
    up. Round 2's official record was lost to a 2x150 s probe giving up
    too early — never again."""
    code = ("import jax, jax.numpy as jnp;"
            "print(float((jnp.ones((8,128))*2).sum()))")
    budget = float(os.environ.get("NS3D_BENCH_PROBE_BUDGET_S", "840"))
    timeouts = [120.0, 240.0, 360.0, 360.0, 360.0]
    spent = 0.0
    for i, t in enumerate(timeouts):
        t = min(t, max(30.0, budget - spent))
        start = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=t)
            if r.returncode == 0:
                return True
            print(f"probe attempt {i}: exit {r.returncode}: "
                  f"{r.stderr.decode(errors='replace')[-300:]}",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"probe attempt {i}: timed out after {t:.0f}s",
                  file=sys.stderr, flush=True)
        spent += time.time() - start
        if spent >= budget:
            break
        time.sleep(10.0)  # cooldown: let a transient tunnel holder drain
        spent += 10.0
    return False


if not _device_healthy() and os.environ.get("NS3D_BENCH_CPU_FALLBACK", "1") == "1":
    print("accelerator unhealthy; falling back to CPU (metric labeled)",
          file=sys.stderr)
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import numpy as np  # noqa: E402

import navierstokes3d_tpu as ns  # noqa: E402

HBM_GBPS = {  # peak HBM bandwidth per chip
    "v5 lite": 819.0, "v5e": 819.0, "v4": 1228.0, "v5p": 2765.0,
    "v6e": 1640.0, "cpu": 50.0,
}


def device_hbm_gbps() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for k, v in HBM_GBPS.items():
        if k in kind:
            return v
    return 819.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=("gpu", "multi"), default="gpu",
                    help="config preset: 'gpu' is the showcase cylinder "
                         "flow (the headline bench); 'multi' is the "
                         "multi-script's setup (reference nx=63 default)")
    ap.add_argument("--nx", type=int, default=None,
                    help="default: 255 (gpu preset) / 63 (multi)")
    # 8 timed steps: with the tunnel's ~10% cross-process variance a
    # 3-step window was the minimum credible record; 8 thickens it
    # while staying ~3 s of timed work at the 255 grid
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--backend", choices=("pt", "fdm"), default="pt",
                    help="'pt' (default) benches the reference-parity "
                         "pseudo-transient solve — the headline metric. "
                         "'fdm' benches the beyond-reference direct-"
                         "solve+refinement backend and reports s/step "
                         "with vs_baseline = speedup over a PT run "
                         "timed in the SAME process (kernel A/Bs are "
                         "only valid within one process on this "
                         "runtime).")
    args = ap.parse_args()

    if args.nx is None:
        args.nx = 255 if args.preset == "gpu" else 63
    make = ns.preset_gpu if args.preset == "gpu" else ns.preset_multi
    cfg = make(nx=args.nx, nt=args.steps, compat=False,
               dtype=args.dtype)
    if args.backend == "fdm":
        import dataclasses
        cfg = cfg.replace(numerics=dataclasses.replace(
            cfg.numerics, poisson_backend="fdm"))
    solver = ns.ChorinSolver(cfg)
    g = solver.grid
    log(f"grid {g.nx}x{g.ny}x{g.nz} dtype={args.dtype} "
        f"device={jax.devices()[0].device_kind} niter={g.niter} nchk={g.nchk}")

    state = solver.init_state()
    t0 = time.time()
    state, stats = solver.step_jit(state)
    jax.block_until_ready(state.pr)
    log(f"warmup step 1 (incl. compile): {time.time()-t0:.1f}s "
        f"iters={int(stats.iters)}")
    # step 2 compiles the steady-state structure: the stored-pressure
    # pair (FlowState.pr_lo) appears after the first step
    t0 = time.time()
    state, stats = solver.step_jit(state)
    jax.block_until_ready(state.pr)
    log(f"warmup step 2 (steady structure): {time.time()-t0:.1f}s "
        f"iters={int(stats.iters)}")

    eps_it = cfg.numerics.eps_it
    total_iters, total_ext, t0 = 0, 0, time.time()
    all_converged = True
    divv_pre = None
    step_stats = []
    for i in range(args.steps):
        if i == args.steps - 1:
            # snapshot the final step's Poisson RHS before the donating
            # step deletes its input: the stored-state criterion below
            # re-evaluates the returned pressure pair against it. Drain
            # the queued steps first (that wait is real step compute and
            # stays in the timed wall); only the snapshot itself is
            # excluded (t0 shifted by its duration).
            jax.block_until_ready(state.pr)
            ts = time.time()
            divv_pre = jax.jit(solver.predictor_divv)(state)
            jax.block_until_ready(divv_pre)
            t0 += time.time() - ts
        state, stats = solver.step_jit(state)
        # Host costs move OUT of the timed window (measured,
        # benchmarks/dispatch_gap_probe.py: eager per-step stats reads
        # cost 65 ms/step — two ~32 ms tunnel RPCs — and the per-step
        # block_until_ready another ~20 ms). The steps are CHAINED
        # (each consumes its predecessor's donated state), so
        # free-running them measures exactly the production throughput
        # of `run.py --sync-every N`; the async stat copies overlap
        # compute, and the per-step convergence asserts below run after
        # the window on the same values.
        for a in (stats.iters, stats.iters_ext, stats.err):
            if a is not None:
                try:
                    a.copy_to_host_async()
                except AttributeError:
                    pass
        step_stats.append(stats)
    jax.block_until_ready(state.pr)
    wall = time.time() - t0
    for i, stats in enumerate(step_stats):
        total_iters += int(stats.iters)
        it_ext = int(stats.iters_ext) if stats.iters_ext is not None else 0
        total_ext += it_ext
        step_conv = (float(stats.err) < eps_it) and (int(stats.iters) < g.niter)
        all_converged &= step_conv
        log(f"step {i}: iters={int(stats.iters)} (ext={it_ext}) "
            f"err={float(stats.err):.3e} "
            f"{'converged' if step_conv else 'UNCONVERGED'}")
    if np.isnan(np.asarray(state.pr)).any():
        log("ERROR: NaNs in pressure field")
        all_converged = False

    # Stored-state criterion: the reference evaluates convergence on its
    # STORED (Float64) pressure field (gpu.jl:132-135). Re-evaluate the
    # returned (pr, pr_lo) pair against the final step's RHS with the
    # compensated f32 evaluation (f64-grade on TPU, where float64 is
    # unavailable): the STORED state — not just the in-solve iterate —
    # must meet eps_it.
    stored_err = None
    if divv_pre is not None and state.pr_lo is not None:
        stored_err = float(jax.jit(solver.stored_residual_err)(
            state, divv=divv_pre))
        stored_ok = stored_err < eps_it
        log(f"stored-state criterion: err={stored_err:.3e} "
            f"({'meets' if stored_ok else 'FAILS'} eps_it={eps_it})")
        all_converged &= stored_ok
    iters_per_sec = total_iters / wall
    time_per_step = wall / args.steps

    if args.backend == "fdm":
        # vs_baseline for the direct-solve backend is the measured
        # speedup over the reference-parity PT solve, timed in the SAME
        # process right after (independent processes vary ~10% on this
        # runtime; in-process A/B is the repo's measurement discipline).
        # stats.iters counted refinement rounds above, so the headline
        # iters/s metric does not apply here.
        pt_solver = ns.ChorinSolver(make(nx=args.nx, nt=args.steps,
                                         compat=False, dtype=args.dtype))
        pt_state = pt_solver.init_state()
        for k in range(2):
            t0 = time.time()
            pt_state, pt_stats = pt_solver.step_jit(pt_state)
            jax.block_until_ready(pt_state.pr)
            log(f"pt comparator warmup {k}: {time.time()-t0:.1f}s")
        n_pt = max(3, args.steps // 2)
        t0 = time.time()
        for _ in range(n_pt):
            pt_state, pt_stats = pt_solver.step_jit(pt_state)
            for a in (pt_stats.iters, pt_stats.err):
                try:
                    a.copy_to_host_async()
                except AttributeError:
                    pass
        jax.block_until_ready(pt_state.pr)
        pt_step = (time.time() - t0) / n_pt
        log(f"pt comparator: {pt_step:.3f}s/step over {n_pt} chained "
            f"steps (converged={float(pt_stats.err) < eps_it})")
        backend = jax.default_backend()
        suffix = "_fdm" if backend not in ("cpu", "gpu") \
            else f"_fdm_{backend}_fallback"
        if not all_converged:
            suffix += "_UNCONVERGED"
            log("ERROR: at least one fdm step did not converge")
        print(json.dumps({
            "metric": (f"seconds_per_step_{g.nx}x{g.ny}x{g.nz}_"
                       f"{args.dtype}{suffix}"),
            "value": round(time_per_step, 4),
            "unit": "s/step",
            # measured same-process speedup over the PT parity solve
            "vs_baseline": round(pt_step / time_per_step, 4),
            "pt_seconds_per_step": round(pt_step, 4),
            "all_steps_converged": all_converged,
            "stored_state_err": (None if stored_err is None
                                 else round(stored_err, 9)),
            "device": jax.devices()[0].device_kind,
        }))
        return

    # HBM roofline for the executed iteration mix: the plain fused kernel
    # must move >= 5 grid arrays per iteration (read Pr/dprdtau/rhs, write
    # Pr/dprdtau). The accuracy phase's iterations (stats.iters_ext) are
    # plain-kernel defect-correction iterations under the default
    # accuracy mode (5 passes); only accuracy='extended' runs the
    # double-single kernel (7 passes, (hi,lo) pair). Speed-of-light time
    # is the byte-weighted sum over the mix actually run.
    itemsize = np.dtype(args.dtype).itemsize
    cells = g.nx * g.ny * g.nz
    bw = device_hbm_gbps() * 1e9
    t_plain = 5 * cells * itemsize / bw
    acc = getattr(solver, "acc_pallas", "extended")
    t_acc = (7 if acc == "extended" else 5) * cells * itemsize / bw
    total_plain = total_iters - total_ext
    roofline_wall = total_plain * t_plain + total_ext * t_acc
    frac = roofline_wall / wall
    log(f"time/step={time_per_step:.3f}s iters/s={iters_per_sec:.0f} "
        f"(plain {total_plain}, extended {total_ext}); "
        f"roofline wall={roofline_wall:.3f}s "
        f"({100*frac:.1f}% of speed-of-light for the executed mix)")

    backend = jax.default_backend()
    suffix = "" if backend not in ("cpu", "gpu") else f"_{backend}_fallback"
    if not all_converged:
        # Fail loudly in the record: an unconverged run must never be
        # mistaken for the headline number (reference criterion:
        # every step exits with err < 1e-3, gpu.jl:132-135).
        suffix += "_UNCONVERGED"
        log("ERROR: at least one step did not converge below eps_it "
            f"({eps_it}) within niter={g.niter}")
    print(json.dumps({
        "metric": (f"poisson_iters_per_sec_{g.nx}x{g.ny}x{g.nz}_"
                   f"{args.dtype}{suffix}"),
        "value": round(iters_per_sec, 1),
        "unit": "iter/s",
        # fraction of HBM speed-of-light for the executed iteration mix
        # (plain + extended double-single kernels of the hybrid solve)
        "vs_baseline": round(frac, 4),
        "time_per_step_s": round(time_per_step, 4),
        "all_steps_converged": all_converged,
        # compensated residual of the returned STORED pressure pair
        # (None when the run's config carries no pair, e.g. f64)
        "stored_state_err": (None if stored_err is None
                             else round(stored_err, 6)),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
