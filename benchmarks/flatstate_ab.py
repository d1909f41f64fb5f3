"""In-process A/B: does flat-state mode still buy wall time under
free-run chaining?

NumericsConfig.flat_state carries vx/vy/vz/c between steps in the fused
chain's (NXP, W) layout, deleting the per-step 3D<->flat relayouts
(docs/roadmap.md "Flat FlowState"). Round 3's acceptance criterion was a
measurable per-step drop (~4 ms at 255); round 4 shipped equivalence
tests but no measurement, and the headline bench doesn't use the flag
(VERDICT r4 weak #4). This probe settles it: both modes timed in ONE
process at the showcase grid, chained free-run steps (the production
`--sync-every N` discipline — identical to bench.py's window), A then B
then A again so tunnel drift shows up as an A1-vs-A2 spread.

Run: python benchmarks/flatstate_ab.py [--nx 255] [--steps 8]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax"))

import jax  # noqa: E402

import navierstokes3d_tpu as ns  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def time_mode(flat, nx, steps):
    cfg = ns.preset_gpu(nx=nx, nt=steps, compat=False, dtype="float32")
    if flat:
        cfg = cfg.replace(numerics=dataclasses.replace(
            cfg.numerics, flat_state=True))
    s = ns.ChorinSolver(cfg)
    st = s.init_state()
    for k in range(2):  # warmup incl. the steady (pr_lo-carrying) structure
        t0 = time.time()
        st, stats = s.step_jit(st)
        jax.block_until_ready(st.pr)
        log(f"  warmup {k}: {time.time()-t0:.1f}s iters={int(stats.iters)}")
    t0 = time.time()
    for _ in range(steps):
        st, stats = s.step_jit(st)  # chained free-run: no per-step sync
    jax.block_until_ready(st.pr)
    wall = (time.time() - t0) / steps
    conv = float(stats.err) < cfg.numerics.eps_it
    log(f"  {'flat' if flat else 'canonical'}: {wall*1e3:.1f} ms/step "
        f"(converged={conv})")
    assert conv
    return wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=255)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()
    log(f"device={jax.devices()[0].device_kind} nx={args.nx}")

    log("A1: canonical state")
    a1 = time_mode(False, args.nx, args.steps)
    log("B: flat state")
    b = time_mode(True, args.nx, args.steps)
    log("A2: canonical state (drift control)")
    a2 = time_mode(False, args.nx, args.steps)

    a = min(a1, a2)
    log(f"canonical {a1*1e3:.1f}/{a2*1e3:.1f} ms/step (spread "
        f"{abs(a1-a2)*1e3:.1f} ms) vs flat {b*1e3:.1f} ms/step "
        f"-> delta {(a-b)*1e3:+.1f} ms/step "
        f"({'flat wins' if b < a else 'no win — relayouts already hidden'})")


if __name__ == "__main__":
    main()
