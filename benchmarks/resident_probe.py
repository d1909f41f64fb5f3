"""A/B probe: VMEM-resident Poisson chunk kernel vs the streaming kernel.

Measures, in ONE process (the repo's measurement discipline — independent
processes vary ~10% on the axon runtime):
  (a) the streaming folded kernel driven by a flat fori_loop (the
      production hot loop's body), us/iter;
  (b) the resident chunk kernel (nit iterations per pallas call, zero
      per-iteration HBM traffic), us/iter;
and checks the two produce identical fields and residuals.

Usage: python benchmarks/resident_probe.py [--nx 255] [--nit 152]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".cache", "jax"))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from navierstokes3d_tpu.config import preset_gpu
from navierstokes3d_tpu.kernels.poisson import (build_poisson_iter,
                                                poisson_bc_spec)
from navierstokes3d_tpu.models.chorin import ChorinSolver


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=255)
    ap.add_argument("--nit", type=int, default=152)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    cfg = preset_gpu(nx=args.nx, compat=False, dtype="float32")
    s = ChorinSolver(cfg)
    g = s.grid
    bcspec = poisson_bc_spec(cfg.variant, g, cfg.physics, s.pressure_split)
    interpret = jax.default_backend() in ("cpu", "gpu")
    iter_fn, pack, unpack = build_poisson_iter(
        g.nx, g.ny, g.nz, g.dx, g.dy, g.dz, g.dtau, g.damp, bcspec,
        dtype="float32", slab=8, interpret=interpret, mode="blocked",
        folded=True)
    # make_resident only exists on the folded, non-extended,
    # non-distributed T==1 branch — lane-tiled widths (e.g. --nx 511)
    # stay on the streaming kernel and never attach it
    res_factory = getattr(iter_fn, "make_resident", None)
    res = res_factory(args.nit) if res_factory is not None else None
    if res is None:
        print("resident kernel ineligible at this shape")
        return

    rng = np.random.RandomState(0)
    pr = rng.randn(g.nx, g.ny, g.nz).astype(np.float32)
    dpr = rng.randn(g.nx, g.ny, g.nz).astype(np.float32) * 0.01
    rhs = rng.randn(g.nx, g.ny, g.nz).astype(np.float32)
    pp, df, rf = pack(jnp.asarray(pr), jnp.asarray(dpr), jnp.asarray(rhs))

    nit = args.nit

    @jax.jit
    def run_stream(pp, df):
        def body(i, c):
            p, d = c
            p, d, _ = iter_fn(p, d, rf, False)
            return (p, d)
        p, d = jax.lax.fori_loop(0, nit - 1, body, (pp, df))
        p, d, ec = iter_fn(p, d, rf, True)
        return p, d, jnp.max(ec)

    @jax.jit
    def run_res(pp, df):
        p, d, ec = res(pp, df, rf)
        return p, d, ec[0, 0]

    # correctness first (fresh inputs, compare)
    p1, d1, e1 = run_stream(pp, df)
    jax.block_until_ready(p1)
    p2, d2, e2 = run_res(pp, df)
    jax.block_until_ready(p2)
    dp = float(jnp.max(jnp.abs(p1 - p2)))
    dd = float(jnp.max(jnp.abs(d1 - d2)))
    print(f"equivalence over {nit} iters: |dpr|={dp:.3e} |ddpr|={dd:.3e} "
          f"err stream={float(e1):.6e} resident={float(e2):.6e}")

    # chain CALLS calls per timing window so the axon tunnel's ~30 ms
    # dispatch RPC amortizes out (dispatch_gap_probe.py); each call
    # consumes its predecessor's state, so this measures steady
    # throughput, not repeated-identical-input artifacts.
    CALLS = 10
    for name, fn in (("stream", run_stream), ("resident", run_res)):
        # warm
        p, d, e = fn(pp, df)
        jax.block_until_ready(p)
        best = 1e30
        for _ in range(args.reps):
            t0 = time.time()
            for _ in range(CALLS):
                p, d, e = fn(p, d)
            jax.block_until_ready(p)
            best = min(best, time.time() - t0)
        print(f"{name}: {best * 1e6 / (nit * CALLS):.1f} us/iter "
              f"({best * 1e3:.1f} ms / {nit * CALLS} iters)")


if __name__ == "__main__":
    main()
