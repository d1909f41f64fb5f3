"""Isolate the wide-row (511-class, W ~ 94k lanes) Poisson-kernel slowdown.

At 255x153x153 (W=23,424) the folded kernel streams at ~1.4 TB/s
effective; at 511x307x307 (W=94,336) it was measured at ~4.5 ms/iter
(~214 GB/s) — ~6.7x off. Candidates: (a) lane rolls degrade at wide
rows, (b) the (8, W) DMA block staging breaks the double-buffer
pipeline, (c) per-grid-step fixed overhead. The probe separates them:

  1. real folded kernel at nx=511 (wide rows, the failing case)
  2. real folded kernel at nx=2044, ny=nz=153 (SAME total bytes,
     narrow rows) — if this hits the 255-grid rate, width is the issue
  3. slab sweep B=8/16/32 at wide rows — per-step overhead amortization
  4. micro kernels at (512, 94336): pure stream (0 rolls) vs 4 rolls —
     roll cost in isolation at wide rows

Timing: chained state across calls within one process (axon caches
repeated identical dispatches — see the repo measurement notes), K
iterations per call in a fori_loop.
"""

import argparse
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench_chained(name, step_fn, state0, calls=4, iters_per_call=50,
                  bytes_per_iter=None):
    """state -> state chained across calls; reports ms per inner iter."""
    state = step_fn(*state0)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    t0 = time.time()
    for _ in range(calls):
        state = step_fn(*state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    ms = (time.time() - t0) / (calls * iters_per_call) * 1e3
    bw = ""
    if bytes_per_iter:
        bw = f"  {bytes_per_iter / (ms * 1e-3) / 1e9:7.0f} GB/s effective"
    print(f"{name:42s}: {ms:8.4f} ms/iter{bw}", flush=True)
    return ms


def real_kernel_case(nx, ny, nz, B, K, extended=False):
    from navierstokes3d_tpu.kernels.poisson import (PoissonBCSpec,
                                                    build_poisson_iter)
    bc = PoissonBCSpec(True, None, np.zeros(ny * nz))
    # grid geometry constants don't matter for perf; use unit spacings
    # mrows=1 everywhere: the wide case auto-selects M=1, so the narrow
    # same-bytes control must too (and M=4 at nx=2044 trips a scoped-VMEM
    # estimate gap — the M-selection live-rows formula undercounts for
    # G >> 8; tracked separately)
    iter_fn, pack, unpack = build_poisson_iter(
        nx, ny, nz, 1.0 / nx, 1.0 / ny, 1.0 / nz, 1e-3, 2.0 / nx, bc,
        dtype=jnp.float32, mode="blocked", folded=True, mrows=1,
        slab=(B if B != 8 else None), extended=extended)
    rng = np.random.default_rng(0)
    pr0 = jnp.asarray(rng.random((nx, ny, nz)), jnp.float32) * 1e-3
    dpr0 = jnp.zeros((nx, ny, nz), jnp.float32)
    rhs0 = jnp.asarray(rng.random((nx, ny, nz)), jnp.float32) * 1e-3
    if extended:
        hi, lo, df, rf = pack(pr0, dpr0, rhs0)

        @jax.jit
        def run(hi, lo, df):
            def body(_, c):
                h, l, d = c
                h, l, d, _e = iter_fn(h, l, d, rf, do_chk=0)
                return (h, l, d)
            return jax.lax.fori_loop(0, K, body, (hi, lo, df))

        state0 = (hi, lo, df)
    else:
        pp, df, rf = pack(pr0, dpr0, rhs0)

        @jax.jit
        def run(pp, df):
            def body(_, c):
                p, d, _e = iter_fn(*c, rf, do_chk=0)
                return (p, d)
            return jax.lax.fori_loop(0, K, body, (pp, df))

        state0 = (pp, df)
    W = ((ny * nz + 127) // 128) * 128
    passes = 7 if extended else 5
    return run, state0, passes * nx * W * 4, iter_fn


def micro_kernel(NXP, W, B, n_rolls, shift, K, n_pr_fetch=3):
    """Strips the folded kernel to its data motion: fetch n_pr_fetch
    shifted B-row views of x + 2 big blocks, do n_rolls lane rolls,
    write 2 outputs. n_rolls=0 isolates the stream; 4 adds the real
    kernel's shuffle load."""
    S = NXP // B
    # must not contract: a contracting recurrence reaches an exact f32
    # fixpoint during warmup, after which chained calls have bit-identical
    # inputs and the axon dispatch cache serves them instantly
    scale = np.float32(-1.0007)

    damp = np.float32(1e-6)

    def body_math(xm, xc, xp, d, r, o1, o2):
        pc = xc[:, :]
        acc = (xp[:, :] - pc) + (xm[:, :] - pc)
        for i in range(n_rolls):
            sh = shift if i < 2 else 1
            sh = sh if i % 2 == 0 else W - sh
            acc += pltpu.roll(pc, sh, 1) - pc
        # slight sign-flipping expansion dominates; the stencil term is
        # damped so the values stay bounded yet never repeat
        dn = d[:, :] * scale + damp * (acc + r[:, :])
        o1[:, :] = pc * scale + damp * dn
        o2[:, :] = dn

    if n_pr_fetch == 3:
        def kernel(xm, xc, xp, d, r, o1, o2):
            body_math(xm, xc, xp, d, r, o1, o2)
    else:
        def kernel(xc, d, r, o1, o2):
            body_math(xc, xc, xc, d, r, o1, o2)

    def rb(off):
        return pl.BlockSpec((B, W),
                            (lambda s: (jnp.clip(s + off, 0, S - 1), 0)),
                            memory_space=pltpu.VMEM)

    shape = jax.ShapeDtypeStruct((NXP, W), jnp.float32)
    call = pl.pallas_call(
        kernel,
        grid=(S,),
        out_shape=(shape, shape),
        in_specs=[rb(o) for o in ((-1, 0, 1) if n_pr_fetch == 3 else (0,))]
        + [rb(0), rb(0)],
        out_specs=(rb(0), rb(0)),
        input_output_aliases={n_pr_fetch: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
    )
    one = lambda x, d, r: call(*([x] * n_pr_fetch), d, r)

    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.random((NXP, W)), jnp.float32)
    d0 = jnp.zeros((NXP, W), jnp.float32)
    r0 = jnp.asarray(rng.random((NXP, W)), jnp.float32) * 1e-3

    @jax.jit
    def run(x, d):
        def body(_, c):
            x, d = c
            x, d = one(x, d, r0)
            return (x, d)
        return jax.lax.fori_loop(0, K, body, (x, d))

    return run, (x0, d0), (n_pr_fetch + 2 + 2) * NXP * W * 4


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--wide-only", action="store_true")
    ap.add_argument("--skip-real", action="store_true")
    args = ap.parse_args(argv)
    K = args.iters
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    cases = []
    if not args.skip_real:
        cases += [
            ("folded 511x307x307 B=8 (wide, baseline)", 511, 307, 307, 8),
            ("folded 2044x153x153 B=8 (same bytes, narrow)",
             2044, 153, 153, 8),
            ("folded 511x307x307 B=16", 511, 307, 307, 16),
            ("folded 511x307x307 B=32", 511, 307, 307, 32),
            ("folded 255x153x153 B=8 (reference point)", 255, 153, 153, 8),
        ]
        if args.wide_only:
            cases = [c for c in cases if c[1] == 511]
    for name, nx, ny, nz, B in cases:
        try:
            run, st0, bpi, _ = real_kernel_case(nx, ny, nz, B, K)
            bench_chained(name, run, st0, calls=args.calls,
                          iters_per_call=K, bytes_per_iter=bpi)
        except Exception as e:
            print(f"{name:42s}: FAILED {str(e)[:160]}", flush=True)

    # micro kernels: same shapes at three total sizes — if even the
    # 0-roll single-fetch stream slows down with total size, the effect
    # is in the data motion, not the kernel math
    for NXP, W, tag in ((512, 94336, "511-size wide"),
                        (2048, 23424, "511-size narrow"),
                        (256, 23424, "255-size control")):
        for n_rolls, fetch in ((0, 1), (0, 3), (4, 3)):
            try:
                run, st0, bpi = micro_kernel(NXP, W, 8, n_rolls, 307, K,
                                             n_pr_fetch=fetch)
                bench_chained(
                    f"micro {NXP}x{W} ({tag}) rolls={n_rolls} "
                    f"fetch={fetch}+2+2",
                    run, st0, calls=args.calls, iters_per_call=K,
                    bytes_per_iter=bpi)
            except Exception as e:
                print(f"micro {NXP}x{W} rolls={n_rolls} fetch={fetch}: "
                      f"FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
