"""Measure HBM read vs write pass rates of the blocked-pipeline shape at
511-class size (NXP=512, W=94336, B=8 blocks).

The wide_row_probe found the folded kernel sits exactly on the micro
stream floor (~505 GB/s effective on 7 passes); a two-point fit of the
micro cases suggested reads ~757 GB/s and writes ~275 GB/s per pass.
This probe varies (n_read, n_write) independently to pin the per-pass
rates, which decide whether traffic reduction should target pr re-fetch
(M-row blocking) or the write stream (temporal multi-sweep).
"""

import sys
import os
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


def rw_case(NXP, W, B, n_read, n_write, K):
    """n_read full-pass inputs -> n_write full-pass outputs (+ one (8,128)
    dummy output so a 0/1-write case still has a pallas output).

    scale is -1.001: a contracting recurrence reaches an exact f32
    fixpoint within the warmup call, after which every chained call has
    bit-identical inputs and the axon runtime serves it from its
    dispatch cache (measured "1.3 PB/s"). Slight expansion + sign
    alternation keeps inputs distinct and bounded over the run."""
    S = NXP // B
    scale = np.float32(-1.001)

    def kernel(*refs):
        ins = refs[:n_read]
        outs = refs[n_read:n_read + n_write]
        tiny = refs[n_read + n_write]
        acc = ins[0][:, :] * scale
        for r in ins[1:]:
            acc = acc + r[:, :] * scale
        for i, o in enumerate(outs):
            o[:, :] = acc + np.float32(i)
        tiny[:, :] = acc[:8, :128]

    def rb():
        return pl.BlockSpec((B, W), (lambda s: (s, 0)),
                            memory_space=pltpu.VMEM)

    tiny_spec = pl.BlockSpec((8, 128), (lambda s: (0, 0)),
                             memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((NXP, W), jnp.float32)
    call = pl.pallas_call(
        kernel,
        grid=(S,),
        out_shape=tuple([shape] * n_write
                        + [jax.ShapeDtypeStruct((8, 128), jnp.float32)]),
        in_specs=[rb() for _ in range(n_read)],
        out_specs=tuple([rb() for _ in range(n_write)] + [tiny_spec]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
    )

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.random((NXP, W)), jnp.float32)
          for _ in range(max(n_read, 1))]

    # aux arrays ride as jit ARGUMENTS (a closure constant this size is
    # inlined into the program upload and blows the tunnel's body limit)
    @jax.jit
    def run(x0, aux):
        def body(_, x):
            outs = call(x, *aux)
            return outs[0] if n_write else x * scale
        return jax.lax.fori_loop(0, K, body, x0)

    aux = tuple(xs[1:n_read])
    return (lambda x: run(x, aux)), xs[0]


def main():
    NXP, W, B, K = 512, 94336, 8, 100
    pass_gb = NXP * W * 4 / 1e9
    print(f"device: {jax.devices()[0].device_kind}  pass={pass_gb*1e3:.0f} MB",
          flush=True)
    results = {}
    for n_read, n_write in ((3, 2), (5, 2), (7, 2), (3, 1), (5, 1),
                            (1, 2), (2, 2)):
        run, x0 = rw_case(NXP, W, B, n_read, n_write, K)
        x = run(x0)
        jax.block_until_ready(x)
        t0 = time.time()
        for _ in range(4):
            x = run(x)
        jax.block_until_ready(x)
        ms = (time.time() - t0) / (4 * K) * 1e3
        results[(n_read, n_write)] = ms
        tot = (n_read + n_write) * pass_gb
        print(f"reads={n_read} writes={n_write}: {ms:8.4f} ms "
              f"({tot / (ms * 1e-3):5.0f} GB/s combined)", flush=True)

    # least-squares fit: ms = a*reads + b*writes + c
    import numpy.linalg as la
    A = np.array([[r, w, 1.0] for (r, w) in results])
    y = np.array([results[k] for k in results])
    coef, *_ = la.lstsq(A, y, rcond=None)
    a, b, c = coef
    print(f"fit: read pass {a:.4f} ms ({pass_gb/a*1e3:.0f} GB/s), "
          f"write pass {b:.4f} ms ({pass_gb/b*1e3:.0f} GB/s), "
          f"fixed {c:.4f} ms", flush=True)


if __name__ == "__main__":
    main()
