"""Chunked pseudo-transient convergence loop (shared by every PT backend).

Replicates the reference's `for iter=1:niter ... break` control flow
(NavierStokes3D_gpu.jl:126-137) as one lax.while_loop: run chunks of nchk
iterations, check the residual after each chunk, stop on convergence
(err < eps_it), non-finite error, or chunk budget; if never converged, run
the trailing niter % nchk iterations unchecked (the reference's final
partial chunk).

Optional stall exit (no reference analog; see NumericsConfig.stall_exit):
stop after `checks` consecutive residual checks that improved by less than
the ratio — the iteration has hit the dtype's noise floor and the
remaining budget is pure waste.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
from jax import lax


def pt_loop(run_iters: Callable, residual_err: Callable, pr, dpr,
            nchunks: int, nchk: int, rem: int, eps_it: float, dtype,
            stall: Optional[Tuple[float, int]] = None):
    """run_iters(pr, dpr, n, k) -> (pr, dpr): n iterations (k = chunk index,
    so a backend may treat the first chunk specially); residual_err(pr) ->
    scalar err (including any cross-device reduction). Returns
    (pr, dpr, iters, err, hist)."""
    big = jnp.asarray(1e30, dtype)
    stall_on = stall is not None
    ratio, checks = stall if stall_on else (0.0, 0)

    def cond(st):
        _, _, k, err, _, stall_n = st
        ok = (k < nchunks) & (err >= eps_it) & jnp.isfinite(err)
        if stall_on:
            ok = ok & (stall_n < checks)
        return ok

    def body(st):
        pr, dpr, k, err, hist, stall_n = st
        pr, dpr = run_iters(pr, dpr, nchk, k)
        new_err = residual_err(pr)
        hist = hist.at[k].set(new_err)
        if stall_on:
            # first chunk compares against `big`, never counting as a stall
            stall_n = jnp.where(new_err > ratio * err, stall_n + 1, 0)
        return (pr, dpr, k + 1, new_err, hist, stall_n)

    hist0 = jnp.full((max(nchunks, 1),), jnp.nan, dtype)
    pr, dpr, k, err, hist, stall_n = lax.while_loop(
        cond, body, (pr, dpr, jnp.int32(0), big, hist0, jnp.int32(0)))
    iters = k * nchk
    if rem > 0:
        # The reference's trailing partial chunk runs only if the loop
        # reached niter without converging (gpu.jl:126-137); a stall exit
        # also skips it (iterating at the noise floor buys nothing).
        do_tail = (k >= nchunks) & (err >= eps_it) & jnp.isfinite(err)
        if stall_on:
            do_tail = do_tail & (stall_n < checks)
        pr, dpr = lax.cond(
            do_tail,
            lambda c: run_iters(*c, rem, k),
            lambda c: c,
            (pr, dpr))
        iters = iters + jnp.where(do_tail, rem, 0)
    return pr, dpr, iters, err, hist
