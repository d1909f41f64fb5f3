"""Chunked pseudo-transient convergence loop (shared by every PT backend).

Replicates the reference's `for iter=1:niter ... break` control flow
(NavierStokes3D_gpu.jl:126-137) as one lax.while_loop: run chunks of nchk
iterations, check the residual after each chunk, stop on convergence
(err < eps_it), non-finite error, or chunk budget; if never converged, run
the trailing niter % nchk iterations unchecked (the reference's final
partial chunk).

Optional stall exit (no reference analog; see NumericsConfig.stall_exit):
stop when the residual improved by less than ratio**window over the last
`window` residual checks — the iteration has hit its noise floor and the
remaining budget is pure waste. The window (rather than per-chunk
comparison) separates floor noise (per-chunk ratios fluctuating around
1.0 with dips to ~0.8) from genuinely slow asymptotic convergence
(steady 0.89-0.94 per chunk).
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
    scalar err (including any cross-device reduction). stall is
    (ratio, window) or None: exit when err > ratio**window * err_from_
    `window`_checks_ago. Returns (pr, dpr, iters, err, hist)."""
    big = jnp.asarray(1e30, dtype)
    stall_on = stall is not None
    ratio, window = stall if stall_on else (0.0, 1)
    window = max(int(window), 1)
    thresh = ratio ** window

    def stalled_of(err, errbuf):
        # errbuf[0] is the err from `window` checks ago; it starts at
        # `big`, so the first `window` checks can never trip the exit
        return (err > thresh * errbuf[0]) & (errbuf[0] < big)

    def cond(st):
        _, _, k, err, _, errbuf = st
        ok = (k < nchunks) & (err >= eps_it) & jnp.isfinite(err)
        if stall_on:
            ok = ok & jnp.logical_not(stalled_of(err, errbuf))
        return ok

    def body(st):
        pr, dpr, k, err, hist, errbuf = st
        pr, dpr = run_iters(pr, dpr, nchk, k)
        new_err = residual_err(pr)
        hist = hist.at[k].set(new_err)
        errbuf = jnp.concatenate([errbuf[1:], new_err[None]])
        return (pr, dpr, k + 1, new_err, hist, errbuf)

    hist0 = jnp.full((max(nchunks, 1),), jnp.nan, dtype)
    # errbuf holds the last window+1 check values (bigs until enough
    # checks have run): errbuf[-1] == the carried err, errbuf[0] == the
    # err from exactly `window` intervals earlier (matching ratio**window)
    errbuf0 = jnp.full((window + 1,), big, dtype)
    pr, dpr, k, err, hist, errbuf = lax.while_loop(
        cond, body, (pr, dpr, jnp.int32(0), big, hist0, errbuf0))
    iters = k * nchk
    stalled = stalled_of(err, errbuf) if stall_on else jnp.bool_(False)
    if rem > 0:
        # The reference's trailing partial chunk runs only if the loop
        # reached niter without converging (gpu.jl:126-137); a stall exit
        # also skips it (iterating at the noise floor buys nothing).
        do_tail = (k >= nchunks) & (err >= eps_it) & jnp.isfinite(err)
        if stall_on:
            do_tail = do_tail & jnp.logical_not(stalled)
        pr, dpr = lax.cond(
            do_tail,
            lambda c: run_iters(*c, rem, k),
            lambda c: c,
            (pr, dpr))
        iters = iters + jnp.where(do_tail, rem, 0)
    return pr, dpr, iters, err, hist
