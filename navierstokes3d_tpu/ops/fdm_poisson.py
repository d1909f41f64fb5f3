"""Fast-diagonalization direct Poisson solver (optional backend).

The pressure-Poisson operator of the reference is separable:
A = Ax (x) I (x) I + I (x) Ay (x) I + I (x) I (x) Az, where each 1D
operator is the second difference with the folded boundary conditions
(zero-gradient faces drop the boundary coupling; the outlet face is
Dirichlet; see models/chorin.py::_poisson_solve_jnp_folded). Each Ak is a
symmetric tridiagonal matrix, so A is diagonalized by the tensor product
of their eigenbases:

    p = Qx (x) Qy (x) Qz  [ (Qx' (x) Qy' (x) Qz' f) / (lx+ly+lz) ]

The transforms are dense (n_k x n_k) matmuls over ~6M-cell fields — they
run on the TPU MXU, solving the system EXACTLY in ~6 matmul passes
(measured 4.06 ms/solve at the 255-class showcase grid on v5e,
benchmarks/fdm_speed_probe.py) instead of the reference's thousands of
pseudo-transient iterations (gpu.jl:126-137) — the full fdm step runs
11.8x faster than the PT parity step (24.3 vs 287 ms free-run chained,
benchmarks/records/). Iterative refinement in the same basis absorbs
float32 round-off (1 round/step at 255, landing ~1e-8 err units).

This is a capability the reference does not have; the pseudo-transient
backend remains the parity default ('pt').
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _axis_operator(m: int, d: float, lo_zero_grad: bool,
                   hi_zero_grad: bool) -> np.ndarray:
    """1D interior operator (m = n-2 cells) with folded BCs: a
    zero-gradient end drops the boundary coupling (diag -1 instead of -2);
    a Dirichlet end keeps -2 (the frozen boundary value contributes to the
    RHS; for the homogeneous outlet it contributes 0)."""
    a = np.zeros((m, m))
    for i in range(m):
        diag = -2.0
        if i == 0 and lo_zero_grad:
            diag = -1.0
        if i == m - 1 and hi_zero_grad:
            diag = -1.0
        a[i, i] = diag
        if i > 0:
            a[i, i - 1] = 1.0
        if i < m - 1:
            a[i, i + 1] = 1.0
    return a / (d * d)


def _axis_eigs(grid, variant: str):
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    if variant == "multi":
        ax = _axis_operator(nx - 2, grid.dx, True, False)
    else:
        ax = _axis_operator(nx - 2, grid.dx, False, False)
    ay = _axis_operator(ny - 2, grid.dy, True, True)
    az = _axis_operator(nz - 2, grid.dz, True, True)
    return (np.linalg.eigh(ax), np.linalg.eigh(ay), np.linalg.eigh(az))


def solve_host_f64(grid, variant: str, rhs: np.ndarray) -> np.ndarray:
    """One-off exact host solve in float64 (for static boundary-driven
    parts that must not pollute float32 device solves)."""
    (lx, qx), (ly, qy), (lz, qz) = _axis_eigs(grid, variant)
    t = np.einsum("ia,ajk->ijk", qx.T, rhs)
    t = np.einsum("jb,ibk->ijk", qy.T, t)
    t = np.einsum("kc,ijc->ijk", qz.T, t)
    t /= (lx[:, None, None] + ly[None, :, None] + lz[None, None, :])
    p = np.einsum("ai,ijk->ajk", qx, t)
    p = np.einsum("jb,ibk->ijk", qy, p)
    return np.einsum("kc,ijc->ijk", qz, p)


def build_fdm_solver(grid, variant: str, dtype):
    """Returns solve(rhs_interior) -> p_interior, both (nx-2,ny-2,nz-2).

    variant 'multi': x zero-grad at inlet, Dirichlet-0 at outlet
    (multi_gpu.jl:175-184); 'gpu': Dirichlet both x faces (the hydrostatic
    plane values enter through the RHS; see the solver integration).
    y/z are zero-gradient in both variants.
    """
    # host-side float64 eigendecompositions (symmetric tridiagonal).
    # The closed-over constants stay NumPy: build_fdm_solver may be
    # called lazily inside a jit trace (models/chorin._poisson_solve_fdm),
    # and a jnp.asarray created there would cache leaked tracers into the
    # closure, crashing every later trace that reuses the solver (same
    # pattern as chorin._folded_masks).
    (lx, qx), (ly, qy), (lz, qz) = _axis_eigs(grid, variant)
    lam = (lx[:, None, None] + ly[None, :, None] + lz[None, None, :])
    # The pure-Neumann direction pair leaves no zero mode here because the
    # x axis always has at least one Dirichlet end in both variants.
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    inv_lam = np.asarray(1.0 / lam, np_dtype)
    qx_c, qy_c, qz_c = (np.asarray(q, np_dtype) for q in (qx, qy, qz))
    acc_t = jnp.float32 if jnp.dtype(dtype) == jnp.float32 else jnp.dtype(dtype)

    # HIGHEST precision: TPU f32 matmuls default to bf16 MXU passes,
    # which costs ~1.5 orders of magnitude in the direct solve's residual
    # (measured at nx=20 on v5e: 9.9e-3 vs 3.1e-4 err units) and caps the
    # per-refinement contraction of the compensated refinement loop. The
    # transforms are a trivial fraction of the solve, so the 6-pass f32
    # emulation is free.
    prec = jax.lax.Precision.HIGHEST

    def to_modal(f):
        t = jnp.einsum("ia,ajk->ijk", qx_c.T, f,
                       preferred_element_type=acc_t, precision=prec)
        t = jnp.einsum("jb,ibk->ijk", qy_c.T, t,
                       preferred_element_type=acc_t, precision=prec)
        return jnp.einsum("kc,ijc->ijk", qz_c.T, t,
                          preferred_element_type=acc_t, precision=prec)

    def from_modal(t):
        p = jnp.einsum("ai,ijk->ajk", qx_c, t,
                       preferred_element_type=acc_t, precision=prec)
        p = jnp.einsum("jb,ibk->ijk", qy_c, p,
                       preferred_element_type=acc_t, precision=prec)
        return jnp.einsum("kc,ijc->ijk", qz_c, p,
                          preferred_element_type=acc_t, precision=prec)

    def apply_a(p):
        """A p via the same folded stencil (for iterative refinement)."""
        pad = jnp.pad(p, 1)
        cx = 1.0 / (grid.dx * grid.dx)
        cy = 1.0 / (grid.dy * grid.dy)
        cz = 1.0 / (grid.dz * grid.dz)
        pc = p
        m = p.shape
        xl = (pad[:-2, 1:-1, 1:-1] - pc)
        xr = (pad[2:, 1:-1, 1:-1] - pc)
        yl = (pad[1:-1, :-2, 1:-1] - pc)
        yr = (pad[1:-1, 2:, 1:-1] - pc)
        zl = (pad[1:-1, 1:-1, :-2] - pc)
        zr = (pad[1:-1, 1:-1, 2:] - pc)
        # drop the boundary-coupling term where zero-gradient (the pad
        # zeros already model homogeneous Dirichlet ends)
        i = jnp.arange(m[0])[:, None, None]
        j = jnp.arange(m[1])[None, :, None]
        k = jnp.arange(m[2])[None, None, :]
        if variant == "multi":
            xl = jnp.where(i == 0, 0.0, xl)           # inlet zero-grad
            # outlet Dirichlet-0: xr keeps (pad 0 == boundary value 0)
        else:
            pass  # gpu: Dirichlet both (homogeneous part; planes via RHS)
        yl = jnp.where(j == 0, 0.0, yl)
        yr = jnp.where(j == m[1] - 1, 0.0, yr)
        zl = jnp.where(k == 0, 0.0, zl)
        zr = jnp.where(k == m[2] - 1, 0.0, zr)
        return cx * (xl + xr) + cy * (yl + yr) + cz * (zl + zr)

    @jax.jit
    def solve(rhs, refine: int = 1):
        p = from_modal(to_modal(rhs) * inv_lam)
        for _ in range(refine):
            r = rhs - apply_a(p)
            p = p + from_modal(to_modal(r) * inv_lam)
        return p

    solve.apply_a = apply_a
    return solve
