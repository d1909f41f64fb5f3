"""Finite-difference stencil micro-ops as pure slicing.

These replicate the semantics of ParallelStencil.FiniteDifferences3D macros
used throughout the reference kernels (scripts/NavierStokes3D_gpu.jl:175-219):

  @all(A)[i,j,k]   -> A[i,j,k]
  @inn(A)[i,j,k]   -> A[i+1,j+1,k+1]
  @d_xa(A)[i,j,k]  -> A[i+1,j,k] - A[i,j,k]
  @d_xi(A)[i,j,k]  -> A[i+1,j+1,k+1] - A[i,j+1,k+1]
  @d2_xi(A)[i,j,k] -> A[i+2,j+1,k+1] - 2 A[i+1,j+1,k+1] + A[i,j+1,k+1]
  (and the y/z analogues)

In ParallelStencil the iteration range of each statement is the shape of its
left-hand-side array; reads may therefore crop the operand. Callers here crop
with explicit slices at the call site (see ops/physics.py) so every formula's
index algebra is visible and testable against a NumPy oracle.

All ops are out-of-place slices: XLA fuses chains of them into single
VPU passes, so this layer costs nothing at runtime.
"""

from __future__ import annotations

import jax.numpy as jnp


def d_xa(a):
    """Forward difference along x over the full array: out (nx-1, ny, nz)."""
    return a[1:, :, :] - a[:-1, :, :]


def d_ya(a):
    return a[:, 1:, :] - a[:, :-1, :]


def d_za(a):
    return a[:, :, 1:] - a[:, :, :-1]


def d_xi(a):
    """Difference along x on inner y/z planes: out (nx-1, ny-2, nz-2)."""
    return a[1:, 1:-1, 1:-1] - a[:-1, 1:-1, 1:-1]


def d_yi(a):
    return a[1:-1, 1:, 1:-1] - a[1:-1, :-1, 1:-1]


def d_zi(a):
    return a[1:-1, 1:-1, 1:] - a[1:-1, 1:-1, :-1]


def d2_xi(a):
    """Second difference along x on inner y/z planes: out (nx-2, ny-2, nz-2)."""
    return a[2:, 1:-1, 1:-1] - 2.0 * a[1:-1, 1:-1, 1:-1] + a[:-2, 1:-1, 1:-1]


def d2_yi(a):
    return a[1:-1, 2:, 1:-1] - 2.0 * a[1:-1, 1:-1, 1:-1] + a[1:-1, :-2, 1:-1]


def d2_zi(a):
    return a[1:-1, 1:-1, 2:] - 2.0 * a[1:-1, 1:-1, 1:-1] + a[1:-1, 1:-1, :-2]


def inn(a):
    """Interior view A[1:-1,1:-1,1:-1]."""
    return a[1:-1, 1:-1, 1:-1]


def av_xa(a):
    """Two-point average along x (used for face->center interpolation)."""
    return 0.5 * (a[1:, :, :] + a[:-1, :, :])


def av_ya(a):
    return 0.5 * (a[:, 1:, :] + a[:, :-1, :])


def av_za(a):
    return 0.5 * (a[:, :, 1:] + a[:, :, :-1])


def laplacian_inner(a, dx, dy, dz):
    """d2_xi/dx/dx + d2_yi/dy/dy + d2_zi/dz/dz: out (nx-2, ny-2, nz-2).

    The pressure-Poisson operator (NavierStokes3D_gpu.jl:200,210). The two
    successive divisions (not /(dx*dx)) reproduce the reference's exact
    floating-point rounding for golden-value parity.
    """
    return (d2_xi(a) / dx / dx
            + d2_yi(a) / dy / dy
            + d2_zi(a) / dz / dz)


def laplacian_inner_ds(a, dx, dy, dz):
    """laplacian_inner in difference-first form ((a+ - ac) + (a- - ac)):
    evaluation error ~eps*|neighbor difference| instead of eps*|a| — used
    by the extended-precision residual, where eps*|a| noise would mask the
    (hi,lo) pair's extra bits. NOT reference-rounding-parity (use
    laplacian_inner for golden comparisons)."""
    c = a[1:-1, 1:-1, 1:-1]
    return (((a[2:, 1:-1, 1:-1] - c) + (a[:-2, 1:-1, 1:-1] - c)) / dx / dx
            + ((a[1:-1, 2:, 1:-1] - c) + (a[1:-1, :-2, 1:-1] - c)) / dy / dy
            + ((a[1:-1, 1:-1, 2:] - c) + (a[1:-1, 1:-1, :-2] - c)) / dz / dz)


def divergence(vx, vy, vz, dx, dy, dz):
    """Staggered divergence at cell centers: the @∇V macro
    (NavierStokes3D_gpu.jl:175). out (nx, ny, nz)."""
    return d_xa(vx) / dx + d_ya(vy) / dy + d_za(vz) / dz
