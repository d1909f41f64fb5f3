"""Semi-Lagrangian advection: method of characteristics + trilinear interp.

Reference: advect!/backtrack!/lerp (NavierStokes3D_gpu.jl:288-334;
NavierStokes3D_multi_gpu.jl:190-243). Each staggered component averages the
other two velocity components onto its own face, backtracks the departure
point one dt, and trilinearly interpolates the *_o snapshot there. Departure
indices clamp to the array bounds (gpu.jl:290-293), which on a sharded grid
clamps into the halo exactly as the reference's per-rank clamp does.

compat=True replicates the reference bug where the third branch advects Vy a
second time with Vz-face-averaged velocities and Vz-derived bounds, so Vz is
never advected (gpu.jl:321-326) — the golden regression values encode this.
compat=False advects Vz properly.

The 8-corner reads lower to a single XLA gather per corner; the Pallas
kernel in kernels/advect (bounded-window formulation, exploiting |δ| ≲ 1
cell from CFL_adv = 1) replaces this on the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp


def _lerp(a, b, t):
    """lerp(a,b,t) = b t + a (1-t) (NavierStokes3D_gpu.jl:306)."""
    return b * t + a * (1.0 - t)


def _backtrack(a_o, vxc, vyc, vzc, ix, iy, iz, dt, dx, dy, dz):
    """Vectorized backtrack! (NavierStokes3D_gpu.jl:288-304).

    a_o: source snapshot (clamp bounds come from its shape).
    vxc/vyc/vzc: face-centered velocities over the write region.
    ix/iy/iz: 1-based indices of the write region (broadcastable).
    Returns interpolated values over the write region.
    """
    n1, n2, n3 = a_o.shape
    dtype = a_o.dtype
    dlx = dt * vxc / dx
    dly = dt * vyc / dy
    dlz = dt * vzc / dz
    ix1 = jnp.clip(jnp.floor(ix - dlx), 1, n1).astype(jnp.int32)
    iy1 = jnp.clip(jnp.floor(iy - dly), 1, n2).astype(jnp.int32)
    iz1 = jnp.clip(jnp.floor(iz - dlz), 1, n3).astype(jnp.int32)
    ix2 = jnp.minimum(ix1 + 1, n1)
    iy2 = jnp.minimum(iy1 + 1, n2)
    iz2 = jnp.minimum(iz1 + 1, n3)
    # Julia: δ = (δ>0) - (δ%1); % is truncated remainder == fmod.
    tx = (dlx > 0).astype(dtype) - jnp.fmod(dlx, 1.0)
    ty = (dly > 0).astype(dtype) - jnp.fmod(dly, 1.0)
    tz = (dlz > 0).astype(dtype) - jnp.fmod(dlz, 1.0)

    ix1, iy1, iz1, ix2, iy2, iz2 = jnp.broadcast_arrays(ix1, iy1, iz1, ix2, iy2, iz2)

    def at(i, j, k):  # 1-based -> 0-based gather
        return a_o[i - 1, j - 1, k - 1]

    fy1z1 = _lerp(at(ix1, iy1, iz1), at(ix2, iy1, iz1), tx)
    fy1z2 = _lerp(at(ix1, iy1, iz2), at(ix2, iy1, iz2), tx)
    fy2z1 = _lerp(at(ix1, iy2, iz1), at(ix2, iy2, iz1), tx)
    fy2z2 = _lerp(at(ix1, iy2, iz2), at(ix2, iy2, iz2), tx)
    fz1 = _lerp(fy1z1, fy2z1, ty)
    fz2 = _lerp(fy1z2, fy2z2, ty)
    return _lerp(fz1, fz2, tz)


def _ranges(dtype, *specs):
    """1-based index axes, shaped for broadcasting: specs are (start, stop)."""
    out = []
    for axis, (start, stop) in enumerate(specs):
        shape = [1, 1, 1]
        r = jnp.arange(start, stop + 1, dtype=dtype)
        shape[axis] = r.shape[0]
        out.append(r.reshape(shape))
    return out


def advect(vx, vy, vz, c, dt, dx, dy, dz, *, compat: bool):
    """Advect all staggered velocity components and the tracer C.

    Inputs are the post-BC fields of this step; they serve as both the *_o
    snapshots (reference copies at gpu.jl:141) and the write targets.
    """
    nx1, ny, nz = vx.shape          # (nx+1, ny, nz)
    nx = nx1 - 1
    dtype = vx.dtype
    vx_o, vy_o, vz_o, c_o = vx, vy, vz, c

    # -- branch 1: Vx over ix in 2..nx (gpu.jl:308-314) --
    vxc = vx_o[1:-1, :, :]
    vyc = 0.25 * (vy_o[:-1, :-1, :] + vy_o[:-1, 1:, :]
                  + vy_o[1:, :-1, :] + vy_o[1:, 1:, :])
    vzc = 0.25 * (vz_o[:-1, :, :-1] + vz_o[:-1, :, 1:]
                  + vz_o[1:, :, :-1] + vz_o[1:, :, 1:])
    ix, iy, iz = _ranges(dtype, (2, nx), (1, ny), (1, nz))
    vx_new = vx.at[1:-1, :, :].set(
        _backtrack(vx_o, vxc, vyc, vzc, ix, iy, iz, dt, dx, dy, dz))

    # -- branch 2: Vy over iy in 2..ny (gpu.jl:315-320) --
    vxc = 0.25 * (vx_o[:-1, :-1, :] + vx_o[1:, :-1, :]
                  + vx_o[:-1, 1:, :] + vx_o[1:, 1:, :])
    vyc = vy_o[:, 1:-1, :]
    vzc = 0.25 * (vz_o[:, :-1, :-1] + vz_o[:, :-1, 1:]
                  + vz_o[:, 1:, :-1] + vz_o[:, 1:, 1:])
    ix, iy, iz = _ranges(dtype, (1, nx), (2, ny), (1, nz))
    vy_new = vy.at[:, 1:-1, :].set(
        _backtrack(vy_o, vxc, vyc, vzc, ix, iy, iz, dt, dx, dy, dz))

    # -- branch 3: iz in 2..nz with Vz-face velocities (gpu.jl:321-326) --
    vxc = 0.25 * (vx_o[:-1, :, :-1] + vx_o[1:, :, :-1]
                  + vx_o[:-1, :, 1:] + vx_o[1:, :, 1:])
    vyc = 0.25 * (vy_o[:, :-1, :-1] + vy_o[:, 1:, :-1]
                  + vy_o[:, :-1, 1:] + vy_o[:, 1:, 1:])
    vzc = vz_o[:, :, 1:-1]
    ix, iy, iz = _ranges(dtype, (1, nx), (1, ny), (2, nz))
    if compat:
        # Reference bug: writes Vy (with Vy_o source and Vy clamp bounds)
        # instead of Vz (gpu.jl:325). Overwrites branch-2 results wherever
        # both regions overlap, exactly as the sequential Julia kernel does.
        vals = _backtrack(vy_o, vxc, vyc, vzc, ix, iy, iz, dt, dx, dy, dz)
        vy_new = vy_new.at[:, :-1, 1:].set(vals)
        vz_new = vz
    else:
        vals = _backtrack(vz_o, vxc, vyc, vzc, ix, iy, iz, dt, dx, dy, dz)
        vz_new = vz.at[:, :, 1:-1].set(vals)

    # -- branch 4: tracer C over all cells (gpu.jl:327-332) --
    vxc = 0.5 * (vx_o[:-1, :, :] + vx_o[1:, :, :])
    vyc = 0.5 * (vy_o[:, :-1, :] + vy_o[:, 1:, :])
    vzc = 0.5 * (vz_o[:, :, :-1] + vz_o[:, :, 1:])
    ix, iy, iz = _ranges(dtype, (1, nx), (1, ny), (1, nz))
    c_new = _backtrack(c_o, vxc, vyc, vzc, ix, iy, iz, dt, dx, dy, dz)

    return vx_new, vy_new, vz_new, c_new
