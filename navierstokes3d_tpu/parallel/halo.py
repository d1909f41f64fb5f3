"""Explicit halo exchange + distributed Poisson loop under shard_map.

This is the hand-scheduled counterpart of the reference's communication
layer: ImplicitGlobalGrid's `update_halo!` becomes per-axis
`lax.ppermute` face shifts over the ICI mesh, and `MPI.Allreduce(MAX)`
(max_g, NavierStokes3D_multi_gpu.jl:21) becomes an in-jit `lax.pmax` —
zero host round-trips for the entire pseudo-transient solve
(the reference syncs to host at every residual check, gpu.jl:132).

Data layout: each device owns an un-haloed block of the global grid
(identical to the global-view sharding in parallel/mesh.py, so states
move freely between the two paths). Halos are fetched transiently per
iteration; at physical boundaries ppermute's missing links yield zeros,
which only ever feed masked ring cells.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

AXES = ("x", "y", "z")


def _shift(x, axis_name: str, direction: int):
    """Neighbor shift along a mesh axis: returns this device's face data
    received from its -direction neighbor (zeros at the open boundary)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return jnp.zeros_like(x)
    if direction > 0:
        perm = [(i, i + 1) for i in range(n - 1)]
    else:
        perm = [(i + 1, i) for i in range(n - 1)]
    return lax.ppermute(x, axis_name, perm)


def halo_pad(block, axis_names=AXES):
    """Pad a local block by 1 cell per side per sharded axis with neighbor
    face planes (zeros at open global boundaries).

    The reference exchanges whole halos after every kernel
    (update_halo!, multi_gpu.jl:450-477); here the exchange is fused into
    the consuming stencil's padding. 6 ppermutes of one face plane each.
    """
    out = block
    for dim, ax in enumerate(axis_names):
        lo_face = lax.index_in_dim(out, 0, dim, keepdims=True)
        hi_face = lax.index_in_dim(out, out.shape[dim] - 1, dim, keepdims=True)
        from_left = _shift(hi_face, ax, +1)   # left neighbor's last plane
        from_right = _shift(lo_face, ax, -1)  # right neighbor's first plane
        out = jnp.concatenate([from_left, out, from_right], axis=dim)
    return out


def _device_pos(axis_names=AXES):
    idx = [lax.axis_index(a) for a in axis_names]
    num = [lax.axis_size(a) for a in axis_names]
    return idx, num


def _bc_pr_local(pr, variant: str, xlo_plane, xhi_plane):
    """The reference's set_bc_Pr! on a local block, guarded by global
    position exactly as the multi script guards by rank
    (multi_gpu.jl:175-184). Requires local block >= 2 cells per sharded
    axis (copy source planes are then always owned)."""
    (ix, iy, iz), (npx, npy, npz) = _device_pos()

    def plane_set(a, dim, where_lo, src):
        return a

    if variant == "multi":
        pr = jnp.where(ix == 0, pr.at[0].set(pr[1]), pr)
        pr = jnp.where(ix == npx - 1, pr.at[-1].set(pr[-2]), pr)
        pr = jnp.where(iy == 0, pr.at[:, 0].set(pr[:, 1]), pr)
        pr = jnp.where(iy == npy - 1, pr.at[:, -1].set(pr[:, -2]), pr)
        pr = jnp.where(iz == 0, pr.at[:, :, 0].set(pr[:, :, 1]), pr)
        pr = jnp.where(iz == npz - 1, pr.at[:, :, -1].set(pr[:, :, -2]), pr)
        pr = jnp.where(ix == npx - 1, pr.at[-1].set(0.0), pr)
    else:  # gpu variant: bc_y, bc_z, hydrostatic x planes (gpu.jl:281-286)
        pr = jnp.where(iy == 0, pr.at[:, 0].set(pr[:, 1]), pr)
        pr = jnp.where(iy == npy - 1, pr.at[:, -1].set(pr[:, -2]), pr)
        pr = jnp.where(iz == 0, pr.at[:, :, 0].set(pr[:, :, 1]), pr)
        pr = jnp.where(iz == npz - 1, pr.at[:, :, -1].set(pr[:, :, -2]), pr)
        pr = jnp.where(ix == 0, pr.at[0].set(xlo_plane), pr)
        pr = jnp.where(ix == npx - 1, pr.at[-1].set(xhi_plane), pr)
    return pr


def build_poisson_shard_map(mesh: Mesh, grid, phys, eps_it: float,
                            variant: str, dtype):
    """Distributed pseudo-transient Poisson solve: the ENTIRE chunked
    while_loop runs inside one shard_map — per iteration: 6 face
    ppermutes (Pr halo) + local fused stencil + position-guarded BCs;
    per residual check: one more halo + lax.pmax over the mesh.

    Returns solve(pr, dprdtau, rhs3d) -> (pr, dprdtau, iters, err, hist)
    operating on globally-sharded arrays.
    """
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    dx, dy, dz = grid.dx, grid.dy, grid.dz
    dtau, damp = grid.dtau, grid.damp
    nchk, niter = grid.nchk, grid.niter
    nchunks = niter // nchk
    rem = niter - nchunks * nchk
    err_scale = (grid.ly * grid.ly) / phys.psc
    npx, npy, npz = (mesh.shape[a] for a in AXES)
    if nx % npx or ny % npy or nz % npz:
        raise ValueError("grid dims must divide mesh dims")
    bx, by, bz = nx // npx, ny // npy, nz // npz
    if min(bx, by, bz) < 2:
        raise ValueError("local blocks must be >= 2 cells per axis")

    # gpu-variant hydrostatic x planes, as local (by,bz) tiles per device:
    # value depends only on global z (gpu.jl:257-261).
    if variant == "gpu":
        izg = np.arange(1, nz + 1, dtype=np.float64)
        prof = phys.rho * phys.g * (nz - izg + 0.5) * dz
        prof_full = np.broadcast_to(prof[None, :], (ny, nz)).astype(dtype)
    else:
        prof_full = np.zeros((ny, nz), dtype)

    def local_interior_mask(sh):
        """1.0 on global-interior cells of the local block."""
        (ix, iy, iz), (Px, Py, Pz) = _device_pos()
        gx = ix * bx + lax.broadcasted_iota(jnp.int32, sh, 0)
        gy = iy * by + lax.broadcasted_iota(jnp.int32, sh, 1)
        gz = iz * bz + lax.broadcasted_iota(jnp.int32, sh, 2)
        m = ((gx >= 1) & (gx <= nx - 2) & (gy >= 1) & (gy <= ny - 2)
             & (gz >= 1) & (gz <= nz - 2))
        return m

    def lap_of(pad):
        c = pad[1:-1, 1:-1, 1:-1]
        return ((pad[2:, 1:-1, 1:-1] - 2 * c + pad[:-2, 1:-1, 1:-1]) / dx / dx
                + (pad[1:-1, 2:, 1:-1] - 2 * c + pad[1:-1, :-2, 1:-1]) / dy / dy
                + (pad[1:-1, 1:-1, 2:] - 2 * c + pad[1:-1, 1:-1, :-2]) / dz / dz)

    def loop_body_local(pr, dpr, rhs, mask, xlo, xhi):
        pad = halo_pad(pr)
        resid = lap_of(pad) - rhs
        dpr = jnp.where(mask, dpr * (1.0 - damp) + dtau * resid,
                        jnp.zeros_like(dpr))
        pr = pr + dtau * dpr
        pr = _bc_pr_local(pr, variant, xlo, xhi)
        return pr, dpr

    def residual_local(pr, rhs, mask):
        pad = halo_pad(pr)
        rp = lap_of(pad) - rhs
        local_max = jnp.max(jnp.where(mask, jnp.abs(rp), 0.0))
        return lax.pmax(lax.pmax(lax.pmax(local_max, "x"), "y"), "z")

    def solve_local(pr, dpr, rhs):
        mask = local_interior_mask(pr.shape)
        (ixd, iyd, izd), _ = _device_pos()
        # local tile of the hydrostatic profile for this device
        profj = jnp.asarray(prof_full)
        ys = iyd * by
        zs = izd * bz
        xplane = lax.dynamic_slice(profj, (ys, zs), (by, bz))
        xlo = xplane + jnp.asarray(100.0, dtype)
        xhi = xplane

        def run_iters(pr, dpr, n):
            return lax.fori_loop(
                0, n,
                lambda _, c: loop_body_local(*c, rhs, mask, xlo, xhi),
                (pr, dpr))

        big = jnp.asarray(1e30, dtype)

        def cond(st):
            _, _, k, err, _ = st
            return (k < nchunks) & (err >= eps_it) & jnp.isfinite(err)

        def body(st):
            pr, dpr, k, err, hist = st
            pr, dpr = run_iters(pr, dpr, nchk)
            err = residual_local(pr, rhs, mask) * err_scale
            hist = hist.at[k].set(err)
            return (pr, dpr, k + 1, err, hist)

        hist0 = jnp.full((max(nchunks, 1),), jnp.nan, dtype)
        pr, dpr, k, err, hist = lax.while_loop(
            cond, body, (pr, dpr, jnp.int32(0), big, hist0))
        iters = k * nchk
        if rem > 0:
            do_tail = (k >= nchunks) & (err >= eps_it) & jnp.isfinite(err)
            pr, dpr = lax.cond(do_tail,
                               lambda a: run_iters(*a, rem),
                               lambda a: a, (pr, dpr))
            iters = iters + jnp.where(do_tail, rem, 0)
        return pr, dpr, iters, err, hist

    spec = P(*AXES)
    rep = P()
    solve = shard_map(
        solve_local, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec, rep, rep, rep),
        check_rep=False)
    return solve
