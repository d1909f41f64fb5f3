"""Fused Pallas TPU kernel for the pseudo-transient Poisson iteration.

One invocation performs a full damped Jacobi-style iteration INCLUDING the
boundary conditions (the reference's update_dPrdτ! + update_Pr! +
set_bc_Pr! sequence, NavierStokes3D_gpu.jl:199-207,281-286 /
multi_gpu.jl:70-82,175-184) in a single pass over HBM:

    read  Pr (with 1-plane x halo), dPrdτ, rhs
    write Pr', dPrdτ'            -- ~5.25 grid passes, the HBM minimum.

Layout: fields are flattened to (nx, ny*nz) so the TPU lane dimension is
ny*nz (23409 for the showcase grid -> <0.1% tile padding, versus 1.75x
for a trailing (ny,nz)=(153,153) pair). The y/z stencil becomes lane
shifts of nz and 1; shift wrap-around lands only in the boundary ring,
which is masked (dPrdτ ring stays 0) or overwritten by the in-kernel BCs.
Pr carries 2 permanent pad planes in x so every slab DMA has uniform
shape; pad-plane garbage only ever feeds masked ring cells.

The kernel walks x-slabs with double-buffered async DMA (load slab s+1
while computing slab s), the standard Pallas stencil pipeline. Jacobi
semantics require separate in/out Pr buffers (a slab's left halo is the
previous slab's unwritten old value); dPrdτ has no halo so it could alias,
but is kept separate for clarity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class PoissonBCSpec(NamedTuple):
    """BC sequence applied in-kernel after the pressure update.

    multi variant: zero_grad_x=True,  xlo_plane=None,     xhi_plane=zeros
                   (bc_x!, bc_y!, bc_z!, outlet Dirichlet — multi_gpu.jl:175-184)
    gpu variant:   zero_grad_x=False, xlo_plane=prof+100, xhi_plane=prof
                   (bc_y!, bc_z!, hydrostatic x — gpu.jl:281-286)
    """
    zero_grad_x: bool
    xlo_plane: Optional[np.ndarray]   # (ny*nz,) or None
    xhi_plane: Optional[np.ndarray]   # (ny*nz,) or None


def choose_slab(nx: int, nyz: int, itemsize: int = 4,
                vmem_budget: int = 12 * 2 ** 20) -> int:
    """Largest divisor of nx whose slab working set fits the VMEM budget.

    Working set: 2x(B+2) pr + 2xB dpr + 2xB rhs + B opr + B odpr planes,
    each padded to 8-sublane multiples.
    """
    best = 1
    for b in range(1, nx + 1):
        if nx % b:
            continue
        pad = lambda n: ((n + 7) // 8) * 8
        planes = 2 * pad(b + 2) + 4 * pad(b) + 2 * pad(b)
        if planes * nyz * itemsize <= vmem_budget:
            best = b
    return best


def build_poisson_iter(nx: int, ny: int, nz: int, dx: float, dy: float,
                       dz: float, dtau: float, damp: float,
                       bc: PoissonBCSpec, dtype=jnp.float32,
                       slab: Optional[int] = None, interpret: bool = False):
    """Returns (iter_fn, pack, unpack):

      pack(pr, dprdtau, rhs3d) -> (pr_pad, dpr_flat, rhs_flat)
      iter_fn(pr_pad, dpr_flat, rhs_flat) -> (pr_pad', dpr_flat')
      unpack(pr_pad, dpr_flat) -> (pr, dprdtau)

    pr_pad: (nx+2, nyz) with real planes at [1:nx+1]; pad planes feed only
    masked ring cells so their content is irrelevant.
    """
    nyz = ny * nz
    B = slab or choose_slab(nx, nyz, np.dtype(dtype).itemsize)
    S = nx // B
    inv_dx2 = np.array(1.0 / dx / dx, np.dtype(dtype))
    inv_dy2 = np.array(1.0 / dy / dy, np.dtype(dtype))
    inv_dz2 = np.array(1.0 / dz / dz, np.dtype(dtype))
    one = np.array(1.0, np.dtype(dtype))
    dtau_c = np.array(dtau, np.dtype(dtype))
    decay = np.array(1.0 - damp, np.dtype(dtype))

    # Precomputed per-lane index/mask rows (loaded once into VMEM, 93KB each)
    j = np.arange(nyz, dtype=np.int32)
    jrow = (j // nz).reshape(1, nyz)                     # y index per lane
    zrow = (j % nz).reshape(1, nyz)                      # z index per lane
    yz_interior = ((jrow >= 1) & (jrow <= ny - 2)
                   & (zrow >= 1) & (zrow <= nz - 2)).astype(np.dtype(dtype))
    xlo = (np.zeros((1, nyz), np.dtype(dtype)) if bc.xlo_plane is None
           else np.asarray(bc.xlo_plane, np.dtype(dtype)).reshape(1, nyz))
    xhi = (np.zeros((1, nyz), np.dtype(dtype)) if bc.xhi_plane is None
           else np.asarray(bc.xhi_plane, np.dtype(dtype)).reshape(1, nyz))
    has_xlo = bc.xlo_plane is not None
    has_xhi = bc.xhi_plane is not None

    def kernel(pr_pad, dpr, rhs, yzmask, jrow_r, zrow_r, xlo_r, xhi_r,
               pr_out, dpr_out,
               pr_buf, dpr_buf, rhs_buf, opr_buf, odpr_buf,
               load_sems, store_sems):

        def loads(slot, s):
            return [
                pltpu.make_async_copy(pr_pad.at[pl.ds(s * B, B + 2)],
                                      pr_buf.at[slot], load_sems.at[slot, 0]),
                pltpu.make_async_copy(dpr.at[pl.ds(s * B, B)],
                                      dpr_buf.at[slot], load_sems.at[slot, 1]),
                pltpu.make_async_copy(rhs.at[pl.ds(s * B, B)],
                                      rhs_buf.at[slot], load_sems.at[slot, 2]),
            ]

        for dma in loads(0, 0):
            dma.start()

        def body(s, carry):
            slot = s % 2
            nxt = (s + 1) % 2

            @pl.when(s + 1 < S)
            def _():
                for dma in loads(nxt, s + 1):
                    dma.start()

            for dma in loads(slot, s):
                dma.wait()

            p = pr_buf[slot]              # (B+2, nyz)
            d = dpr_buf[slot]             # (B, nyz)
            r = rhs_buf[slot]             # (B, nyz)
            pc = p[1:B + 1, :]
            lap = (p[2:B + 2, :] - 2.0 * pc + p[0:B, :]) * inv_dx2
            # pltpu.roll requires non-negative shifts: -k == nyz - k
            lap += (pltpu.roll(pc, nyz - nz, 1) - 2.0 * pc
                    + pltpu.roll(pc, nz, 1)) * inv_dy2
            lap += (pltpu.roll(pc, nyz - 1, 1) - 2.0 * pc
                    + pltpu.roll(pc, 1, 1)) * inv_dz2
            d_new = (d * decay + dtau_c * (lap - r)) * yzmask[0:1, :]
            first = s == 0
            last = s == S - 1
            # global x-ring planes (real x = 0 and nx-1) keep dPrdτ = 0;
            # this also kills any pad-plane garbage picked up by lap there.
            row = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
            ring = jnp.logical_or(jnp.logical_and(first, row == 0),
                                  jnp.logical_and(last, row == B - 1))
            d_new = jnp.where(ring, jnp.zeros_like(d_new), d_new)
            odpr_buf[:] = d_new
            opr_buf[:] = pc + dtau_c * d_new

            # ---- boundary conditions on the updated pressure ----
            if bc.zero_grad_x:
                @pl.when(first)
                def _():
                    opr_buf[0, :] = opr_buf[1, :]

                @pl.when(last)
                def _():
                    opr_buf[B - 1, :] = opr_buf[B - 2, :]
            q = opr_buf[:]
            jr = jrow_r[0:1, :]
            zr = zrow_r[0:1, :]
            q = jnp.where(jr == 0, pltpu.roll(q, nyz - nz, 1), q)
            q = jnp.where(jr == ny - 1, pltpu.roll(q, nz, 1), q)
            q = jnp.where(zr == 0, pltpu.roll(q, nyz - 1, 1), q)
            q = jnp.where(zr == nz - 1, pltpu.roll(q, 1, 1), q)
            opr_buf[:] = q
            if has_xlo:
                @pl.when(first)
                def _():
                    opr_buf[0, :] = xlo_r[0, :]
            if has_xhi:
                @pl.when(last)
                def _():
                    opr_buf[B - 1, :] = xhi_r[0, :]

            st1 = pltpu.make_async_copy(opr_buf,
                                        pr_out.at[pl.ds(s * B + 1, B)],
                                        store_sems.at[0])
            st2 = pltpu.make_async_copy(odpr_buf,
                                        dpr_out.at[pl.ds(s * B, B)],
                                        store_sems.at[1])
            st1.start()
            st2.start()
            # Single-slot out buffers: wait before the next slab reuses them.
            st1.wait()
            st2.wait()
            return carry

        jax.lax.fori_loop(0, S, body, 0)

    jdtype = jnp.dtype(dtype)
    pallas_iter = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nx + 2, nyz), jdtype),   # pr_out (padded)
            jax.ShapeDtypeStruct((nx, nyz), jdtype),       # dpr_out
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # pr_pad
            pl.BlockSpec(memory_space=pltpu.ANY),          # dpr
            pl.BlockSpec(memory_space=pltpu.ANY),          # rhs
            pl.BlockSpec(memory_space=pltpu.VMEM),         # yzmask
            pl.BlockSpec(memory_space=pltpu.VMEM),         # jrow
            pl.BlockSpec(memory_space=pltpu.VMEM),         # zrow
            pl.BlockSpec(memory_space=pltpu.VMEM),         # xlo
            pl.BlockSpec(memory_space=pltpu.VMEM),         # xhi
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B + 2, nyz), jdtype),   # pr_buf
            pltpu.VMEM((2, B, nyz), jdtype),       # dpr_buf
            pltpu.VMEM((2, B, nyz), jdtype),       # rhs_buf
            pltpu.VMEM((B, nyz), jdtype),          # opr_buf
            pltpu.VMEM((B, nyz), jdtype),          # odpr_buf
            pltpu.SemaphoreType.DMA((2, 3)),       # load sems
            pltpu.SemaphoreType.DMA((2,)),         # store sems
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=14 * nx * nyz,
            bytes_accessed=int(5.3 * nx * nyz * np.dtype(dtype).itemsize),
            transcendentals=0),
        interpret=interpret,
    )

    yzmask_c = jnp.asarray(yz_interior)
    jrow_c = jnp.asarray(jrow)
    zrow_c = jnp.asarray(zrow)
    xlo_c = jnp.asarray(xlo)
    xhi_c = jnp.asarray(xhi)

    def iter_fn(pr_pad, dpr_flat, rhs_flat):
        return pallas_iter(pr_pad, dpr_flat, rhs_flat, yzmask_c, jrow_c,
                           zrow_c, xlo_c, xhi_c)

    def pack(pr, dprdtau, rhs3d):
        pr_pad = jnp.zeros((nx + 2, nyz), jdtype)
        pr_pad = pr_pad.at[1:nx + 1].set(pr.reshape(nx, nyz).astype(jdtype))
        return (pr_pad,
                dprdtau.reshape(nx, nyz).astype(jdtype),
                rhs3d.reshape(nx, nyz).astype(jdtype))

    def unpack(pr_pad, dpr_flat):
        return (pr_pad[1:nx + 1].reshape(nx, ny, nz),
                dpr_flat.reshape(nx, ny, nz))

    iter_fn.slab = B  # introspection for tests/benchmarks
    return iter_fn, pack, unpack
