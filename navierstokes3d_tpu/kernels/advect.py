"""Fused Pallas select-shift advection (TPU hot path).

Reference semantics: advect!/backtrack!/lerp (NavierStokes3D_gpu.jl:288-334),
via the bounded-window select-shift formulation of ops/advect.py
(`_backtrack_selectshift`). The XLA form of that accumulation re-reads the
source array once per shifted slice — (2k+2)^3 = 216 HBM passes at k=2,
split into 6 optimization-barrier fusions that each stream ~36 slices of
the 3D array at poor effective bandwidth (the (255,153,153) layout pads
lanes 153->256; measured ~1.4 ms per fusion, ~25 ms for the four advected
fields at the showcase grid). This kernel keeps a row-slab of the source
resident in VMEM and performs the whole 216-term accumulation there, in
the Poisson kernel's flat (rows, W) lane layout (kernels/poisson.py):

  * each field flattens to (n1, W) with W = ceil(n2*n3/128)*128; lane j
    holds (y, z) = (j // n3, j % n3);
  * a y/z window offset (p, q) is ONE cyclic lane roll by p*n3 + q of the
    x-extended slab, hoisted out of the x-offset loop (shifts commute);
    the 6 x-offsets are free row views of each rolled slab;
  * any rolled lane whose sample would fall outside the global staggered
    bounds carries exactly zero weight (the same clamp argument that
    makes the jnp zero-pad form exact), so roll wraparound, lane-row
    carries, and the padding tail never contribute.

The accumulation runs in the jnp backend's exact (p, q, o) term order
with the same weight expressions, so results are BIT-IDENTICAL to
ops/advect.py's selectshift backend when both run under the same
compilation discipline (asserted under jit in tests/test_advect_pallas
.py; also measured bitwise on the real chip at the 255x153x153 showcase
shape). Across independently compiled TPU programs XLA may contract
mul+add into FMA differently per shape, which perturbs the jnp side by
1-2 ulp (measured at nx=63: max 3.6e-7 on O(1) fields, zero
discontinuity flips) — the same caveat that applies between any two
fusions of the jnp backend itself. The clamp counter (points whose
displacement exceeds k on any axis) is summed in-kernel into an SMEM
scalar, matching the jnp count.

Each staggered field is one pallas_call built by `build_advect_branch`;
`build_advect` assembles the four reference branches (Vx/Vy/Vz/C —
gpu.jl:308-332) with the face-averaged advecting velocities precomputed
by the same XLA expressions as ops/advect.py. compat mode (the reference's
Vz-never-advected bug) stays on the jnp backends by design.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad2(a, rows, lanes):
    """Zero-pad a 2D array up to (rows, lanes) (concat-lowered, cheap)."""
    r, c = a.shape
    if r == rows and c == lanes:
        return a
    return jnp.pad(a, ((0, rows - r), (0, lanes - c)))


def build_advect_branch(n1: int, n2: int, n3: int, dt: float, dx: float,
                        dy: float, dz: float, k: int, dtype=jnp.float32,
                        write_rows: Optional[Tuple[int, int]] = None,
                        lane_y: Optional[Tuple[int, int]] = None,
                        lane_z: Optional[Tuple[int, int]] = None,
                        slab: int = 8, interpret: bool = False):
    """One advected field: returns (run, flat, unflat).

    run(a_flat, vxc_flat, vyc_flat, vzc_flat) -> (out_flat, n_clamped)
    where all operands are (NXP, W) flat arrays (flat()/unflat() convert);
    out carries the accumulated interpolant on the write region and the
    input value elsewhere; n_clamped is a (1,1) int32 count of write-region
    points whose raw displacement exceeded k on any axis.

    (n1, n2, n3): the field's GLOBAL staggered shape — also the
    departure-point clamp bounds (gpu.jl:290-293). write_rows: inclusive
    0-based x-row range written (None = all rows); lane_y / lane_z:
    inclusive 0-based y / z ranges written (None = full axis). The
    advecting velocities vxc/vyc/vzc need valid values on the write region
    only (elsewhere any finite value — the write mask discards them).
    """
    nyz = n2 * n3
    W = ((nyz + 127) // 128) * 128
    B = slab
    NXP = ((n1 + B - 1) // B) * B
    S = NXP // B
    P = k + 1
    if B < P:
        raise ValueError(f"slab {B} must be >= k+1 = {P}")
    jdtype = jnp.dtype(dtype)
    itemsize = np.dtype(dtype).itemsize
    # dt * v / d with dt, d rounded separately — the jnp backend's exact
    # expression (ops/advect.py axis_terms), so dl rounds identically
    dt_c = np.array(dt, np.dtype(dtype))
    dxs = (np.array(dx, np.dtype(dtype)), np.array(dy, np.dtype(dtype)),
           np.array(dz, np.dtype(dtype)))
    kf = np.array(float(k), np.dtype(dtype))

    # per-lane index rows (1, W): y, z (0-based), real-lane mask
    j = np.arange(W, dtype=np.int32)
    real = j < nyz
    jrow = np.where(real, j // n3, -1).reshape(1, W)
    zrow = np.where(real, j % n3, -1).reshape(1, W)
    wmask = real.reshape(1, W)
    if lane_y is not None:
        wmask = wmask & (jrow >= lane_y[0]) & (jrow <= lane_y[1])
    if lane_z is not None:
        wmask = wmask & (zrow >= lane_z[0]) & (zrow <= lane_z[1])
    wr0, wr1 = write_rows if write_rows is not None else (0, n1 - 1)
    # f32 1-based global index per lane (exact: indices < 2^24)
    idx_y = jrow.astype(np.dtype(dtype)) + 1.0
    idx_z = zrow.astype(np.dtype(dtype)) + 1.0
    rows_c = tuple(map(jnp.asarray, (idx_y, idx_z,
                                     wmask.astype(np.int32))))

    offs = list(range(-P, k + 1))            # jnp term order (o, p, q)

    def axis_terms(v, d_c, idx, n):
        """Mirror of ops/advect.py axis_terms: one-hot offsets + fraction
        + clamp flag, identical expressions so weights are bit-equal."""
        dl_raw = dt_c * v / d_c
        dl = jnp.clip(dl_raw, -kf, kf)
        i1 = jnp.clip(jnp.floor(idx - dl), 1.0, float(n))
        t = (dl > 0).astype(jdtype) - jnp.fmod(dl, jnp.asarray(1.0, jdtype))
        o1 = (i1 - idx).astype(jnp.int32)
        o2 = (jnp.minimum(i1 + 1.0, float(n)) - idx).astype(jnp.int32)
        return o1, o2, t, jnp.abs(dl_raw) > kf

    def weight(o1, o2, t, o):
        one = jnp.ones((), jdtype)
        zero = jnp.zeros((), jdtype)
        return (jnp.where(o1 == o, one - t, zero)
                + jnp.where(o2 == o, t, zero))

    def kernel(a_lo, a_mid, a_hi, vxc, vyc, vzc, iy_r, iz_r, wm_r,
               out_ref, ncl_ref):
        sidx = pl.program_id(0)
        # x-extended slab: rows [s*B - P, s*B + B + k)
        a_ext = jnp.concatenate(
            [a_lo[B - P:, :], a_mid[:, :], a_hi[:k, :]], axis=0)
        gx = (sidx * B
              + jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0))
        idx_x = gx.astype(jdtype) + 1.0
        iy = iy_r[0:1, :]
        iz = iz_r[0:1, :]

        ox1, ox2, tx, cx = axis_terms(vxc[:, :], dxs[0], idx_x, n1)
        oy1, oy2, ty, cy = axis_terms(vyc[:, :], dxs[1], iy, n2)
        oz1, oz2, tz, cz = axis_terms(vzc[:, :], dxs[2], iz, n3)

        wmask = ((wm_r[0:1, :] != 0) & (gx >= wr0) & (gx <= wr1))
        clamped = (cx | cy | cz) & wmask
        ncount = jnp.sum(clamped.astype(jnp.int32))

        # hoisted x-offset weight planes (6)
        wxs = [weight(ox1, ox2, tx, o) for o in offs]

        # the jnp backend's exact accumulation order — (p, q, o) with the
        # term (wx * (wy*wz)) * sample — chosen so ONE cyclic lane roll
        # per (p, q) covers all six x-offsets (free row views) while only
        # a single rolled slab stays live in VMEM (pre-rolling all 36
        # spilled 136MB of vregs at the 255 grid).
        # pltpu.roll(x, s)[j] = x[j - s mod W] => shift by W - d.
        acc = jnp.zeros((B, W), jdtype)
        for p_off in offs:
            wy = weight(oy1, oy2, ty, p_off)
            for q_off in offs:
                wz = weight(oz1, oz2, tz, q_off)
                wyz = wy * wz
                d = (p_off * n3 + q_off) % W
                r = a_ext if d == 0 else pltpu.roll(a_ext, W - d, 1)
                for io, o_off in enumerate(offs):
                    sl = r[P + o_off:P + o_off + B, :]
                    acc = acc + (wxs[io] * wyz) * sl
        out_ref[:, :] = jnp.where(wmask, acc, a_mid[:, :])

        @pl.when(sidx == 0)
        def _():
            ncl_ref[0, 0] = ncount

        @pl.when(sidx != 0)
        def _():
            ncl_ref[0, 0] = ncl_ref[0, 0] + ncount

    def row_block(off):
        return pl.BlockSpec((B, W),
                            (lambda s, _o=off: (jnp.clip(s + _o, 0, S - 1),
                                                0)),
                            memory_space=pltpu.VMEM)

    def big_block():
        return pl.BlockSpec((B, W), (lambda s: (s, 0)),
                            memory_space=pltpu.VMEM)

    lane_row = pl.BlockSpec((1, W), (lambda s: (0, 0)),
                            memory_space=pltpu.VMEM)

    nterm = len(offs) ** 3
    cost = pl.CostEstimate(
        flops=(3 * nterm + 60) * NXP * W,
        bytes_accessed=int(8 * NXP * W * itemsize),
        transcendentals=0)
    # live VMEM: 36 rolled + extended slab + operands + weights (~24 (B,W)
    # planes) + double buffering of the 7 IO blocks
    live_rows = 4 * (B + P + k) + 60 * B
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=int(min(live_rows * W * itemsize + 2 ** 22,
                                 120 * 2 ** 20)))

    flat_shape = jax.ShapeDtypeStruct((NXP, W), jdtype)
    ncl_shape = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    ncl_block = pl.BlockSpec((1, 1), (lambda s: (0, 0)),
                             memory_space=pltpu.SMEM)

    call = pl.pallas_call(
        kernel,
        grid=(S,),
        out_shape=(flat_shape, ncl_shape),
        in_specs=[row_block(-1), row_block(0), row_block(1),
                  big_block(), big_block(), big_block(),
                  lane_row, lane_row, lane_row],
        out_specs=(big_block(), ncl_block),
        compiler_params=compiler_params,
        cost_estimate=cost,
        interpret=interpret,
    )

    def run(a_flat, vxc_flat, vyc_flat, vzc_flat):
        out, ncl = call(a_flat, a_flat, a_flat, vxc_flat, vyc_flat,
                        vzc_flat, *rows_c)
        return out, ncl

    def flat(a):
        return _pad2(a.reshape(n1, nyz).astype(jdtype), NXP, W)

    def unflat(a_flat):
        return a_flat[:n1, :nyz].reshape(n1, n2, n3)

    return run, flat, unflat


def build_advect(nx: int, ny: int, nz: int, dt: float, dx: float, dy: float,
                 dz: float, k: int = 2, dtype=jnp.float32,
                 interpret: bool = False):
    """The full four-branch advection step (gpu.jl:308-332, compat=False
    semantics — Vz advected properly) as fused Pallas kernels.

    Returns advect_fn(vx, vy, vz, c) -> (vx', vy', vz', c', n_clamped)
    operating on the 3D staggered arrays; bit-identical to
    ops.advect.advect(..., method='selectshift', k=k, compat=False).
    """
    mk = functools.partial(build_advect_branch, dt=dt, dx=dx, dy=dy, dz=dz,
                           k=k, dtype=dtype, interpret=interpret)
    b1 = mk(nx + 1, ny, nz, write_rows=(1, nx - 1))
    b2 = mk(nx, ny + 1, nz, lane_y=(1, ny - 1))
    b3 = mk(nx, ny, nz + 1, lane_z=(1, nz - 1))
    b4 = mk(nx, ny, nz)

    def advect_fn(vx, vy, vz, c):
        # branch 1: Vx over ix in 2..nx — face-averaged Vy/Vz
        # (identical XLA expressions to ops/advect.py, zero-padded to the
        # full staggered shape; the kernel's write mask discards the pads)
        vxc = vx[1:-1, :, :]
        vyc = 0.25 * (vy[:-1, :-1, :] + vy[:-1, 1:, :]
                      + vy[1:, :-1, :] + vy[1:, 1:, :])
        vzc = 0.25 * (vz[:-1, :, :-1] + vz[:-1, :, 1:]
                      + vz[1:, :, :-1] + vz[1:, :, 1:])
        pad1 = ((1, 1), (0, 0), (0, 0))
        r1, f1, u1 = b1
        o1, n1c = r1(f1(vx), f1(jnp.pad(vxc, pad1)),
                     f1(jnp.pad(vyc, pad1)), f1(jnp.pad(vzc, pad1)))

        # branch 2: Vy over iy in 2..ny
        vxc = 0.25 * (vx[:-1, :-1, :] + vx[1:, :-1, :]
                      + vx[:-1, 1:, :] + vx[1:, 1:, :])
        vyc = vy[:, 1:-1, :]
        vzc = 0.25 * (vz[:, :-1, :-1] + vz[:, :-1, 1:]
                      + vz[:, 1:, :-1] + vz[:, 1:, 1:])
        pad2 = ((0, 0), (1, 1), (0, 0))
        r2, f2, u2 = b2
        o2, n2c = r2(f2(vy), f2(jnp.pad(vxc, pad2)),
                     f2(jnp.pad(vyc, pad2)), f2(jnp.pad(vzc, pad2)))

        # branch 3: Vz over iz in 2..nz (compat=False semantics)
        vxc = 0.25 * (vx[:-1, :, :-1] + vx[1:, :, :-1]
                      + vx[:-1, :, 1:] + vx[1:, :, 1:])
        vyc = 0.25 * (vy[:, :-1, :-1] + vy[:, 1:, :-1]
                      + vy[:, :-1, 1:] + vy[:, 1:, 1:])
        vzc = vz[:, :, 1:-1]
        pad3 = ((0, 0), (0, 0), (1, 1))
        r3, f3, u3 = b3
        o3, n3c = r3(f3(vz), f3(jnp.pad(vxc, pad3)),
                     f3(jnp.pad(vyc, pad3)), f3(jnp.pad(vzc, pad3)))

        # branch 4: tracer C over all cells
        vxc = 0.5 * (vx[:-1, :, :] + vx[1:, :, :])
        vyc = 0.5 * (vy[:, :-1, :] + vy[:, 1:, :])
        vzc = 0.5 * (vz[:, :, :-1] + vz[:, :, 1:])
        r4, f4, u4 = b4
        o4, n4c = r4(f4(c), f4(vxc), f4(vyc), f4(vzc))

        n_clamped = (n1c[0, 0] + n2c[0, 0] + n3c[0, 0] + n4c[0, 0])
        return u1(o1), u2(o2), u3(o3), u4(o4), n_clamped

    return advect_fn


# ---- common-flat-layout variant (chains with kernels/fused_step.py) ----

def build_advect_branch_flat(lay, n1: int, n2: int, n3: int, dt: float,
                             dx: float, dy: float, dz: float, k: int,
                             make_adv,
                             write_rows: Optional[Tuple[int, int]] = None,
                             lane_y: Optional[Tuple[int, int]] = None,
                             lane_z: Optional[Tuple[int, int]] = None,
                             interpret: bool = False):
    """One advected field in the shared flat layout of
    kernels/fused_step.CommonLayout (lane stride nz+1 for every staggered
    field), with the face-averaged advecting velocities computed IN the
    kernel from the raw velocity slabs — the XLA face-average fusions and
    the per-field flatten/unflatten round trips of build_advect never
    touch HBM.

    make_adv(vx_e, vy_e, vz_e, L, R) -> (vxc, vyc, vzc) builds the (B, W)
    advecting-velocity slabs for write rows [s*B, s*B+B) from the
    extended velocity slabs (rows [s*B-1, s*B+B]; row r is e[1:B+1],
    r-1 is e[0:B], r+1 is e[2:B+2]) using the lane-roll views L/R —
    mirroring ops/advect.py's face-average expression order so weights
    round identically. Accumulation term order and weight expressions are
    those of build_advect_branch (bit-equal under matched compilation)."""
    W, NZ, B, S = lay.W, lay.NZ, lay.B, lay.S
    nyzp = lay.nyzp
    jdtype = lay.dtype
    itemsize = np.dtype(jdtype).itemsize
    P = k + 1
    if B < P:
        raise ValueError(f"slab {B} must be >= k+1 = {P}")
    dt_c = np.array(dt, np.dtype(jdtype))
    dxs = (np.array(dx, np.dtype(jdtype)), np.array(dy, np.dtype(jdtype)),
           np.array(dz, np.dtype(jdtype)))
    kf = np.array(float(k), np.dtype(jdtype))

    # per-lane rows (1, W) in the COMMON stride: y = j // (nz+1)
    j = np.arange(W, dtype=np.int32)
    jrow = j // NZ
    zrow = j % NZ
    real = (j < nyzp) & (jrow < n2) & (zrow < n3)
    wmask = real
    if lane_y is not None:
        wmask = wmask & (jrow >= lane_y[0]) & (jrow <= lane_y[1])
    if lane_z is not None:
        wmask = wmask & (zrow >= lane_z[0]) & (zrow <= lane_z[1])
    wr0, wr1 = write_rows if write_rows is not None else (0, n1 - 1)
    idx_y = np.where(real, jrow, -1).astype(np.dtype(jdtype)) + 1.0
    idx_z = np.where(real, zrow, -1).astype(np.dtype(jdtype)) + 1.0
    rows_c = (jnp.asarray(idx_y.reshape(1, W)),
              jnp.asarray(idx_z.reshape(1, W)),
              jnp.asarray(wmask.reshape(1, W).astype(np.int32)))

    offs = list(range(-P, k + 1))

    def axis_terms(v, d_c, idx, n):
        dl_raw = dt_c * v / d_c
        dl = jnp.clip(dl_raw, -kf, kf)
        i1 = jnp.clip(jnp.floor(idx - dl), 1.0, float(n))
        t = (dl > 0).astype(jdtype) - jnp.fmod(dl, jnp.asarray(1.0, jdtype))
        o1 = (i1 - idx).astype(jnp.int32)
        o2 = (jnp.minimum(i1 + 1.0, float(n)) - idx).astype(jnp.int32)
        return o1, o2, t, jnp.abs(dl_raw) > kf

    def weight(o1, o2, t, o):
        one = jnp.ones((), jdtype)
        zero = jnp.zeros((), jdtype)
        return (jnp.where(o1 == o, one - t, zero)
                + jnp.where(o2 == o, t, zero))

    def body(sidx, a_ext, vxe, vye, vze, iy, iz, wm, Wc):
        """The accumulation math on lane windows of width Wc — shared by
        the untiled (Wc=W, cyclic) and lane-tiled (Wc=CW, halo-fed)
        kernels (see fused_step.build_predict.body). Reach from a
        center output lane: raw-field sampling <= P*(NZ+1) lanes plus
        the face-average's NZ+1 for the WEIGHTS — both within the
        layout's halo_k = max(3, k+1) guarantee."""
        def L(a, d):
            return pltpu.roll(a, Wc - d, 1)

        def R(a, d):
            return pltpu.roll(a, d, 1)

        vxc, vyc, vzc = make_adv(vxe, vye, vze, L, R)
        gx = (sidx * B
              + jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0))
        idx_x = gx.astype(jdtype) + 1.0

        ox1, ox2, tx, cx = axis_terms(vxc, dxs[0], idx_x, n1)
        oy1, oy2, ty, cy = axis_terms(vyc, dxs[1], iy, n2)
        oz1, oz2, tz, cz = axis_terms(vzc, dxs[2], iz, n3)

        wmask = ((wm != 0) & (gx >= wr0) & (gx <= wr1))
        clamped = (cx | cy | cz) & wmask
        ncount = jnp.sum(clamped.astype(jnp.int32))

        wxs = [weight(ox1, ox2, tx, o) for o in offs]

        # identical accumulation structure to build_advect_branch, with
        # the COMMON lane stride (nz+1) in the per-(p,q) roll distance
        acc = jnp.zeros((B, Wc), jdtype)
        for p_off in offs:
            wy = weight(oy1, oy2, ty, p_off)
            for q_off in offs:
                wz = weight(oz1, oz2, tz, q_off)
                wyz = wy * wz
                d = (p_off * NZ + q_off) % Wc
                r = a_ext if d == 0 else pltpu.roll(a_ext, Wc - d, 1)
                for io, o_off in enumerate(offs):
                    sl = r[P + o_off:P + o_off + B, :]
                    acc = acc + (wxs[io] * wyz) * sl
        return jnp.where(wmask, acc, a_ext[P:P + B, :]), ncount

    def kernel(a_lo, a_mid, a_hi, vxl, vxm, vxh, vyl, vym, vyh,
               vzl, vzm, vzh, iy_r, iz_r, wm_r, out_ref, ncl_ref):
        sidx = pl.program_id(0)

        def ext1(lo, mid, hi):
            return jnp.concatenate([lo[B - 1:, :], mid[:, :], hi[:1, :]], 0)

        a_ext = jnp.concatenate(
            [a_lo[B - P:, :], a_mid[:, :], a_hi[:k, :]], axis=0)
        out, ncount = body(sidx, a_ext, ext1(vxl, vxm, vxh),
                           ext1(vyl, vym, vyh), ext1(vzl, vzm, vzh),
                           iy_r[0:1, :], iz_r[0:1, :], wm_r[0:1, :], W)
        out_ref[:, :] = out

        @pl.when(sidx == 0)
        def _():
            ncl_ref[0, 0] = ncount

        @pl.when(sidx != 0)
        def _():
            ncl_ref[0, 0] = ncl_ref[0, 0] + ncount

    def kernel_t(*refs):
        # lane-tiled: a(9), vx(9), vy(9), vz(9), iy, iz, wm + outs
        sidx = pl.program_id(1)
        first = (pl.program_id(0) == 0) & (sidx == 0)
        HW, WT, CW = lay.HW, lay.WT, lay.CW
        cat = _make_cat(3)
        ag = refs[0:9]
        vg = [refs[9 * i:9 * (i + 1)] for i in range(1, 4)]
        iy_r, iz_r, wm_r = refs[36], refs[37], refs[38]
        out_ref, ncl_ref = refs[39:]

        def ext1_cat(g):
            return jnp.concatenate([cat(g, 0)[B - 1:, :], cat(g, 1)[:, :],
                                    cat(g, 2)[:1, :]], 0)

        a_ext = jnp.concatenate(
            [cat(ag, 0)[B - P:, :], cat(ag, 1)[:, :],
             cat(ag, 2)[:k, :]], axis=0)
        out, ncount = body(sidx, a_ext, ext1_cat(vg[0]), ext1_cat(vg[1]),
                           ext1_cat(vg[2]), iy_r[0:1, :], iz_r[0:1, :],
                           wm_r[0:1, :], CW)
        out_ref[:, :] = out[:, HW:HW + WT]

        @pl.when(first)
        def _():
            ncl_ref[0, 0] = ncount

        @pl.when(jnp.logical_not(first))
        def _():
            ncl_ref[0, 0] = ncl_ref[0, 0] + ncount

    from .fused_step import (_lane_row, _lane_row_t, _make_cat,
                             _row_block, _row_block_t, _tiled_specs)

    def row_block(off):
        return _row_block(B, W, S, off)

    lane_row = _lane_row(W)

    nterm = len(offs) ** 3
    cost = pl.CostEstimate(
        flops=(3 * nterm + 80) * lay.NXP * W,
        bytes_accessed=int(14 * lay.NXP * W * itemsize),
        transcendentals=0)
    # + the in-kernel face-average slabs and their roll temporaries, and
    # the (2k+2) hoisted x-offset weight planes (the budget must scale
    # with k: wide-window escalation builds use k up to B-1); the
    # 255-grid k=2 build measured 10K over a 4MB slack, so give 12MB
    live_rows = (4 * (B + P + k) + 3 * (B + 2)
                 + (2 * k + 2) * B + 60 * B)
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=int(min(live_rows * W * itemsize + 12 * 2 ** 20,
                                 120 * 2 ** 20)))

    flat_shape = jax.ShapeDtypeStruct((lay.NXP, W), jdtype)
    ncl_shape = jax.ShapeDtypeStruct((1, 1), jnp.int32)

    if lay.T > 1:
        # halo-extended lane constants: index rows get neighbor copies
        # (weights on halo lanes feed center outputs via the rolls);
        # the write mask gets ZERO halos so ncl counts each real lane
        # exactly once across tiles
        rows_ct = (jnp.asarray(lay.ext_lane(idx_y.reshape(1, W))),
                   jnp.asarray(lay.ext_lane(idx_z.reshape(1, W))),
                   jnp.asarray(lay.ext_lane(
                       wmask.reshape(1, W).astype(np.int32),
                       halo_fill="zero")))
        ncl_block = pl.BlockSpec((1, 1), (lambda t, s: (0, 0)),
                                 memory_space=pltpu.SMEM)
        live_t = (2 * 12 * B * (lay.WT + 2 * lay.HW)
                  + live_rows * lay.CW)
        call = pl.pallas_call(
            kernel_t,
            grid=(lay.T, S),
            out_shape=(flat_shape, ncl_shape),
            in_specs=(_tiled_specs(lay, (-1, 0, 1)) * 4
                      + [_lane_row_t(lay)] * 3),
            out_specs=(_row_block_t(lay, 0), ncl_block),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(min(live_t * itemsize
                                         + 12 * 2 ** 20,
                                         120 * 2 ** 20))),
            cost_estimate=cost,
            interpret=interpret,
        )

        def run(a_f, vx_f, vy_f, vz_f):
            return call(*([a_f] * 9), *([vx_f] * 9), *([vy_f] * 9),
                        *([vz_f] * 9), *rows_ct)
    else:
        ncl_block = pl.BlockSpec((1, 1), (lambda s: (0, 0)),
                                 memory_space=pltpu.SMEM)
        call = pl.pallas_call(
            kernel,
            grid=(S,),
            out_shape=(flat_shape, ncl_shape),
            in_specs=[row_block(-1), row_block(0), row_block(1)] * 4
                     + [lane_row, lane_row, lane_row],
            out_specs=(row_block(0), ncl_block),
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )

        def run(a_f, vx_f, vy_f, vz_f):
            return call(a_f, a_f, a_f, vx_f, vx_f, vx_f, vy_f, vy_f,
                        vy_f, vz_f, vz_f, vz_f, *rows_c)

    return run


def build_advect_flat(nx: int, ny: int, nz: int, dt: float, dx: float,
                      dy: float, dz: float, k: int = 2, dtype=jnp.float32,
                      B: int = 8, interpret: bool = False, layout=None):
    """The four-branch advection step (gpu.jl:308-332, compat=False) in
    the shared flat layout, face averages in-kernel. Returns
    advect_flat(vx_f, vy_f, vz_f, c_f) -> (vx_f', vy_f', vz_f', c_f',
    n_clamped) on CommonLayout-flat operands (`.layout` attached), plus a
    3D-array wrapper `.on3d` used by the equivalence tests."""
    from .fused_step import CommonLayout
    lay = layout or CommonLayout(nx, ny, nz, B=B, dtype=dtype)
    B = lay.B  # the adv_* closures must slice with the layout's own B
    NZ = lay.NZ
    half = np.array(0.5, np.dtype(dtype))
    quart = np.array(0.25, np.dtype(dtype))

    # rows: r -> e[1:B+1], r-1 -> e[0:B], r+1 -> e[2:B+2]; lanes: y+1 ->
    # L(.,NZ), y-1 -> R(.,NZ), z+1 -> L(.,1), z-1 -> R(.,1). Sum order
    # mirrors ops/advect.py's ((a+b)+c)+d face averages exactly.
    def adv_vx(vxe, vye, vze, L, R):
        vy0, vy1 = vye[0:B, :], vye[1:B + 1, :]
        vz0, vz1 = vze[0:B, :], vze[1:B + 1, :]
        vyc = quart * (((vy0 + L(vy0, NZ)) + vy1) + L(vy1, NZ))
        vzc = quart * (((vz0 + L(vz0, 1)) + vz1) + L(vz1, 1))
        return vxe[1:B + 1, :], vyc, vzc

    def adv_vy(vxe, vye, vze, L, R):
        vx1, vx2 = vxe[1:B + 1, :], vxe[2:B + 2, :]
        vz1 = vze[1:B + 1, :]
        vxc = quart * (((R(vx1, NZ) + R(vx2, NZ)) + vx1) + vx2)
        vzc = quart * (((R(vz1, NZ) + R(L(vz1, 1), NZ)) + vz1) + L(vz1, 1))
        return vxc, vye[1:B + 1, :], vzc

    def adv_vz(vxe, vye, vze, L, R):
        vx1, vx2 = vxe[1:B + 1, :], vxe[2:B + 2, :]
        vy1 = vye[1:B + 1, :]
        vxc = quart * (((R(vx1, 1) + R(vx2, 1)) + vx1) + vx2)
        vyc = quart * (((R(vy1, 1) + R(L(vy1, NZ), 1)) + vy1) + L(vy1, NZ))
        return vxc, vyc, vze[1:B + 1, :]

    def adv_c(vxe, vye, vze, L, R):
        vx1 = vxe[1:B + 1, :]
        vy1 = vye[1:B + 1, :]
        vz1 = vze[1:B + 1, :]
        return (half * (vx1 + vxe[2:B + 2, :]),
                half * (vy1 + L(vy1, NZ)),
                half * (vz1 + L(vz1, 1)))

    mk = functools.partial(build_advect_branch_flat, lay, dt=dt, dx=dx,
                           dy=dy, dz=dz, k=k, interpret=interpret)
    r1 = mk(n1=nx + 1, n2=ny, n3=nz, make_adv=adv_vx,
            write_rows=(1, nx - 1))
    r2 = mk(n1=nx, n2=ny + 1, n3=nz, make_adv=adv_vy, lane_y=(1, ny - 1))
    r3 = mk(n1=nx, n2=ny, n3=nz + 1, make_adv=adv_vz, lane_z=(1, nz - 1))
    r4 = mk(n1=nx, n2=ny, n3=nz, make_adv=adv_c)

    def advect_flat(vx_f, vy_f, vz_f, c_f):
        o1, n1c = r1(vx_f, vx_f, vy_f, vz_f)
        o2, n2c = r2(vy_f, vx_f, vy_f, vz_f)
        o3, n3c = r3(vz_f, vx_f, vy_f, vz_f)
        o4, n4c = r4(c_f, vx_f, vy_f, vz_f)
        n_clamped = (n1c[0, 0] + n2c[0, 0] + n3c[0, 0] + n4c[0, 0])
        return o1, o2, o3, o4, n_clamped

    def on3d(vx, vy, vz, c):
        f = lay.flat
        o1, o2, o3, o4, ncl = advect_flat(f(vx), f(vy), f(vz), f(c))
        return (lay.unflat(o1, nx + 1, ny, nz),
                lay.unflat(o2, nx, ny + 1, nz),
                lay.unflat(o3, nx, ny, nz + 1),
                lay.unflat(o4, nx, ny, nz), ncl)

    advect_flat.layout = lay
    advect_flat.on3d = on3d
    return advect_flat


def advect_kernel_vmem_bytes(nx: int, ny: int, nz: int, k: int,
                             B: int = 8, flat: bool = True,
                             dtype=jnp.float32, layout=None) -> int:
    """Estimated scoped-VMEM requirement of one advection branch kernel
    (the same live-set formulas the builders pass as compiler limits).
    Callers gate kernel construction on this: at large lane widths (the
    255-grid's W is 23.8k lanes; a 511 grid's is 95k) the ~60-plane
    accumulation working set exceeds the 128MB VMEM and Mosaic refuses
    the program — those sizes run LANE-TILED (pass the tiled layout;
    the window width CW replaces W in the live-set formula), falling
    back to the jnp backend only when even tiling can't fit."""
    P = k + 1
    if flat:
        nyzp = (ny + 1) * (nz + 1)
        W = ((nyzp + 127) // 128) * 128
        live_rows = (4 * (B + P + k) + 3 * (B + 2)
                     + (2 * k + 2) * B + 60 * B)
        if layout is not None and layout.T > 1:
            itemsize = np.dtype(dtype).itemsize
            live_t = (2 * 12 * B * (layout.WT + 2 * layout.HW)
                      + live_rows * layout.CW)
            return int(live_t * itemsize + 12 * 2 ** 20)
    else:
        nyz = ny * nz
        W = ((nyz + 127) // 128) * 128
        live_rows = 4 * (B + P + k) + 60 * B
    itemsize = np.dtype(dtype).itemsize  # same formula the builder budgets with
    return int(live_rows * W * itemsize + 12 * 2 ** 20)
