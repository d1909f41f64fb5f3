"""Fused Pallas kernels for the non-Poisson step chain (TPU hot path).

Reference semantics: the per-op ``@parallel`` kernel launches of the
Chorin step (NavierStokes3D_gpu.jl:119-142) — update_τ!, predict_V!,
set_cylinder!, update_∇V! before the Poisson solve, and correct_V!,
set_cylinder!, the velocity BCs after it. The jnp forms in
ops/physics.py are exact but XLA materializes every intermediate (six
stress tensors, the padded interior updates) as separate HBM fusions in
a poorly tiled 3D layout ((255,153,153) pads lanes 153->256); the chain
runs at ~35 GB/s effective. These kernels compute the whole chain
slab-by-slab in VMEM:

  * predict kernel: stress -> predictor -> cylinder mask -> divergence,
    reading Vx/Vy/Vz once and writing Vx*/Vy*/Vz*/∇V once (the six τ
    tensors never touch HBM);
  * correct kernel: pressure-gradient correction -> cylinder mask ->
    the gpu variant's full velocity BC stack (bc_x!/bc_y!/bc_zV!,
    gpu.jl:264-279), reading Pr/Vx/Vy/Vz once and writing the
    boundary-complete velocities once.

Layout: all fields share ONE flat layout — y/z planes zero-padded to
(ny+1, nz+1) so every staggered shape embeds in the same lane grid, then
flattened to (NXP, W) rows=x, lanes=(y*(nz+1)+z) padded to a lane
multiple of 128. With a COMMON lane stride, every cross-field staggered
offset is one cyclic lane roll (pltpu.roll), the same device primitive
the Poisson kernel uses (kernels/poisson.py); per-field strides would
need gathers. The padding overhead is (ny+1)(nz+1)/(ny*nz) ~ 1.3% at the
showcase grid vs the 67% the 3D layout pads.

Bit-compatibility: every expression mirrors ops/physics.py's order and
scalar-rounding discipline (constants pre-rounded to f32 exactly as
jax's weak-type promotion rounds them; interior updates are masked ADDS
so the boundary keeps the jnp path's `x + 0.0` semantics, not a select).
Results match the jnp chain to within XLA's per-compilation FMA
contraction freedom on the raw `v + s*f` updates — measured <=1 ulp on
<0.02% of points, the same variation the jnp backend shows against
itself across fusion splits (asserted as 4-ulp per-element bounds in
tests/test_fused_step.py).

Boundary-condition folding (correct kernel): the gpu variant's BC stack
is a composition of neighbor copies — zero-gradient x/y planes and
no-slip-bottom/free-slip-top z planes (gpu.jl:221-243). Applied after
the in-VMEM correction+mask, the composite is a separable clamped read:
  out(x,y,z) = 0                     if z == 0          (no-slip)
             = q(cx(x), cy(y), cz(z)) otherwise
with cx/cy clamping the first/last index to its neighbor and
cz(nz-1)=nz-2 — two static row views plus four lane rolls, exactly
reproducing the reference's application order (corners included).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _f(x, dtype):
    """Round a (python-float) scalar to the array dtype exactly as jax's
    weak-type promotion does before it enters an f32 expression."""
    return np.dtype(dtype).type(x)


def ext_lane_np(a, T: int, WT: int, HW: int, W: int,
                halo_fill: str = "copy"):
    """Halo-extend a (1, W) numpy lane constant for a lane-tiled kernel:
    -> (1, T*(WT+2*HW)), per tile the WT center lanes plus both HW
    halos. halo_fill='copy' takes the neighboring tiles' real values
    (for constants consumed at halo lanes), zero-filled beyond the
    global edges where every consumer is masked; 'zero' leaves halos
    zero (write masks must count each real lane exactly once). Shared
    by CommonLayout.ext_lane and the lane-tiled Poisson kernel's
    sweep constants (kernels/poisson.py)."""
    a = np.asarray(a).reshape(1, W)
    CW = WT + 2 * HW
    out = np.zeros((1, T * CW), a.dtype)
    for t in range(T):
        if halo_fill == "copy":
            lo = t * WT - HW
            s0, s1 = max(lo, 0), min(t * WT + WT + HW, W)
            out[0, t * CW + (s0 - lo):t * CW + (s0 - lo)
                + (s1 - s0)] = a[0, s0:s1]
        else:
            out[0, t * CW + HW:t * CW + HW + WT] = (
                a[0, t * WT:t * WT + WT])
    return out


class CommonLayout:
    """The shared flat layout: rows = x, lanes = y*(nz+1) + z with all
    fields zero-padded to (ny+1, nz+1) y/z planes.

    Lane tiling (wide grids): at 511-class widths (~95k lanes) the
    whole-row working sets of the fused kernels exceed VMEM (predict
    measured ~166MB needed at W=95104). With lane_tiles=T > 1 the lane
    axis splits into T tiles of WT lanes; kernels run a 2D (tile,
    x-slab) grid where each tile fetches HW-lane halo blocks from its
    neighbors, so every cross-lane roll chain stays inside the
    (WT + 2*HW)-lane VMEM window — the same scheme as the lane-tiled
    Poisson kernel (kernels/poisson.py). halo_k sizes HW as
    halo_k*(NZ+1) lanes rounded up to 128: the longest chained roll
    reach of any consumer kernel in (NZ+1) units — 3 for the predict
    chain (stress -> predictor -> divergence), k+1 for the advection
    accumulation window (see the reach accounting in build_predict).
    Data stays one contiguous (NXP, W=T*WT) array in HBM; tiles and
    halos are BlockSpec views, not a relayout."""

    def __init__(self, nx: int, ny: int, nz: int, B: int = 8,
                 dtype=jnp.float32, lane_tiles: int = None,
                 halo_k: int = 3):
        self.nx, self.ny, self.nz = nx, ny, nz
        self.NY, self.NZ = ny + 1, nz + 1
        self.nyzp = self.NY * self.NZ
        base_w = ((self.nyzp + 127) // 128) * 128
        T = int(lane_tiles) if lane_tiles else 1
        HW = ((halo_k * (self.NZ + 1) + 127) // 128) * 128
        if T > 1:
            WT = -(-self.nyzp // (T * HW)) * HW
            if WT < HW:
                T = 1  # degenerate: halos would span whole tiles
        if T > 1:
            self.W = T * WT
            self.T, self.WT, self.HW = T, WT, HW
            self.CW = WT + 2 * HW
            self.Q = WT // HW  # halo blocks per tile
        else:
            self.W = base_w
            self.T, self.WT, self.HW = 1, base_w, 0
            self.CW = base_w
            self.Q = 0
        self.halo_k = halo_k
        self.B = B
        self.NXP = ((nx + 1 + B - 1) // B) * B
        self.S = self.NXP // B
        self.dtype = jnp.dtype(dtype)
        j = np.arange(self.W, dtype=np.int32)
        iy = (j // self.NZ).reshape(1, self.W)
        iz = (j % self.NZ).reshape(1, self.W)
        self.iy_row = jnp.asarray(iy)
        self.iz_row = jnp.asarray(iz)
        if self.T > 1:
            # halo-extended per-tile forms of the index rows: kernels
            # computing intermediate values on halo lanes need the TRUE
            # lane coordinates there (copies), zero-filled only beyond
            # the global edges where every consumer is masked
            self.iy_ext = jnp.asarray(self.ext_lane(iy))
            self.iz_ext = jnp.asarray(self.ext_lane(iz))

    def ext_lane(self, a, halo_fill: str = "copy"):
        """Halo-extend a (1, W) lane constant to this layout's tiled
        form (see ext_lane_np)."""
        return ext_lane_np(a, self.T, self.WT, self.HW, self.W,
                           halo_fill=halo_fill)

    def flat(self, a):
        n1, n2, n3 = a.shape
        a = jnp.pad(a, ((0, self.NXP - n1), (0, self.NY - n2),
                        (0, self.NZ - n3)))
        a = a.reshape(self.NXP, self.nyzp).astype(self.dtype)
        if self.W != self.nyzp:
            a = jnp.pad(a, ((0, 0), (0, self.W - self.nyzp)))
        return a

    def unflat(self, af, n1: int, n2: int, n3: int):
        a = af[:n1, : self.nyzp].reshape(n1, self.NY, self.NZ)
        return a[:, :n2, :n3]

    def packed_masks(self, masks) -> jnp.ndarray:
        """Cylinder masks (2D (x,y), broadcast along z — ops/cylinder.py)
        bit-packed into one int32 (NXP, W) constant:
        bit0 = C seed ring, bit1 = Vx, bit2 = Vy, bit3 = Vz."""
        def expand(m2d):
            m = np.zeros((self.NXP, self.NY), np.int32)
            a = np.asarray(m2d)
            m[: a.shape[0], : a.shape[1]] = a
            full = np.repeat(m[:, :, None], self.NZ, axis=2)
            out = np.zeros((self.NXP, self.W), np.int32)
            out[:, : self.nyzp] = full.reshape(self.NXP, self.nyzp)
            return out
        bits = (expand(masks.mask_c)
                | (expand(masks.mask_vx) << 1)
                | (expand(masks.mask_vy) << 2)
                | (expand(masks.mask_vz) << 3))
        return jnp.asarray(bits)


def _row_block(B, W, S, off):
    return pl.BlockSpec((B, W),
                        (lambda s, _o=off: (jnp.clip(s + _o, 0, S - 1), 0)),
                        memory_space=pltpu.VMEM)


def _lane_row(W):
    return pl.BlockSpec((1, W), (lambda s: (0, 0)), memory_space=pltpu.VMEM)


# ---- lane-tiled grid helpers (grid = (T, S), x-step innermost) ----

def _row_block_t(lay, off):
    """Center block: (B, WT) lanes of tile t, x-slab s+off."""
    S = lay.S
    return pl.BlockSpec(
        (lay.B, lay.WT),
        (lambda t, s, _o=off: (jnp.clip(s + _o, 0, S - 1), t)),
        memory_space=pltpu.VMEM)


def _halo_block_t(lay, off, side):
    """Halo block: the (B, HW) lane block adjacent to tile t on `side`
    (0 = left neighbor's last block, 1 = right neighbor's first).
    Out-of-range indices clip — edge tiles read in-range garbage there,
    consumed only by lanes the kernels mask out (the same invariant
    that covers cyclic-roll wraparound in the untiled kernels)."""
    S, Q = lay.S, lay.Q
    TQ = lay.T * Q
    d = -1 if side == 0 else Q
    return pl.BlockSpec(
        (lay.B, lay.HW),
        (lambda t, s, _o=off, _d=d: (jnp.clip(s + _o, 0, S - 1),
                                     jnp.clip(t * Q + _d, 0, TQ - 1))),
        memory_space=pltpu.VMEM)


def _lane_row_t(lay):
    """Per-tile (1, CW) block of a (1, T*CW) halo-extended constant."""
    return pl.BlockSpec((1, lay.CW), (lambda t, s: (0, t)),
                        memory_space=pltpu.VMEM)


def _tiled_specs(lay, offs):
    """BlockSpecs for ONE input array read at row offsets `offs`:
    centers first, then left halos, then right halos (the kernel's
    `_cat` helper re-zips them)."""
    return ([_row_block_t(lay, o) for o in offs]
            + [_halo_block_t(lay, o, 0) for o in offs]
            + [_halo_block_t(lay, o, 1) for o in offs])


def _make_cat(n_off):
    """In-kernel: zip one array's (centers, lhalos, rhalos) ref groups
    into lane-concatenated (B, CW) windows per row offset."""
    def cat(refs, i):
        c = refs[i]
        l = refs[n_off + i]
        r = refs[2 * n_off + i]
        return jnp.concatenate([l[:, :], c[:, :], r[:, :]], axis=1)
    return cat


def build_predict(nx: int, ny: int, nz: int, *, dt: float, dx: float,
                  dy: float, dz: float, mu: float, rho: float, g_eff: float,
                  masks, B: int = 8, dtype=jnp.float32,
                  interpret: bool = False, layout: CommonLayout = None,
                  mask_bits=None):
    """Fused update_τ! + predict_V! + set_cylinder!(V) + update_∇V!
    (NavierStokes3D_gpu.jl:121-125). Returns predict_fn(vx, vy, vz) ->
    (vx*, vy*, vz*, divv) on the 3D staggered arrays, bit-identical to
    the ops/physics.py + ops/cylinder.py chain. The tracer C is NOT
    handled here (its mask set is one cheap XLA select at the caller).
    layout/mask_bits: pass a shared CommonLayout and packed-mask
    constant so chained builders embed ONE (NXP, W) mask in HBM."""
    lay = layout or CommonLayout(nx, ny, nz, B=B, dtype=dtype)
    B = lay.B  # BlockSpecs below must slab with the layout's own B
    W, NZ, S = lay.W, lay.NZ, lay.S
    if B < 2:
        raise ValueError("slab B must be >= 2 (x-halo depth)")
    jdt = lay.dtype
    dxc, dyc, dzc = _f(dx, jdt), _f(dy, jdt), _f(dz, jdt)
    muc = _f(mu, jdt)
    a2mu = _f(2.0 * mu, jdt)
    three = _f(3.0, jdt)
    dtrho = _f(dt / rho, jdt)
    rg = _f(rho * g_eff, jdt)
    mbits = mask_bits if mask_bits is not None else lay.packed_masks(masks)

    def body(s, vxe, vye, vze, mske, iy, iz, Wc):
        """The fused predict math on (B+4, Wc) row-extended windows —
        lane-width-agnostic so the untiled (Wc=W, cyclic rolls) and
        lane-tiled (Wc=CW, halo-fed concat window) kernels share one
        expression tree bit-for-bit. Chained roll-reach from a center
        output lane: divergence (+NZ) <- predictor (+-(NZ+1)) <- stress
        (+-(NZ+1)) = 3*NZ+2 lanes <= halo_k=3 units of (NZ+1), the
        CommonLayout halo guarantee."""
        zero = jnp.zeros((), jdt)

        def L(a, d):
            """Lane view at (y,z) offset +d (sample lane j+d)."""
            return pltpu.roll(a, Wc - d, 1)

        def R(a, d):
            """Lane view at (y,z) offset -d (sample lane j-d)."""
            return pltpu.roll(a, d, 1)

        # ---- centers slab, rows [s*B - 1, s*B + B + 1): stress normals.
        # Mirrors update_tau (ops/physics.py:39-45) term-for-term.
        vc, vcp = vxe[1:B + 3, :], vxe[2:B + 4, :]
        vyc, vzc = vye[1:B + 3, :], vze[1:B + 3, :]
        dvxdx = (vcp - vc) / dxc
        dvydy = (L(vyc, NZ) - vyc) / dyc
        dvzdz = (L(vzc, 1) - vzc) / dzc
        divt = dvxdx + dvydy + dvzdz
        th = divt / three
        txx = a2mu * (dvxdx - th)
        tyy = a2mu * (dvydy - th)
        tzz = a2mu * (dvzdz - th)

        # ---- edges slab, rows [s*B - 1, s*B + B): shear stresses.
        # txy[e,y,z] etc. exactly as ops/physics.py:48-55 (edge row e
        # samples velocity row e+1; (y+1, z+1) lane offsets are rolls).
        vx1 = vxe[2:B + 3, :]
        vy1, vy0 = vye[2:B + 3, :], vye[1:B + 2, :]
        vz1, vz0 = vze[2:B + 3, :], vze[1:B + 2, :]
        txy = muc * ((L(vx1, NZ + 1) - L(vx1, 1)) / dyc
                     + (L(vy1, NZ + 1) - L(vy0, NZ + 1)) / dxc)
        txz = muc * ((L(vx1, NZ + 1) - L(vx1, NZ)) / dzc
                     + (L(vz1, NZ + 1) - L(vz0, NZ + 1)) / dxc)
        tyz = muc * ((L(vy1, NZ + 1) - L(vy1, NZ)) / dzc
                     + (L(vz1, NZ + 1) - L(vz1, 1)) / dyc)

        # ---- predictor (ops/physics.py:59-81), V* = V + dt/rho * f.
        # vx* on rows [s*B, s*B + B] (one extra row feeds the divergence).
        gxe = (s * B
               + jax.lax.broadcasted_iota(jnp.int32, (B + 1, 1), 0))
        fx = ((txx[1:B + 2, :] - txx[0:B + 1, :]) / dxc
              + (R(txy, 1) - R(txy, NZ + 1)) / dyc
              + (R(txz, NZ) - R(txz, NZ + 1)) / dzc)
        maskx = ((gxe >= 1) & (gxe <= nx - 1)
                 & (iy >= 1) & (iy <= ny - 2)
                 & (iz >= 1) & (iz <= nz - 2))
        vxs = vxe[2:B + 3, :] + jnp.where(maskx, dtrho * fx, zero)
        vxs = jnp.where((mske & 2) != 0, zero, vxs)

        gx = gxe[:B, :]
        tyy_r = tyy[1:B + 1, :]
        txy_r, txy_m = txy[1:B + 1, :], txy[0:B, :]
        tyz_m = tyz[0:B, :]
        fy = ((tyy_r - R(tyy_r, NZ)) / dyc
              + (R(txy_r, NZ + 1) - R(txy_m, NZ + 1)) / dxc
              + (R(tyz_m, NZ) - R(tyz_m, NZ + 1)) / dzc)
        masky = ((gx >= 1) & (gx <= nx - 2)
                 & (iy >= 1) & (iy <= ny - 1)
                 & (iz >= 1) & (iz <= nz - 2))
        vys = vye[2:B + 2, :] + jnp.where(masky, dtrho * fy, zero)
        vys = jnp.where((mske[:B, :] & 4) != 0, zero, vys)

        tzz_r = tzz[1:B + 1, :]
        txz_r, txz_m = txz[1:B + 1, :], txz[0:B, :]
        fz = ((tzz_r - R(tzz_r, 1)) / dzc
              + (R(txz_r, NZ + 1) - R(txz_m, NZ + 1)) / dxc
              + (R(tyz_m, 1) - R(tyz_m, NZ + 1)) / dyc
              - rg)
        maskz = ((gx >= 1) & (gx <= nx - 2)
                 & (iy >= 1) & (iy <= ny - 2)
                 & (iz >= 1) & (iz <= nz - 1))
        vzs = vze[2:B + 2, :] + jnp.where(maskz, dtrho * fz, zero)
        vzs = jnp.where((mske[:B, :] & 8) != 0, zero, vzs)

        # ---- divergence of the masked predictor (ops/stencil.py:111)
        dv = ((vxs[1:B + 1, :] - vxs[0:B, :]) / dxc
              + (L(vys, NZ) - vys) / dyc
              + (L(vzs, 1) - vzs) / dzc)
        mask_dv = (gx <= nx - 1) & (iy <= ny - 1) & (iz <= nz - 1)
        return (vxs[0:B, :], vys, vzs, jnp.where(mask_dv, dv, zero))

    def kernel(vxl, vxm, vxh, vyl, vym, vyh, vzl, vzm, vzh, mskm, mskh,
               iy_r, iz_r, vxo, vyo, vzo, dvo):
        s = pl.program_id(0)

        def ext(lo, mid, hi):
            # rows [s*B - 2, s*B + B + 2); out-of-range rows hold
            # neighbor-block copies, consumed only by masked-out outputs
            return jnp.concatenate([lo[B - 2:, :], mid[:, :], hi[:2, :]], 0)

        mske = jnp.concatenate([mskm[:, :], mskh[:1, :]], 0)
        vxo[:, :], vyo[:, :], vzo[:, :], dvo[:, :] = body(
            s, ext(vxl, vxm, vxh), ext(vyl, vym, vyh),
            ext(vzl, vzm, vzh), mske, iy_r[0:1, :], iz_r[0:1, :], W)

    def kernel_t(*refs):
        # lane-tiled: refs = vx(9), vy(9), vz(9), msk(6), iy, iz + outs
        s = pl.program_id(1)
        HW, WT, CW = lay.HW, lay.WT, lay.CW
        cat = _make_cat(3)
        vx9, vy9, vz9 = refs[0:9], refs[9:18], refs[18:27]
        msk6 = refs[27:33]
        iy_r, iz_r = refs[33], refs[34]
        vxo, vyo, vzo, dvo = refs[35:]

        def ext_cat(g):
            lo, mid, hi = cat(g, 0), cat(g, 1), cat(g, 2)
            return jnp.concatenate([lo[B - 2:, :], mid[:, :],
                                    hi[:2, :]], 0)

        cm = _make_cat(2)
        mske = jnp.concatenate([cm(msk6, 0)[:, :], cm(msk6, 1)[:1, :]], 0)
        vxw, vyw, vzw, dvw = body(
            s, ext_cat(vx9), ext_cat(vy9), ext_cat(vz9), mske,
            iy_r[0:1, :], iz_r[0:1, :], CW)
        ctr = slice(HW, HW + WT)
        vxo[:, :] = vxw[:, ctr]
        vyo[:, :] = vyw[:, ctr]
        vzo[:, :] = vzw[:, ctr]
        dvo[:, :] = dvw[:, ctr]

    itemsize = np.dtype(jdt).itemsize
    cost = pl.CostEstimate(
        flops=120 * lay.NXP * W,
        bytes_accessed=int(8 * lay.NXP * W * itemsize),
        transcendentals=0)
    out_shape = tuple(jax.ShapeDtypeStruct((lay.NXP, W), jdt)
                      for _ in range(4))
    if lay.T > 1:
        # ~30 (B+4, CW)-class temporaries + double-buffered IO blocks
        live = (2 * 13 * B * (lay.WT + 2 * lay.HW)
                + 34 * (B + 4) * lay.CW)
        call = pl.pallas_call(
            kernel_t,
            grid=(lay.T, S),
            out_shape=out_shape,
            in_specs=(_tiled_specs(lay, (-1, 0, 1)) * 3
                      + _tiled_specs(lay, (0, 1))
                      + [_lane_row_t(lay), _lane_row_t(lay)]),
            out_specs=tuple(_row_block_t(lay, 0) for _ in range(4)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(min(live * itemsize + 2 ** 22,
                                         110 * 2 ** 20))),
            cost_estimate=cost,
            interpret=interpret,
        )

        def run_flat(vxf, vyf, vzf):
            return call(*([vxf] * 9), *([vyf] * 9), *([vzf] * 9),
                        *([mbits] * 6), lay.iy_ext, lay.iz_ext)
    else:
        rb = lambda off: _row_block(B, W, S, off)  # noqa: E731
        call = pl.pallas_call(
            kernel,
            grid=(S,),
            out_shape=out_shape,
            in_specs=[rb(-1), rb(0), rb(1), rb(-1), rb(0), rb(1),
                      rb(-1), rb(0), rb(1), rb(0), rb(1),
                      _lane_row(W), _lane_row(W)],
            out_specs=tuple(rb(0) for _ in range(4)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20),
            cost_estimate=cost,
            interpret=interpret,
        )

        def run_flat(vxf, vyf, vzf):
            return call(vxf, vxf, vxf, vyf, vyf, vyf, vzf, vzf, vzf,
                        mbits, mbits, lay.iy_row, lay.iz_row)

    def predict_fn(vx, vy, vz) -> Tuple:
        vxf, vyf, vzf, dvf = run_flat(lay.flat(vx), lay.flat(vy),
                                      lay.flat(vz))
        return (lay.unflat(vxf, nx + 1, ny, nz),
                lay.unflat(vyf, nx, ny + 1, nz),
                lay.unflat(vzf, nx, ny, nz + 1),
                lay.unflat(dvf, nx, ny, nz))

    predict_fn.run_flat = run_flat
    predict_fn.layout = lay
    # the tracer seed ring's mask in the flat layout (bit 0), for callers
    # chaining C through the flat step: c = where(cmask_flat, 1, c)
    predict_fn.cmask_flat = (mbits & 1) != 0
    return predict_fn


def build_correct(nx: int, ny: int, nz: int, *, dt: float, dx: float,
                  dy: float, dz: float, rho: float, masks, B: int = 8,
                  dtype=jnp.float32, interpret: bool = False,
                  variant: str = "gpu", vin: float = 0.0,
                  layout: CommonLayout = None, mask_bits=None):
    """Fused correct_V! + set_cylinder!(V) + the variant's velocity BCs.
    gpu: zero-grad x/y + no-slip-bottom/free-slip-top z
    (NavierStokes3D_gpu.jl:138-142 with the bc stack of :264-279);
    multi (non-compat): zero-grad on all axes + the Dirichlet inlet
    plane Vx = vin (multi_gpu.jl:156-166 with the compat omissions
    restored — compat mode never takes the fused path). Returns
    correct_fn(vx, vy, vz, pr) -> (vx', vy', vz') matching correct_v +
    apply_cylinder + bc.make_bc_fns' set_bc_vel."""
    if variant not in ("gpu", "multi"):
        raise ValueError(f"unknown variant {variant!r}")
    lay = layout or CommonLayout(nx, ny, nz, B=B, dtype=dtype)
    B = lay.B  # BlockSpecs below must slab with the layout's own B
    W, NZ, S = lay.W, lay.NZ, lay.S
    if B < 2:
        raise ValueError("slab B must be >= 2 (x-halo depth)")
    jdt = lay.dtype
    dxc, dyc, dzc = _f(dx, jdt), _f(dy, jdt), _f(dz, jdt)
    mdtrho = _f(-dt / rho, jdt)
    vin_c = _f(vin, jdt)
    mbits = mask_bits if mask_bits is not None else lay.packed_masks(masks)

    def body(s, pre, vxe, vye, vze, mske, iy, iz, Wc):
        """The fused correct+BC math on (B+4, Wc) windows — lane-width-
        agnostic (see build_predict.body). Chained roll-reach from a
        center output lane: BC neighbor copy (+-NZ or +-1) <- pressure
        gradient (+-NZ) = 2*NZ+1 lanes <= the halo_k=3 guarantee."""
        zero = jnp.zeros((), jdt)

        def L(a, d):
            return pltpu.roll(a, Wc - d, 1)

        def R(a, d):
            return pltpu.roll(a, d, 1)

        # corrected+masked fields on rows [s*B - 1, s*B + B + 1)
        gxe = (s * B - 1
               + jax.lax.broadcasted_iota(jnp.int32, (B + 2, 1), 0))
        pr_r, pr_m = pre[1:B + 3, :], pre[0:B + 2, :]

        # vx += -dt/rho * d_x(pr)/dx on the interior (ops/physics.py:123)
        maskx = ((gxe >= 1) & (gxe <= nx - 1)
                 & (iy >= 1) & (iy <= ny - 2)
                 & (iz >= 1) & (iz <= nz - 2))
        vxs = vxe[1:B + 3, :] + jnp.where(
            maskx, (mdtrho * (pr_r - pr_m)) / dxc, zero)
        vxs = jnp.where((mske & 2) != 0, zero, vxs)

        masky = ((gxe >= 1) & (gxe <= nx - 2)
                 & (iy >= 1) & (iy <= ny - 1)
                 & (iz >= 1) & (iz <= nz - 2))
        vys = vye[1:B + 3, :] + jnp.where(
            masky, (mdtrho * (pr_r - R(pr_r, NZ))) / dyc, zero)
        vys = jnp.where((mske & 4) != 0, zero, vys)

        maskz = ((gxe >= 1) & (gxe <= nx - 2)
                 & (iy >= 1) & (iy <= ny - 2)
                 & (iz >= 1) & (iz <= nz - 1))
        vzs = vze[1:B + 3, :] + jnp.where(
            maskz, (mdtrho * (pr_r - R(pr_r, 1))) / dzc, zero)
        vzs = jnp.where((mske & 8) != 0, zero, vzs)

        # ---- the variant's BC stack as a separable clamped read (module
        # docstring): zero-grad planes are interior-neighbor copies, the
        # z floor is no-slip (gpu) or another zero-grad copy (multi),
        # and multi's inlet Dirichlet overrides last, in the reference's
        # order (gpu.jl:264-279 / multi_gpu.jl:156-166).
        gx = gxe[1:B + 1, :]

        def bc(q_slab, n1, n2, n3):
            q = q_slab[1:B + 1, :]
            q = jnp.where(gx == 0, q_slab[2:B + 2, :], q)
            q = jnp.where(gx == n1 - 1, q_slab[0:B, :], q)
            q = jnp.where(iy == 0, L(q, NZ), q)
            q = jnp.where(iy == n2 - 1, R(q, NZ), q)
            q = jnp.where(iz == n3 - 1, R(q, 1), q)
            if variant == "gpu":
                return jnp.where(iz == 0, zero, q)   # no-slip bottom
            return jnp.where(iz == 0, L(q, 1), q)    # zero-grad bottom

        vx_b = bc(vxs, nx + 1, ny, nz)
        if variant == "multi":
            vx_b = jnp.where(gx == 0, vin_c, vx_b)   # inlet plane
        return vx_b, bc(vys, nx, ny + 1, nz), bc(vzs, nx, ny, nz + 1)

    def kernel(prl, prm, prh, vxl, vxm, vxh, vyl, vym, vyh, vzl, vzm, vzh,
               mskl, mskm, mskh, iy_r, iz_r, vxo, vyo, vzo):
        s = pl.program_id(0)

        def ext(lo, mid, hi):
            return jnp.concatenate([lo[B - 2:, :], mid[:, :], hi[:2, :]], 0)

        mske = jnp.concatenate([mskl[B - 1:, :], mskm[:, :],
                                mskh[:1, :]], 0)  # rows [s*B-1, s*B+B]
        vxo[:, :], vyo[:, :], vzo[:, :] = body(
            s, ext(prl, prm, prh), ext(vxl, vxm, vxh),
            ext(vyl, vym, vyh), ext(vzl, vzm, vzh), mske,
            iy_r[0:1, :], iz_r[0:1, :], W)

    def kernel_t(*refs):
        # lane-tiled: pr(9), vx(9), vy(9), vz(9), msk(9), iy, iz + outs
        s = pl.program_id(1)
        HW, WT, CW = lay.HW, lay.WT, lay.CW
        cat = _make_cat(3)
        groups = [refs[9 * i:9 * (i + 1)] for i in range(5)]
        iy_r, iz_r = refs[45], refs[46]
        vxo, vyo, vzo = refs[47:]

        def ext_cat(g):
            return jnp.concatenate([cat(g, 0)[B - 2:, :], cat(g, 1)[:, :],
                                    cat(g, 2)[:2, :]], 0)

        pre, vxe, vye, vze = (ext_cat(groups[0]), ext_cat(groups[1]),
                              ext_cat(groups[2]), ext_cat(groups[3]))
        mg = groups[4]
        mske = jnp.concatenate([cat(mg, 0)[B - 1:, :], cat(mg, 1)[:, :],
                                cat(mg, 2)[:1, :]], 0)
        vxw, vyw, vzw = body(s, pre, vxe, vye, vze, mske,
                             iy_r[0:1, :], iz_r[0:1, :], CW)
        ctr = slice(HW, HW + WT)
        vxo[:, :] = vxw[:, ctr]
        vyo[:, :] = vyw[:, ctr]
        vzo[:, :] = vzw[:, ctr]

    itemsize = np.dtype(jdt).itemsize
    cost = pl.CostEstimate(
        flops=40 * lay.NXP * W,
        bytes_accessed=int(8 * lay.NXP * W * itemsize),
        transcendentals=0)
    out_shape = tuple(jax.ShapeDtypeStruct((lay.NXP, W), jdt)
                      for _ in range(3))
    if lay.T > 1:
        live = (2 * 17 * B * (lay.WT + 2 * lay.HW)
                + 30 * (B + 4) * lay.CW)
        call = pl.pallas_call(
            kernel_t,
            grid=(lay.T, S),
            out_shape=out_shape,
            in_specs=(_tiled_specs(lay, (-1, 0, 1)) * 5
                      + [_lane_row_t(lay), _lane_row_t(lay)]),
            out_specs=tuple(_row_block_t(lay, 0) for _ in range(3)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(min(live * itemsize + 2 ** 22,
                                         110 * 2 ** 20))),
            cost_estimate=cost,
            interpret=interpret,
        )

        def run_flat(vxf, vyf, vzf, prf):
            return call(*([prf] * 9), *([vxf] * 9), *([vyf] * 9),
                        *([vzf] * 9), *([mbits] * 9),
                        lay.iy_ext, lay.iz_ext)
    else:
        rb = lambda off: _row_block(B, W, S, off)  # noqa: E731
        call = pl.pallas_call(
            kernel,
            grid=(S,),
            out_shape=out_shape,
            in_specs=[rb(-1), rb(0), rb(1)] * 4 + [rb(-1), rb(0), rb(1),
                                                   _lane_row(W),
                                                   _lane_row(W)],
            out_specs=tuple(rb(0) for _ in range(3)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20),
            cost_estimate=cost,
            interpret=interpret,
        )

        def run_flat(vxf, vyf, vzf, prf):
            return call(prf, prf, prf, vxf, vxf, vxf, vyf, vyf, vyf,
                        vzf, vzf, vzf, mbits, mbits, mbits,
                        lay.iy_row, lay.iz_row)

    def correct_fn(vx, vy, vz, pr) -> Tuple:
        vxf, vyf, vzf = run_flat(lay.flat(vx), lay.flat(vy), lay.flat(vz),
                                 lay.flat(pr))
        return (lay.unflat(vxf, nx + 1, ny, nz),
                lay.unflat(vyf, nx, ny + 1, nz),
                lay.unflat(vzf, nx, ny, nz + 1))

    correct_fn.run_flat = run_flat
    correct_fn.layout = lay
    return correct_fn
