"""Fused Pallas TPU kernel for the pseudo-transient Poisson iteration.

One invocation performs a full damped Jacobi-style iteration INCLUDING the
boundary conditions (the reference's update_dPrdτ! + update_Pr! +
set_bc_Pr! sequence, NavierStokes3D_gpu.jl:199-207,281-286 /
multi_gpu.jl:70-82,175-184) in one fused pass over HBM.

Layout: fields are flattened to (nx, W) where W = ny*nz rounded up to the
128-lane tile (Mosaic requires lane-aligned HBM DMA, and ny*nz lanes have
<0.1% tile padding versus 1.75x for a trailing (ny,nz)=(153,153) pair).
The y/z stencil becomes lane shifts of nz and 1; shift wrap-around and
pad-lane garbage land only in the boundary ring, which is masked (dPrdτ
ring stays 0) or overwritten by the in-kernel BCs.

Two pipeline modes:
  * 'blocked' (default): grid over x-slabs with Pallas's automatic
    double-buffered pipeline; the +-1-plane x halo comes from passing Pr
    three times with shifted block index maps (prev/cur/next). Pr is read
    3x -> ~7.25 grid passes per iteration. Simple and robust.
  * 'dma': manual double-buffered async-copy pipeline reading Pr slabs
    with a 2-plane halo once -> ~5.25 passes (the HBM minimum). Pr
    carries 2 permanent pad planes in x so every slab DMA has uniform
    shape. EXPERIMENTAL: interpret-mode validated only; an early version
    crashed (and wedged) the axon remote TPU runtime, and the kernel is
    VPU-bound anyway so the traffic saving buys nothing on v5e. Kept as
    the scaffold for temporal blocking (docs/roadmap.md).
Jacobi semantics need separate in/out Pr buffers (a slab's halo must be
the neighbor's old value).
"""

from __future__ import annotations

import os
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
    gpu + split:   xlo_plane=100s, xhi_plane=zeros, z_lo_add=-rho*g*dz,
                   z_hi_add=+rho*g*dz (the p' = Pr - P_static(z) image of
                   the same BC sequence; bc.affine_grad_z)
    """
    zero_grad_x: bool
    xlo_plane: Optional[np.ndarray]   # (ny*nz,) or None
    xhi_plane: Optional[np.ndarray]   # (ny*nz,) or None
    z_lo_add: float = 0.0             # additive offset on the z-lo copy
    z_hi_add: float = 0.0             # additive offset on the z-hi copy


def poisson_bc_spec(variant: str, grid, phys,
                    pressure_split: bool = False) -> PoissonBCSpec:
    """The configured variant's BC sequence as a kernel spec (shared by
    the single-chip solver and the shard_map-composed distributed path)."""
    nyz = grid.ny * grid.nz
    if variant == "multi":
        return PoissonBCSpec(zero_grad_x=True, xlo_plane=None,
                             xhi_plane=np.zeros(nyz))
    if pressure_split:
        rho_g_dz = phys.rho * phys.g * grid.dz
        return PoissonBCSpec(zero_grad_x=False,
                             xlo_plane=np.full(nyz, 100.0),
                             xhi_plane=np.zeros(nyz),
                             z_lo_add=-rho_g_dz, z_hi_add=+rho_g_dz)
    iz = np.arange(1, grid.nz + 1, dtype=np.float64)
    prof = phys.rho * phys.g * (grid.nz - iz + 0.5) * grid.dz
    prof2d = np.broadcast_to(prof[None, :], (grid.ny, grid.nz))
    return PoissonBCSpec(zero_grad_x=False,
                         xlo_plane=(prof2d + 100.0).ravel(),
                         xhi_plane=prof2d.ravel())


# VMEM ceiling the resident-chunk kernel plans against (v5e has 128 MB;
# 110 MB leaves headroom for Mosaic's own spills). The eligibility guard
# and the compiler vmem_limit both derive from this one constant.
_RESIDENT_VMEM_BUDGET = 110 * 2 ** 20


def choose_slab(nx: int, w: int, itemsize: int = 4,
                vmem_budget: int = 10 * 2 ** 20) -> int:
    """Largest divisor of nx whose slab working set fits the VMEM budget
    (sized for the heavier 'dma' mode; 'blocked' uses less)."""
    best = 1
    pad = lambda n: ((n + 7) // 8) * 8
    for b in range(1, nx + 1):
        if nx % b:
            continue
        planes = 2 * pad(b + 2) + 4 * pad(b) + 2 * pad(b)
        if planes * w * itemsize <= vmem_budget:
            best = b
    return best


def build_poisson_iter(nx: int, ny: int, nz: int, dx: float, dy: float,
                       dz: float, dtau: float, damp: float,
                       bc: PoissonBCSpec, dtype=jnp.float32,
                       slab: Optional[int] = None, interpret: bool = False,
                       mode: str = "blocked", extended: bool = False,
                       local_rows: Optional[int] = None,
                       folded: bool = False,
                       mrows: Optional[int] = None,
                       lane_tiles: Optional[int] = None,
                       sweep_depth: Optional[int] = None):
    """Returns (iter_fn, pack, unpack):

      pack(pr, dprdtau, rhs3d) -> flattened state tuple
      iter_fn(pr_flat, dpr_flat, rhs_flat) -> (pr_flat', dpr_flat')
      unpack(pr_flat, dpr_flat) -> (pr, dprdtau) in (nx,ny,nz)

    'dma' mode keeps Pr padded to (nx+2, W) with real planes at [1:nx+1];
    pad planes only ever feed masked ring cells.

    extended=True (blocked mode): the pressure is a double-single (hi,lo)
    float32 pair (NumericsConfig.extended_precision); iter_fn becomes
    (hi, lo, dpr, rhs) -> (hi', lo', dpr'), pack returns (hi, lo, dpr, rhs)
    and unpack takes (hi, lo, dpr). lap(hi)+lap(lo) cancels the stored
    field's representation noise so the residual can genuinely reach the
    reference's eps_it in float32.

    folded=True (blocked mode): fold the boundary conditions into the
    stencil instead of applying them per iteration — the Pallas analog of
    _poisson_solve_jnp_folded (models/chorin.py): zero-gradient neighbor
    terms are dropped via precomputed coefficient-mask lane rows, and
    Dirichlet planes are loop-invariant (their rows/lanes never update,
    so whatever the caller froze there persists). The caller must (a) run
    the FIRST iteration in exact form (ph.poisson_iter + set_bc_pr) so
    incoming BC-inconsistent boundary planes are read once exactly like
    the reference, (b) hoist the split-pressure affine-z constants into
    the RHS, and (c) materialize boundary planes (set_bc_pr) at the end.
    The payoff: the per-iteration cross-lane shuffle count drops from 8
    rolls to 4 (16 to 8 extended) — the kernel is VPU-shuffle-bound, not
    HBM-bound, so this is nearly a 2x on the hot loop.

    local_rows (blocked mode): build the kernel for one shard of an
    x-decomposed mesh (the shard_map-composed path, parallel/halo.py).
    The shard owns `local_rows` x-rows; iter_fn gains trailing arguments
    (halo_lo, halo_hi [, halo_lo2, halo_hi2 in extended mode], x_off):
    (1, W) neighbor face rows exchanged via ppermute by the caller, and
    the shard's global row offset (int32 (1,1), axis_index * local_rows).
    All BC position guards key on the GLOBAL row index x_off + row, so
    each device applies exactly its own piece of set_bc_Pr! — the Pallas
    analog of the reference's rank-guarded BCs (multi_gpu.jl:164-181).
    """
    if folded and mode != "blocked":
        raise ValueError("folded BCs are implemented for 'blocked' mode")
    nyz = ny * nz
    W = ((nyz + 127) // 128) * 128
    jdtype = jnp.dtype(dtype)
    itemsize = np.dtype(dtype).itemsize

    # ---- lane tiling (wide grids) ----
    # At 511-class widths (W ~ 94k lanes) the whole-row working set
    # forces M=1 (pr fetched 3x) and the kernel runs exactly at the
    # measured HBM stream floor (~505 GB/s on 7.25 passes/iter,
    # benchmarks/wide_row_probe.py) — unlike the 255 grid, whose entire
    # problem is VMEM-class. The only lever is traffic: tile the lane
    # dimension into T tiles of WT lanes so the M-row re-fetch blocking
    # (and the temporal 2-sweep) fit VMEM again. Each tile fetches
    # HW-lane halo blocks from its neighbors for the +-nz/+-1 lane
    # stencil; tile-edge garbage lands only on non-interior lanes, the
    # same invariant that covers the cyclic-roll wraparound at T=1.
    # HW is sized for two chained sweeps (reach 2*nz+2) so the 1-sweep
    # and 2-sweep kernels share one layout.
    T, WT, HW = 1, W, 0
    # default sweep depth 3: at the 511-class operating point (T=4,
    # M=4) the s=3 kernel measured best (0.78 ms/iter vs 0.87/0.90 at
    # s=4/5 on T=8 and 1.56 at s=2) — deeper sweeps trade vanishing
    # stream savings for linear VPU cost and halo padding
    SWD = int(sweep_depth if sweep_depth is not None
              else os.environ.get("NS3D_SWEEP_DEPTH", "3"))
    if mode == "blocked" and folded and local_rows is None and not extended:
        t_req = lane_tiles
        if t_req is None and not interpret and W > (1 << 15):
            t_req = max(1, round(W / 24576))
        if t_req and t_req > 1:
            # halo width sized so SWD chained sweeps stay clear of the
            # concat edges: each sweep consumes <= nz+1 lanes of margin
            HW = ((SWD * (nz + 1) + 127) // 128) * 128
            T = int(t_req)
            WT = -(-nyz // (T * HW)) * HW
            if WT < HW or T < 2:
                T, WT, HW = 1, W, 0  # degenerate: halos span tiles
            else:
                W = T * WT
    CW = WT + 2 * HW  # in-kernel concat width (center + both halos)
    B = slab or choose_slab(nx, W, itemsize)
    S = nx // B
    inv_dx2 = np.array(1.0 / dx / dx, np.dtype(dtype))
    inv_dy2 = np.array(1.0 / dy / dy, np.dtype(dtype))
    inv_dz2 = np.array(1.0 / dz / dz, np.dtype(dtype))
    dtau_c = np.array(dtau, np.dtype(dtype))
    decay = np.array(1.0 - damp, np.dtype(dtype))

    # Precomputed per-lane index/mask rows (each one (1,W) ~ 93KB in VMEM)
    j = np.arange(W, dtype=np.int32)
    real = j < nyz
    jrow = np.where(real, j // nz, -1).reshape(1, W)     # y index per lane
    zrow = np.where(real, j % nz, -1).reshape(1, W)      # z index per lane
    yz_interior = ((jrow >= 1) & (jrow <= ny - 2)
                   & (zrow >= 1) & (zrow <= nz - 2)).astype(np.dtype(dtype))
    # folded mode: per-lane neighbor-term weights (mask * 1/h^2). A weight
    # is 0 where that neighbor is a zero-gradient copy of the center (the
    # difference term vanishes after BC application) — y and z are
    # zero-gradient at both ends in both variants (gpu.jl:281-284 /
    # multi_gpu.jl:175-178), so these rows are variant-independent.
    fyp = ((jrow != ny - 2) * inv_dy2).astype(np.dtype(dtype))
    fym = ((jrow != 1) * inv_dy2).astype(np.dtype(dtype))
    fzp = ((zrow != nz - 2) * inv_dz2).astype(np.dtype(dtype))
    fzm = ((zrow != 1) * inv_dz2).astype(np.dtype(dtype))

    def lanes(plane):
        out = np.zeros((1, W), np.dtype(dtype))
        if plane is not None:
            out[0, :nyz] = np.asarray(plane, np.dtype(dtype)).ravel()
        return out

    xlo = lanes(bc.xlo_plane)
    xhi = lanes(bc.xhi_plane)
    has_xlo = bc.xlo_plane is not None
    has_xhi = bc.xhi_plane is not None

    # z-offset BC constants as double-single pairs (exact residual of the
    # f32 rounding goes to the lo channel in extended mode)
    zlo_hi = np.array(bc.z_lo_add, np.dtype(dtype))
    zhi_hi = np.array(bc.z_hi_add, np.dtype(dtype))
    zlo_lo = np.array(np.float64(bc.z_lo_add) - np.float64(zlo_hi),
                      np.dtype(dtype))
    zhi_lo = np.array(np.float64(bc.z_hi_add) - np.float64(zhi_hi),
                      np.dtype(dtype))

    def lap_of_rows(p_ext):
        # difference-first evaluation ((p+ - pc) + (p- - pc), not
        # p+ - 2pc + p-): neighbor differences of close values round at
        # ~eps*|difference| instead of eps*|value| — decisive for the
        # extended-precision pair, whose whole point is removing the
        # eps*|value| noise (a - 2c + b form floors the residual at ~2e-3
        # on the split gpu preset; this form reaches eps_it).
        pc = p_ext[1:-1, :]
        lap = ((p_ext[2:, :] - pc) + (p_ext[:-2, :] - pc)) * inv_dx2
        # pltpu.roll needs non-negative shifts: -k == W - k (cyclic)
        lap += ((pltpu.roll(pc, W - nz, 1) - pc)
                + (pltpu.roll(pc, nz, 1) - pc)) * inv_dy2
        lap += ((pltpu.roll(pc, W - 1, 1) - pc)
                + (pltpu.roll(pc, 1, 1) - pc)) * inv_dz2
        return lap, pc

    def apply_bc_rows(q, gx, jrow_r, zrow_r, xlo_r, xhi_r, z_lo_c, z_hi_c):
        """The reference's set_bc_Pr! plane sequence on a (B,W) slab."""
        if bc.zero_grad_x:
            q = jnp.where(gx == 0,
                          pltpu.roll(q, q.shape[0] - 1, 0), q)  # row<-row+1
            q = jnp.where(gx == nx - 1, pltpu.roll(q, 1, 0), q)  # row<-row-1
        jr = jrow_r[0:1, :]
        zr = zrow_r[0:1, :]
        q = jnp.where(jr == 0, pltpu.roll(q, W - nz, 1), q)
        q = jnp.where(jr == ny - 1, pltpu.roll(q, nz, 1), q)
        zlo_src = pltpu.roll(q, W - 1, 1)
        zhi_src = pltpu.roll(q, 1, 1)
        if float(z_lo_c) != 0.0:
            zlo_src = zlo_src + z_lo_c
        if float(z_hi_c) != 0.0:
            zhi_src = zhi_src + z_hi_c
        q = jnp.where(zr == 0, zlo_src, q)
        q = jnp.where(zr == nz - 1, zhi_src, q)
        if has_xlo:
            q = jnp.where(gx == 0, xlo_r[0:1, :], q)
        if has_xhi:
            q = jnp.where(gx == nx - 1, xhi_r[0:1, :], q)
        return q

    def lap_of_rows_folded(p_ext, gx, wyp, wym, wzp, wzm):
        """Masked-coefficient Laplacian (folded mode): 4 lane rolls per
        evaluation (vs 4 + 4 BC rolls in exact mode). wyp..wzm are the
        per-lane neighbor weights (mask/h^2); the x-lo term is dropped by
        global row index where x is zero-gradient (multi variant)."""
        pc = p_ext[1:-1, :]
        xp = p_ext[2:, :] - pc
        xm = p_ext[:-2, :] - pc
        if bc.zero_grad_x:
            xm = jnp.where(gx == 1, jnp.zeros_like(xm), xm)
        lap = (xp + xm) * inv_dx2
        lap += ((pltpu.roll(pc, W - nz, 1) - pc) * wyp[0:1, :]
                + (pltpu.roll(pc, nz, 1) - pc) * wym[0:1, :])
        lap += ((pltpu.roll(pc, W - 1, 1) - pc) * wzp[0:1, :]
                + (pltpu.roll(pc, 1, 1) - pc) * wzm[0:1, :])
        return lap, pc

    def resid_max(resid, live, yzmask):
        """Masked max|resid| of this block — the residual of the state
        ENTERING the iteration, emitted so the convergence loop never
        needs a separate residual pass (see ptloop.pt_loop_fused)."""
        rm = jnp.abs(resid) * yzmask[0:1, :]
        return jnp.max(jnp.where(live, rm, jnp.zeros_like(rm)))

    def compute_slab_folded(p_ext, d, r, gx, live, yzmask,
                            wyp, wym, wzp, wzm):
        """Folded slab math: no BC application — Dirichlet rows/lanes are
        frozen (live/yzmask exclude them from the update) and
        zero-gradient neighbors are dropped inside the lap."""
        lap, pc = lap_of_rows_folded(p_ext, gx, wyp, wym, wzp, wzm)
        resid = lap - r
        d_new = (d * decay + dtau_c * resid) * yzmask[0:1, :]
        d_new = jnp.where(live, d_new, jnp.zeros_like(d_new))
        q = pc + dtau_c * d_new
        return q, d_new, resid

    def compute_slab_ext_folded(h_ext, l_ext, d, r, gx, live, yzmask,
                                wyp, wym, wzp, wzm):
        """Folded double-single slab math. At frozen cells the two_sum
        renormalizes the pair (hi absorbs lo) — value-preserving, and the
        folded lap never reads frozen boundary lanes anyway."""
        lap_h, hc = lap_of_rows_folded(h_ext, gx, wyp, wym, wzp, wzm)
        lap_l, lc = lap_of_rows_folded(l_ext, gx, wyp, wym, wzp, wzm)
        resid = (lap_h - r) + lap_l
        d_new = (d * decay + dtau_c * resid) * yzmask[0:1, :]
        d_new = jnp.where(live, d_new, jnp.zeros_like(d_new))
        u = lc + dtau_c * d_new
        s = hc + u                      # two_sum(hc, u): exact hi' + lo'
        ap = s - u
        bp = s - ap
        ql = (hc - ap) + (u - bp)
        return s, ql, d_new, resid

    def compute_slab(p_ext, d, r, gx, live, yzmask, jrow_r, zrow_r,
                     xlo_r, xhi_r):
        """Shared slab math: p_ext (B+2,W) old-Pr with x halo planes,
        d/r (B,W), gx (B,1) global x-row indices of the slab, live (B,1)
        rows that update (global interior AND locally owned; ghost rows
        beyond the owned range on a padded grid stay identically zero).
        Returns (new_pr (B,W), new_dpr (B,W))."""
        lap, pc = lap_of_rows(p_ext)
        resid = lap - r
        d_new = (d * decay + dtau_c * resid) * yzmask[0:1, :]
        # interior-x rows only: ring (gx=0, nx-1) and ghosts keep
        # dPrdτ = 0; `where` also discards halo/pad garbage (even NaN).
        d_new = jnp.where(live, d_new, jnp.zeros_like(d_new))
        q = pc + dtau_c * d_new
        # ---- boundary conditions on the updated pressure ----
        q = apply_bc_rows(q, gx, jrow_r, zrow_r, xlo_r, xhi_r,
                          zlo_hi, zhi_hi)
        return q, d_new, resid

    def compute_slab_ext(h_ext, l_ext, d, r, gx, live, yzmask, jrow_r,
                         zrow_r, xlo_r, xhi_r):
        """Double-single slab math: the pressure pair (hi, lo) satisfies
        lap(hi)+lap(lo) == lap(hi+lo) in real arithmetic; the update
        renormalizes through an exact two_sum. Dirichlet x planes write
        (plane, 0); z offsets add their own (hi, lo) constant split."""
        lap_h, hc = lap_of_rows(h_ext)
        lap_l, lc = lap_of_rows(l_ext)
        resid = (lap_h - r) + lap_l
        d_new = (d * decay + dtau_c * resid) * yzmask[0:1, :]
        d_new = jnp.where(live, d_new, jnp.zeros_like(d_new))
        u = lc + dtau_c * d_new
        s = hc + u                      # two_sum(hc, u): exact hi' + lo'
        ap = s - u
        bp = s - ap
        q = s
        ql = (hc - ap) + (u - bp)
        q = apply_bc_rows(q, gx, jrow_r, zrow_r, xlo_r, xhi_r,
                          zlo_hi, zhi_hi)
        ql = apply_bc_rows(ql, gx, jrow_r, zrow_r,
                           jnp.zeros_like(xlo_r), jnp.zeros_like(xhi_r),
                           zlo_lo, zhi_lo)
        return q, ql, d_new, resid

    # double-buffered block working set: blocked = 3 pr-in + dpr + rhs +
    # 2 out; extended doubles the pressure traffic (3 hi + 3 lo) and adds
    # a third output
    n_block_bufs = (3 + 3 + 1 + 1 + 3) if extended else (3 + 1 + 1 + 1 + 1)
    vmem_planes = n_block_bufs * (((B + 7) // 8) * 8) * 2 + 64
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=int(min(vmem_planes * W * itemsize + 2 ** 22,
                                 100 * 2 ** 20)))
    cost = pl.CostEstimate(
        flops=(36 if extended else 20) * nx * W,
        bytes_accessed=int(((11.25 if extended else 7.25)
                            if mode == "blocked" else 5.3)
                           * nx * W * itemsize),
        transcendentals=0)

    if mode == "blocked":
        # LR = rows this kernel instance owns (the whole grid, or one
        # x-shard of it in distributed mode).
        LR = local_rows if local_rows else nx
        dist = local_rows is not None
        # Mosaic requires the sublane block dim to be a multiple of 8 (or
        # the full array dim): pad x to NXP = ceil(LR/B)*B with inert ghost
        # rows (proof of inertness: d_new is zeroed there, pr ghosts start
        # 0 and the update/BC selects never touch them).
        if slab is None:
            B = 8
            env_b = os.environ.get("NS3D_PALLAS_SLAB")
            if env_b:
                B = int(env_b)
        # LR % B == 1 would put the zero-grad hi source row (nx-2) in a
        # different block than its target (nx-1) — only the exact
        # zero-grad-x roll (apply_bc_rows) has that cross-row dependency;
        # folded and Dirichlet-x builds are unconstrained.
        needs_bc_roll = bc.zero_grad_x and not folded
        if not interpret and (B % 8 or (needs_bc_roll and LR % B == 1)):
            raise ValueError(f"blocked mode needs slab%8==0 (and LR%B!=1 "
                             f"with the zero-grad x roll), got B={B}, "
                             f"LR={LR}")
        if interpret and needs_bc_roll and LR % B == 1:
            B += 1  # keep the BC source row in-slab for odd test shapes
        # distributed shards need ghost row LR to exist: the caller writes
        # the +x neighbor's halo face there each iteration, making it the
        # +1 stencil neighbor of owned row LR-1 wherever it falls in a slab
        NXP = ((LR + (1 if dist else 0) + B - 1) // B) * B
        S = NXP // B
        # (An S%4 ghost-row round-up to unlock M=4 at wide grids was
        # measured and reverted: at W~94k lanes M=2 ran 20% SLOWER than
        # M=1 — the wide-row cost is not pr fetch passes, so odd S keeps
        # its natural M=1 there.)

        # M output slabs per grid step (folded, non-distributed): Pr is
        # fetched as M+2 B-row blocks per step instead of 3 per slab, so
        # its HBM traffic drops from 3 passes to (M+2)/M. Measured on
        # v5e at 255x153x153 (benchmarks/poisson_variants.py --folded):
        # plain 0.180/0.176/0.172/0.282 ms/iter at M=1/2/4/8 and extended
        # 0.321/0.322/0.373/OOM — larger blocks shrink the double-buffer
        # pipeline overlap and (extended, M>=8) blow scoped VMEM, so the
        # default is M=4 plain / M=1 extended; NS3D_PALLAS_M or mrows=
        # override for experiments.
        M = 1
        if folded and not dist:
            env_m = os.environ.get("NS3D_PALLAS_M")
            if mrows is not None:
                cands = [mrows]
            elif env_m:
                cands = [int(env_m)]
            elif T > 1:
                cands = [8, 4, 2, 1]
            else:
                cands = [1] if extended else [4, 2, 1]
            streams = 2 if extended else 1
            n_out = 3 if extended else 2
            for m in cands:
                if T > 1:
                    # tiled working set: double-buffered IO blocks (pr
                    # center+halos, dpr, rhs, outs) + the concat/roll
                    # temporaries of the (R+2, CW) window
                    live = (2 * ((m + 2) * B * CW + 4 * m * B * WT)
                            + 10 * (m * B + 2) * CW)
                    ok = live * itemsize + 2 ** 22 <= 100 * 2 ** 20
                else:
                    live_rows = 2 * (streams * (m + 2) * B
                                     + (2 + n_out) * m * B)
                    ok = live_rows * W * itemsize <= 72 * 2 ** 20
                if S % m == 0 and ok:
                    M = m
                    break
            if (mrows is not None or env_m) and M == 1 and cands[0] != 1:
                raise ValueError(
                    f"mrows={cands[0]} needs S%mrows==0 (S={S}) and the "
                    "working set within VMEM")
        R = M * B
        G = S // M

        def row_block(off):
            """B-row input block at stride M: grid step s covers output
            rows [s*R, s*R+R); its x halo comes from the last/first rows
            of the flanking blocks (edge clips feed only masked rows)."""
            return pl.BlockSpec(
                (B, W),
                (lambda s: (jnp.clip(s * M + off, 0, S - 1), 0)),
                memory_space=pltpu.VMEM)

        def big_block():
            return pl.BlockSpec(
                (R, W), (lambda s: (s, 0)), memory_space=pltpu.VMEM)

        lane_row = pl.BlockSpec((1, W), (lambda s: (0, 0)),
                                memory_space=pltpu.VMEM)
        smem_scalar = pl.BlockSpec((1, 1), (lambda s: (0, 0)),
                                   memory_space=pltpu.SMEM)
        if folded:
            rows_c = tuple(map(jnp.asarray,
                               (yz_interior, fyp, fym, fzp, fzm)))
        else:
            rows_c = tuple(map(jnp.asarray,
                               (yz_interior, jrow, zrow, xlo, xhi)))
        slab_shape = jax.ShapeDtypeStruct((NXP, W), jdtype)

        def zpack(a):
            return jnp.zeros((NXP, W), jdtype).at[:LR, :nyz].set(
                a.reshape(LR, nyz).astype(jdtype))

        def unflat(a):
            return a[:LR, :nyz].reshape(LR, ny, nz)

        def rows_of(sidx, x_off):
            """(gx, live): global row indices of grid step sidx's R rows
            and the rows that update — global interior AND locally owned
            (distributed shards have ghost rows whose gx is a valid
            global index)."""
            lrow = sidx * R + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
            gx = x_off + lrow
            live = jnp.logical_and(gx >= 1, gx <= nx - 2)
            if dist:
                live = jnp.logical_and(live, lrow < LR)
            return gx, live

        def p_ext_of(sidx, blocks, hlo):
            """(R+2)-row extended window from the M+2 fetched B-row
            blocks: the flanking blocks contribute their last/first row.
            Distributed: the -x neighbor halo replaces step 0's lo row
            (row 0 is always a step's first row); the +x halo is NOT an
            operand — the caller writes it into ghost row LR, reached
            through the normal in-window/next-block neighbor path. At
            global edges the leftover garbage only reaches masked
            ring/ghost rows."""
            lo_row = blocks[0][B - 1:B, :]
            if dist:
                sidx_col = jnp.full((1, 1), sidx, jnp.int32)
                lo_row = jnp.where(sidx_col == 0, hlo[0:1, :], lo_row)
            hi_row = blocks[M + 1][0:1, :]
            mid = [b[:, :] for b in blocks[1:M + 1]]
            return jnp.concatenate([lo_row, *mid, hi_row], axis=0)

        # the 5 lane-row operands: (yzmask, jrow, zrow, xlo, xhi) in exact
        # mode, (yzmask, fyp, fym, fzp, fzm) weight rows in folded mode —
        # same slots, so the pallas_call plumbing is shared.
        slab_fn = compute_slab_folded if folded else compute_slab
        slab_fn_ext = compute_slab_ext_folded if folded else compute_slab_ext

        cost = pl.CostEstimate(
            flops=(36 if extended else 20) * nx * W,
            bytes_accessed=int((((2 if extended else 1) * (M + 2) / M
                                 + (5 if extended else 4))
                                * nx * W * itemsize)),
            transcendentals=0)
        live_rows_ = (2 * ((2 if extended else 1) * (M + 2) * B
                           + (2 + (3 if extended else 2)) * R) + 8)
        est_ = live_rows_ * W * itemsize + 2 ** 22
        if W > 2 ** 16:
            # wide grids (511-class, W ~ 94k lanes): Mosaic's scoped
            # need outgrows this IO-block estimate (measured 97.9M vs a
            # 76M limit) — give the full budget there; the M selection
            # above already bounded the IO working set. W <= 64k keeps
            # the exact limit the 255-grid perf was tuned under.
            est_ = 110 * 2 ** 20
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=int(min(est_, 110 * 2 ** 20)))

        # single (1,1) SMEM accumulator (a (1,1) block per grid step is
        # not a legal Mosaic tiling): the block index is constant so the
        # buffer persists across the sequential grid steps and the kernel
        # max-accumulates into it
        err_shape = jax.ShapeDtypeStruct((1, 1), jdtype)
        err_block = pl.BlockSpec((1, 1), (lambda s: (0, 0)),
                                 memory_space=pltpu.SMEM)

        one_flag = jnp.ones((1, 1), jnp.int32)

        def _as_flag(v):
            """do_chk operand: None (tests/simple callers) = always emit;
            loop bodies pass (it+1) % nchk == 0 so the ~20%-cost reduce
            runs only on consumed iterations."""
            if v is None:
                return one_flag
            return jnp.asarray(v, jnp.int32).reshape(1, 1)

        def emit_err(err_out, sidx, rm):
            @pl.when(sidx == 0)
            def _():
                err_out[0, 0] = rm

            @pl.when(sidx != 0)
            def _():
                err_out[0, 0] = jnp.maximum(err_out[0, 0], rm)

        if T > 1:
            # ---- lane-tiled folded kernel (wide grids) ----
            # 2D grid (tile, x-step): per lane tile the x-slabs stream
            # exactly like the T=1 kernel; the +-nz/+-1 lane stencil reads
            # HW-lane halo blocks of the neighboring tiles, concatenated
            # around the center block in VMEM. Bit-compatible with the
            # T=1 folded math (same per-lane expressions and sum order;
            # rolls act on the concat window instead of the full row).
            Q = WT // HW
            TQ = T * Q

            def row_block_t(off):
                return pl.BlockSpec(
                    (B, WT),
                    (lambda t, s, off=off: (jnp.clip(s * M + off, 0, S - 1),
                                            t)),
                    memory_space=pltpu.VMEM)

            def halo_block_t(off, side):
                d = -1 if side == 0 else Q
                return pl.BlockSpec(
                    (B, HW),
                    (lambda t, s, off=off, d=d: (
                        jnp.clip(s * M + off, 0, S - 1),
                        jnp.clip(t * Q + d, 0, TQ - 1))),
                    memory_space=pltpu.VMEM)

            big_t = pl.BlockSpec((R, WT), (lambda t, s: (s, t)),
                                 memory_space=pltpu.VMEM)
            lane_t = pl.BlockSpec((1, WT), (lambda t, s: (0, t)),
                                  memory_space=pltpu.VMEM)
            smem_t = pl.BlockSpec((1, 1), (lambda t, s: (0, 0)),
                                  memory_space=pltpu.SMEM)
            err_block_t = pl.BlockSpec((1, 1), (lambda t, s: (0, 0)),
                                       memory_space=pltpu.SMEM)

            def lap_center(p_cat, gx, wyp, wym, wzp, wzm):
                """Folded lap on the (rows, CW) concat window, sliced to
                the WT center lanes — per-lane arithmetic identical to
                lap_of_rows_folded (tile-edge reads come from real
                neighbor-halo data instead of the cyclic roll)."""
                pc = p_cat[1:-1, :]
                ctr = lambda a: a[:, HW:HW + WT]
                pcc = ctr(pc)
                xp = ctr(p_cat[2:, :]) - pcc
                xm = ctr(p_cat[:-2, :]) - pcc
                if bc.zero_grad_x:
                    xm = jnp.where(gx == 1, jnp.zeros_like(xm), xm)
                lap = (xp + xm) * inv_dx2
                lap += ((ctr(pltpu.roll(pc, CW - nz, 1)) - pcc)
                        * wyp[0:1, :]
                        + (ctr(pltpu.roll(pc, nz, 1)) - pcc) * wym[0:1, :])
                lap += ((ctr(pltpu.roll(pc, CW - 1, 1)) - pcc)
                        * wzp[0:1, :]
                        + (ctr(pltpu.roll(pc, 1, 1)) - pcc) * wzm[0:1, :])
                return lap, pcc

            def kernel(*refs):
                prs = refs[:M + 2]
                prl = refs[M + 2:2 * (M + 2)]
                prr = refs[2 * (M + 2):3 * (M + 2)]
                (dpr, rhs, row0, row1, row2, row3, row4, chk,
                 pr_out, dpr_out, err_out) = refs[3 * (M + 2):]
                tidx = pl.program_id(0)
                sidx = pl.program_id(1)
                gx, live = rows_of(sidx, 0)
                p_cat = jnp.concatenate(
                    [p_ext_of(sidx, prl, None),
                     p_ext_of(sidx, prs, None),
                     p_ext_of(sidx, prr, None)], axis=1)
                lap, pcc = lap_center(p_cat, gx, row1, row2, row3, row4)
                resid = lap - rhs[:, :]
                d_new = (dpr[:, :] * decay + dtau_c * resid) * row0[0:1, :]
                d_new = jnp.where(live, d_new, jnp.zeros_like(d_new))
                pr_out[:, :] = pcc + dtau_c * d_new
                dpr_out[:, :] = d_new

                @pl.when(chk[0, 0] != 0)
                def _():
                    emit_err(err_out, tidx * G + sidx,
                             resid_max(resid, live, row0))

            in_specs_t = [row_block_t(off) for off in range(-1, M + 1)]
            in_specs_t += [halo_block_t(off, 0) for off in range(-1, M + 1)]
            in_specs_t += [halo_block_t(off, 1) for off in range(-1, M + 1)]
            in_specs_t += [big_t, big_t,
                           lane_t, lane_t, lane_t, lane_t, lane_t, smem_t]
            cost_t = pl.CostEstimate(
                flops=20 * nx * W,
                bytes_accessed=int(((M + 2) / M * CW / WT + 4)
                                   * nx * W * itemsize),
                transcendentals=0)
            live_e = (2 * ((M + 2) * B * CW + 4 * R * WT)
                      + 10 * (R + 2) * CW)
            params_t = pltpu.CompilerParams(
                vmem_limit_bytes=int(min(live_e * itemsize + 2 ** 22,
                                         110 * 2 ** 20)))
            pallas_iter = pl.pallas_call(
                kernel,
                grid=(T, G),
                out_shape=(slab_shape, slab_shape, err_shape),
                in_specs=in_specs_t,
                out_specs=(big_t, big_t, err_block_t),
                input_output_aliases={3 * (M + 2): 1},
                compiler_params=params_t,
                cost_estimate=cost_t,
                interpret=interpret,
            )

            def iter_fn(pr_flat, dpr_flat, rhs_flat, do_chk=None):
                return pallas_iter(*([pr_flat] * (3 * (M + 2))),
                                   dpr_flat, rhs_flat, *rows_c,
                                   _as_flag(do_chk))

            def pack(pr, dprdtau, rhs3d):
                return zpack(pr), zpack(dprdtau), zpack(rhs3d)

            def unpack(pr_flat, dpr_flat):
                return unflat(pr_flat), unflat(dpr_flat)

            # ---- tiled temporal 2-sweep: two damped Jacobi iterations
            # per HBM round trip. Where the T=1 grid is VMEM-class and
            # the 2-sweep LOSES (VPU-bound, measured 96.5 vs 83.7 us at
            # 255), the wide tiled grid is HBM-stream-bound, so halving
            # the write stream and amortizing the dpr/rhs fetches is a
            # direct win. Sweep 1 runs on the full (R+4, CW) concat
            # window (its outputs are needed at +-(nz+1) halo lanes by
            # sweep 2), so the lane-constant rows come in halo-extended
            # (1, T*CW) form; HW >= 2*nz+2 guarantees sweep 2's reads
            # stay clear of both the concat edges and roll wraparound.
            # lane constants halo-extended per tile (zero-filled at the
            # global edges — zero weights there freeze out-of-range
            # lanes, the same invariant as the cyclic-roll garbage)
            from .fused_step import ext_lane_np
            rows_ext_c = tuple(
                jnp.asarray(ext_lane_np(np.asarray(r), T, WT, HW, W))
                for r in (yz_interior, fyp, fym, fzp, fzm))
            lane_ext_t = pl.BlockSpec((1, CW), (lambda t, s: (0, t)),
                                      memory_space=pltpu.VMEM)

            def ext_of_t(blocks, take):
                lo = blocks[0][B - take:, :]
                hi = blocks[M + 1][:take, :]
                mid = [b[:, :] for b in blocks[1:M + 1]]
                return jnp.concatenate([lo, *mid, hi], axis=0)

            def cat3(l, c, r):
                return jnp.concatenate([l, c, r], axis=1)

            def lap_full(p_ext, gx, wyp, wym, wzp, wzm):
                """Folded lap over the full CW width (sweep 1)."""
                pc = p_ext[1:-1, :]
                xp = p_ext[2:, :] - pc
                xm = p_ext[:-2, :] - pc
                if bc.zero_grad_x:
                    xm = jnp.where(gx == 1, jnp.zeros_like(xm), xm)
                lap = (xp + xm) * inv_dx2
                lap += ((pltpu.roll(pc, CW - nz, 1) - pc) * wyp[0:1, :]
                        + (pltpu.roll(pc, nz, 1) - pc) * wym[0:1, :])
                lap += ((pltpu.roll(pc, CW - 1, 1) - pc) * wzp[0:1, :]
                        + (pltpu.roll(pc, 1, 1) - pc) * wzm[0:1, :])
                return lap, pc

            nn = M + 2

            def mk_sweep_fn(s):
                """s chained damped Jacobi iterations per HBM round trip.
                Sweeps 1..s-1 run on the full CW width with windows
                shrinking 2 rows / (nz+1) lanes per sweep; the final
                sweep is center-lane only and emits its entering
                residual — the same check quantity as s unrolled 1-sweep
                calls, so iteration counts match exactly."""
                def kernelS(*refs):
                    prs, prl, prr = (refs[:nn], refs[nn:2 * nn],
                                     refs[2 * nn:3 * nn])
                    dps, dpl, dprr = (refs[3 * nn:4 * nn],
                                      refs[4 * nn:5 * nn],
                                      refs[5 * nn:6 * nn])
                    rhc, rhl, rhr = (refs[6 * nn:7 * nn],
                                     refs[7 * nn:8 * nn],
                                     refs[8 * nn:9 * nn])
                    (row0e, row1e, row2e, row3e, row4e, chk,
                     pr_out, dpr_out, err_out) = refs[9 * nn:]
                    tidx = pl.program_id(0)
                    sidx = pl.program_id(1)
                    WR = R + 2 * (s - 1)   # rows of the d/rhs windows
                    lrow = (sidx * R - (s - 1)
                            + jax.lax.broadcasted_iota(jnp.int32,
                                                       (WR, 1), 0))
                    live = jnp.logical_and(lrow >= 1, lrow <= nx - 2)
                    gx = lrow
                    q = cat3(ext_of_t(prl, s), ext_of_t(prs, s),
                             ext_of_t(prr, s))            # (R+2s, CW)
                    d = cat3(ext_of_t(dpl, s - 1), ext_of_t(dps, s - 1),
                             ext_of_t(dprr, s - 1)) if s > 1 else None
                    rv = cat3(ext_of_t(rhl, s - 1), ext_of_t(rhc, s - 1),
                              ext_of_t(rhr, s - 1))       # (WR, CW)
                    ctr = lambda a: a[:, HW:HW + WT]
                    w_c = [r[0:1, HW:HW + WT] for r in
                           (row0e, row1e, row2e, row3e, row4e)]
                    for j in range(s):
                        if j == s - 1:
                            # final sweep: center lanes, emit residual
                            lap, qcc = lap_center(q, gx, w_c[1], w_c[2],
                                                  w_c[3], w_c[4])
                            resid = lap - ctr(rv)
                            d_new = ((ctr(d) * decay + dtau_c * resid)
                                     * w_c[0])
                            d_new = jnp.where(live, d_new,
                                              jnp.zeros_like(d_new))
                            pr_out[:, :] = qcc + dtau_c * d_new
                            dpr_out[:, :] = d_new

                            @pl.when(chk[0, 0] != 0)
                            def _():
                                emit_err(err_out, tidx * G + sidx,
                                         resid_max(resid, live, w_c[0]))
                        else:
                            lap, qc = lap_full(q, gx, row1e, row2e,
                                               row3e, row4e)
                            resid = lap - rv
                            d_new = ((d * decay + dtau_c * resid)
                                     * row0e[0:1, :])
                            d_new = jnp.where(live, d_new,
                                              jnp.zeros_like(d_new))
                            q = qc + dtau_c * d_new
                            d = d_new[1:-1, :]
                            rv = rv[1:-1, :]
                            gx = gx[1:-1, :]
                            live = live[1:-1, :]

                in_specsS = []
                for _arr in range(3):  # pr, dpr, rhs
                    in_specsS += [row_block_t(off)
                                  for off in range(-1, M + 1)]
                    in_specsS += [halo_block_t(off, 0)
                                  for off in range(-1, M + 1)]
                    in_specsS += [halo_block_t(off, 1)
                                  for off in range(-1, M + 1)]
                in_specsS += [lane_ext_t] * 5 + [smem_t]
                costS = pl.CostEstimate(
                    flops=s * 20 * nx * W,
                    bytes_accessed=int((3 * (M + 2) / M * CW / WT + 2)
                                       * nx * W * itemsize),
                    transcendentals=0)
                liveS = (2 * (3 * nn * B * CW + 2 * R * WT)
                         + (10 + 2 * s) * (R + 2 * s) * CW)
                if liveS * itemsize + 2 ** 22 > 110 * 2 ** 20:
                    return None
                paramsS = pltpu.CompilerParams(
                    vmem_limit_bytes=int(min(liveS * itemsize + 2 ** 22,
                                             110 * 2 ** 20)))
                pallas_iterS = pl.pallas_call(
                    kernelS,
                    grid=(T, G),
                    out_shape=(slab_shape, slab_shape, err_shape),
                    in_specs=in_specsS,
                    out_specs=(big_t, big_t, err_block_t),
                    compiler_params=paramsS,
                    cost_estimate=costS,
                    interpret=interpret,
                )

                def iterS_fn(pr_flat, dpr_flat, rhs_flat, do_chk=None):
                    return pallas_iterS(*([pr_flat] * (3 * nn)),
                                        *([dpr_flat] * (3 * nn)),
                                        *([rhs_flat] * (3 * nn)),
                                        *rows_ext_c, _as_flag(do_chk))

                iterS_fn.sweeps = s
                return iterS_fn

            sweep_fns = {}
            # s sweeps consume <= s*(nz+1) lanes of halo margin; HW was
            # sized from SWD, so only depths whose reach fits are built
            # (SWD=1 builds none — clamping to 2 would chain past the
            # halo and read concat-edge garbage into interior lanes)
            for s in range(2, min(SWD, B) + 1):
                if s * (nz + 1) > HW:
                    continue
                fn_s = mk_sweep_fn(s)
                if fn_s is not None:
                    sweep_fns[s] = fn_s
            if 2 in sweep_fns:
                iter_fn.sweep2 = sweep_fns[2]
            iter_fn.sweep_fns = sweep_fns

        elif not extended:
            def kernel(*refs):
                prs = refs[:M + 2]
                if dist:
                    (dpr, rhs, row0, row1, row2, row3, row4,
                     hlo, xoff, chk, pr_out, dpr_out,
                     err_out) = refs[M + 2:]
                    x_off = xoff[0, 0]
                else:
                    (dpr, rhs, row0, row1, row2, row3, row4,
                     chk, pr_out, dpr_out, err_out) = refs[M + 2:]
                    hlo = None
                    x_off = 0
                sidx = pl.program_id(0)
                gx, live = rows_of(sidx, x_off)
                p_ext = p_ext_of(sidx, prs, hlo)
                q, d_new, resid = slab_fn(p_ext, dpr[:, :], rhs[:, :], gx,
                                          live, row0, row1, row2, row3,
                                          row4)
                pr_out[:, :] = q
                dpr_out[:, :] = d_new

                # the reduce costs ~20% of the iteration; run it only on
                # iterations whose value the convergence loop consumes
                @pl.when(chk[0, 0] != 0)
                def _():
                    emit_err(err_out, sidx,
                             resid_max(resid, live, row0))

            in_specs = [row_block(off) for off in range(-1, M + 1)]  # pr
            in_specs += [
                big_block(),                                  # dpr
                big_block(),                                  # rhs
                lane_row, lane_row, lane_row, lane_row, lane_row,
            ]
            if dist:
                in_specs += [lane_row, smem_scalar]
            in_specs += [smem_scalar]                         # chk flag
            # alias dpr in -> dpr out: its blocks are read and written at
            # the SAME grid index (no cross-step overlap, unlike pr's
            # halo windows), so in-place is race-free — and it removes a
            # per-iteration 24MB carry copy XLA otherwise inserts in the
            # convergence while-loop (one was VMEM-staged at ~32us/iter)
            pallas_iter = pl.pallas_call(
                kernel,
                grid=(G,),
                out_shape=(slab_shape, slab_shape, err_shape),
                in_specs=in_specs,
                out_specs=(big_block(), big_block(), err_block),
                input_output_aliases={M + 2: 1},
                compiler_params=compiler_params,
                cost_estimate=cost,
                interpret=interpret,
            )

            if dist:
                def iter_fn(pr_flat, dpr_flat, rhs_flat, hlo, x_off,
                            do_chk=None):
                    return pallas_iter(*([pr_flat] * (M + 2)), dpr_flat,
                                       rhs_flat, *rows_c, hlo, x_off,
                                       _as_flag(do_chk))
            else:
                def iter_fn(pr_flat, dpr_flat, rhs_flat, do_chk=None):
                    return pallas_iter(*([pr_flat] * (M + 2)), dpr_flat,
                                       rhs_flat, *rows_c,
                                       _as_flag(do_chk))

            if folded and not dist:
                # ---- temporal 2-sweep kernel: TWO bit-identical damped
                # Jacobi iterations per HBM round trip. Sweep 1 runs on an
                # (R+2)-row window (the pr halo rows were already fetched
                # — the flanking blocks just contribute 2 rows instead of
                # 1); sweep 2 consumes sweep 1's VMEM-resident q/dpr and
                # writes the final R rows. dpr and rhs move from exact
                # big-blocks to (M+2) row-blocks for their +-1-row halo,
                # so per-iteration HBM traffic drops from
                # (M+2)/M + 4 ~ 5.5 passes to ((M+2)/M*3 + 2)/2 ~ 3.25 at
                # M=4. The emitted residual is sweep 2's entering
                # residual — exactly what the second call of the unrolled
                # 1-sweep pair emits, so convergence checks and exits see
                # the same quantities and iteration counts match exactly;
                # fields agree to per-program FMA-contraction rounding
                # (the M-row re-tiling's standard, tests/test_pallas.py).
                def rows_of2(sidx):
                    lrow = (sidx * R - 1
                            + jax.lax.broadcasted_iota(jnp.int32,
                                                       (R + 2, 1), 0))
                    live = jnp.logical_and(lrow >= 1, lrow <= nx - 2)
                    return lrow, live

                def ext_of(blocks, take):
                    lo = blocks[0][B - take:, :]
                    hi = blocks[M + 1][:take, :]
                    mid = [b[:, :] for b in blocks[1:M + 1]]
                    return jnp.concatenate([lo, *mid, hi], axis=0)

                def kernel2(*refs):
                    prs = refs[:M + 2]
                    dprs = refs[M + 2:2 * (M + 2)]
                    rhss = refs[2 * (M + 2):3 * (M + 2)]
                    (row0, row1, row2, row3, row4, chk,
                     pr_out, dpr_out, err_out) = refs[3 * (M + 2):]
                    sidx = pl.program_id(0)
                    gx_e, live_e = rows_of2(sidx)
                    p_ext1 = ext_of(prs, 2)       # rows [sR-2, sR+R+2)
                    dpr_e = ext_of(dprs, 1)       # rows [sR-1, sR+R+1)
                    rhs_e = ext_of(rhss, 1)
                    q1, d1, _ = slab_fn(p_ext1, dpr_e, rhs_e, gx_e,
                                        live_e, row0, row1, row2, row3,
                                        row4)
                    gx2 = gx_e[1:-1, :]
                    live2 = live_e[1:-1, :]
                    q2, d2, resid2 = slab_fn(q1, d1[1:-1, :],
                                             rhs_e[1:-1, :], gx2, live2,
                                             row0, row1, row2, row3, row4)
                    pr_out[:, :] = q2
                    dpr_out[:, :] = d2

                    @pl.when(chk[0, 0] != 0)
                    def _():
                        emit_err(err_out, sidx,
                                 resid_max(resid2, live2, row0))

                cost2 = pl.CostEstimate(
                    flops=2 * 20 * nx * W,
                    bytes_accessed=int((3 * (M + 2) / M + 2)
                                       * nx * W * itemsize),
                    transcendentals=0)
                live_rows2 = 2 * (3 * (M + 2) * B + 2 * R) + 8 * (R + 2)
                params2 = pltpu.CompilerParams(
                    vmem_limit_bytes=int(min(
                        live_rows2 * W * itemsize + 2 ** 22,
                        110 * 2 ** 20)))
                in_specs2 = ([row_block(off) for off in range(-1, M + 1)]
                             * 3
                             + [lane_row] * 5 + [smem_scalar])
                pallas_iter2 = pl.pallas_call(
                    kernel2,
                    grid=(G,),
                    out_shape=(slab_shape, slab_shape, err_shape),
                    in_specs=in_specs2,
                    out_specs=(big_block(), big_block(), err_block),
                    compiler_params=params2,
                    cost_estimate=cost2,
                    interpret=interpret,
                )

                def iter2_fn(pr_flat, dpr_flat, rhs_flat, do_chk=None):
                    return pallas_iter2(*([pr_flat] * (M + 2)),
                                        *([dpr_flat] * (M + 2)),
                                        *([rhs_flat] * (M + 2)),
                                        *rows_c, _as_flag(do_chk))

                iter_fn.sweep2 = iter2_fn

                # ---- VMEM-resident chunk kernel ----
                # One pallas call advancing NIT damped Jacobi iterations
                # with pr, dPrdtau and the RHS resident in VMEM for the
                # whole chunk: two bulk HBM->VMEM copies in, NIT sweeps
                # over the scratch arrays, two bulk copies out. Per-
                # iteration HBM traffic is ZERO. MEASURED on v5e
                # (round 5, benchmarks/resident_probe.py, bit-identical
                # fields/err on hardware): at 255 it ties the streaming
                # kernel exactly (96.0 vs 96.0 us/iter) — the streaming
                # pipeline already hides its DMA behind compute, so the
                # binding constraint at that size is the sweep body's
                # issue rate, not HBM; at 63 it wins ~20-28%
                # (87-63.5 vs 121-77 us/iter depending on session), all
                # of it per-op issue overhead on tiny (10,1536) blocks.
                # Neither justifies wiring it into the production loop
                # (benchmarks/records/README.md "63-grid attribution");
                # the kernel stays as measurement apparatus + a VMEM
                # in-place-sweep reference, tested for equivalence in
                # tests/test_pallas.py. Only built when the 3-array
                # working set fits VMEM (255x153x153 f32: 72 MB of the
                # 110 MB budget; 511-class grids stay on the lane-tiled
                # streaming kernel).
                #
                # Jacobi correctness in place: slabs update in ascending
                # x; each slab's -x neighbor row is saved from the OLD
                # values before the overwrite, and its +x neighbor rows
                # are still unwritten — so every read sees iteration-k
                # values while writes build k+1 (the same one-row-save
                # discipline as an out-of-place sweep, without a second
                # 24 MB pressure buffer).
                #
                # The emitted err is the masked max|resid| of the state
                # ENTERING the final iteration of the chunk — exactly
                # the check value the 1-sweep loop's flagged call emits
                # at a chunk boundary (ptloop.pt_loop_fused), so
                # iteration counts match the streaming loop exactly.
                BR = B
                SR = NXP // BR
                res_cache = {}

                def make_resident(nit):
                    """Resident-chunk variant advancing `nit` iterations
                    per call, or None when the working set exceeds VMEM
                    or the shape is ineligible."""
                    nit = int(nit)
                    if nit < 1:
                        return None
                    if nit in res_cache:
                        return res_cache[nit]
                    resident_bytes = 3 * NXP * W * itemsize
                    # sweep-body working set: p_ext/q/d_new/resid plus
                    # ~10 elementwise intermediates, each a (BR+2)-row
                    # lane block — 14 row-blocks is a conservative bound
                    # on what Mosaic keeps simultaneously live
                    scoped = 14 * (BR + 2) * W * itemsize
                    need = resident_bytes + scoped + (1 << 22)
                    # one budget: guard and compiler limit from the same
                    # number (an undercount here only surfaces as a
                    # Mosaic compile failure, so keep them consistent)
                    if need > _RESIDENT_VMEM_BUDGET:
                        res_cache[nit] = None
                        return None

                    def sweep(prv, dpv, rhv, rows, emit):
                        """One full-grid damped Jacobi iteration, in
                        place on the VMEM scratch arrays."""
                        prev = prv[0:1, :]  # x=-1 garbage: row 0 is dead
                        err = None
                        for s in range(SR):
                            lo = s * BR
                            cur = prv[lo:lo + BR, :]
                            nxt = (prv[lo + BR:lo + BR + 1, :]
                                   if s + 1 < SR else cur[0:1, :])
                            p_ext = jnp.concatenate([prev, cur, nxt],
                                                    axis=0)
                            gx = lo + jax.lax.broadcasted_iota(
                                jnp.int32, (BR, 1), 0)
                            live = jnp.logical_and(gx >= 1, gx <= nx - 2)
                            q, d_new, resid = compute_slab_folded(
                                p_ext, dpv[lo:lo + BR, :],
                                rhv[lo:lo + BR, :], gx, live, *rows)
                            prev = cur[BR - 1:BR, :]  # old values (SSA)
                            prv[lo:lo + BR, :] = q
                            dpv[lo:lo + BR, :] = d_new
                            if emit:
                                rm = resid_max(resid, live, rows[0])
                                err = rm if err is None \
                                    else jnp.maximum(err, rm)
                        return err

                    def kernelR(pr_in, dpr_in, rhs_in, row0, row1, row2,
                                row3, row4, pr_out, dpr_out, err_out,
                                prv, dpv, rhv, sem_in, sem_out):
                        cps = [pltpu.make_async_copy(src, dst,
                                                     sem_in.at[i])
                               for i, (src, dst) in enumerate(
                                   ((pr_in, prv), (dpr_in, dpv),
                                    (rhs_in, rhv)))]
                        for c in cps:
                            c.start()
                        for c in cps:
                            c.wait()
                        rows = (row0, row1, row2, row3, row4)
                        if nit > 1:
                            jax.lax.fori_loop(
                                0, nit - 1,
                                lambda i, c: (sweep(prv, dpv, rhv, rows,
                                                    False), c)[1], 0)
                        err_out[0, 0] = sweep(prv, dpv, rhv, rows, True)
                        outs = [pltpu.make_async_copy(src, dst,
                                                      sem_out.at[i])
                                for i, (src, dst) in enumerate(
                                    ((prv, pr_out), (dpv, dpr_out)))]
                        for c in outs:
                            c.start()
                        for c in outs:
                            c.wait()

                    costR = pl.CostEstimate(
                        flops=nit * 20 * nx * W,
                        bytes_accessed=int(5 * NXP * W * itemsize),
                        transcendentals=0)
                    paramsR = pltpu.CompilerParams(
                        vmem_limit_bytes=int(min(
                            need, _RESIDENT_VMEM_BUDGET)))
                    pallas_res = pl.pallas_call(
                        kernelR,
                        out_shape=(slab_shape, slab_shape, err_shape),
                        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
                        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
                        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                                   pl.BlockSpec(memory_space=pl.ANY),
                                   pl.BlockSpec(
                                       memory_space=pltpu.SMEM)),
                        scratch_shapes=[
                            pltpu.VMEM((NXP, W), jdtype),
                            pltpu.VMEM((NXP, W), jdtype),
                            pltpu.VMEM((NXP, W), jdtype),
                            pltpu.SemaphoreType.DMA((3,)),
                            pltpu.SemaphoreType.DMA((2,)),
                        ],
                        input_output_aliases={0: 0, 1: 1},
                        compiler_params=paramsR,
                        cost_estimate=costR,
                        interpret=interpret,
                    )

                    def res_fn(pr_flat, dpr_flat, rhs_flat):
                        return pallas_res(pr_flat, dpr_flat, rhs_flat,
                                          *rows_c)

                    res_fn.nit = nit
                    res_cache[nit] = res_fn
                    return res_fn

                iter_fn.make_resident = make_resident

            def pack(pr, dprdtau, rhs3d):
                return zpack(pr), zpack(dprdtau), zpack(rhs3d)

            def unpack(pr_flat, dpr_flat):
                return unflat(pr_flat), unflat(dpr_flat)

        else:
            def kernel(*refs):
                his = refs[:M + 2]
                los = refs[M + 2:2 * (M + 2)]
                if dist:
                    (dpr, rhs, row0, row1, row2, row3, row4,
                     h_hlo, l_hlo, xoff, chk,
                     hi_out, lo_out, dpr_out, err_out) = refs[2 * (M + 2):]
                    x_off = xoff[0, 0]
                else:
                    (dpr, rhs, row0, row1, row2, row3, row4, chk,
                     hi_out, lo_out, dpr_out, err_out) = refs[2 * (M + 2):]
                    h_hlo = l_hlo = None
                    x_off = 0
                sidx = pl.program_id(0)
                gx, live = rows_of(sidx, x_off)
                h_ext = p_ext_of(sidx, his, h_hlo)
                l_ext = p_ext_of(sidx, los, l_hlo)
                q, ql, d_new, resid = slab_fn_ext(
                    h_ext, l_ext, dpr[:, :], rhs[:, :], gx, live,
                    row0, row1, row2, row3, row4)
                hi_out[:, :] = q
                lo_out[:, :] = ql
                dpr_out[:, :] = d_new

                @pl.when(chk[0, 0] != 0)
                def _():
                    emit_err(err_out, sidx,
                             resid_max(resid, live, row0))

            in_specs = [row_block(off) for off in range(-1, M + 1)]  # hi
            in_specs += [row_block(off) for off in range(-1, M + 1)]  # lo
            in_specs += [
                big_block(),                                  # dpr
                big_block(),                                  # rhs
                lane_row, lane_row, lane_row, lane_row, lane_row,
            ]
            if dist:
                in_specs += [lane_row, lane_row, smem_scalar]
            in_specs += [smem_scalar]                         # chk flag
            # same dpr in->out aliasing as the plain kernel
            pallas_iter = pl.pallas_call(
                kernel,
                grid=(G,),
                out_shape=(slab_shape, slab_shape, slab_shape, err_shape),
                in_specs=in_specs,
                out_specs=(big_block(), big_block(), big_block(),
                           err_block),
                input_output_aliases={2 * (M + 2): 2},
                compiler_params=compiler_params,
                cost_estimate=cost,
                interpret=interpret,
            )

            if dist:
                def iter_fn(hi_flat, lo_flat, dpr_flat, rhs_flat,
                            h_hlo, l_hlo, x_off, do_chk=None):
                    return pallas_iter(*([hi_flat] * (M + 2)),
                                       *([lo_flat] * (M + 2)),
                                       dpr_flat, rhs_flat, *rows_c,
                                       h_hlo, l_hlo, x_off,
                                       _as_flag(do_chk))
            else:
                def iter_fn(hi_flat, lo_flat, dpr_flat, rhs_flat,
                            do_chk=None):
                    return pallas_iter(*([hi_flat] * (M + 2)),
                                       *([lo_flat] * (M + 2)),
                                       dpr_flat, rhs_flat, *rows_c,
                                       _as_flag(do_chk))

            def pack(pr, dprdtau, rhs3d):
                return (zpack(pr), jnp.zeros((NXP, W), jdtype),
                        zpack(dprdtau), zpack(rhs3d))

            def unpack(hi_flat, lo_flat, dpr_flat):
                return unflat(hi_flat), unflat(lo_flat), unflat(dpr_flat)

        if not dist:
            # Residual check evaluated directly in the flattened (NXP, W)
            # layout: unpacking to (nx, ny, nz) for the jnp folded lap is
            # a lane-retiling transpose that costs ~15 ms per check on v5e
            # at 255^3-scale (measured: 453 ms of a 1.23 s step was checks,
            # benchmarks/step_breakdown.py) — the same masked
            # difference-first lap over lane rolls costs ~1 ms. The
            # arithmetic reproduces _folded_lap_fn's per-element order
            # exactly (mask-multiply then /dx/dx divisions) so iteration
            # counts keep matching the jnp folded backend.
            mk = lambda a: jnp.asarray(a.astype(np.dtype(dtype)))
            myp = mk(jrow != ny - 2)
            mym = mk(jrow != 1)
            mzp = mk(zrow != nz - 2)
            mzm = mk(zrow != 1)
            gcol = np.arange(1, NXP - 1)[:, None]  # global x of sliced rows
            mxm = mk((gcol != 1) if bc.zero_grad_x
                     else np.ones_like(gcol, bool))
            live_b = jnp.asarray((gcol <= nx - 2)
                                 & (yz_interior > 0).astype(bool))

            def flat_lap(p):
                pc = p[1:-1, :]
                xp = p[2:, :] - pc
                xm = p[:-2, :] - pc
                yp = jnp.roll(pc, -nz, 1) - pc
                ym = jnp.roll(pc, nz, 1) - pc
                zp = jnp.roll(pc, -1, 1) - pc
                zm = jnp.roll(pc, 1, 1) - pc
                return ((xp + mxm * xm) / dx / dx
                        + (myp * yp + mym * ym) / dy / dy
                        + (mzp * zp + mzm * zm) / dz / dz)

            if extended:
                def residual_flat(hi_flat, lo_flat, rhs_flat):
                    rp = ((flat_lap(hi_flat) - rhs_flat[1:-1, :])
                          + flat_lap(lo_flat))
                    return jnp.max(jnp.where(live_b, jnp.abs(rp), 0))
            else:
                def residual_flat(p_flat, rhs_flat):
                    rp = flat_lap(p_flat) - rhs_flat[1:-1, :]
                    return jnp.max(jnp.where(live_b, jnp.abs(rp), 0))

            iter_fn.residual_flat = residual_flat

            # --- compensated residual (defect-correction restarts) ---
            # A single f32 evaluation of lap(p) - rhs carries rounding
            # ~eps*|rhs|; at the showcase gpu preset |rhs|~5e7, flooring
            # the observable residual near 2e-3 in err units — above
            # eps_it. This evaluation tracks every first-order rounding
            # term (two_sum diffs, Dekker products against f64-split
            # weights, compensated accumulation), so its error is
            # ~eps*|resid| instead: accurate enough both to DEFINE the
            # correction problem lap(delta) = -r0 and to report an honest
            # final err. Runs once per restart (~1-2 fused HBM passes).
            spl = np.float32(4097.0)  # Veltkamp split factor, f32 (2^12+1)

            def _split(a):
                t = a * spl
                hi = t - (t - a)
                return hi, a - hi

            def _two_sum(a, b):
                s = a + b
                bp = s - a
                return s, (a - (s - bp)) + (b - bp)

            def _wpair(mask_row, h):
                """(1,W) f64 weight mask/h^2 as a (hi, lo, hi1, hi2) f32
                quad: hi+lo ~ f64 weight, (hi1, hi2) the Veltkamp split
                of hi (precomputed; Dekker needs both factors split)."""
                w64 = mask_row.astype(np.float64) / h / h
                w_hi = w64.astype(np.float32)
                w_lo = (w64 - w_hi).astype(np.float32)
                t = w_hi * np.float32(4097.0)
                w1 = t - (t - w_hi)
                w2 = w_hi - w1
                return tuple(map(mk, (w_hi, w_lo, w1, w2)))

            wq_yp = _wpair(jrow != ny - 2, dy)
            wq_ym = _wpair(jrow != 1, dy)
            wq_zp = _wpair(zrow != nz - 2, dz)
            wq_zm = _wpair(zrow != 1, dz)
            one_row = np.ones((1, W))
            wq_x = _wpair(one_row, dx)

            def _term(dh, dl, wq):
                """Exact-ish dh*w as a (prod, err) pair; dl folded in at
                first order."""
                w_hi, w_lo, w1, w2 = wq
                a1, a2 = _split(dh)
                p = dh * w_hi
                e = ((a1 * w1 - p) + a1 * w2 + a2 * w1) + a2 * w2
                e = e + (dh * w_lo + dl * w_hi)
                return p, e

            def compensated_residual(p_flat, rhs_flat, rhs_lo_flat=None):
                """rhs_lo_flat: optional low word of an (hi, lo) RHS pair
                (ops/ds.rhs_pair) — without it the f32 rounding of the
                RHS itself (~eps32*|rhs| ~ 7e-4 err units at the 255
                showcase) stays in the problem definition and caps how
                far the defect correction can honestly converge."""
                pc = p_flat[1:-1, :]
                pairs = []
                dh, dl = _two_sum(p_flat[2:, :], -pc)
                pairs.append(_term(dh, dl, wq_x))
                dh, dl = _two_sum(p_flat[:-2, :], -pc)
                if bc.zero_grad_x:
                    z = jnp.zeros_like(dh)
                    g1 = gcol == 1
                    dh = jnp.where(g1, z, dh)
                    dl = jnp.where(g1, z, dl)
                pairs.append(_term(dh, dl, wq_x))
                for shift, wq in ((-nz, wq_yp), (nz, wq_ym),
                                  (-1, wq_zp), (1, wq_zm)):
                    dh, dl = _two_sum(jnp.roll(pc, shift, 1), -pc)
                    pairs.append(_term(dh, dl, wq))
                rlo = (jnp.zeros_like(pc) if rhs_lo_flat is None
                       else -rhs_lo_flat[1:-1, :])
                pairs.append((-rhs_flat[1:-1, :], rlo))
                s, c = pairs[0]
                for p_i, e_i in pairs[1:]:
                    s, t = _two_sum(s, p_i)
                    c = c + (t + e_i)
                r = jnp.where(live_b, s + c, jnp.zeros_like(s))
                ring = jnp.zeros((1, W), r.dtype)
                r_full = jnp.concatenate([ring, r, ring], axis=0)
                return r_full, jnp.max(jnp.abs(r))

            iter_fn.compensated_residual = compensated_residual

    elif mode == "dma":
        def kernel(pr_pad, dpr, rhs, yzmask, jrow_r, zrow_r, xlo_r, xhi_r,
                   pr_out, dpr_out,
                   pr_buf, dpr_buf, rhs_buf, opr_buf, odpr_buf,
                   load_sems, store_sems):

            def loads(slot, s):
                return [
                    pltpu.make_async_copy(
                        pr_pad.at[pl.ds(s * B, B + 2)], pr_buf.at[slot],
                        load_sems.at[slot, 0]),
                    pltpu.make_async_copy(
                        dpr.at[pl.ds(s * B, B)], dpr_buf.at[slot],
                        load_sems.at[slot, 1]),
                    pltpu.make_async_copy(
                        rhs.at[pl.ds(s * B, B)], rhs_buf.at[slot],
                        load_sems.at[slot, 2]),
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

                gx = s * B + jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
                live = jnp.logical_and(gx >= 1, gx <= nx - 2)
                q, d_new, _ = compute_slab(
                    pr_buf[slot], dpr_buf[slot], rhs_buf[slot], gx, live,
                    yzmask, jrow_r, zrow_r, xlo_r, xhi_r)
                opr_buf[:] = q
                odpr_buf[:] = d_new
                st1 = pltpu.make_async_copy(
                    opr_buf, pr_out.at[pl.ds(s * B + 1, B)],
                    store_sems.at[0])
                st2 = pltpu.make_async_copy(
                    odpr_buf, dpr_out.at[pl.ds(s * B, B)], store_sems.at[1])
                st1.start()
                st2.start()
                st1.wait()
                st2.wait()
                return carry

            jax.lax.fori_loop(0, S, body, 0)

        pallas_iter = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((nx + 2, W), jdtype),
                jax.ShapeDtypeStruct((nx, W), jdtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)),
            scratch_shapes=[
                pltpu.VMEM((2, B + 2, W), jdtype),
                pltpu.VMEM((2, B, W), jdtype),
                pltpu.VMEM((2, B, W), jdtype),
                pltpu.VMEM((B, W), jdtype),
                pltpu.VMEM((B, W), jdtype),
                pltpu.SemaphoreType.DMA((2, 3)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )

        yzmask_c, jrow_c, zrow_c = map(jnp.asarray, (yz_interior, jrow, zrow))
        xlo_c, xhi_c = jnp.asarray(xlo), jnp.asarray(xhi)

        def iter_fn(pr_pad, dpr_flat, rhs_flat):
            return pallas_iter(pr_pad, dpr_flat, rhs_flat, yzmask_c, jrow_c,
                               zrow_c, xlo_c, xhi_c)

        def pack(pr, dprdtau, rhs3d):
            pr_pad = jnp.zeros((nx + 2, W), jdtype)
            pr_pad = pr_pad.at[1:nx + 1, :nyz].set(
                pr.reshape(nx, nyz).astype(jdtype))
            z = lambda a: jnp.zeros((nx, W), jdtype).at[:, :nyz].set(
                a.reshape(nx, nyz).astype(jdtype))
            return pr_pad, z(dprdtau), z(rhs3d)

        def unpack(pr_pad, dpr_flat):
            return (pr_pad[1:nx + 1, :nyz].reshape(nx, ny, nz),
                    dpr_flat[:, :nyz].reshape(nx, ny, nz))

    else:
        raise ValueError(f"unknown mode {mode!r}")

    iter_fn.slab = B
    iter_fn.mode = mode
    iter_fn.folded = folded
    iter_fn.mrows = M if mode == "blocked" else 1
    iter_fn.lane_tiles = T if mode == "blocked" else 1
    # blocked-mode iter_fn returns a trailing (1, 1) SMEM-accumulated
    # masked max|resid| of the ENTERING state, max-reduced across the
    # kernel's grid steps (see ptloop.pt_loop_fused)
    iter_fn.emits_err = mode == "blocked"
    return iter_fn, pack, unpack
