"""Immersed elliptic-cylinder mask.

Reference: set_cylinder! (NavierStokes3D_gpu.jl:336-368 and
NavierStokes3D_multi_gpu.jl:249-281). The geometry is static, so instead of
re-evaluating per-cell coordinate math twice per time step on device, the
masks are precomputed once on the host as 2D (x,y) boolean planes (the
cylinder is extruded along z, so z never enters the inequality) and applied
as fused `where` selects:

  C  <- 1 where (xc,yc) inside 1.05 x radius   (tracer seed ring)
  Vi <- 0 where the component's own staggered location is inside the radius

`set_cylinder` is invoked twice per step, after the predictor and after the
corrector (NavierStokes3D_gpu.jl:123,139), exactly as in the reference.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..grid import Grid


@dataclasses.dataclass(frozen=True)
class CylinderMasks:
    """2D (x,y) masks, broadcast along z at application time."""
    mask_c: jnp.ndarray    # (nx, ny) bool
    mask_vx: jnp.ndarray   # (nx+1, ny) bool
    mask_vy: jnp.ndarray   # (nx, ny+1) bool
    mask_vz: jnp.ndarray   # (nx, ny) bool


def _inside(x, y, cfg: SimConfig, thresh: float) -> np.ndarray:
    phys = cfg.physics
    sinb, cosb = np.sin(phys.beta), np.cos(phys.beta)
    xr = (x - phys.ox) * cosb - (y - phys.oy) * sinb
    yr = (x - phys.ox) * sinb + (y - phys.oy) * cosb
    return (xr * xr / phys.a2 + yr * yr / phys.b2) < thresh


def build_masks(cfg: SimConfig, grid: Grid) -> CylinderMasks:
    """Evaluate the reference's per-location coordinate formulas.

    multi variant (NavierStokes3D_multi_gpu.jl:250-251):
        xc = xco_g + (ix-1) dx   with xco_g = -(lx-dx)/2 globally
        xv = xc - dx/2
    gpu variant (NavierStokes3D_gpu.jl:337-338):
        xv = (ix-1) dx - lx/2;  xc = xv + dx/2  (same xc/xv), but note the
        reference computes yc = yv + dx/2 — with dx, not dy. compat=True
        replicates that quirk (benign when ny = 0.6 nx exactly, so dx == dy).
    """
    nx, ny = grid.nx, grid.ny
    dx, dy = grid.dx, grid.dy
    # 1-based index arithmetic as in the reference kernels
    i_c = np.arange(1, nx + 2)   # covers both nx and nx+1 sized x-dims
    j_c = np.arange(1, ny + 2)
    xc = -(grid.lx - dx) / 2 + (i_c - 1) * dx
    yv_ = (j_c - 1) * dy - grid.ly / 2
    if cfg.variant == "gpu" and cfg.compat:
        yc = yv_ + dx / 2  # reference quirk: dx instead of dy (gpu.jl:338)
    else:
        yc = yv_ + dy / 2
    xv = xc - dx / 2

    def grid2d(xs, ys, shape):
        return np.broadcast_to(xs[: shape[0], None], shape) , \
               np.broadcast_to(ys[None, : shape[1]], shape)

    xcc, ycc = grid2d(xc, yc, (nx, ny))
    mask_c = _inside(xcc, ycc, cfg, 1.05)
    xvv, ycv = grid2d(xv, yc, (nx + 1, ny))
    mask_vx = _inside(xvv, ycv, cfg, 1.0)
    xcv, yvv = grid2d(xc, yv_, (nx, ny + 1))
    mask_vy = _inside(xcv, yvv, cfg, 1.0)
    mask_vz = _inside(xcc, ycc, cfg, 1.0)
    return CylinderMasks(
        mask_c=jnp.asarray(mask_c),
        mask_vx=jnp.asarray(mask_vx),
        mask_vy=jnp.asarray(mask_vy),
        mask_vz=jnp.asarray(mask_vz),
    )


def apply_cylinder(c, vx, vy, vz, masks: CylinderMasks):
    """C=1 inside the tracer ring; V=0 inside the solid (broadcast along z)."""
    one = jnp.ones((), dtype=c.dtype)
    zero = jnp.zeros((), dtype=c.dtype)
    c = jnp.where(masks.mask_c[:, :, None], one, c)
    vx = jnp.where(masks.mask_vx[:, :, None], zero, vx)
    vy = jnp.where(masks.mask_vy[:, :, None], zero, vy)
    vz = jnp.where(masks.mask_vz[:, :, None], zero, vz)
    return c, vx, vy, vz
