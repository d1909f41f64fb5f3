"""Scalar-loop oracle: literal 1-based transcription of the reference kernels.

Each function here re-implements one @parallel kernel of
/root/reference/scripts/NavierStokes3D_{gpu,multi_gpu}.jl as plain Python
loops over 1-based indices, using a tiny Fortran-style accessor. This is
deliberately the *dumbest possible* implementation — an independent
derivation path from navierstokes3d_tpu/ops (which uses slicing) — so that
agreement between the two validates every iteration range, crop, and
floating-point expression.

Only used on tiny grids in tests; O(n^3) Python loops.
"""

from __future__ import annotations

import math

import numpy as np


class F:
    """1-based view over a numpy array (Julia indexing)."""

    def __init__(self, a):
        self.a = a

    def __getitem__(self, idx):
        return self.a[tuple(i - 1 for i in idx)]

    def __setitem__(self, idx, val):
        self.a[tuple(i - 1 for i in idx)] = val

    def size(self, d):  # Julia size(A, d), d 1-based
        return self.a.shape[d - 1]


def update_tau(vx, vy, vz, mu, dx, dy, dz):
    """NavierStokes3D_gpu.jl:177-185."""
    nx, ny, nz = vx.shape[0] - 1, vx.shape[1], vx.shape[2]
    txx = np.zeros((nx, ny, nz))
    tyy = np.zeros((nx, ny, nz))
    tzz = np.zeros((nx, ny, nz))
    txy = np.zeros((nx - 1, ny - 1, nz - 1))
    txz = np.zeros((nx - 1, ny - 1, nz - 1))
    tyz = np.zeros((nx - 1, ny - 1, nz - 1))
    Vx, Vy, Vz = F(vx), F(vy), F(vz)
    TXX, TYY, TZZ, TXY, TXZ, TYZ = F(txx), F(tyy), F(tzz), F(txy), F(txz), F(tyz)
    for i in range(1, nx + 1):
        for j in range(1, ny + 1):
            for k in range(1, nz + 1):
                dvx = (Vx[i + 1, j, k] - Vx[i, j, k]) / dx
                dvy = (Vy[i, j + 1, k] - Vy[i, j, k]) / dy
                dvz = (Vz[i, j, k + 1] - Vz[i, j, k]) / dz
                div = dvx + dvy + dvz
                TXX[i, j, k] = 2 * mu * (dvx - div / 3.0)
                TYY[i, j, k] = 2 * mu * (dvy - div / 3.0)
                TZZ[i, j, k] = 2 * mu * (dvz - div / 3.0)
    for i in range(1, nx):
        for j in range(1, ny):
            for k in range(1, nz):
                # @d_yi(Vx): Vx[i+1,j+1,k+1]-Vx[i+1,j,k+1]
                TXY[i, j, k] = mu * (
                    (Vx[i + 1, j + 1, k + 1] - Vx[i + 1, j, k + 1]) / dy
                    + (Vy[i + 1, j + 1, k + 1] - Vy[i, j + 1, k + 1]) / dx)
                TXZ[i, j, k] = mu * (
                    (Vx[i + 1, j + 1, k + 1] - Vx[i + 1, j + 1, k]) / dz
                    + (Vz[i + 1, j + 1, k + 1] - Vz[i, j + 1, k + 1]) / dx)
                TYZ[i, j, k] = mu * (
                    (Vy[i + 1, j + 1, k + 1] - Vy[i + 1, j + 1, k]) / dz
                    + (Vz[i + 1, j + 1, k + 1] - Vz[i + 1, j, k + 1]) / dy)
    return txx, tyy, tzz, txy, txz, tyz


def predict_v(vx, vy, vz, txx, tyy, tzz, txy, txz, tyz, rho, g, dt, dx, dy, dz):
    """NavierStokes3D_gpu.jl:187-192 (interior/@inn updates)."""
    vx, vy, vz = vx.copy(), vy.copy(), vz.copy()
    Vx, Vy, Vz = F(vx), F(vy), F(vz)
    TXX, TYY, TZZ, TXY, TXZ, TYZ = map(F, (txx, tyy, tzz, txy, txz, tyz))
    # @inn(Vx) over (size(Vx)-2)
    for i in range(1, Vx.size(1) - 1):
        for j in range(1, Vx.size(2) - 1):
            for k in range(1, Vx.size(3) - 1):
                Vx[i + 1, j + 1, k + 1] = Vx[i + 1, j + 1, k + 1] + dt / rho * (
                    (TXX[i + 1, j + 1, k + 1] - TXX[i, j + 1, k + 1]) / dx
                    + (TXY[i, j + 1, k] - TXY[i, j, k]) / dy
                    + (TXZ[i, j, k + 1] - TXZ[i, j, k]) / dz)
    for i in range(1, Vy.size(1) - 1):
        for j in range(1, Vy.size(2) - 1):
            for k in range(1, Vy.size(3) - 1):
                Vy[i + 1, j + 1, k + 1] = Vy[i + 1, j + 1, k + 1] + dt / rho * (
                    (TYY[i + 1, j + 1, k + 1] - TYY[i + 1, j, k + 1]) / dy
                    + (TXY[i + 1, j, k] - TXY[i, j, k]) / dx
                    + (TYZ[i, j, k + 1] - TYZ[i, j, k]) / dz)
    for i in range(1, Vz.size(1) - 1):
        for j in range(1, Vz.size(2) - 1):
            for k in range(1, Vz.size(3) - 1):
                Vz[i + 1, j + 1, k + 1] = Vz[i + 1, j + 1, k + 1] + dt / rho * (
                    (TZZ[i + 1, j + 1, k + 1] - TZZ[i + 1, j + 1, k]) / dz
                    + (TXZ[i + 1, j, k] - TXZ[i, j, k]) / dx
                    + (TYZ[i, j + 1, k] - TYZ[i, j, k]) / dy
                    - rho * g)
    return vx, vy, vz


def update_divv(vx, vy, vz, dx, dy, dz):
    """NavierStokes3D_gpu.jl:194-197."""
    nx, ny, nz = vx.shape[0] - 1, vx.shape[1], vx.shape[2]
    out = np.zeros((nx, ny, nz))
    Vx, Vy, Vz, O = F(vx), F(vy), F(vz), F(out)
    for i in range(1, nx + 1):
        for j in range(1, ny + 1):
            for k in range(1, nz + 1):
                O[i, j, k] = ((Vx[i + 1, j, k] - Vx[i, j, k]) / dx
                              + (Vy[i, j + 1, k] - Vy[i, j, k]) / dy
                              + (Vz[i, j, k + 1] - Vz[i, j, k]) / dz)
    return out


def poisson_iter(pr, dprdtau_inner, divv, rho, dt, dtau, damp, dx, dy, dz):
    """update_dPrdτ! + update_Pr! (NavierStokes3D_gpu.jl:199-207).

    dprdtau_inner has the reference's (nx-2,ny-2,nz-2) shape.
    """
    pr = pr.copy()
    dpr = dprdtau_inner.copy()
    nx, ny, nz = pr.shape
    P, D, G = F(pr), F(dpr), F(divv)
    for i in range(1, nx - 1):
        for j in range(1, ny - 1):
            for k in range(1, nz - 1):
                lap = ((P[i + 2, j + 1, k + 1] - 2 * P[i + 1, j + 1, k + 1]
                        + P[i, j + 1, k + 1]) / dx / dx
                       + (P[i + 1, j + 2, k + 1] - 2 * P[i + 1, j + 1, k + 1]
                          + P[i + 1, j, k + 1]) / dy / dy
                       + (P[i + 1, j + 1, k + 2] - 2 * P[i + 1, j + 1, k + 1]
                          + P[i + 1, j + 1, k]) / dz / dz)
                D[i, j, k] = D[i, j, k] * (1.0 - damp) + dtau * (
                    lap - rho / dt * G[i + 1, j + 1, k + 1])
    for i in range(1, nx - 1):
        for j in range(1, ny - 1):
            for k in range(1, nz - 1):
                P[i + 1, j + 1, k + 1] = P[i + 1, j + 1, k + 1] + dtau * D[i, j, k]
    return pr, dpr


def compute_res(pr, divv, rho, dt, dx, dy, dz):
    """compute_res! (NavierStokes3D_gpu.jl:209-212)."""
    nx, ny, nz = pr.shape
    rp = np.zeros((nx - 2, ny - 2, nz - 2))
    P, G, R = F(pr), F(divv), F(rp)
    for i in range(1, nx - 1):
        for j in range(1, ny - 1):
            for k in range(1, nz - 1):
                R[i, j, k] = ((P[i + 2, j + 1, k + 1] - 2 * P[i + 1, j + 1, k + 1]
                               + P[i, j + 1, k + 1]) / dx / dx
                              + (P[i + 1, j + 2, k + 1] - 2 * P[i + 1, j + 1, k + 1]
                                 + P[i + 1, j, k + 1]) / dy / dy
                              + (P[i + 1, j + 1, k + 2] - 2 * P[i + 1, j + 1, k + 1]
                                 + P[i + 1, j + 1, k]) / dz / dz
                              - rho / dt * G[i + 1, j + 1, k + 1])
    return rp


def correct_v(vx, vy, vz, pr, dt, rho, dx, dy, dz):
    """correct_V! (NavierStokes3D_gpu.jl:214-219)."""
    vx, vy, vz = vx.copy(), vy.copy(), vz.copy()
    Vx, Vy, Vz, P = F(vx), F(vy), F(vz), F(pr)
    for i in range(1, Vx.size(1) - 1):
        for j in range(1, Vx.size(2) - 1):
            for k in range(1, Vx.size(3) - 1):
                Vx[i + 1, j + 1, k + 1] -= dt / rho * (
                    P[i + 1, j + 1, k + 1] - P[i, j + 1, k + 1]) / dx
    for i in range(1, Vy.size(1) - 1):
        for j in range(1, Vy.size(2) - 1):
            for k in range(1, Vy.size(3) - 1):
                Vy[i + 1, j + 1, k + 1] -= dt / rho * (
                    P[i + 1, j + 1, k + 1] - P[i + 1, j, k + 1]) / dy
    for i in range(1, Vz.size(1) - 1):
        for j in range(1, Vz.size(2) - 1):
            for k in range(1, Vz.size(3) - 1):
                Vz[i + 1, j + 1, k + 1] -= dt / rho * (
                    P[i + 1, j + 1, k + 1] - P[i + 1, j + 1, k]) / dz
    return vx, vy, vz


def _lerp(a, b, t):
    return b * t + a * (1 - t)


def _backtrack(A, A_o, vxc, vyc, vzc, dt, dx, dy, dz, ix, iy, iz):
    """backtrack! (NavierStokes3D_gpu.jl:288-304). A, A_o: F views."""
    dlx, dly, dlz = dt * vxc / dx, dt * vyc / dy, dt * vzc / dz
    ix1 = min(max(math.floor(ix - dlx), 1), A.size(1))
    iy1 = min(max(math.floor(iy - dly), 1), A.size(2))
    iz1 = min(max(math.floor(iz - dlz), 1), A.size(3))
    ix2 = min(max(ix1 + 1, 1), A.size(1))
    iy2 = min(max(iy1 + 1, 1), A.size(2))
    iz2 = min(max(iz1 + 1, 1), A.size(3))
    dlx = (1.0 if dlx > 0 else 0.0) - math.fmod(dlx, 1.0)
    dly = (1.0 if dly > 0 else 0.0) - math.fmod(dly, 1.0)
    dlz = (1.0 if dlz > 0 else 0.0) - math.fmod(dlz, 1.0)
    fy1z1 = _lerp(A_o[ix1, iy1, iz1], A_o[ix2, iy1, iz1], dlx)
    fy1z2 = _lerp(A_o[ix1, iy1, iz2], A_o[ix2, iy1, iz2], dlx)
    fy2z1 = _lerp(A_o[ix1, iy2, iz1], A_o[ix2, iy2, iz1], dlx)
    fy2z2 = _lerp(A_o[ix1, iy2, iz2], A_o[ix2, iy2, iz2], dlx)
    fz1 = _lerp(fy1z1, fy2z1, dly)
    fz2 = _lerp(fy1z2, fy2z2, dly)
    A[ix, iy, iz] = _lerp(fz1, fz2, dlz)


def advect(vx, vy, vz, c, dt, dx, dy, dz, compat=True):
    """advect! (NavierStokes3D_gpu.jl:308-334). Inputs are the *_o snapshots;
    returns the advected fields. compat=True keeps the Vy/Vz branch bug
    (:325); compat=False advects Vz properly."""
    vx_o, vy_o, vz_o, c_o = vx.copy(), vy.copy(), vz.copy(), c.copy()
    vx, vy, vz, c = vx.copy(), vy.copy(), vz.copy(), c.copy()
    Vx, Vy, Vz, C = F(vx), F(vy), F(vz), F(c)
    Vxo, Vyo, Vzo, Co = F(vx_o), F(vy_o), F(vz_o), F(c_o)
    # @parallel launch ranges span the largest array: (nx+1, ny+1, nz+1)
    n1 = max(vx.shape[0], vy.shape[0], vz.shape[0], c.shape[0])
    n2 = max(vx.shape[1], vy.shape[1], vz.shape[1], c.shape[1])
    n3 = max(vx.shape[2], vy.shape[2], vz.shape[2], c.shape[2])
    for ix in range(1, n1 + 1):
        for iy in range(1, n2 + 1):
            for iz in range(1, n3 + 1):
                if 1 < ix < Vx.size(1) and iy <= Vx.size(2) and iz <= Vx.size(3):
                    vxc = Vxo[ix, iy, iz]
                    vyc = 0.25 * (Vyo[ix - 1, iy, iz] + Vyo[ix - 1, iy + 1, iz]
                                  + Vyo[ix, iy, iz] + Vyo[ix, iy + 1, iz])
                    vzc = 0.25 * (Vzo[ix - 1, iy, iz] + Vzo[ix - 1, iy, iz + 1]
                                  + Vzo[ix, iy, iz] + Vzo[ix, iy, iz + 1])
                    _backtrack(Vx, Vxo, vxc, vyc, vzc, dt, dx, dy, dz, ix, iy, iz)
                if 1 < iy < Vy.size(2) and ix <= Vy.size(1) and iz <= Vy.size(3):
                    vxc = 0.25 * (Vxo[ix, iy - 1, iz] + Vxo[ix + 1, iy - 1, iz]
                                  + Vxo[ix, iy, iz] + Vxo[ix + 1, iy, iz])
                    vyc = Vyo[ix, iy, iz]
                    vzc = 0.25 * (Vzo[ix, iy - 1, iz] + Vzo[ix, iy - 1, iz + 1]
                                  + Vzo[ix, iy, iz] + Vzo[ix, iy, iz + 1])
                    _backtrack(Vy, Vyo, vxc, vyc, vzc, dt, dx, dy, dz, ix, iy, iz)
                if 1 < iz < Vz.size(3) and ix <= Vz.size(1) and iy <= Vz.size(2):
                    vxc = 0.25 * (Vxo[ix, iy, iz - 1] + Vxo[ix + 1, iy, iz - 1]
                                  + Vxo[ix, iy, iz] + Vxo[ix + 1, iy, iz])
                    vyc = 0.25 * (Vyo[ix, iy, iz - 1] + Vyo[ix, iy + 1, iz - 1]
                                  + Vyo[ix, iy, iz] + Vyo[ix, iy + 1, iz])
                    vzc = Vzo[ix, iy, iz]
                    if compat:  # reference bug: writes Vy from Vy_o (:325)
                        _backtrack(Vy, Vyo, vxc, vyc, vzc, dt, dx, dy, dz, ix, iy, iz)
                    else:
                        _backtrack(Vz, Vzo, vxc, vyc, vzc, dt, dx, dy, dz, ix, iy, iz)
                if ix <= C.size(1) and iy <= C.size(2) and iz <= C.size(3):
                    vxc = 0.5 * (Vxo[ix, iy, iz] + Vxo[ix + 1, iy, iz])
                    vyc = 0.5 * (Vyo[ix, iy, iz] + Vyo[ix, iy + 1, iz])
                    vzc = 0.5 * (Vzo[ix, iy, iz] + Vzo[ix, iy, iz + 1])
                    _backtrack(C, Co, vxc, vyc, vzc, dt, dx, dy, dz, ix, iy, iz)
    return vx, vy, vz, c


def set_cylinder(c, vx, vy, vz, a2, b2, ox, oy, sinb, cosb, lx, ly, lz,
                 dx, dy, dz, variant="multi"):
    """set_cylinder! — multi coords (multi_gpu.jl:249-281) or gpu coords
    with the yc = yv + dx/2 quirk (gpu.jl:336-368)."""
    c, vx, vy, vz = c.copy(), vx.copy(), vy.copy(), vz.copy()
    C, Vx, Vy, Vz = F(c), F(vx), F(vy), F(vz)
    n1, n2, n3 = vx.shape[0], vy.shape[1], vz.shape[2]
    xco = -(lx - dx) / 2  # x_g(1,dx,C) - (lx-dx)/2 with x_g(1)=0, rank 0
    yco = -(ly - dy) / 2
    for ix in range(1, n1 + 1):
        for iy in range(1, n2 + 1):
            for iz in range(1, n3 + 1):
                if variant == "multi":
                    xc = xco + (ix - 1) * dx
                    yc = yco + (iy - 1) * dy
                    xv, yv = xc - dx / 2, yc - dy / 2
                else:
                    xv = (ix - 1) * dx - lx / 2
                    yv = (iy - 1) * dy - ly / 2
                    xc = xv + dx / 2
                    yc = yv + dx / 2  # reference quirk (gpu.jl:338)
                def inside(x, y, th):
                    xr = (x - ox) * cosb - (y - oy) * sinb
                    yr = (x - ox) * sinb + (y - oy) * cosb
                    return xr * xr / a2 + yr * yr / b2 < th
                if ix <= C.size(1) and iy <= C.size(2) and iz <= C.size(3):
                    if inside(xc, yc, 1.05):
                        C[ix, iy, iz] = 1.0
                if ix <= Vx.size(1) and iy <= Vx.size(2) and iz <= Vx.size(3):
                    if inside(xv, yc, 1.0):
                        Vx[ix, iy, iz] = 0.0
                if ix <= Vy.size(1) and iy <= Vy.size(2) and iz <= Vy.size(3):
                    if inside(xc, yv, 1.0):
                        Vy[ix, iy, iz] = 0.0
                if ix <= Vz.size(1) and iy <= Vz.size(2) and iz <= Vz.size(3):
                    if inside(xc, yc, 1.0):
                        Vz[ix, iy, iz] = 0.0
    return c, vx, vy, vz


def set_bc_vel_multi(vx, vy, vz, vin, compat=True):
    """set_bc_Vel! (NavierStokes3D_multi_gpu.jl:156-169), single rank."""
    vx, vy, vz = vx.copy(), vy.copy(), vz.copy()
    for a in (vx,):
        a[0, :, :] = a[1, :, :]; a[-1, :, :] = a[-2, :, :]
        a[:, 0, :] = a[:, 1, :]; a[:, -1, :] = a[:, -2, :]
        a[:, :, 0] = a[:, :, 1]; a[:, :, -1] = a[:, :, -2]
    vy[0, :, :] = vy[1, :, :]; vy[-1, :, :] = vy[-2, :, :]
    if not compat:
        vy[:, 0, :] = vy[:, 1, :]; vy[:, -1, :] = vy[:, -2, :]
    vy[:, :, 0] = vy[:, :, 1]; vy[:, :, -1] = vy[:, :, -2]
    vz[0, :, :] = vz[1, :, :]; vz[-1, :, :] = vz[-2, :, :]
    vz[:, 0, :] = vz[:, 1, :]; vz[:, -1, :] = vz[:, -2, :]
    if not compat:
        vz[:, :, 0] = vz[:, :, 1]; vz[:, :, -1] = vz[:, :, -2]
    vx[0, :, :] = vin
    return vx, vy, vz


def set_bc_pr_multi(pr):
    """set_bc_Pr! (NavierStokes3D_multi_gpu.jl:175-184), single rank."""
    pr = pr.copy()
    pr[0, :, :] = pr[1, :, :]; pr[-1, :, :] = pr[-2, :, :]
    pr[:, 0, :] = pr[:, 1, :]; pr[:, -1, :] = pr[:, -2, :]
    pr[:, :, 0] = pr[:, :, 1]; pr[:, :, -1] = pr[:, :, -2]
    pr[-1, :, :] = 0.0
    return pr


def set_bc_vel_gpu(vx, vy, vz):
    """set_bc_Vel! (NavierStokes3D_gpu.jl:264-279)."""
    out = []
    for a in (vx, vy, vz):
        a = a.copy()
        a[0, :, :] = a[1, :, :]; a[-1, :, :] = a[-2, :, :]
        a[:, 0, :] = a[:, 1, :]; a[:, -1, :] = a[:, -2, :]
        a[:, :, 0] = 0.0; a[:, :, -1] = a[:, :, -2]   # bc_zV!
        out.append(a)
    return tuple(out)


def set_bc_pr_gpu(pr, dz, nz, g, rho):
    """set_bc_Pr! (NavierStokes3D_gpu.jl:281-286)."""
    pr = pr.copy()
    pr[:, 0, :] = pr[:, 1, :]; pr[:, -1, :] = pr[:, -2, :]
    pr[:, :, 0] = pr[:, :, 1]; pr[:, :, -1] = pr[:, :, -2]
    P = F(pr)
    for iy in range(1, pr.shape[1] + 1):
        for iz in range(1, pr.shape[2] + 1):
            P[1, iy, iz] = rho * g * (nz - iz + 0.5) * dz + 100
            P[pr.shape[0], iy, iz] = rho * g * (nz - iz + 0.5) * dz
    return pr


def run_multi(nx=9, nt=2, compat=True):
    """Full reference time loop, multi variant, single rank — literal
    transcription of run_navierstokes3D (NavierStokes3D_multi_gpu.jl:287-536)
    composed from the scalar kernels above. Tiny grids only."""
    lx, rho, vin, mu = 1.0, 1000.0, 1.0, 0.001
    psc = rho * vin**2
    ly_lx = lz_lx = 0.6
    ly, lz = ly_lx * lx, lz_lx * lx
    ox, oy = -0.4 * lx, 0.0
    g = 0.0  # Fr = Inf (:301,316)
    a2 = b2 = (0.05 * lx) ** 2
    sinb, cosb = 0.0, 1.0
    ny, nz = math.ceil(nx * ly_lx), math.ceil(nx * lz_lx)
    eps_it = 1e-3
    niter = 50 * max(nx, ny, nz)
    nchk = ny - 1
    dx, dy, dz = lx / nx, ly / ny, lz / nz
    dt = min((1 / 4.1) * max(dx, dy, dz) ** 2 * rho / mu,
             1.0 * max(dx, dy, dz) / vin)
    damp = 2 / nx
    dtau = (1.0 / math.sqrt(3.1)) * max(dx, dy, dz)

    pr = np.zeros((nx, ny, nz))
    dpr = np.zeros((nx - 2, ny - 2, nz - 2))
    c = np.zeros((nx, ny, nz))
    vx = np.zeros((nx + 1, ny, nz))
    vy = np.zeros((nx, ny + 1, nz))
    vz = np.zeros((nx, ny, nz + 1))
    # init (:368-373); z_g(iz) = (iz-1) dz on rank 0
    if compat:
        vy[0, :, :] = vin
    else:
        vx[0, :, :] = vin
    for iz in range(1, nz + 1):
        pr[:, :, iz - 1] = -(((iz - 1) * dz) - dz / 2) * rho * g
    c, vx, vy, vz = set_cylinder(c, vx, vy, vz, a2, b2, ox, oy, sinb, cosb,
                                 lx, ly, lz, dx, dy, dz, variant="multi")
    iters_hist = []
    for _ in range(nt):
        taus = update_tau(vx, vy, vz, mu, dx, dy, dz)
        vx, vy, vz = predict_v(vx, vy, vz, *taus, rho, g, dt, dx, dy, dz)
        c, vx, vy, vz = set_cylinder(c, vx, vy, vz, a2, b2, ox, oy, sinb,
                                     cosb, lx, ly, lz, dx, dy, dz,
                                     variant="multi")
        divv = update_divv(vx, vy, vz, dx, dy, dz)
        it_done = 0
        for itr in range(1, niter + 1):
            pr, dpr = poisson_iter(pr, dpr, divv, rho, dt, dtau, damp,
                                   dx, dy, dz)
            pr = set_bc_pr_multi(pr)
            it_done = itr
            if itr % nchk == 0:
                rp = compute_res(pr, divv, rho, dt, dx, dy, dz)
                err = np.max(np.abs(rp)) * (ly * ly) / psc
                if err < eps_it or not np.isfinite(err):
                    break
        iters_hist.append(it_done)
        vx, vy, vz = correct_v(vx, vy, vz, pr, dt, rho, dx, dy, dz)
        c, vx, vy, vz = set_cylinder(c, vx, vy, vz, a2, b2, ox, oy, sinb,
                                     cosb, lx, ly, lz, dx, dy, dz,
                                     variant="multi")
        vx, vy, vz = set_bc_vel_multi(vx, vy, vz, vin, compat=compat)
        vx, vy, vz, c = advect(vx, vy, vz, c, dt, dx, dy, dz, compat=compat)
    return dict(pr=pr, vx=vx, vy=vy, vz=vz, c=c, dpr=dpr,
                iters=iters_hist)
