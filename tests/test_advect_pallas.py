"""Pallas advect kernel (kernels/advect.py) vs the jnp selectshift backend.

The kernel claims BIT-IDENTICAL results (same weight expressions, same
(o, p, q) accumulation order — see the module docstring), so these tests
assert exact equality, not tolerances. Both sides run under jax.jit (the
production context): XLA's FMA contraction changes the jnp backend's own
results between eager and jitted execution (~1 ulp on ~20% of points), so
eager-vs-jit comparisons are the wrong baseline. Interpret mode on CPU;
f32 fields (the kernel's production dtype).
"""

import jax

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes3d_tpu.kernels.advect import build_advect
from navierstokes3d_tpu.ops.advect import advect


def _fields(nx, ny, nz, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    f = np.float32
    vx = jnp.asarray(rng.normal(size=(nx + 1, ny, nz)).astype(f) * scale)
    vy = jnp.asarray(rng.normal(size=(nx, ny + 1, nz)).astype(f) * scale)
    vz = jnp.asarray(rng.normal(size=(nx, ny, nz + 1)).astype(f) * scale)
    c = jnp.asarray(rng.uniform(size=(nx, ny, nz)).astype(f))
    return vx, vy, vz, c


def _compare(dims, dt, scale, k=2, seed=0):
    nx, ny, nz = dims
    dx, dy, dz = 1.0, 1.1, 0.95
    vx, vy, vz, c = _fields(nx, ny, nz, seed=seed, scale=scale)
    fn = build_advect(nx, ny, nz, dt, dx, dy, dz, k=k,
                      dtype=jnp.float32, interpret=True)
    got = jax.jit(fn)(vx, vy, vz, c)
    ref = jax.jit(lambda *A: advect(*A, dt, dx, dy, dz, compat=False,
                                    method="selectshift", with_stats=True,
                                    k=k))(vx, vy, vz, c)
    for name, a, b in zip("vx vy vz c".split(), got[:4], ref[:4]):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"{name} differs from jnp selectshift")
    assert int(got[4]) == int(ref[4])
    return int(got[4])


@pytest.mark.parametrize("dims", [(17, 9, 9), (12, 7, 5)])
def test_bitwise_vs_jnp(dims):
    """Sub-window displacements: exact equality, zero clamps."""
    n = _compare(dims, dt=0.9, scale=0.5)
    assert n == 0


def test_bitwise_with_clamps():
    """Displacements beyond k on some points: values still bit-equal
    (both backends clamp identically) and the counters agree."""
    n = _compare((16, 8, 8), dt=1.0, scale=3.0)
    assert n > 0


def test_bitwise_k3_and_padding_rows():
    """k=3 (the 8^3-term window) and an nx that forces row padding."""
    n = _compare((13, 6, 7), dt=0.8, scale=0.7, k=3, seed=2)
    assert n == 0


# ---- common-flat-layout variant (in-kernel face averages) ----

def _compare_flat(dims, dt, scale, k=2, seed=0):
    from navierstokes3d_tpu.kernels.advect import build_advect_flat
    nx, ny, nz = dims
    dx, dy, dz = 1.0, 1.1, 0.95
    vx, vy, vz, c = _fields(nx, ny, nz, seed=seed, scale=scale)
    fn = build_advect_flat(nx, ny, nz, dt, dx, dy, dz, k=k,
                           dtype=jnp.float32, interpret=True)
    got = jax.jit(fn.on3d)(vx, vy, vz, c)
    ref = jax.jit(lambda *A: advect(*A, dt, dx, dy, dz, compat=False,
                                    method="selectshift", with_stats=True,
                                    k=k))(vx, vy, vz, c)
    for name, a, b in zip("vx vy vz c".split(), got[:4], ref[:4]):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"{name} differs from jnp selectshift")
    assert int(got[4]) == int(ref[4])
    return int(got[4])


@pytest.mark.parametrize("dims", [(17, 9, 9), (12, 7, 5)])
def test_flat_bitwise_vs_jnp(dims):
    """Common-layout kernel with in-kernel face averages: the 0.25/0.5
    face-average scalings are exact powers of two, so the advecting
    velocities — and hence the full accumulation — stay bit-equal."""
    n = _compare_flat(dims, dt=0.9, scale=0.5)
    assert n == 0


def test_flat_bitwise_with_clamps():
    n = _compare_flat((16, 8, 8), dt=1.0, scale=3.0)
    assert n > 0


def test_flat_k3(dims=(13, 6, 7)):
    n = _compare_flat(dims, dt=0.8, scale=0.7, k=3, seed=2)
    assert n == 0
