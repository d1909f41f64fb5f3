"""Raw-binary field dumps with reference format parity.

The reference's save_array (NavierStokes3D_multi_gpu.jl:27-30) writes the
gathered global inner fields as raw Float32, column-major (Julia memory
order), named `out_save/out_{C,Pr,Vx,Vy,Vz}_v_%04d.bin` (:515-523).

Julia arrays are column-major: A[i,j,k] with i fastest. NumPy is
row-major, so byte-for-byte parity requires Fortran-order serialization;
`save_array` does that. A C++ accelerated writer (csrc/) is used when
built (async, double-buffered); this module is the always-available path.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from . import native


def save_array(path_noext: str, a: np.ndarray, *,
               asynchronous: bool = False) -> str:
    """Write `a` as Float32 raw binary in Julia (column-major) element
    order to `path_noext + '.bin'`.

    Uses the native C++ runtime (cache-blocked transpose + background
    writer thread) when built; `asynchronous=True` queues the disk write
    so the step loop is not stalled — call io.native.drain() before
    reading frames back."""
    fname = path_noext + ".bin"
    arr = np.asarray(a)
    if arr.ndim == 3 and native.write_f32(fname, arr,
                                          asynchronous=asynchronous):
        return fname
    np.asarray(arr, dtype=np.float32).flatten(order="F").tofile(fname)
    return fname


def load_array(fname: str, shape, dtype=np.float32) -> np.ndarray:
    """Read back a reference-format .bin (column-major)."""
    flat = np.fromfile(fname, dtype=dtype)
    return flat.reshape(shape, order="F")


def save_fields(out_dir: str, iframe: int, fields: Dict[str, np.ndarray]):
    """Frame dump with the reference's naming:
    out_save/out_{name}_v_%04d.bin (NavierStokes3D_multi_gpu.jl:517-521)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, arr in fields.items():
        paths[name] = save_array(
            os.path.join(out_dir, f"out_{name}_v_{iframe:04d}"), arr)
    return paths
