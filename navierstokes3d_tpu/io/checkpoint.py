"""Checkpoint / resume.

The reference can only save (raw .bin / .mat dumps with no loader,
SURVEY.md §5); with functional state, resume is trivial and added here:
a single .npz holds every FlowState field plus step metadata, and
`load_checkpoint` reconstructs the exact state (same dtype) so a resumed
run continues bit-for-bit from where it stopped.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..state import FlowState

_FIELDS = ("pr", "vx", "vy", "vz", "c", "dprdtau")


def save_checkpoint(path: str, state: FlowState, it: int,
                    pressure_split: bool = False) -> str:
    """pressure_split records whether state.pr stores p' = Pr - P_static(z)
    (NumericsConfig.pressure_split); a resume must use the same convention."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrs = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    if state.pr_lo is not None:
        # stored-pressure pair low word (FlowState.pr_lo): resume keeps
        # the stored state's converged-residual property bit-for-bit
        arrs["pr_lo"] = np.asarray(state.pr_lo)
    np.savez(path, it=np.int64(it),
             pressure_split=np.bool_(pressure_split), **arrs)
    return path if path.endswith(".npz") else path + ".npz"


def load_checkpoint(path: str, dtype=None,
                    expect_pressure_split: bool | None = None
                    ) -> Tuple[FlowState, int]:
    with np.load(path) as z:
        arrs = {f: z[f] for f in _FIELDS}
        if "pr_lo" in z:
            arrs["pr_lo"] = z["pr_lo"]
        it = int(z["it"])
        split = bool(z["pressure_split"]) if "pressure_split" in z else False
    if expect_pressure_split is not None and split != expect_pressure_split:
        raise ValueError(
            f"checkpoint {path} stores pressure_split={split} but the "
            f"solver expects {expect_pressure_split}; resume with a "
            "matching NumericsConfig.pressure_split")
    if dtype is not None:
        arrs = {k: v.astype(dtype) for k, v in arrs.items()}
    return FlowState(**{k: jnp.asarray(v) for k, v in arrs.items()}), it


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [f for f in os.listdir(ckpt_dir)
             if f.startswith("ckpt_") and f.endswith(".npz")]
    if not cands:
        return None
    return os.path.join(ckpt_dir, max(cands))
