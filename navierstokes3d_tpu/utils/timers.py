"""Wall-clock and bandwidth accounting.

The reference has no timing/observability (SURVEY.md §5); this adds the
north-star metrics: time/step, Poisson iters/sec, and effective HBM
bandwidth vs the analytic roofline.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional


@dataclasses.dataclass
class StepRecord:
    it: int
    wall_s: float
    poisson_iters: int
    err: float


class RunTimer:
    def __init__(self):
        self.records: List[StepRecord] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self, it: int, poisson_iters: int, err: float) -> StepRecord:
        rec = StepRecord(it=it, wall_s=time.time() - self._t0,
                         poisson_iters=poisson_iters, err=err)
        self.records.append(rec)
        return rec

    def summary(self, skip_first: int = 1) -> dict:
        recs = self.records[skip_first:] or self.records
        if not recs:
            return {}
        total = sum(r.wall_s for r in recs)
        iters = sum(r.poisson_iters for r in recs)
        return {
            "steps": len(recs),
            "time_per_step_s": total / len(recs),
            "poisson_iters_per_sec": iters / total if total else 0.0,
            "total_wall_s": total,
        }


def poisson_roofline_iters_per_sec(cells: int, itemsize: int,
                                   hbm_gbps: float) -> float:
    """Minimum HBM traffic per damped-iteration: read Pr/dprdtau/divv,
    write Pr/dprdtau = 5 grid passes."""
    return hbm_gbps * 1e9 / (5 * cells * itemsize)
