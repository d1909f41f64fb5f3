"""Chorin projection solver: the full time step as one jittable function.

Step structure (reference: the time loop at NavierStokes3D_gpu.jl:119-171 /
NavierStokes3D_multi_gpu.jl:446-477):

  1. viscous stress + predictor            update_τ! / predict_V!
  2. immersed cylinder mask                set_cylinder!
  3. divergence (Poisson RHS)              update_∇V!
  4. pseudo-transient Poisson solve        update_dPrdτ!/update_Pr!/set_bc_Pr!
     with residual checks every nchk iterations and early exit
  5. velocity correction + cylinder + BCs  correct_V!/set_cylinder!/set_bc_Vel!
  6. semi-Lagrangian advection             advect!

The reference's Poisson loop syncs to the host at every residual check
(gpu.jl:132). Here the entire solve — including the convergence check and,
on a sharded run, the cross-device max-reduction — lives inside one
lax.while_loop under jit: zero host round-trips per step.

Loop equivalence with the reference's `for iter=1:niter ... break`:
  * run chunks of nchk iterations; after each chunk compute err; stop when
    err < eps_it, err non-finite, or niter//nchk chunks done;
  * if never converged, run the trailing niter % nchk iterations unchecked
    (the reference's final partial chunk).
"""

from __future__ import annotations

import os
import warnings
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..bc import make_bc_fns, make_bc_pr_pair
from ..config import SimConfig
from ..grid import Grid, make_grid
from ..ops import ds as dsops
from ..ops import physics as ph
from ..ops.advect import advect
from ..ops.cylinder import CylinderMasks, apply_cylinder, build_masks
from ..ptloop import pt_loop, pt_loop_fused
from ..state import FlowState, StepStats, zeros_state

# Widest select-shift window the fused Pallas advection kernels support:
# the fully unrolled (2k+2)^3-term accumulation blows Mosaic register
# allocation past this (measured: 853MB of spill slots at k=6 on the 255
# grid). Wider windows run the jnp backend (XLA slices scale to any k).
MAX_PALLAS_ADVECT_K = 3


def _two_sum(a, b):
    """Knuth two_sum: s = fl(a + b), e such that a + b = s + e exactly."""
    s = a + b
    ap = s - b
    bp = s - ap
    return s, (a - ap) + (b - bp)


class ChorinSolver:
    """Owns config-derived constants, masks and BC closures; exposes pure
    jittable `init_state`, `step`, and `poisson_solve`."""

    def __init__(self, cfg: SimConfig):
        self.cfg = cfg
        self.grid: Grid = make_grid(cfg)
        self.dtype = cfg.numerics.jnp_dtype
        if self.dtype == jnp.float64 and not jax.config.jax_enable_x64:
            raise RuntimeError(
                "float64 requested but jax_enable_x64 is off; set "
                "jax.config.update('jax_enable_x64', True) or use float32.")
        self.masks: CylinderMasks = build_masks(cfg, self.grid)
        self._init_split()
        self.set_bc_vel, self.set_bc_pr = make_bc_fns(
            cfg, self.grid, pressure_split=self.pressure_split)
        # (hi, lo) image of set_bc_pr for the stored pressure pair
        # (FlowState.pr_lo); only the f32 accuracy phases consume it.
        self.set_bc_pr_pair = make_bc_pr_pair(
            cfg, self.grid, pressure_split=self.pressure_split)
        stall_on = cfg.numerics.stall_exit
        if stall_on is None:
            stall_on = not cfg.compat
        self._stall = ((cfg.numerics.stall_ratio, cfg.numerics.stall_checks)
                       if stall_on else None)
        # advection backend: the bounded-window select-shift form is ~13x
        # faster than XLA gathers on TPU; compat keeps the literal gather
        # semantics (unbounded displacement clamping).
        on_accel = (jax.default_backend() not in ("cpu",)
                    or os.environ.get("NS3D_FUSED_INTERPRET") == "1")
        self.advect_method = os.environ.get(
            "NS3D_ADVECT",
            "selectshift" if (on_accel and not cfg.compat) else "gather")
        # select-shift window: (2k+2)^3 accumulation terms dominate the
        # non-Poisson VPU cost; k=2 is a 2x margin over the CFL_adv=1
        # displacement bound (ops/advect.py), clamp-counted beyond.
        self.advect_k = int(os.environ.get("NS3D_ADVECT_K", "2"))
        self._init_pallas()
        self._init_advect_pallas()
        self._init_fused_step()
        # flat-state mode (NumericsConfig.flat_state): carry vx/vy/vz/c
        # between steps in the fused chain's (NXP, W) layout — requires
        # the full chain (the step must be _step_chained end to end)
        self.flat_state = bool(cfg.numerics.flat_state
                               and self._advect_flat is not None
                               and self.advect_method == "selectshift"
                               and cfg.parallel.mesh_shape == (1, 1, 1))
        if cfg.numerics.flat_state and not self.flat_state:
            warnings.warn(
                "flat_state requested but the fused flat chain is "
                "unavailable on this config (compat/f64/over-wide grid, "
                "non-selectshift advection, or a >1-device mesh — the "
                "distributed schedules own their layouts); keeping "
                "canonical 3D state", RuntimeWarning)
        # fdm backend: two classes of full-grid data must enter jitted
        # steps as RUNTIME ARGUMENTS, never closure constants — anything
        # closed over concretely is (a) evaluated eagerly at trace time
        # if operated on, and (b) inlined into the lowered program as a
        # literal. At the 511 grid that meant 4 copies of the 3-D
        # eigenvalue sum (one per modal_scale call site) plus the static
        # boundary field — ~1 GB of literals, which the axon
        # remote-compile endpoint rejects with HTTP 413. The threaded
        # aux dict carries the 1-D eigenvalue vectors (the 3-D sum is
        # then STAGED and built on device) and, for the gpu variant, the
        # host-f64-solved static boundary field (_build_fdm_static).
        # _fdm_aux_arg holds the threaded tracers for the duration of a
        # trace; unjitted steps fall back to the concrete closures.
        self._fdm_static = None
        self._fdm_aux = None
        self._fdm_aux_arg = None
        if cfg.numerics.poisson_backend == "fdm":
            from ..ops.fdm_poisson import build_fdm_solver
            self._fdm_solve = build_fdm_solver(self.grid, cfg.variant,
                                               self.dtype)
            aux = {"eigs": self._fdm_solve.eig_consts}
            if cfg.variant == "gpu":
                self._fdm_static = self._build_fdm_static()
                aux["static"] = self._fdm_static
            self._fdm_aux = aux
        if self._fdm_aux is None:
            self.step_jit = jax.jit(self.step, donate_argnums=0)
        else:
            inner = jax.jit(self._step_fdm_aux, donate_argnums=0)
            # device_put LAZILY on first step (constructing a solver must
            # not touch the device); cached so later steps reuse the
            # buffers instead of re-transferring host arrays every call.
            self._fdm_aux_dev = None

            def step_jit(state):
                if self._fdm_aux_dev is None:
                    self._fdm_aux_dev = jax.device_put(self._fdm_aux)
                return inner(state, self._fdm_aux_dev)

            self.step_jit = step_jit

    def _step_fdm_aux(self, state, fdm_aux):
        """step() with the fdm aux pytree (eigenvalue vectors + optional
        static boundary field, see __init__) threaded as an argument so
        they are device buffers, never compile-time literals."""
        self._fdm_aux_arg = fdm_aux
        try:
            return self.step(state)
        finally:
            self._fdm_aux_arg = None

    def _build_fdm_static(self):
        """gpu-variant fdm backend: the hydrostatic Dirichlet x planes
        (gpu.jl:257-261) put ~1e9-scale boundary terms in the Poisson RHS,
        which would drown the physics in float32. Solve the static
        boundary-driven part ONCE in float64 on the host; per step only
        the dynamic rho/dt divv part is solved on device
        (_poisson_solve_fdm)."""
        grid, phys = self.grid, self.cfg.physics
        iz = np.arange(1, grid.nz + 1, dtype=np.float64)
        prof = phys.rho * phys.g * (grid.nz - iz + 0.5) * grid.dz
        prof2d = np.broadcast_to(prof[None, :], (grid.ny, grid.nz))
        cx = 1.0 / (grid.dx * grid.dx)
        rhs_b = np.zeros((grid.nx - 2, grid.ny - 2, grid.nz - 2))
        rhs_b[0] -= (prof2d[1:-1, 1:-1] + 100.0) * cx
        rhs_b[-1] -= prof2d[1:-1, 1:-1] * cx
        from ..ops.fdm_poisson import solve_host_f64
        return np.asarray(solve_host_f64(grid, self.cfg.variant, rhs_b),
                          np.dtype(jnp.dtype(self.dtype).name))

    def _init_split(self):
        """Hydrostatic pressure split (NumericsConfig.pressure_split):
        state.pr stores p' = Pr - P_static(z), with P_static the exact
        init/BC profile rho*g*(nz-iz+0.5)*dz (gpu.jl:87,257-261 — both are
        the same linear-in-z profile). Algebraically identical to the
        reference formulation; see config.py for the float32 rationale."""
        cfg, phys, grid = self.cfg, self.cfg.physics, self.grid
        if cfg.compat and cfg.numerics.poisson_backend == "fdm":
            raise ValueError(
                "poisson_backend='fdm' replaces the reference's Poisson "
                "loop (direct solve + compensated refinement against the "
                "folded operator) and cannot compose with compat mode")
        want = cfg.numerics.pressure_split
        if want is None:
            want = (cfg.variant == "gpu" and not cfg.compat
                    and phys.g != 0.0
                    and cfg.numerics.poisson_backend != "fdm")
        self.pressure_split = bool(want)
        ext = cfg.numerics.extended_precision
        if ext is None:
            # f32 production runs carry the (hi,lo) stored pair whenever
            # the PT backend solves in f32 — not only under the gpu
            # variant's hydrostatic split: the multi variant's developing
            # inflow raises the pressure's dynamic range until the plain
            # f32 residual floor crosses eps_it (measured: nx=63 stalls
            # at step 7 with err 1.8e-3; with the pair every step
            # reproduces the f64 iteration counts exactly). compat keeps
            # the reference's plain iterate; fdm handles its own accuracy.
            ext = (cfg.numerics.jnp_dtype == jnp.float32
                   and not cfg.compat
                   and cfg.numerics.poisson_backend != "fdm")
        elif ext and cfg.compat:
            raise ValueError("extended_precision changes the iterate and "
                             "cannot compose with compat mode")
        self.extended = bool(ext)
        # Accuracy phase selection (NumericsConfig.accuracy): the Pallas
        # hybrid defaults to restarted defect correction (same guarantees
        # at ~half the per-iteration cost); the jnp path keeps the
        # extended pair, which runs from the start and reproduces the
        # Float64 reference's iteration counts (defect is a TPU perf
        # shape, so an explicit 'defect' there maps to 'extended').
        acc = cfg.numerics.accuracy
        if acc not in (None, "defect", "extended", "none"):
            raise ValueError(f"accuracy must be defect/extended/none, "
                             f"got {acc!r}")
        if not self.extended or acc == "none":
            self.acc_pallas = self.acc_jnp = "none"
        elif acc == "extended":
            self.acc_pallas = self.acc_jnp = "extended"
        elif acc == "defect":
            self.acc_pallas = "defect"
            self.acc_jnp = "extended"
        else:  # None (auto)
            # restarted defect correction is the cheap hybrid shape, but
            # the correction solve runs PLAIN f32, so its floor tracks
            # the pressure's dynamic range: under the gpu variant's
            # hydrostatic split the iterate is small-range and defect is
            # validated (255 stored-state err 6.1e-4); without the split
            # (multi variant) the correction stalls at ~1.5e-3 vs the
            # 1e-3 criterion (measured at nx=63 on v5e) while the
            # extended (hi,lo) phase reaches 5.3e-4 — so no-split
            # configs run the pair kernel for the accuracy phase.
            self.acc_pallas = "defect" if self.pressure_split else "extended"
            self.acc_jnp = "extended"
        if self.pressure_split:
            if cfg.numerics.poisson_backend == "fdm":
                raise NotImplementedError(
                    "pressure_split composes only with the 'pt' backend "
                    "(the fdm backend hoists the static boundary terms "
                    "itself)")
            iz = np.arange(1, grid.nz + 1, dtype=np.float64)
            self._p_static = (phys.rho * phys.g
                              * (grid.nz - iz + 0.5) * grid.dz)  # (nz,)
        else:
            self._p_static = None
        # Folded-BC RHS hoist (full cell-centered shape): the affine-z BC
        # of the split field drops a CONSTANT -+rho*g*dz neighbor term at
        # the z-adjacent interior planes; rhs_folded = rhs - hoist. Zero
        # when the split is off (plain zero-gradient terms vanish).
        zh = np.zeros(grid.nz)
        if self.pressure_split:
            rho_g_dz = phys.rho * phys.g * grid.dz
            zh[1] = -rho_g_dz / grid.dz / grid.dz
            zh[grid.nz - 2] = +rho_g_dz / grid.dz / grid.dz
        self._z_hoist = zh  # (nz,), full-shape z index
        self._flap = None   # lazily-built folded interior Laplacian
        self._fcomp = None  # lazily-built compensated pair residual

    def full_pressure(self, pr) -> jax.Array:
        """Physical pressure Pr from the state's pressure field (identity
        unless the hydrostatic split is active)."""
        if not self.pressure_split:
            return pr
        return pr + jnp.asarray(self._p_static, pr.dtype)[None, None, :]

    def gather_inner(self, state: "FlowState"):
        """gather_inner with the physical (unsplit) pressure."""
        state = self.canonical_state(state)
        return gather_inner(
            state if not self.pressure_split
            else state.replace(pr=self.full_pressure(state.pr)))

    # ---- flat-state representation (NumericsConfig.flat_state) ----

    def maybe_flatten_state(self, state: "FlowState") -> "FlowState":
        """Convert vx/vy/vz/c to the fused chain's flat (NXP, W) layout
        when flat-state mode is on (exact zero-pad embeddings; pr and
        the pair stay 3D — the Poisson solve has its own layout).
        No-op otherwise or when already flat."""
        if not self.flat_state or state.vx.ndim == 2:
            return state
        lay = self._advect_flat.layout
        return state.replace(vx=lay.flat(state.vx), vy=lay.flat(state.vy),
                             vz=lay.flat(state.vz), c=lay.flat(state.c))

    def canonical_state(self, state: "FlowState") -> "FlowState":
        """Inverse of maybe_flatten_state: the canonical 3D staggered
        representation (exact crops), for every I/O boundary
        (checkpoint, gather, viz, .mat) and for non-chained step paths.
        No-op when the state is already canonical."""
        if state.vx.ndim != 2:
            return state
        lay = self._advect_flat.layout
        nx, ny, nz = self.grid.nx, self.grid.ny, self.grid.nz
        return state.replace(vx=lay.unflat(state.vx, nx + 1, ny, nz),
                             vy=lay.unflat(state.vy, nx, ny + 1, nz),
                             vz=lay.unflat(state.vz, nx, ny, nz + 1),
                             c=lay.unflat(state.c, nx, ny, nz))

    def _init_pallas(self):
        """Build the fused Poisson-iteration Pallas kernel when enabled.

        Auto policy: on for float32 on TPU-class backends; the jnp path
        remains the oracle (and the float64 / CPU / sharded path).
        """
        from ..kernels.poisson import (build_poisson_iter, choose_slab,
                                       poisson_bc_spec)
        cfg, grid = self.cfg, self.grid
        self._pallas = None
        self._pallas_ext = None
        self._pallas_folded = False
        want = cfg.use_pallas
        backend = jax.default_backend()
        on_tpu = backend not in ("cpu", "gpu")
        interpret = not on_tpu
        mode = os.environ.get("NS3D_PALLAS_MODE", "blocked")
        if want is None:
            want = on_tpu and self.dtype == jnp.float32
            if (mode != "blocked"
                    and "axon" in str(jax.config.jax_platforms or "")
                    and os.environ.get("NS3D_PALLAS") != "1"):
                # The auto-pipelined 'blocked' kernel is validated stable on
                # the axon remote-TPU runtime (runbook + burn-in, round 1-2)
                # and is the default everywhere. Experimental modes (e.g.
                # the manual-DMA variant, which once wedged the runtime for
                # ~1h) stay behind an explicit NS3D_PALLAS=1 opt-in there.
                # (default_backend() reports 'tpu' for axon, so detect the
                # plugin through jax_platforms.)
                want = False
            if os.environ.get("NS3D_PALLAS") == "0":
                want = False
        if not want:
            return
        nyz = grid.ny * grid.nz
        slab = None
        if mode == "blocked":
            # blocked mode pads x to a multiple of the 8-row slab with
            # inert ghost rows — no divisibility constraint (the old
            # choose_slab divisor gate silently dropped the whole Pallas
            # path for prime nx, e.g. 127). nx % B == 1 is illegal only
            # for the exact zero-grad-x roll (compat multi: the hi source
            # row nx-2 would cross a block edge); folded and Dirichlet-x
            # builds take any B.
            needs_roll = cfg.compat and cfg.variant == "multi"
            if needs_roll:
                slab = next((b for b in (8, 16, 24) if grid.nx % b != 1),
                            None)
            else:
                slab = 8
            if slab is None or grid.nx < 4:
                warnings.warn(
                    f"Pallas Poisson path disabled: nx={grid.nx} "
                    "admits no slab size compatible with the exact "
                    "zero-grad-x BC roll (nx % B == 1 for B in 8/16/24); "
                    "falling back to the jnp backend", RuntimeWarning)
                return
        elif choose_slab(grid.nx, nyz, np.dtype(self.dtype).itemsize) < 2:
            return  # dma mode: in-slab x BCs need >=2 planes per slab
        bc = poisson_bc_spec(cfg.variant, grid, cfg.physics,
                             self.pressure_split)
        # Non-compat runs use the folded-BC kernel (BCs as dropped stencil
        # terms + a hoisted RHS + one exact first iteration — identical
        # numerics to _poisson_solve_jnp_folded) at ~half the per-iteration
        # cross-lane shuffle work; compat keeps the exact in-kernel-BC
        # sequence, which replicates the reference's update-then-BC loop
        # bit-for-bit in structure.
        self._pallas_folded = (not cfg.compat) and mode == "blocked"
        # NS3D_LANE_TILES: force the lane-tiled kernel build (wide grids
        # select it automatically on TPU; the env knob serves CPU
        # interpret tests and TPU experiments)
        lt_env = os.environ.get("NS3D_LANE_TILES")
        self._pallas = build_poisson_iter(
            grid.nx, grid.ny, grid.nz, grid.dx, grid.dy, grid.dz,
            grid.dtau, grid.damp, bc, dtype=self.dtype, slab=slab,
            interpret=interpret, mode=mode, folded=self._pallas_folded,
            lane_tiles=int(lt_env) if lt_env else None)
        # extended (double-single) kernel for the accuracy phase of the
        # hybrid solve (_poisson_solve_pallas); ~1.8x cost/iteration.
        # Built only when selected — the default accuracy phase on this
        # path is defect correction, which reuses the plain kernel.
        self._pallas_ext = None
        if self.acc_pallas == "extended" and mode == "blocked":
            self._pallas_ext = build_poisson_iter(
                grid.nx, grid.ny, grid.nz, grid.dx, grid.dy, grid.dz,
                grid.dtau, grid.damp, bc, dtype=self.dtype, slab=slab,
                interpret=interpret, mode=mode, extended=True,
                folded=self._pallas_folded)

    def _init_advect_pallas(self):
        """Build the fused select-shift advection kernels (kernels/advect
        .py) when the hot path can use them: TPU float32, non-compat, and
        the select-shift method active. The XLA select-shift re-reads the
        source once per shifted slice (~25 ms of the 255-grid step); the
        Pallas form keeps the slab in VMEM and is bit-identical under jit
        (tests/test_advect_pallas.py). NS3D_ADVECT=selectshift/gather
        forces the jnp backends; NS3D_ADVECT_PALLAS=0 opts out without
        changing the method."""
        self._advect_pallas = None
        cfg, grid = self.cfg, self.grid
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        eligible = (self.dtype == jnp.float32 and not cfg.compat
                    and self.advect_method == "selectshift"
                    and "NS3D_ADVECT" not in os.environ
                    and os.environ.get("NS3D_ADVECT_PALLAS") != "0"
                    and os.environ.get("NS3D_PALLAS") != "0")
        want = (on_tpu and eligible and self._pallas_advect_k_ok()
                and self._pallas_advect_vmem_ok(flat=False))
        if not want:
            if (eligible and not self._pallas_advect_k_ok()
                    and (on_tpu or os.environ.get(
                        "NS3D_FUSED_INTERPRET") == "1")):
                # this config would have used the Pallas kernels but for
                # the window width — say so, and only then
                warnings.warn(
                    f"advect_k={self.advect_k} > "
                    f"{MAX_PALLAS_ADVECT_K}: Pallas advection kernels "
                    "disabled (register pressure); using the jnp "
                    "select-shift backend", RuntimeWarning)
            return
        from ..kernels.advect import build_advect
        self._advect_pallas = build_advect(
            grid.nx, grid.ny, grid.nz, grid.dt, grid.dx, grid.dy, grid.dz,
            k=self.advect_k, dtype=self.dtype, interpret=False)

    def _pallas_advect_k_ok(self) -> bool:
        """Whether the configured select-shift window fits the fused
        Pallas advection kernels (see MAX_PALLAS_ADVECT_K)."""
        return self.advect_k <= MAX_PALLAS_ADVECT_K

    def _pallas_advect_vmem_ok(self, flat: bool, layout=None) -> bool:
        """Whether one advection branch kernel's working set fits VMEM
        at this grid's lane width (kernels/advect.py
        advect_kernel_vmem_bytes). A 511-class grid's ~95k-lane rows
        blow the ~60-plane accumulation past 128MB untiled; the flat
        chain runs LANE-TILED there (pass the tiled layout), so only
        extreme widths fall back to the jnp backend."""
        from ..kernels.advect import advect_kernel_vmem_bytes
        g = self.grid
        return advect_kernel_vmem_bytes(
            g.nx, g.ny, g.nz, self.advect_k, flat=flat,
            layout=layout) <= 100 * 2 ** 20

    def _init_fused_step(self):
        """Build the fused non-Poisson chain kernels (kernels/fused_step
        .py) when the hot path can use them: TPU float32, non-compat.
        The predict kernel (stress+predictor+cylinder+divergence) and
        the correct kernel (correction+cylinder+the variant's folded BC
        stack) serve both variants. NS3D_FUSED_STEP=0 / NS3D_PALLAS=0
        opt out."""
        self._fused_pre = None
        self._fused_post = None
        self._advect_flat = None
        cfg, grid = self.cfg, self.grid
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        # NS3D_FUSED_INTERPRET=1: build the chain in interpret mode on
        # the CPU backend — exercises the _step_chained WIRING (operand
        # order, unflat dims, mask plumbing) in CI without TPU hardware
        interpret = (not on_tpu
                     and os.environ.get("NS3D_FUSED_INTERPRET") == "1")
        # empirical VMEM envelope of the predict kernel: its working set
        # + Mosaic register spills scale with the kernel's lane-window
        # width (measured: needs ~166MB of the 128MB VMEM at W=95104
        # lanes, the 511 grid; comfortably compiles at W=23808, the 255
        # grid). ~1.75KB/lane against a 100MB budget keeps 2.4x headroom
        # over the validated width. Wider grids LANE-TILE the window
        # back into the envelope (CommonLayout lane_tiles; same scheme
        # as the lane-tiled Poisson kernel) — the jnp chain serves only
        # whatever even tiling can't fit. NS3D_FUSED_LANE_TILES forces a
        # tile count (interpret-mode equivalence tests use it).
        from ..kernels.fused_step import (CommonLayout, build_correct,
                                          build_predict)
        envelope = 100 * 2 ** 20 // 1792
        base_w = ((((grid.ny + 1) * (grid.nz + 1)) + 127) // 128) * 128
        # the advection accumulation needs (k+1) units of (NZ+1)-lane
        # halo vs the predict chain's 3 (see CommonLayout docstring)
        advect_eligible = (self.advect_method == "selectshift"
                           and self._pallas_advect_k_ok()
                           and "NS3D_ADVECT" not in os.environ
                           and os.environ.get("NS3D_ADVECT_PALLAS")
                           != "0")
        halo_k = max(3, self.advect_k + 1) if advect_eligible else 3
        lt_env = os.environ.get("NS3D_FUSED_LANE_TILES")
        if lt_env:
            tiles = int(lt_env)
        elif base_w <= envelope:
            tiles = 1
        else:
            tiles = max(2, round(base_w / 24576))
        lay = CommonLayout(grid.nx, grid.ny, grid.nz, dtype=self.dtype,
                           lane_tiles=tiles, halo_k=halo_k)
        vmem_ok = lay.CW <= envelope
        want = ((on_tpu or interpret) and self.dtype == jnp.float32
                and not cfg.compat and vmem_ok
                and os.environ.get("NS3D_FUSED_STEP") != "0"
                and os.environ.get("NS3D_PALLAS") != "0")
        if not want:
            if (on_tpu and not vmem_ok and self.dtype == jnp.float32
                    and not cfg.compat):
                warnings.warn(
                    f"lane window CW={lay.CW} (T={lay.T} tiles) exceeds "
                    "the fused step kernels' VMEM envelope; running the "
                    "jnp non-Poisson chain", RuntimeWarning)
            return
        phys = cfg.physics
        g_eff = 0.0 if self.pressure_split else phys.g
        # ONE shared layout + packed cylinder-mask constant across all
        # three builders (each (NXP, W) mask is ~24 MB HBM at 255)
        mbits = lay.packed_masks(self.masks)
        self._fused_pre = build_predict(
            grid.nx, grid.ny, grid.nz, dt=grid.dt, dx=grid.dx, dy=grid.dy,
            dz=grid.dz, mu=phys.mu, rho=phys.rho, g_eff=g_eff,
            masks=self.masks, dtype=self.dtype, interpret=interpret,
            layout=lay, mask_bits=mbits)
        self._fused_post = build_correct(
            grid.nx, grid.ny, grid.nz, dt=grid.dt, dx=grid.dx,
            dy=grid.dy, dz=grid.dz, rho=phys.rho, masks=self.masks,
            dtype=self.dtype, variant=cfg.variant, vin=phys.vin,
            interpret=interpret, layout=lay, mask_bits=mbits)
        # common-layout advect kernel: chains the flat layout through the
        # WHOLE non-Poisson step (no 3D<->flat round trips, no XLA
        # face-average fusions); requires the fused post and the
        # select-shift method
        if (advect_eligible
                and self._pallas_advect_vmem_ok(flat=True, layout=lay)):
            from ..kernels.advect import build_advect_flat
            self._advect_flat = build_advect_flat(
                grid.nx, grid.ny, grid.nz, grid.dt, grid.dx, grid.dy,
                grid.dz, k=self.advect_k, dtype=self.dtype,
                interpret=interpret, layout=lay)

    def _unroll2(self, budget: int) -> bool:
        """Whether a convergence loop with this iteration budget can run
        the 2x-unrolled body (see phase 1 of the folded solve): chunk
        boundaries and the budget end must both land on even iteration
        parity, so exit decisions and iteration counts stay bit-identical
        to the 1x loop. NS3D_UNROLL2=0 opts out (perf triage)."""
        return (self.grid.nchk % 2 == 0 and budget % 2 == 0
                and budget >= 2
                and os.environ.get("NS3D_UNROLL2", "1") != "0")

    def _sweep_plan(self, iter_fn, budget: int):
        """Temporal-sweep body selection for the folded convergence loop.

        Returns (s, sweep_fn) to run bodies of TWO s-sweep kernel calls
        (2s iterations/body; the call pair ping-pongs the pr/dpr carry
        buffers so XLA's fixed buffer assignment needs no per-iteration
        copy), or None for the plain 1-sweep bodies (then _unroll2
        decides 2x vs 1x). All modes perform the same kernel math with
        the same check semantics — check values are always the residual
        entering iteration k*nchk (ptloop.pt_loop_fused), and the gates
        require nchk and the checked budget to be body-advance multiples
        — so iteration counts match exactly; fields match to per-program
        FMA-contraction rounding (tests/test_pallas.py sweep2 tests).

        Defaults: ON for lane-tiled (wide-grid) kernels, where the loop
        is HBM-stream-bound and s-sweeps cut traffic ~s-fold on the
        write stream (511x307x307 measured 2.68 -> 0.78 ms/iter at s=3,
        benchmarks/wide_row_probe.py + round-4 notes); OFF for the T=1
        kernel, whose whole working set is VMEM-class and where the
        extra sweep arithmetic measured SLOWER (96.5 vs 83.7 us/iter at
        255). NS3D_SWEEP2=1/0 overrides either default; NS3D_UNROLL2=0
        forces single-call bodies."""
        if os.environ.get("NS3D_UNROLL2", "1") == "0":
            return None
        fns = getattr(iter_fn, "sweep_fns", None)
        if not fns:
            s2 = getattr(iter_fn, "sweep2", None)
            fns = {2: s2} if s2 is not None else {}
        tiled = getattr(iter_fn, "lane_tiles", 1) > 1
        if not fns or os.environ.get(
                "NS3D_SWEEP2", "1" if tiled else "0") != "1":
            return None
        for s in sorted(fns, reverse=True):
            n = 2 * s
            if (self.grid.nchk % n == 0 and self.grid.nchk >= 2 * n
                    and budget % n == 0 and budget >= n):
                return s, fns[s]
        return None

    def step_sharded_jit(self, mesh):
        """Jitted step over a 3D device mesh (global-view SPMD path).

        The XLA SPMD partitioner turns the stencil slices into neighbor
        collective-permutes (halo exchanges) and the residual max into an
        all-reduce, all inside the jitted while_loop — the TPU-native
        replacement for the reference's update_halo!/MPI.Allreduce
        (NavierStokes3D_multi_gpu.jl:450-466).
        """
        from ..parallel.mesh import replicated, state_shardings
        import functools
        sh = state_shardings(mesh)
        rep = replicated(mesh)
        # pallas_call cannot be partitioned by the SPMD partitioner; on a
        # real multi-device mesh force the jnp Poisson backends.
        allow_pallas = mesh.size == 1
        # want_pair=False: the sharded pytrees stay pair-free (sh/stats_sh
        # declare no pr_lo). Single-chip users get the pair via step_jit;
        # a state carrying one must drop it (state.replace(pr_lo=None))
        # before entering a distributed step.
        poisson_fn = functools.partial(self.poisson_solve,
                                       allow_pallas=allow_pallas,
                                       want_pair=False)
        step = lambda state: self._step_impl(
            state, poisson_fn, allow_pallas_advect=allow_pallas)
        # stats sharding template: derive the pytree structure (which
        # optional channels the selected backend emits) by abstract
        # evaluation instead of re-encoding the dispatch logic here
        state_struct = jax.eval_shape(self.init_state)
        if self._fdm_aux is not None:
            # fdm backend: thread the aux pytree (1-D eigenvalue vectors
            # + the gpu variant's full-grid static boundary field) as
            # replicated runtime arguments — same reason as step_jit in
            # __init__: closure constants are inlined as literals into
            # the lowered program (HTTP 413 at scale). Replication is
            # correct and cheap in compile size; the partitioner slices
            # the static locally for the sharded p_int + static add, no
            # collectives.
            def step_aux(state, fdm_aux):
                self._fdm_aux_arg = fdm_aux
                try:
                    return step(state)
                finally:
                    self._fdm_aux_arg = None
            aux_struct = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                self._fdm_aux)
            aux_sh = jax.tree.map(lambda _: rep, self._fdm_aux)
            _, stats_struct = jax.eval_shape(step_aux, state_struct,
                                             aux_struct)
            stats_sh = jax.tree.map(lambda _: rep, stats_struct)
            inner = jax.jit(step_aux, donate_argnums=0,
                            in_shardings=(sh, aux_sh),
                            out_shardings=(sh, stats_sh))
            aux_dev_cell = []

            def sharded_step(state):
                if not aux_dev_cell:
                    aux_dev_cell.append(
                        jax.device_put(self._fdm_aux, aux_sh))
                return inner(state, aux_dev_cell[0])

            return sharded_step
        _, stats_struct = jax.eval_shape(step, state_struct)
        stats_sh = jax.tree.map(lambda _: rep, stats_struct)
        return jax.jit(step, donate_argnums=0,
                       in_shardings=(sh,), out_shardings=(sh, stats_sh))

    # ---- initialization ----

    def init_state(self) -> FlowState:
        """Initial conditions per variant.

        multi (NavierStokes3D_multi_gpu.jl:368-373): inflow plane velocity
        (written to Vy[1,:,:] in the reference — a typo kept under compat;
        Vx under compat=False), hydrostatic pressure from global z
        (zero when g=0), then the cylinder mask.
        gpu (NavierStokes3D_gpu.jl:84-88): 1/6-power-law Vx profile and
        hydrostatic pressure; no cylinder application at init.
        """
        cfg, g, grid = self.cfg, self.cfg.physics.g, self.grid
        rho = cfg.physics.rho
        st = zeros_state(grid, self.dtype)
        if cfg.variant == "multi":
            if cfg.compat:
                st = st.replace(vy=st.vy.at[0, :, :].set(cfg.physics.vin))
            else:
                st = st.replace(vx=st.vx.at[0, :, :].set(cfg.physics.vin))
            # Pr(iz) = -(z_g(iz) - dz/2) ρ g with z_g(iz) = (iz-1) dz (:370)
            iz = np.arange(1, grid.nz + 1)
            pr_prof = -(((iz - 1) * grid.dz) - grid.dz / 2) * rho * g
            pr = jnp.broadcast_to(
                jnp.asarray(pr_prof, dtype=self.dtype)[None, None, :],
                grid.shape_c)
            st = st.replace(pr=pr)
            c, vx, vy, vz = apply_cylinder(st.c, st.vx, st.vy, st.vz, self.masks)
            st = st.replace(c=c, vx=vx, vy=vy, vz=vz)
        else:  # gpu variant
            zc = grid.zc()
            prof = cfg.physics.vin * (7.0 / 6.0) * (
                (zc + grid.lz / 2) / grid.lz) ** (1.0 / 6.0)
            vx = jnp.broadcast_to(
                jnp.asarray(prof, dtype=self.dtype)[None, None, :],
                grid.shape_vx)
            if self.pressure_split:
                # the hydrostatic init IS P_static: p' starts at exactly 0
                st = st.replace(vx=vx)
            else:
                pr_prof = -(zc - grid.lz / 2) * rho * g
                pr = jnp.broadcast_to(
                    jnp.asarray(pr_prof, dtype=self.dtype)[None, None, :],
                    grid.shape_c)
                st = st.replace(vx=vx, pr=pr)
        return self.maybe_flatten_state(st)

    # ---- Poisson solve ----

    def poisson_solve(self, pr, dprdtau, divv, *, allow_pallas=True,
                      want_pair=True):
        """allow_pallas=False forces the jnp backends: pallas_call is opaque
        to the XLA SPMD partitioner, so any step traced over a >1-device
        global-view mesh must not reach the Pallas kernel (it would gather/
        replicate the globally-sharded operands, or crash).

        want_pair=False suppresses the stored-pressure pair channel
        (StepStats.pr_lo) that the f32 accuracy phases emit — the
        distributed wrappers pass False so their stats/state pytree
        structure stays pair-free (the pair is a single-chip showcase
        feature; f64 distributed runs have no storage floor to lift)."""
        if self.cfg.numerics.poisson_backend == "fdm":
            return self._poisson_solve_fdm(pr, dprdtau, divv,
                                           allow_pallas=allow_pallas,
                                           want_pair=want_pair)
        if (allow_pallas and self._pallas is not None
                and (self.acc_pallas != "extended"
                     or self._pallas_ext is not None)):
            return self._poisson_solve_pallas(pr, dprdtau, divv,
                                              want_pair=want_pair)
        if not self.cfg.compat:
            return self._poisson_solve_jnp_folded(pr, dprdtau, divv,
                                                  want_pair=want_pair)
        return self._poisson_solve_jnp(pr, dprdtau, divv)

    def _poisson_solve_fdm(self, pr, dprdtau, divv, *, allow_pallas=True,
                           want_pair=True):
        """Direct solve via fast diagonalization + compensated iterative
        refinement (ops/fdm_poisson): ~6 MXU matmul passes solve the
        pressure system outright, then up to NumericsConfig.fdm_refine
        rounds of { r = compensated residual of the (hi, lo) pressure
        pair; e = fdm(-r); pair (+)= e } drive the STORED state below
        eps_it — the same stored-state criterion stored_residual_err
        evaluates, so stats.err here IS the honest pair residual. The
        loop exits as soon as err < eps_it; stats.iters counts refinement
        rounds (each ~12 MXU transform passes), not PT iterations. This
        replaces the reference's thousands of pseudo-transient iterations
        per step (gpu.jl:126-137). dprdtau passes through untouched (it
        is pseudo-transient state; switching backends mid-run simply
        warm-starts 'pt' from wherever it was). `allow_pallas` is
        accepted for dispatch-signature compatibility; the path is pure
        jnp (einsums + elementwise), so the SPMD partitioner can shard
        it."""
        grid, phys = self.grid, self.cfg.physics
        # _fdm_solve and the aux pytree are built eagerly in __init__
        # (backend == 'fdm' is config-fixed). Prefer the threaded runtime
        # arguments (tracers during jitted traces — keeps the 3-D
        # eigenvalue sum and static field out of the compiled program's
        # literals); unjitted callers fall back to the concrete closures.
        aux = self._fdm_aux_arg
        fdm_eigs = aux["eigs"] if aux is not None else None
        fdm_static = (aux.get("static") if aux is not None
                      else self._fdm_static)
        rho, dt = phys.rho, grid.dt
        num = self.cfg.numerics
        eps_it = num.eps_it
        err_scale = (grid.ly * grid.ly) / phys.psc
        fdm = self._fdm_solve
        use_pair = jnp.dtype(self.dtype) == jnp.float32

        if use_pair:
            # (hi, lo) RHS pair (ops/ds.rhs_pair): lo carries the f32
            # rounding of the RHS so the refinement targets the true
            # (f64-defined) right-hand side — without it eps32*|rhs|
            # (~7e-4 err units at 255) floors just under the criterion.
            rhs_hi3, rhs_lo3 = dsops.rhs_pair(divv, rho / dt, None)
            rhs_hi = rhs_hi3[1:-1, 1:-1, 1:-1]
            rhs_lo = rhs_lo3[1:-1, 1:-1, 1:-1]
            comp = self._comp_residual_fn()

            def resid(pr_v, lo_v):
                return comp(pr_v, lo_v, rhs_hi, rhs_lo)
        else:
            # f64: a plain folded-stencil residual carries ~eps64 noise,
            # far below eps_it — no compensation needed.
            rhs_hi = ((rho / dt) * divv[1:-1, 1:-1, 1:-1]).astype(self.dtype)
            lap = self._folded_lap_fn()

            def resid(pr_v, lo_v):
                r = lap(pr_v) - rhs_hi
                return r, jnp.max(jnp.abs(r))

        p_int = fdm(rhs_hi, eigs=fdm_eigs)
        if fdm_static is not None:
            p_int = p_int + fdm_static
        # Zero-pad insertion, NOT pr.at[1:-1,...].set(p_int): set_bc_pr
        # overwrites every boundary face anyway (both variants write all
        # six planes; verified bit-identical single-device), and the
        # DUS-into-pr form miscompiles under the GSPMD partitioner — on a
        # (2,2,2) mesh the x-shard-boundary plane of the update is
        # silently dropped (diff 0.112 at nx=16 f64, the whole i=8 plane
        # keeping pr0's values; tests/test_direct_solve.py
        # ::test_fdm_backend_sharded_equals_single guards this).
        pr = jnp.pad(p_int.astype(self.dtype), 1)
        pr = self.set_bc_pr(pr)
        lo = jnp.zeros_like(pr)
        if use_pair:
            # Install the (hi, lo) Dirichlet plane image BEFORE the
            # refinement: the pair image carries the f64 profile's f32
            # rounding remainder in the lo planes (bc.make_bc_pr_pair),
            # and the stored-state criterion reads those planes through
            # the folded masks — refining against lo-planes = 0 would
            # converge a ~1e-2-err-units-different problem (measured:
            # stored_err 9.4e-3 at 255 while the in-solve err read
            # 1.4e-8).
            pr, lo = self.set_bc_pr_pair(pr, lo)

        # Refinement loop. The Dirichlet planes are frozen after the
        # BC application above (the correction problem has homogeneous
        # BCs — exactly the operator build_fdm_solver diagonalizes) and
        # the compensated residual's folded masks never read the
        # zero-grad planes, so BCs need no re-application inside the
        # loop.
        nchunks = grid.niter // grid.nchk
        hist0 = jnp.full((nchunks,), jnp.nan, self.dtype)
        r0, emax0 = resid(pr, lo)
        err0 = (emax0 * err_scale).astype(self.dtype)
        hist0 = hist0.at[0].set(err0)
        max_ref = jnp.int32(num.fdm_refine)

        # Elementwise interior mask: like the zero-pad insertion above,
        # this replaces the .at[1:-1,...].set() dynamic-update-slice,
        # whose DUS-then-read-overlapping-planes composition miscompiles
        # under the GSPMD partitioner (docs/gspmd_dus_note.md) — resid()
        # reads the pair's BC planes through the folded masks right after
        # the write. where(mask, pad(inner), full) is bit-identical.
        sh_c = pr.shape
        interior = jnp.ones(tuple(d - 2 for d in sh_c), bool)
        interior = jnp.pad(interior, 1, constant_values=False)

        def insert_interior(full, inner):
            return jnp.where(interior, jnp.pad(inner, 1), full)

        def cond_fn(c):
            _, _, _, k, err, _ = c
            return (err >= eps_it) & (k < max_ref)

        def body_fn(c):
            pr_v, lo_v, r, k, _, hist = c
            # resid returns r = lap(p) - rhs, so the correction solves
            # lap(e) = -r (the defect phase's rhs_c = -r0 convention)
            e = fdm(-r.astype(self.dtype), eigs=fdm_eigs)
            nh, t = dsops.two_sum(pr_v[1:-1, 1:-1, 1:-1], e)
            nl = lo_v[1:-1, 1:-1, 1:-1] + t
            nh, nl = dsops.two_sum(nh, nl)
            pr_v = insert_interior(pr_v, nh)
            lo_v = insert_interior(lo_v, nl)
            r2, emax2 = resid(pr_v, lo_v)
            err2 = (emax2 * err_scale).astype(self.dtype)
            hist = hist.at[jnp.minimum(k + 1, nchunks - 1)].set(err2)
            return pr_v, lo_v, r2, k + jnp.int32(1), err2, hist

        pr, lo, _, nref, err, hist = lax.while_loop(
            cond_fn, body_fn,
            (pr, lo, r0, jnp.int32(0), err0, hist0))

        if want_pair and use_pair:
            pr, lo = self.set_bc_pr_pair(pr, lo)
            return pr, dprdtau, StepStats(iters=nref, err=err,
                                          err_hist=hist, pr_lo=lo)
        # Fold the pair: after the renormalizing two_sum, hi IS the
        # correctly-rounded sum, so dropping lo costs <= 0.5 ulp of the
        # stored field (err still reports the pair's residual — the
        # criterion the loop drove below eps_it).
        pr = self.set_bc_pr(pr)
        return pr, dprdtau, StepStats(iters=nref, err=err, err_hist=hist)

    def _folded_masks(self, dtype):
        """Per-axis neighbor coefficient masks of the folded stencil,
        broadcast-shaped, as NumPy (so cached closures hold no traced
        values — these may be first built inside a jit trace)."""
        grid = self.grid
        nx, ny, nz = grid.nx, grid.ny, grid.nz

        def masks_1d(n, lo_zero_grad, hi_zero_grad):
            am = np.ones(n - 2, dtype)
            ap = np.ones(n - 2, dtype)
            if lo_zero_grad:
                am[0] = 0.0
            if hi_zero_grad:
                ap[-1] = 0.0
            return am, ap

        if self.cfg.variant == "multi":
            # bc_x zero-grad lo; hi ends Dirichlet 0 (outlet overwrite)
            axm, axp = masks_1d(nx, True, False)
            aym, ayp = masks_1d(ny, True, True)
            azm, azp = masks_1d(nz, True, True)
        else:  # gpu: x Dirichlet both (hydrostatic), y/z zero-grad
            axm, axp = masks_1d(nx, False, False)
            aym, ayp = masks_1d(ny, True, True)
            azm, azp = masks_1d(nz, True, True)
        return (axm[:, None, None], axp[:, None, None],
                aym[None, :, None], ayp[None, :, None],
                azm[None, None, :], azp[None, None, :])

    def _comp_residual_fn(self):
        """Compensated folded residual of a (hi, lo) pressure pair against
        a (hi, lo) RHS pair: jnp twin of the flat in-kernel version
        (kernels/poisson.py compensated_residual), used by the jnp folded
        backend's defect-correction finisher and stored_residual_err.

        A single f32 evaluation of lap(p) - rhs carries rounding
        ~eps32*|rhs| (~2e-3 err units at the showcase preset) — above
        eps_it, so it can neither define a correction problem nor report
        an honest final err. This evaluation tracks every first-order
        rounding term (two_sum neighbor diffs, Dekker products against
        f64-split weights, compensated accumulation), bringing the error
        down to ~eps32*|resid|. Runs once per restart — not hot."""
        if self._fcomp is not None:
            return self._fcomp
        grid = self.grid
        dx, dy, dz = grid.dx, grid.dy, grid.dz
        masks = self._folded_masks(np.float64)
        quads = [dsops.weight_quad(m / h / h) for m, h in
                 zip(masks, (dx, dx, dy, dy, dz, dz))]

        def comp(hi, lo, rhs_hi, rhs_lo):
            hic = hi[1:-1, 1:-1, 1:-1]
            loc = lo[1:-1, 1:-1, 1:-1]
            nbs = ((hi[:-2, 1:-1, 1:-1], lo[:-2, 1:-1, 1:-1]),
                   (hi[2:, 1:-1, 1:-1], lo[2:, 1:-1, 1:-1]),
                   (hi[1:-1, :-2, 1:-1], lo[1:-1, :-2, 1:-1]),
                   (hi[1:-1, 2:, 1:-1], lo[1:-1, 2:, 1:-1]),
                   (hi[1:-1, 1:-1, :-2], lo[1:-1, 1:-1, :-2]),
                   (hi[1:-1, 1:-1, 2:], lo[1:-1, 1:-1, 2:]))
            pairs = []
            for (nb_hi, nb_lo), quad in zip(nbs, quads):
                dh, dl = dsops.two_sum(nb_hi, -hic)
                dl = dl + (nb_lo - loc)
                pairs.append(dsops.weighted_term(dh, dl, quad))
            pairs.append((-rhs_hi, -rhs_lo))
            s, c = dsops.accumulate(pairs)
            r = s + c
            return r, jnp.max(jnp.abs(r))

        self._fcomp = comp
        return comp

    def _folded_lap_fn(self):
        """Interior Laplacian with the boundary conditions folded in:
        zero-gradient neighbor terms dropped via coefficient masks (the
        difference vanishes after BC application), Dirichlet planes read
        as-is (they are loop-invariant). Shared by the folded jnp backend
        and the folded Pallas path's residual evaluation."""
        if self._flap is not None:
            return self._flap
        dx, dy, dz = self.grid.dx, self.grid.dy, self.grid.dz
        axm, axp, aym, ayp, azm, azp = self._folded_masks(self.dtype)

        def lap_folded(pr):
            pc = pr[1:-1, 1:-1, 1:-1]
            return ((axp * (pr[2:, 1:-1, 1:-1] - pc)
                     + axm * (pr[:-2, 1:-1, 1:-1] - pc)) / dx / dx
                    + (ayp * (pr[1:-1, 2:, 1:-1] - pc)
                       + aym * (pr[1:-1, :-2, 1:-1] - pc)) / dy / dy
                    + (azp * (pr[1:-1, 1:-1, 2:] - pc)
                       + azm * (pr[1:-1, 1:-1, :-2] - pc)) / dz / dz)

        self._flap = lap_folded
        return lap_folded

    def _poisson_solve_jnp_folded(self, pr, dprdtau, divv, max_chunks=None,
                                  want_pair=True):
        """Poisson solve with the boundary conditions folded into the
        stencil: zero-gradient faces become dropped neighbor terms
        (coefficient masks), Dirichlet faces are loop-invariant planes,
        and the RHS is hoisted — so one iteration is two fused elementwise
        passes with NO per-iteration boundary-plane updates.

        Equivalence with the reference's update-then-BC sequence: after
        bc, lap at a cell adjacent to a zero-gradient face reads a copy of
        its own updated neighbor, i.e. that difference term vanishes;
        Dirichlet planes are invariant under the interior-only update.
        The first iteration reads the incoming (possibly BC-inconsistent)
        boundary planes exactly like the reference, so it runs in exact
        form before the Dirichlet planes are frozen.
        """
        grid, phys, num = self.grid, self.cfg.physics, self.cfg.numerics
        rho, dt, dtau, damp = phys.rho, grid.dt, grid.dtau, grid.damp
        dx, dy, dz = grid.dx, grid.dy, grid.dz
        eps_it = num.eps_it
        nchunks = grid.niter // grid.nchk
        rem = grid.niter - nchunks * grid.nchk
        if max_chunks is not None:
            nchunks = min(nchunks, max_chunks)
            rem = 0
        dtype = self.dtype
        lap_folded = self._folded_lap_fn()

        extended = self.acc_jnp == "extended" and dtype == jnp.float32
        zh = self._z_hoist[1:-1] if self.pressure_split else None
        if extended:
            # (hi, lo) RHS pair: hi is bit-identical to the plain f32
            # computation below (same trajectory); lo carries its
            # first-order rounding, consumed by the compensated residual
            # of the defect-correction finisher (ops/ds.rhs_pair).
            rhs, rhs_lo = dsops.rhs_pair(divv[1:-1, 1:-1, 1:-1],
                                         rho / dt, zh)
        else:
            rhs = ((rho / dt) * divv[1:-1, 1:-1, 1:-1]).astype(dtype)
            if zh is not None:
                # affine z BC (bc.affine_grad_z): the dropped boundary-
                # neighbor term is the CONSTANT -+rho*g*dz, hoisted here
                rhs = rhs - jnp.asarray(zh, dtype)[None, None, :]

        err_scale = (grid.ly * grid.ly) / phys.psc
        if extended:
            # Double-single iterate (NumericsConfig.extended_precision):
            # pr is carried as a (hi, lo) float32 pair. lap(hi)+lap(lo) ==
            # lap(hi+lo) in real arithmetic, and f32-evaluating lap(hi) is
            # nearly exact (neighbor differences of close values round to
            # ~eps*|difference|, not eps*|value|) — so the pair's residual
            # is free of the stored field's representation noise.
            def two_sum(a, b):
                s = a + b
                ap = s - b
                bp = s - ap
                return s, (a - ap) + (b - bp)

            def step_fn(carry, it):
                hi, lo, dpr = carry
                resid = (lap_folded(hi) - rhs) + lap_folded(lo)
                dpr = dpr.at[1:-1, 1:-1, 1:-1].set(
                    dpr[1:-1, 1:-1, 1:-1] * (1.0 - damp) + dtau * resid)
                hi, lo = two_sum(hi, lo + dtau * dpr)
                return ((hi, lo, dpr),
                        jnp.max(jnp.abs(resid)) * err_scale, jnp.int32(1))
        else:
            def step_fn(carry, it):
                pr, dpr = carry
                resid = lap_folded(pr) - rhs
                dpr = dpr.at[1:-1, 1:-1, 1:-1].set(
                    dpr[1:-1, 1:-1, 1:-1] * (1.0 - damp) + dtau * resid)
                pr = pr + dtau * dpr
                return ((pr, dpr),
                        jnp.max(jnp.abs(resid)) * err_scale, jnp.int32(1))

        # iteration 1 in exact form (reads incoming boundary planes),
        # then freeze the Dirichlet planes via set_bc_pr.
        pr, dprdtau = ph.poisson_iter(pr, dprdtau, divv, rho, dt, dtau,
                                      damp, dx, dy, dz)
        pr = self.set_bc_pr(pr)
        carry0 = ((pr, jnp.zeros_like(pr), dprdtau) if extended
                  else (pr, dprdtau))

        carry, it1, err1, hist1 = pt_loop_fused(
            step_fn, carry0, 1, nchunks * grid.nchk + rem, grid.nchk,
            nchunks, eps_it, dtype, stall=self._stall)
        if not extended:
            pr, dprdtau = carry
            # materialize the zero-gradient boundary planes
            pr = self.set_bc_pr(pr)
            return pr, dprdtau, StepStats(iters=it1, err=err1,
                                          err_hist=hist1)

        # ---- defect-correction finisher (extended path) ----
        # The double-single loop's observable residual carries plain-f32
        # evaluation noise ~eps32*|rhs| (~2e-3 err units at 127+-class
        # gpu grids), so at large grids the loop exits via the stall
        # detector ABOVE eps_it even though f64 converges. Mirror the
        # Pallas hybrid (defect branch of _poisson_solve_pallas):
        # evaluate the true residual r0 once with compensated arithmetic
        # (error ~eps32*|r0|, against the (hi, lo) RHS pair) and solve
        # lap(delta) = -r0 with the plain loop — the correction problem's
        # scale is |r0|, so plain f32 genuinely reaches eps_it. err0
        # seeding makes it a no-op when the pair loop already converged
        # (iteration counts then keep their f64 parity,
        # tests/test_precision.py::test_extended_f32_converges_like_f64).
        hi1, lo1, dpr1 = carry
        comp = self._comp_residual_fn()
        r0, emax = comp(hi1, lo1, rhs, rhs_lo)
        errh = emax * jnp.asarray(err_scale, dtype)
        rhs_c = -r0

        def stepd(c2, it):
            d, dpr = c2
            resid = lap_folded(d) - rhs_c
            dpr = dpr.at[1:-1, 1:-1, 1:-1].set(
                dpr[1:-1, 1:-1, 1:-1] * (1.0 - damp) + dtau * resid)
            d = d + dtau * dpr
            return ((d, dpr),
                    jnp.max(jnp.abs(resid)) * err_scale, jnp.int32(1))

        # delta starts at 0 (its BCs are the homogeneous image of the
        # pressure BCs, already folded into lap_folded/rhs) but dprdtau
        # CARRIES OVER: by linearity the correction continues the
        # phase-1 PT trajectory exactly, just evaluated against |r0|.
        (dl, dprdtau), it2, err2, hist2 = pt_loop_fused(
            stepd, (jnp.zeros_like(hi1), dpr1), 0,
            nchunks * grid.nchk + rem, grid.nchk, nchunks, eps_it,
            dtype, stall=self._stall, err0=errh)
        iters = it1 + it2
        # honest err: the compensated entry evaluation when the pair loop
        # had converged (it2 == 0), else the correction loop's exit
        # residual (evaluated at |r0| scale — noise-free by construction)
        err = jnp.where(it2 > 0, err2, errh)
        hist = jnp.where(jnp.isnan(hist1),
                         jnp.roll(hist2, it1 // grid.nchk), hist1)
        hi2, lo2 = _two_sum(hi1, lo1 + dl)
        if want_pair:
            # the converged iterate crosses the step boundary as the
            # stored (hi, lo) pair (FlowState.pr_lo): the STORED state —
            # not just the in-solve iterate — meets eps_it
            hi2, lo2 = self.set_bc_pr_pair(hi2, lo2)
            return hi2, dprdtau, StepStats(iters=iters, err=err,
                                           err_hist=hist, iters_ext=it2,
                                           pr_lo=lo2)
        # hi absorbs lo through the two_sum renormalization, so hi IS
        # the correctly-rounded f32 field
        pr = self.set_bc_pr(hi2)
        return pr, dprdtau, StepStats(iters=iters, err=err,
                                      err_hist=hist, iters_ext=it2)

    def _poisson_solve_pallas(self, pr, dprdtau, divv, max_chunks=None,
                              want_pair=True):
        """Hot loop backed by the fused Pallas kernel (kernels/poisson.py):
        one HBM pass per iteration, BCs included, state kept in the
        flattened padded layout across the whole solve."""
        grid, phys, num = self.grid, self.cfg.physics, self.cfg.numerics
        rho, dt = phys.rho, grid.dt
        eps_it = num.eps_it
        nchunks = grid.niter // grid.nchk
        rem = grid.niter - nchunks * grid.nchk
        if max_chunks is not None:
            nchunks = min(nchunks, max_chunks)
            rem = 0
        iter_fn, pack, unpack = self._pallas
        num = self.cfg.numerics
        folded = self._pallas_folded
        hybrid_ext = self._pallas_ext is not None
        defect = (self.acc_pallas == "defect" and folded
                  and hasattr(iter_fn, "compensated_residual"))
        hybrid = hybrid_ext or defect

        rhs_lo3d = None
        if defect:
            # (hi, lo) RHS pair (ops/ds.rhs_pair): hi is bit-identical to
            # the plain computation (same hot-loop trajectory); lo feeds
            # the compensated residual so the defect correction targets
            # the true (f64-defined) RHS, not its f32 rounding.
            rhs3d, rhs_lo3d = dsops.rhs_pair(
                divv, rho / dt,
                self._z_hoist if folded else None)
        else:
            rhs3d = (rho / dt) * divv
            if folded:
                rhs3d = rhs3d - jnp.asarray(self._z_hoist,
                                            self.dtype)[None, None, :]

        if folded:
            # folded-BC kernel protocol (see kernels/poisson.py): the
            # affine-z constants are hoisted into the RHS (above), run
            # iteration 1 in exact form (reads incoming boundary planes
            # like the reference), freeze the Dirichlet planes via
            # set_bc_pr, and drive convergence off the kernel-emitted
            # residual. Identical numerics to _poisson_solve_jnp_folded.
            pr, dprdtau = ph.poisson_iter(pr, dprdtau, divv, rho, dt,
                                          grid.dtau, grid.damp,
                                          grid.dx, grid.dy, grid.dz)
            pr = self.set_bc_pr(pr)

        # ---- phase 1: plain fused kernel (the fast path) ----
        pr_pad, dpr_f, rhs_f = pack(pr, dprdtau, rhs3d)
        err_scale = (grid.ly * grid.ly) / phys.psc

        # in hybrid mode phase 1's exit-at-plain-noise-floor IS the
        # handoff criterion, so a stall detector always runs here
        # (stall_exit=False only affects the final phase); the trailing
        # partial chunk belongs to the final phase.
        stall1 = self._stall or (num.stall_ratio, num.stall_checks)
        # Defect mode hands off EARLY (at 1000x eps_it) instead of waiting
        # for a deep stall: the correction phase continues the same PT
        # trajectory (dPrdtau carried over) with strictly better
        # arithmetic — every residual evaluation against |r0| instead of
        # |rhs| — so phase 1's only job is shrinking |r0| enough that the
        # correction's own noise floor (~eps32 * |r0|-in-err-units) sits
        # far below eps_it; 1000x leaves >3 orders of margin while
        # skipping the ~6-chunk stall-detection latency at the floor.
        eps1 = eps_it * (1000.0 if defect else 1.0)
        if folded:
            # flat iteration-level loop on the kernel-emitted residual
            # (ptloop.pt_loop_fused); the exact first iteration above is
            # global iteration 1.
            rem1 = 0 if hybrid else rem
            budget1 = nchunks * grid.nchk + rem1
            plan1 = self._sweep_plan(iter_fn, nchunks * grid.nchk)
            if plan1:
                # two temporal s-sweep calls per body (2s iterations).
                # Pre-run to global iteration 2s (exact iter 1 above,
                # one 1-sweep, s-1 2-sweeps) so bodies start at
                # 2s-parity; check flags land on call 2's last sweep —
                # the same entering-iteration-k*nchk values as the 1x
                # loop. The trailing partial chunk (non-hybrid) becomes
                # a post-loop tail (pt_loop_fused rem/tail_fn),
                # identical iterations.
                s_n, sweep_s = plan1
                n_adv = 2 * s_n
                sweep2 = (iter_fn.sweep_fns[2] if s_n > 2 else sweep_s)
                pr_pad, dpr_f, _ = iter_fn(pr_pad, dpr_f, rhs_f, False)
                for _ in range(s_n - 1):
                    pr_pad, dpr_f, _ = sweep2(pr_pad, dpr_f, rhs_f, False)

                def step1(carry, it):
                    pp, df = carry
                    pp, df, _ = sweep_s(pp, df, rhs_f, False)
                    pp, df, ec = sweep_s(pp, df, rhs_f,
                                         (it + n_adv) % grid.nchk == 0)
                    return ((pp, df), jnp.max(ec) * err_scale,
                            jnp.int32(n_adv))

                def tail1(carry):
                    return lax.fori_loop(
                        0, rem1, lambda _, c: iter_fn(*c, rhs_f, False)[:2],
                        carry)

                (pr_pad, dpr_f), it1, err1, hist1 = pt_loop_fused(
                    step1, (pr_pad, dpr_f), n_adv, nchunks * grid.nchk,
                    grid.nchk, nchunks, eps1, self.dtype,
                    stall=stall1 if hybrid else self._stall,
                    rem=rem1, tail_fn=tail1 if rem1 else None)
            elif self._unroll2(budget1):
                # 2x-unrolled body: the while-loop carry's pr buffer
                # ping-pongs through the two calls and returns to its
                # slot, so XLA's fixed per-slot buffer assignment needs
                # no per-iteration carry copy (the 1x body must copy the
                # kernel's fresh pr output back into the carry buffer
                # every iteration — pr cannot alias in-place because its
                # input blocks are read at +-1-row offsets). Global
                # iteration 2 runs ahead of the loop so bodies start at
                # even parity; chunk boundaries (even, since nchk is
                # even) then always land on call 2, and call 1's check
                # flag is identically false. Kernel-call sequence, flags,
                # and exit decisions are exactly the 1x loop's, so
                # iteration counts and fields are bit-identical.
                pr_pad, dpr_f, _ = iter_fn(pr_pad, dpr_f, rhs_f, False)

                def step1(carry, it):
                    pp, df = carry
                    pp, df, _ = iter_fn(pp, df, rhs_f, False)
                    pp, df, ec = iter_fn(pp, df, rhs_f,
                                         (it + 2) % grid.nchk == 0)
                    return ((pp, df), jnp.max(ec) * err_scale,
                            jnp.int32(2))

                it0 = 2
            else:
                def step1(carry, it):
                    pp, df = carry
                    pp, df, ec = iter_fn(pp, df, rhs_f,
                                         (it + 1) % grid.nchk == 0)
                    return ((pp, df), jnp.max(ec) * err_scale,
                            jnp.int32(1))

                it0 = 1

            if not plan1:
                (pr_pad, dpr_f), it1, err1, hist1 = pt_loop_fused(
                    step1, (pr_pad, dpr_f), it0, budget1,
                    grid.nchk, nchunks, eps1, self.dtype,
                    stall=stall1 if hybrid else self._stall)
        else:
            def run_iters(pr_pad, dpr_f, n, k):
                return lax.fori_loop(
                    0, n, lambda _, c: iter_fn(*c, rhs_f)[:2],
                    (pr_pad, dpr_f))

            def residual_err(pr_pad):
                pr3d, _ = unpack(pr_pad, dpr_f)
                rp = ph.poisson_residual(pr3d, divv, rho, dt,
                                         grid.dx, grid.dy, grid.dz)
                return jnp.max(jnp.abs(rp)) * err_scale

            pr_pad, dpr_f, it1, err1, hist1 = pt_loop(
                run_iters, residual_err,
                pr_pad, dpr_f, nchunks, grid.nchk, 0 if hybrid else rem,
                eps_it, self.dtype, stall=stall1 if hybrid else self._stall)
        if not hybrid:
            pr1, dpr1 = unpack(pr_pad, dpr_f)
            if folded:
                # materialize the zero-gradient boundary planes
                pr1 = self.set_bc_pr(pr1)
            return pr1, dpr1, StepStats(iters=it1, err=err1, err_hist=hist1)

        hist_nan = jnp.full_like(hist1, jnp.nan)

        if defect:
            # ---- phase 2: restarted defect correction ----
            # The plain phase stalls at its float32 noise floor, which is
            # dominated by the eps*|rhs| evaluation noise of the residual
            # (|rhs|~5e7 at the showcase gpu preset). Evaluate the true
            # residual r0 ONCE with compensated arithmetic (error
            # ~eps*|r0|; kernels/poisson.py compensated_residual) and
            # solve lap(delta) = -r0 with the SAME plain kernel: the
            # correction problem's residual scale is |r0| (~5 orders
            # smaller), so plain float32 genuinely reaches eps_it. One
            # round: its entry evaluation doubles as the honest
            # convergence check of the incoming state, and the reported
            # err is the loop's kernel-emitted exit residual of the
            # correction iterate (see the error-semantics note below —
            # a second round could never beat the stored-field floor).
            comp = iter_fn.compensated_residual
            n2 = nchunks * grid.nchk + rem
            rhs_lo_f = pack(pr, dprdtau, rhs_lo3d)[2]
            r0, emax = comp(pr_pad, rhs_f, rhs_lo_f)
            errh = emax * err_scale
            rhs_c = -r0

            pland = self._sweep_plan(iter_fn, nchunks * grid.nchk)
            n2_loop, rem2 = n2, 0
            tail2 = None
            if pland:
                # two temporal s-sweep calls per body; it0=0 is already
                # 2s-parity, and the loop may exit before its first body
                # via err0=errh. The trailing partial chunk becomes the
                # post-loop tail (identical 1-sweep iterations).
                s_d, sweep_d = pland
                n_d = 2 * s_d

                def stepd(carry, it):
                    dl, dd, _ = sweep_d(*carry, rhs_c, False)
                    dl, dd, ec = sweep_d(dl, dd, rhs_c,
                                         (it + n_d) % grid.nchk == 0)
                    return ((dl, dd),
                            jnp.max(ec) * err_scale, jnp.int32(n_d))

                n2_loop, rem2 = nchunks * grid.nchk, rem
                if rem2:
                    def tail2(carry):
                        return lax.fori_loop(
                            0, rem2,
                            lambda _, c: iter_fn(*c, rhs_c, False)[:2],
                            carry)
            elif self._unroll2(n2):
                # same 2x body as phase 1 (buffer ping-pong, no carry
                # copy); it0=0 is already even, and the loop may exit
                # before its first body via err0=errh, so no iteration
                # runs ahead of it here.
                def stepd(carry, it):
                    dl, dd, _ = iter_fn(*carry, rhs_c, False)
                    dl, dd, ec = iter_fn(dl, dd, rhs_c,
                                         (it + 2) % grid.nchk == 0)
                    return ((dl, dd),
                            jnp.max(ec) * err_scale, jnp.int32(2))
            else:
                def stepd(carry, it):
                    dl, dd, ec = iter_fn(*carry, rhs_c,
                                         (it + 1) % grid.nchk == 0)
                    return ((dl, dd),
                            jnp.max(ec) * err_scale, jnp.int32(1))

            # delta starts at 0 but dprdtau CARRIES OVER: by linearity
            # the correction then continues the phase-1 trajectory
            # exactly (resid is the same quantity), just evaluated
            # against the small |r0| instead of |rhs| — resetting dpr
            # would relaunch the marginal PT wave transients from a
            # rough forcing and stall. Seeding err0=errh makes the loop
            # itself a no-op when phase 1 already converged — wrapping
            # it in lax.cond instead would re-trigger the per-iteration
            # copy penalty (ptloop.pt_loop_fused docstring).
            #
            # Error semantics match the extended phase: the reported err
            # is the residual of the solution ITERATE p1 (+) delta (the
            # quantity the loop drives below eps_it). Rounding the sum
            # into the single returned float32 field re-adds the field's
            # representation noise (~eps32*|p|*6/h^2 — ~1e-2 in err
            # units at the 255 showcase grid, for ANY f32 storage
            # scheme; the extended pair's rounded hi has the same
            # floor). See docs/numerics.md; a second correction round
            # can therefore never improve the stored field and is not
            # attempted.
            (dl, d_f), it2, err, hist2 = pt_loop_fused(
                stepd, (jnp.zeros_like(pr_pad), dpr_f),
                0, n2_loop, grid.nchk, nchunks, eps_it, self.dtype,
                stall=self._stall, err0=errh, rem=rem2, tail_fn=tail2)
            hist = jnp.where(jnp.isnan(hist1),
                             jnp.roll(hist2, it1 // grid.nchk), hist1)
            if want_pair:
                # two_sum(p1, delta) represents the converged iterate
                # p1 (+) delta EXACTLY as a stored (hi, lo) pair — the
                # stored state then meets eps_it, not just the in-solve
                # iterate (the single rounded field re-adds ~3e-2 err
                # units at 255; docs/numerics.md "What still floors").
                comp3d = self._comp_residual_fn()
                rhs_hi_in = rhs3d[1:-1, 1:-1, 1:-1]
                rhs_lo_in = rhs_lo3d[1:-1, 1:-1, 1:-1]

                def pair_of(dl_f, df):
                    p13, dpr2 = unpack(pr_pad, df)
                    dl3, _ = unpack(dl_f, df)
                    hi, lo = _two_sum(p13, dl3)
                    hi, lo = self.set_bc_pr_pair(hi, lo)
                    return hi, lo, dpr2

                def true_err(dl_f, df):
                    hi, lo, _ = pair_of(dl_f, df)
                    return comp3d(hi, lo, rhs_hi_in,
                                  rhs_lo_in)[1] * err_scale

                # ---- stored-state guarantee (cold path) ----
                # The fused loop's exit check is the residual ONE
                # iteration before the returned state, evaluated with
                # plain-f32 noise at |delta| scale (ptloop.pt_loop_fused
                # "Convergence semantics"). On MARGINAL exits (check
                # just under eps_it) the returned pair's true residual
                # can land a few percent above eps_it — measured at
                # multi nx=63 on v5e: check 9.92e-4, stored 1.098e-3.
                # When the exit is marginal, re-evaluate the pair with
                # the compensated residual (the stored-state criterion
                # itself, = stored_residual_err) and keep iterating in
                # nchk chunks until the STORED state meets eps_it or
                # the phase-2 budget runs out. The Float64 reference's
                # exact check would also have kept iterating at such a
                # state (gpu.jl:132-135), so this moves f32 iteration
                # counts toward the reference's, never away. Cost when
                # not marginal: none (lax.cond cold branch).
                def guarantee(args):
                    dl_f, df, it2v, errv = args

                    def cond(c):
                        dl_c, df_c, itv, _ = c
                        return ((true_err(dl_c, df_c) >= eps_it)
                                & (itv + grid.nchk <= n2))

                    def body_fn(c):
                        dl_c, df_c, itv, ev = c
                        dl_c, df_c = lax.fori_loop(
                            0, grid.nchk,
                            lambda _, cc: iter_fn(*cc, rhs_c, False)[:2],
                            (dl_c, df_c))
                        return dl_c, df_c, itv + grid.nchk, ev

                    dl_f, df, it2v, _ = lax.while_loop(
                        cond, body_fn, (dl_f, df, it2v, errv))
                    return dl_f, df, it2v, true_err(dl_f, df)

                marginal = ((err >= jnp.asarray(0.85 * eps_it,
                                                self.dtype))
                            & (err < eps_it) & (it2 > 0))
                dl, d_f, it2, err = lax.cond(
                    marginal, guarantee, lambda a: a,
                    (dl, d_f, it2, err))
                hi, lo, dpr2 = pair_of(dl, d_f)
                return hi, dpr2, StepStats(iters=it1 + it2, err=err,
                                           err_hist=hist, iters_ext=it2,
                                           pr_lo=lo)
            pr2, dpr2 = unpack(pr_pad + dl, d_f)
            pr2 = self.set_bc_pr(pr2)
            return pr2, dpr2, StepStats(iters=it1 + it2, err=err,
                                        err_hist=hist, iters_ext=it2)

        # ---- phase 2: extended (double-single) kernel continuation ----
        # The plain phase stops at its float32 noise floor; the pair
        # carries ~48 bits, so iteration keeps converging from that warm
        # start down to eps_it (or the evaluation-noise floor, where the
        # stall detector exits). Skipped entirely if phase 1 converged.
        pr1, dpr1 = unpack(pr_pad, dpr_f)
        from ..ops import stencil as stc
        iter_e, pack_e, unpack_e = self._pallas_ext

        def phase2(args):
            pr1, dpr1 = args
            hi_f, lo_f, dpf0, rhf = pack_e(pr1, dpr1, rhs3d)

            if folded:
                budget2 = nchunks * grid.nchk + rem
                if self._unroll2(budget2):
                    # 2x body (see phase 1): the (hi, lo) pair buffers
                    # ping-pong through the two calls with no carry copy
                    def step2(carry, it):
                        hi, lo, dpf = carry
                        hi, lo, dpf, _ = iter_e(hi, lo, dpf, rhf, False)
                        hi, lo, dpf, ec = iter_e(
                            hi, lo, dpf, rhf, (it + 2) % grid.nchk == 0)
                        return ((hi, lo, dpf),
                                jnp.max(ec) * err_scale, jnp.int32(2))
                else:
                    def step2(carry, it):
                        hi, lo, dpf = carry
                        hi, lo, dpf, ec = iter_e(
                            hi, lo, dpf, rhf, (it + 1) % grid.nchk == 0)
                        return ((hi, lo, dpf),
                                jnp.max(ec) * err_scale, jnp.int32(1))

                (hi, lo, dpf), it2, err2, hist2 = pt_loop_fused(
                    step2, (hi_f, lo_f, dpf0), 0,
                    budget2, grid.nchk, nchunks,
                    eps_it, self.dtype, stall=self._stall)

                if want_pair:
                    # ---- stored-state guarantee (cold path) ----
                    # Same rationale as the defect branch's guarantee:
                    # the fused loop's exit check is one iteration stale
                    # and f32-evaluated, so a MARGINAL exit can return a
                    # pair whose true (compensated) residual sits a few
                    # percent above eps_it. Re-evaluate with the
                    # stored-state criterion itself and keep iterating
                    # in nchk chunks while it fails and budget remains.
                    comp3d = self._comp_residual_fn()

                    def true_err_f(hi_v, lo_v, dpf_v):
                        # the rhs pair is (re)computed here so it stays
                        # INSIDE the lax.cond cold branch (a closure-
                        # captured value would be hoisted to a cond
                        # operand and computed on every phase-2 run)
                        rhs_hi_g, rhs_lo_g = dsops.rhs_pair(
                            divv, rho / dt, self._z_hoist)
                        hi3, lo3, _ = unpack_e(hi_v, lo_v, dpf_v)
                        hi3, lo3 = self.set_bc_pr_pair(hi3, lo3)
                        return comp3d(hi3, lo3,
                                      rhs_hi_g[1:-1, 1:-1, 1:-1],
                                      rhs_lo_g[1:-1, 1:-1, 1:-1]
                                      )[1] * err_scale

                    def guarantee(args):
                        hi_v, lo_v, dpf_v, itv, errv = args

                        def g_cond(c):
                            h, l, d, iv, _ = c
                            return ((true_err_f(h, l, d) >= eps_it)
                                    & (iv + grid.nchk <= budget2))

                        def g_body(c):
                            h, l, d, iv, ev = c
                            h, l, d = lax.fori_loop(
                                0, grid.nchk,
                                lambda _, cc: iter_e(*cc, rhf,
                                                     False)[:3],
                                (h, l, d))
                            return h, l, d, iv + grid.nchk, ev

                        hi_v, lo_v, dpf_v, itv, _ = lax.while_loop(
                            g_cond, g_body,
                            (hi_v, lo_v, dpf_v, itv, errv))
                        return (hi_v, lo_v, dpf_v, itv,
                                true_err_f(hi_v, lo_v, dpf_v))

                    marginal = ((err2 >= jnp.asarray(0.85 * eps_it,
                                                     self.dtype))
                                & (err2 < eps_it))
                    hi, lo, dpf, it2, err2 = lax.cond(
                        marginal, guarantee, lambda a: a,
                        (hi, lo, dpf, it2, err2))
                prc = (hi, lo)
            else:
                def run_iters_e(prc, dpf, n):
                    hi, lo, dpf = lax.fori_loop(
                        0, n, lambda _, c: iter_e(*c, rhf)[:3],
                        (*prc, dpf))
                    return (hi, lo), dpf

                def residual_err_e(prc):
                    hi3, lo3, _ = unpack_e(*prc, prc[0])
                    # difference-first lap: the d2 form's eps*|hi|
                    # evaluation noise would floor the metric above eps_it
                    rp = ((stc.laplacian_inner_ds(hi3, grid.dx, grid.dy,
                                                  grid.dz)
                           - (rho / dt) * stc.inn(divv))
                          + stc.laplacian_inner_ds(lo3, grid.dx, grid.dy,
                                                   grid.dz))
                    return jnp.max(jnp.abs(rp)) * err_scale

                prc, dpf, it2, err2, hist2 = pt_loop(
                    lambda p, d, n, k: run_iters_e(p, d, n),
                    residual_err_e, (hi_f, lo_f), dpf0, nchunks,
                    grid.nchk, rem, eps_it, self.dtype, stall=self._stall)
            # hi is the correctly-rounded f32 field (two_sum renormalized)
            pr2, lo2, dpr2 = unpack_e(*prc, dpf)
            return pr2, lo2, dpr2, it2, err2, hist2

        def skip(args):
            pr1, dpr1 = args
            return (pr1, jnp.zeros_like(pr1), dpr1, jnp.int32(0), err1,
                    hist_nan)

        ran2 = (err1 >= eps_it) & jnp.isfinite(err1)
        pr2, lo2, dpr2, it2, err2, hist2 = lax.cond(ran2, phase2, skip,
                                                    (pr1, dpr1))
        iters = it1 + it2
        err = jnp.where(ran2, err2, err1)
        # splice phase-2 checks after phase 1's in the history
        hist = jnp.where(jnp.isnan(hist1),
                         jnp.roll(hist2, it1 // grid.nchk), hist1)
        if want_pair and folded:
            # the loop's (hi, lo) iterate crosses the step boundary as
            # the stored pair (FlowState.pr_lo)
            pr2, lo2 = self.set_bc_pr_pair(pr2, lo2)
            return pr2, dpr2, StepStats(iters=iters, err=err,
                                        err_hist=hist, iters_ext=it2,
                                        pr_lo=lo2)
        if folded:
            # materialize the zero-gradient boundary planes
            pr2 = self.set_bc_pr(pr2)
        return pr2, dpr2, StepStats(iters=iters, err=err, err_hist=hist,
                                    iters_ext=it2)

    def _poisson_solve_jnp(self, pr, dprdtau, divv):
        grid, phys = self.grid, self.cfg.physics
        num = self.cfg.numerics
        rho, dt, dtau, damp = phys.rho, grid.dt, grid.dtau, grid.damp
        dx, dy, dz = grid.dx, grid.dy, grid.dz
        eps_it = num.eps_it
        nchunks = grid.niter // grid.nchk
        rem = grid.niter - nchunks * grid.nchk

        def one_iter(_, carry):
            pr, dpr = carry
            pr, dpr = ph.poisson_iter(pr, dpr, divv, rho, dt, dtau, damp,
                                      dx, dy, dz)
            pr = self.set_bc_pr(pr)
            return (pr, dpr)

        def run_iters(pr, dpr, n):
            return lax.fori_loop(0, n, one_iter, (pr, dpr))

        def residual_err(pr):
            # err = max|Rp| * ly^2 / psc, in the reference's evaluation
            # order (NavierStokes3D_gpu.jl:132).
            rp = ph.poisson_residual(pr, divv, rho, dt, dx, dy, dz)
            return jnp.max(jnp.abs(rp)) * (grid.ly * grid.ly) / phys.psc

        # the exact backend serves the compat path: reference loop
        # semantics exactly, no stall exit
        pr, dprdtau, iters, err, hist = pt_loop(
            lambda p, d, n, k: run_iters(p, d, n), residual_err,
            pr, dprdtau, nchunks, grid.nchk, rem, eps_it, self.dtype,
            stall=None)
        return pr, dprdtau, StepStats(iters=iters, err=err, err_hist=hist)

    def step_shard_map_jit(self, mesh, use_pallas: bool | None = None):
        """Jitted step whose Poisson hot loop runs under shard_map with
        explicit ppermute halo exchanges and in-loop pmax reductions
        (parallel/halo.py); the rest of the step stays global-view (XLA
        partitions it). The communication-honest scaling path.

        use_pallas: run the fused Pallas kernel per shard (auto: when the
        solver has a kernel built, the mesh is x-only, and halo width is
        1 — the configuration where the kernel composes; otherwise the
        jnp ppermute-halo loop runs)."""
        from ..parallel.halo import build_poisson_shard_map
        from ..parallel.mesh import replicated, state_shardings
        if use_pallas is None:
            use_pallas = (self._pallas is not None
                          and mesh.shape["y"] == 1
                          and mesh.shape["z"] == 1
                          and self.cfg.parallel.halo == 1)
        interpret = jax.default_backend() in ("cpu", "gpu")
        solve = build_poisson_shard_map(
            mesh, self.grid, self.cfg.physics, self.cfg.numerics.eps_it,
            self.cfg.variant, self.dtype,
            halo_width=self.cfg.parallel.halo,
            pressure_split=self.pressure_split, stall=self._stall,
            use_pallas=use_pallas, extended=self.extended and use_pallas,
            interpret=interpret)
        rho, dt = self.cfg.physics.rho, self.grid.dt

        def poisson(pr, dprdtau, divv):
            pr, dprdtau, iters, err, hist = solve(pr, dprdtau,
                                                  (rho / dt) * divv)
            return pr, dprdtau, StepStats(iters=iters, err=err,
                                          err_hist=hist)

        def step(state):
            # pallas_call cannot be partitioned by the SPMD partitioner:
            # on a real multi-device mesh the global-view parts of the
            # step (advect, fused pre/post) must use the jnp ops — only
            # the shard_map'd Poisson solve above composes with Pallas.
            return self._step_impl(state, poisson,
                                   allow_pallas_advect=(mesh.size == 1))

        sh = state_shardings(mesh)
        rep = replicated(mesh)
        stats_sh = StepStats(iters=rep, err=rep, err_hist=rep,
                             advect_clamped=rep)
        return jax.jit(step, donate_argnums=0,
                       in_shardings=(sh,), out_shardings=(sh, stats_sh))

    def step_fullstep_jit(self, mesh, use_pallas: bool | None = None):
        """Jitted step with the ENTIRE Chorin step under one shard_map:
        owned-face staggered velocity storage (every field shards on all
        three mesh axes) and explicit ppermute halo exchanges for every
        stage — the communication-complete analog of the reference's
        update_halo! schedule (multi_gpu.jl:446-477). Operates on the
        DistState layout of parallel/fullstep.py (to_dist/from_dist
        convert at I/O boundaries)."""
        from ..parallel.fullstep import build_fullstep
        return build_fullstep(self, mesh, use_pallas=use_pallas)

    # ---- full step ----

    def step(self, state: FlowState) -> Tuple[FlowState, StepStats]:
        return self._step_impl(state, self.poisson_solve)

    def predictor_divv(self, state: FlowState, *, allow_pallas: bool = True):
        """The predictor-velocity divergence a step taken FROM `state`
        hands to its Poisson solve (the _step_impl prelude, bit-exact
        with the path the corresponding step variant runs). Jit-safe;
        use to snapshot the RHS before a donating step_jit call deletes
        `state` (stored_residual_err consumes it).

        allow_pallas=False forces the jnp prelude — REQUIRED when the
        state is sharded over a multi-device mesh (the SPMD partitioner
        cannot partition the fused pallas_call; step_sharded_jit /
        step_shard_map_jit run the jnp prelude for the same reason) or
        when matching a step that ran with Pallas disabled. Concrete
        multi-device-sharded inputs are detected and routed to the jnp
        prelude automatically; only traced (in-jit) calls still rely on
        the caller passing allow_pallas=False."""
        if allow_pallas:
            try:  # tracers have no committed sharding — leave them alone
                sh = getattr(state.vx, "sharding", None)
                if sh is not None and getattr(sh, "num_devices", 1) > 1:
                    allow_pallas = False
            except Exception:
                pass
        if state.vx.ndim == 2:  # flat-state mode (NumericsConfig.flat_state)
            if self._fused_pre is not None and allow_pallas:
                lay = self._fused_pre.layout
                dvf = self._fused_pre.run_flat(state.vx, state.vy,
                                               state.vz)[3]
                return lay.unflat(dvf, self.grid.nx, self.grid.ny,
                                  self.grid.nz)
            state = self.canonical_state(state)
        if self._fused_pre is not None and allow_pallas:
            # the step's own prelude (bit-exact with _step_impl's fused
            # branch, which is what a donating single-device step_jit ran)
            return self._fused_pre(state.vx, state.vy, state.vz)[3]
        grid, phys = self.grid, self.cfg.physics
        dx, dy, dz = grid.dx, grid.dy, grid.dz
        g_eff = 0.0 if self.pressure_split else phys.g
        taus = ph.update_tau(state.vx, state.vy, state.vz, phys.mu,
                             dx, dy, dz)
        vx, vy, vz = ph.predict_v(state.vx, state.vy, state.vz, *taus,
                                  phys.rho, g_eff, grid.dt, dx, dy, dz)
        _, vx, vy, vz = apply_cylinder(state.c, vx, vy, vz, self.masks)
        return ph.update_divv(vx, vy, vz, dx, dy, dz)

    def stored_residual_err(self, state_after: FlowState, *,
                            state_before: FlowState = None, divv=None,
                            allow_pallas: bool = True):
        """Re-evaluate the reference's convergence criterion on the
        STORED pressure of `state_after` (the state `step` returned):
        max |lap(pr (+) pr_lo) - rhs| * ly^2/psc, with rhs rebuilt
        bit-exactly from the pre-step predictor divergence (pass either
        `state_before` or its `predictor_divv`) and both operands
        evaluated in compensated (double-single) arithmetic — f64-grade
        accuracy in pure f32, so it runs on TPU. The reference evaluates
        this on its Float64 stored field (NavierStokes3D_gpu.jl:132-135);
        this is the independent check that the (hi, lo) stored pair
        actually meets err < eps_it across the step boundary. Jit-safe."""
        if divv is None:
            divv = self.predictor_divv(state_before,
                                       allow_pallas=allow_pallas)
        grid, phys = self.grid, self.cfg.physics
        zh = self._z_hoist[1:-1] if self.pressure_split else None
        rhs_hi, rhs_lo = dsops.rhs_pair(divv[1:-1, 1:-1, 1:-1],
                                        phys.rho / grid.dt, zh)
        comp = self._comp_residual_fn()
        lo = (state_after.pr_lo if state_after.pr_lo is not None
              else jnp.zeros_like(state_after.pr))
        _, emax = comp(state_after.pr, lo, rhs_hi, rhs_lo)
        return emax * (grid.ly * grid.ly) / phys.psc

    def _step_impl(self, state: FlowState, poisson_fn,
                   allow_pallas_advect: bool = True
                   ) -> Tuple[FlowState, StepStats]:
        grid, phys = self.grid, self.cfg.physics
        rho, mu, g = phys.rho, phys.mu, phys.g
        dt = grid.dt
        dx, dy, dz = grid.dx, grid.dy, grid.dz

        # Under the hydrostatic split the predictor's -rho*g body force
        # cancels exactly against d/dz P_static in the corrector (both are
        # dt*g per step); folding the cancellation out keeps it exact in
        # float32 instead of round-tripping through two large terms.
        g_eff = 0.0 if self.pressure_split else g
        fused = self._fused_pre is not None and allow_pallas_advect
        if (fused and self._fused_post is not None
                and self._advect_flat is not None
                and self.advect_method == "selectshift"):
            return self._step_chained(state, poisson_fn)
        if state.vx.ndim == 2:
            # a flat-mode state reaching a non-chained path (e.g. clamp
            # escalation flipped the advection method to 'gather'):
            # drop back to the canonical representation for good
            state = self.canonical_state(state)
        if fused:
            # fused stress+predictor+cylinder+divergence (one HBM pass
            # over the velocities instead of ~15 XLA fusions)
            vx, vy, vz, divv = self._fused_pre(state.vx, state.vy,
                                               state.vz)
            c = jnp.where(self.masks.mask_c[:, :, None],
                          jnp.ones((), state.c.dtype), state.c)
        else:
            taus = ph.update_tau(state.vx, state.vy, state.vz, mu,
                                 dx, dy, dz)
            vx, vy, vz = ph.predict_v(state.vx, state.vy, state.vz, *taus,
                                      rho, g_eff, dt, dx, dy, dz)
            c, vx, vy, vz = apply_cylinder(state.c, vx, vy, vz, self.masks)
            divv = ph.update_divv(vx, vy, vz, dx, dy, dz)
        pr, dprdtau, stats = poisson_fn(state.pr, state.dprdtau, divv)
        # pop the stored-pair low word out of the internal stats channel
        # into the state (the corrector and the next solve's warm start
        # use hi only — the pair's job is making the STORED pressure meet
        # eps_it across the step boundary, docs/numerics.md)
        pr_lo = stats.pr_lo
        stats = stats.replace(pr_lo=None)
        if self._fused_post is not None and allow_pallas_advect:
            # fused correction+cylinder+BC stack; C's (idempotent) second
            # mask set is skipped — the fused prelude above already ran it
            vx, vy, vz = self._fused_post(vx, vy, vz, pr)
        else:
            vx, vy, vz = ph.correct_v(vx, vy, vz, pr, dt, rho, dx, dy, dz)
            c, vx, vy, vz = apply_cylinder(c, vx, vy, vz, self.masks)
            vx, vy, vz = self.set_bc_vel(vx, vy, vz)
        # gate on advect_method at trace time: clamp escalation (run.py)
        # may flip the method to 'gather' and re-jit
        if (self._advect_pallas is not None and allow_pallas_advect
                and self.advect_method == "selectshift"):
            vx, vy, vz, c, n_clamped = self._advect_pallas(vx, vy, vz, c)
        else:
            vx, vy, vz, c, n_clamped = advect(vx, vy, vz, c, dt, dx, dy,
                                              dz, compat=self.cfg.compat,
                                              method=self.advect_method,
                                              with_stats=True,
                                              k=self.advect_k)
        new_state = FlowState(pr=pr, vx=vx, vy=vy, vz=vz, c=c,
                              dprdtau=dprdtau, pr_lo=pr_lo)
        return new_state, stats.replace(advect_clamped=n_clamped)

    def _step_chained(self, state: FlowState, poisson_fn
                      ) -> Tuple[FlowState, StepStats]:
        """The fully fused TPU step: the whole non-Poisson chain runs in
        the shared flat layout (kernels/fused_step.py CommonLayout) —
        ONE flatten per input field at entry and one unflatten per output
        field at exit; predict -> correct -> advect hand flat operands
        directly to each other, with the face-averaged advecting
        velocities computed inside the advect kernel. Bit-compatible with
        _step_impl's unchained branches (same kernels, conversions are
        exact zero-pads/crops)."""
        grid = self.grid
        nx, ny, nz = grid.nx, grid.ny, grid.nz
        lay = self._advect_flat.layout
        flat_in = state.vx.ndim == 2  # flat-state mode: fields arrive flat
        if flat_in:
            vxf, vyf, vzf, cf0 = state.vx, state.vy, state.vz, state.c
        else:
            vxf = lay.flat(state.vx)
            vyf = lay.flat(state.vy)
            vzf = lay.flat(state.vz)
            cf0 = lay.flat(state.c)
        vxf, vyf, vzf, dvf = self._fused_pre.run_flat(vxf, vyf, vzf)
        divv = lay.unflat(dvf, nx, ny, nz)
        cf = jnp.where(self._fused_pre.cmask_flat,
                       jnp.ones((), state.c.dtype), cf0)
        pr, dprdtau, stats = poisson_fn(state.pr, state.dprdtau, divv)
        pr_lo = stats.pr_lo
        stats = stats.replace(pr_lo=None)
        vxf, vyf, vzf = self._fused_post.run_flat(vxf, vyf, vzf,
                                                  lay.flat(pr))
        vxf, vyf, vzf, cf, n_clamped = self._advect_flat(vxf, vyf, vzf, cf)
        if flat_in:
            new_state = FlowState(pr=pr, vx=vxf, vy=vyf, vz=vzf, c=cf,
                                  dprdtau=dprdtau, pr_lo=pr_lo)
        else:
            new_state = FlowState(pr=pr,
                                  vx=lay.unflat(vxf, nx + 1, ny, nz),
                                  vy=lay.unflat(vyf, nx, ny + 1, nz),
                                  vz=lay.unflat(vzf, nx, ny, nz + 1),
                                  c=lay.unflat(cf, nx, ny, nz),
                                  dprdtau=dprdtau, pr_lo=pr_lo)
        return new_state, stats.replace(advect_clamped=n_clamped)

    # ---- convenience driver (host loop; I/O hooks live in run.py) ----

    def run(self, nt: int | None = None, state: FlowState | None = None,
            callback=None):
        nt = self.cfg.numerics.nt if nt is None else nt
        state = self.init_state() if state is None else state
        all_stats = []
        for it in range(1, nt + 1):
            state, stats = self.step_jit(state)
            all_stats.append(stats)
            if callback is not None:
                callback(it, state, stats)
        return state, all_stats


def gather_inner(state: FlowState):
    """Global inner fields as returned by the reference's final gather
    (NavierStokes3D_multi_gpu.jl:528-535): C,Pr (nx-2,ny-2,nz-2) and the
    velocities with their staggered dim one larger."""
    sl = slice(1, -1)
    return (
        np.asarray(state.c[sl, sl, sl]),
        np.asarray(state.pr[sl, sl, sl]),
        np.asarray(state.vx[sl, sl, sl]),
        np.asarray(state.vy[sl, sl, sl]),
        np.asarray(state.vz[sl, sl, sl]),
    )
