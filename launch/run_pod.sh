#!/bin/bash
# Multi-host TPU pod launch — the counterpart of the reference's SLURM
# script (scripts/runme3D.sh: 8 nodes x 1 MPI rank with CUDA-aware MPI).
#
# On TPU pods there is no mpirun: every host runs the same program and
# jax.distributed discovers the slice topology from the TPU runtime.
# Launch this script on every host of the slice, e.g. with
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#       --command="bash navierstokes3d_tpu/launch/run_pod.sh"
#
# The device mesh spans all chips of the slice; intra-slice halo exchange
# rides ICI (the CUDA-aware-MPI analog is simply XLA's collectives).
set -e
cd "$(dirname "$0")/.."

NX="${NX:-256}"            # global streamwise cells; the default divides
                           # evenly over power-of-two slices so the x-only
                           # mesh (the Pallas fast path) stays eligible
NT="${NT:-1000}"
MESH="${MESH:-}"           # e.g. 8x1x1; empty = auto (prefers x-only —
                           # the ONLY shape the per-shard fused Pallas
                           # Poisson kernel composes on; falls back to
                           # near-cubic + the jnp loop when x-only slabs
                           # would be too thin or NX doesn't divide)
EXTRA_ARGS="${EXTRA_ARGS:-}"

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.cache/jax}"

python - "$@" <<PYEOF
import os
import jax

# Multi-host init: no-op on a single host; on a pod each process joins the
# slice-wide runtime (coordinator discovered from the TPU metadata).
try:
    jax.distributed.initialize()
except Exception as e:  # single-host / already initialized
    print(f"jax.distributed.initialize skipped: {e}")

import navierstokes3d_tpu.run as run

# MESH empty -> 'auto': run.py factorizes all visible devices, preferring
# the x-only shape so --comm auto lands on the shard_map + per-shard
# Pallas fast path (parallel/mesh.choose_mesh_shape documents the rule).
mesh = os.environ.get("MESH") or "auto"

argv = ["--nx", os.environ.get("NX", "256"),
        "--nt", os.environ.get("NT", "1000"),
        "--mesh", mesh,
        "--dtype", "float32"]
argv += os.environ.get("EXTRA_ARGS", "").split()
run.main([a for a in argv if a])
PYEOF
