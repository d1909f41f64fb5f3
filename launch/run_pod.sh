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

NX="${NX:-255}"
NT="${NT:-1000}"
MESH="${MESH:-}"           # e.g. 2x2x2; empty = auto near-cubic factorization
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

mesh = os.environ.get("MESH") or None
if mesh is None:
    from navierstokes3d_tpu.parallel import choose_mesh_shape
    shape = choose_mesh_shape(len(jax.devices()))
    mesh = "x".join(map(str, shape))

argv = ["--nx", os.environ.get("NX", "255"),
        "--nt", os.environ.get("NT", "1000"),
        "--mesh", mesh,
        "--dtype", "float32"]
argv += os.environ.get("EXTRA_ARGS", "").split()
run.main([a for a in argv if a])
PYEOF
