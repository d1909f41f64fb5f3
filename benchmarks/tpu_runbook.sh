#!/bin/bash
# Careful TPU measurement sequence for the axon environment. Stages are
# ordered safest-first and each gates the next; nothing is ever killed
# mid-operation (killing a client mid-compile/exec has wedged the remote
# TPU runtime for ~1h — see memory/axon-tpu-gotchas).
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_runbook.log}
: > "$LOG"
say() { echo "[runbook] $*" | tee -a "$LOG"; }

say "stage 0: health"
python -c "
import jax, jax.numpy as jnp
print('health:', float((jnp.ones((8,128))*2).sum()))" >>"$LOG" 2>&1 || { say "unhealthy, abort"; exit 1; }

say "stage 1: skipped (already measured)"
true >>"$LOG" 2>&1

say "stage 2: tiny blocked pallas kernel (first pallas contact)"
python - >>"$LOG" 2>&1 <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from navierstokes3d_tpu.kernels.poisson import build_poisson_iter, PoissonBCSpec
nx, ny, nz = 20, 10, 10
bc = PoissonBCSpec(True, None, np.zeros(ny*nz))
it_t, pk_t, up_t = build_poisson_iter(nx, ny, nz, .1,.1,.1, .01, .1, bc,
                                      dtype=jnp.float32, slab=None, mode='blocked')
rng = np.random.default_rng(0)
pr0, rhs0 = rng.random((nx,ny,nz)), rng.random((nx,ny,nz))
args = pk_t(jnp.asarray(pr0,jnp.float32), jnp.zeros((nx,ny,nz),jnp.float32),
            jnp.asarray(rhs0,jnp.float32))
out = jax.jit(it_t)(*args)
pr_t, dpr_t = up_t(*out)
it_i, pk_i, up_i = build_poisson_iter(nx, ny, nz, .1,.1,.1, .01, .1, bc,
                                      dtype=jnp.float32, slab=None,
                                      mode='blocked', interpret=True)
pr_i, dpr_i = up_i(*it_i(*pk_i(jnp.asarray(pr0,jnp.float32),
                               jnp.zeros((nx,ny,nz),jnp.float32),
                               jnp.asarray(rhs0,jnp.float32))))
print('blocked tiny TPU ok; vs interpret maxdiff pr:',
      float(jnp.abs(pr_t-pr_i).max()), 'dpr:', float(jnp.abs(dpr_t-dpr_i).max()))
EOF
grep -q "blocked tiny TPU ok" "$LOG" || { say "pallas blocked failed; stopping before full-size"; exit 2; }

say "stage 3: post-pallas health"
python -c "
import jax, jax.numpy as jnp
print('health2:', float((jnp.ones((8,128))*2).sum()))" >>"$LOG" 2>&1 || { say "device wedged by pallas tiny run"; exit 3; }

say "stage 4: pallas blocked at 255 in the variants bench"
NS3D_PALLAS=1 python benchmarks/poisson_variants.py --nx 255 --iters 300 --pallas >>"$LOG" 2>&1

say "stage 4b: post-pallas-255 health"
timeout 90 python -c "
import jax, jax.numpy as jnp
print('health3:', float((jnp.ones((8,128))*2).sum()))" >>"$LOG" 2>&1 || { say "device wedged by pallas 255 run"; exit 4; }

say "stage 5: full bench.py with pallas"
NS3D_PALLAS=1 python bench.py --steps 2 >>"$LOG" 2>&1

say "done"
tail -30 "$LOG"
