#!/bin/bash
# CI entry point (the reference's CI runs Pkg.test with a golden probe,
# .github/workflows/CI.yml; its CI is documented as failing — this one
# must stay green).
set -e
cd "$(dirname "$0")/.."

echo "== unit + parity + sharding tests =="
python -m pytest tests/ -x -q

echo "== graft entry compile checks (8 virtual CPU devices) =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as ge
fn, args = ge.entry()
jax.block_until_ready(jax.jit(fn)(*args))
print("entry() ok")
ge.dryrun_multichip(8)
ge.dryrun_multichip(4)
EOF

echo "== CI green =="
