#!/bin/bash
# Round-3 perf measurement queue (VERDICT r2 items #2 and #3).
#
# Waits for the axon TPU tunnel to come back (probes with a killable
# subprocess — a glitched tunnel can hang mid-compile, not just at
# backend init), then runs the per-op roofline profiles back-to-back:
#   1. headline train step (vq_vae, bs 1024, sum)      -> /tmp/prof_headline.*
#   2. 256px UPGrad step   (vq_vae2, bs 64, upgrad)    -> /tmp/prof_upgrad256.*
#   3. 256px sum step      (vq_vae2, bs 64, sum)       -> /tmp/prof_sum256.*
#
# Usage: setsid nohup bash scripts/perf_wait_and_profile.sh \
#            > /tmp/perf_r3.log 2>&1 & echo $! > /tmp/perf_r3.pid
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 150 python - <<'EOF'
from movae_tpu.utils import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
print("probe ok", float((x @ x).sum()), jax.default_backend())
EOF
}

echo "[$(date +%T)] waiting for tunnel..."
ok=0
for i in $(seq 1 60); do
  if probe; then
    echo "[$(date +%T)] tunnel up (attempt $i)"
    ok=1
    break
  fi
  echo "[$(date +%T)] probe $i failed; sleeping 90s"
  sleep 90
done
# trust the successful in-loop probe; re-probing here risks a momentary
# tunnel flake aborting the whole queue right after it was confirmed up
[ "$ok" = 1 ] || { echo "[$(date +%T)] tunnel never came back; giving up"; exit 1; }

run() {  # run <name> <args...>: two attempts, 900s each
  local name=$1; shift
  for attempt in 1 2; do
    echo "[$(date +%T)] $name attempt $attempt: $*"
    if timeout 900 python scripts/step_profile.py "$@" \
        --json "/tmp/prof_$name.json" > "/tmp/prof_$name.log" 2>&1; then
      echo "[$(date +%T)] $name OK"
      return 0
    fi
    echo "[$(date +%T)] $name attempt $attempt FAILED (tail below)"
    tail -3 "/tmp/prof_$name.log"
    probe || sleep 120
  done
  return 1
}

run headline  --batch_size 1024 --agg sum --steps 10 \
              --trace_dir /tmp/trace_headline
run upgrad256 --batch_size 64 --input_size 256 --arch vq_vae2 \
              --agg upgrad --steps 8 --trace_dir /tmp/trace_upgrad256
run sum256    --batch_size 64 --input_size 256 --arch vq_vae2 \
              --agg sum --steps 8 --trace_dir /tmp/trace_sum256
echo "[$(date +%T)] all profiles done"
