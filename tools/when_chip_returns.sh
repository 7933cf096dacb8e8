#!/bin/bash
# Probe the tunneled TPU; when it answers, run the round-3 kernel-validation
# sequence serially (ONE TPU process at a time -- see memory/gotchas) and log
# to /tmp/chip_validation.log:
#   1. bench_substep RUN_SPLIT=1  -- resident-vs-split numerics + perf
#   2. ablate_substep             -- per-stage timing attribution
#   3. bench.py                   -- headline sampling + train-loop metrics
#   4. ego_mimic_eval x2          -- cold vs warm-cache inference throughput
# Each step is bounded; the probe repeats every ~9 min until the chip is up.
set -u
LOG=${LOG:-/tmp/chip_validation.log}
cd /root/repo
echo "watcher started $(date)" >> "$LOG"
while true; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
jax.devices()
(jnp.ones((8,128)) @ jnp.ones((128,8))).block_until_ready()
" >/dev/null 2>&1; then
    break
  fi
  sleep 540
done
echo "chip up at $(date)" >> "$LOG"
{
  echo "=== bench_substep (RUN_SPLIT=1) ==="
  RUN_SPLIT=1 timeout 3600 python tools/bench_substep.py
  echo "=== ablate_substep ==="
  timeout 3600 python tools/ablate_substep.py
  echo "=== bench.py ==="
  timeout 3600 python bench.py
  echo "=== eval cold (ego_mimic_eval, synthetic, iter 100) ==="
  timeout 3600 python -m egopose_tpu.cli.ego_mimic_eval \
    --cfg subject_03 --iter 100 --synthetic
  echo "=== eval warm (same command, persistent-cache hit) ==="
  timeout 3600 python -m egopose_tpu.cli.ego_mimic_eval \
    --cfg subject_03 --iter 100 --synthetic
  echo "=== done $(date) ==="
} >> "$LOG" 2>&1
