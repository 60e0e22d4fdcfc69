#!/bin/bash
# Watch for the axon TPU tunnel to return, then run the queued measurements
# (pending in ROADMAP.md: flattened optimizer/sampling bench A/B + LRT TPU
# numbers). The tunnel can be down for hours (CLAUDE.md); this keeps the
# chip-dependent work from blocking the session.
cd /root/repo || exit 1
LOG=${LOG:-/tmp/tpu_queue.log}
echo "[watch] started $(date)" >> "$LOG"
while true; do
  if timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[watch] tunnel UP $(date)" >> "$LOG"
    break
  fi
  echo "[watch] tunnel down $(date)" >> "$LOG"
  sleep 300
done
{
  echo "=== bench --quick warmup ==="
  timeout 1200 python bench.py --quick
  echo "=== bench default (flatten opt + flat sample) ==="
  timeout 1800 python bench.py
  echo "=== bench MFVI_DIP_FLAT_SAMPLE=0 (per-site sampling A/B) ==="
  MFVI_DIP_FLAT_SAMPLE=0 timeout 1800 python bench.py
  echo "=== ab_lrt (LRT Pallas vs XLA block-diagonal, TPU) ==="
  timeout 2400 python scripts/ab_lrt.py
  echo "[watch] queue done $(date)"
} >> "$LOG" 2>&1
