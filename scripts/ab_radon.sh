#!/bin/bash
# A/B the Radon operator modes on the end-to-end CT MFVI fit (TPU).
# Usage: bash scripts/ab_radon.sh [iters]
ITERS=${1:-600}
for mode in matmul pallas banded banded-bf16; do
  echo "=== mode=$mode ==="
  MFVI_DIP_RADON=$mode timeout 900 python bench.py --metric ct --iters $ITERS 2>&1 | grep -v Warning
done
