#!/bin/bash
# Ablate the round-3 recipe-config factors one at a time against the
# working diag baseline (fp32 / no augment / lr 0.01 / bs 128 -> 17% NME):
# device_augment, bf16 compute, and recipe-scale batch/LR. One TPU process
# at a time; each arm trains 24 epochs on 2048 dot-task crops (~3 min) and
# prints the full mode/protocol report (scripts/diag_learn.py).
set -u
cd "$(dirname "$0")/.."
run() {
  name=$1; shift
  echo "=== ARM $name ($*) ==="
  env DIAG_PLATFORM=tpu DIAG_TASK=dots "$@" python scripts/diag_learn.py \
    2>&1 | grep -v -E "aot_loader|SIGILL|machine features|Machine type|axon" \
    | sed "s/^/[$name] /"
}
run B_augment    DIAG_AUGMENT=1
run C_bf16       DIAG_DTYPE=bfloat16
run D_bf16_aug   DIAG_DTYPE=bfloat16 DIAG_AUGMENT=1
# E: recipe-proxy scale — bs1024 @ lr 0.08 (same per-sample LR), 16K crops,
# 30 epochs; bf16 + augment like the recorded runs.
run E_recipe     DIAG_DTYPE=bfloat16 DIAG_AUGMENT=1 DIAG_LR=0.08 \
                 DIAG_BS=1024 DIAG_N=16384 DIAG_EPOCHS=30
echo "=== SWEEP DONE ==="
