#!/usr/bin/env bash
# Canonical training configuration — the equivalent of the reference's
# train_script.sh:9-27: mobilenet_v2, batch 1024, lr 0.08, 80 epochs,
# milestones 48,64, warmup 5, 8 workers, 300W-LP train_aug_120x120.
# Point --root/--filelists-train/--param-fp-train at the real dataset;
# without them the driver trains on the synthetic stand-in.
set -euo pipefail

python -m synergynet_tpu.cli.train \
    --arch mobilenet_v2 \
    --batch-size 1024 \
    --base-lr 0.08 \
    --epochs 80 \
    --milestones 48,64 \
    --warmup 5 \
    --workers 8 \
    --snapshot-dir ckpts/synergynet_mbv2 \
    --log-file train_mbv2.log \
    "$@"
