"""Training CLI — the ``main_train.py`` / ``train_script.sh`` equivalent.

Canonical hyperparameters follow the reference's shipped script
(train_script.sh:9-27): mobilenet_v2, batch 1024, lr 0.08, 80 epochs,
milestones 48,64, warmup 5, 8 workers. Configuration can also come from a
JSON file produced by :class:`synergynet_tpu.core.Config`.
"""

from __future__ import annotations

import argparse
import logging
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="SynergyNet-TPU training")
    p.add_argument("--config", default=None, help="JSON config path")
    p.add_argument("--arch", default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--base-lr", type=float, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--milestones", default=None, help="e.g. 48,64")
    p.add_argument("--warmup", type=int, default=None)
    p.add_argument("--root", default=None)
    p.add_argument("--filelists-train", default=None)
    p.add_argument("--param-fp-train", default=None)
    p.add_argument("--snapshot-dir", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--workers", type=int, default=None)
    p.add_argument("--test-initial", action="store_true")
    p.add_argument("--log-file", default="output.log")
    p.add_argument("--no-eval", action="store_true")
    args = p.parse_args(argv)

    logging.basicConfig(
        format="[%(asctime)s] [p%(process)d] %(message)s",
        level=logging.INFO,
        handlers=[logging.FileHandler(args.log_file, mode="w"),
                  logging.StreamHandler(sys.stdout)])

    from synergynet_tpu.core import Config
    cfg = Config.from_json(args.config) if args.config else Config()
    if args.arch:
        cfg.model.arch = args.arch
    t = cfg.train
    for name, val in (("batch_size", args.batch_size),
                      ("base_lr", args.base_lr), ("epochs", args.epochs),
                      ("warmup", args.warmup), ("resume", args.resume),
                      ("num_workers", args.workers),
                      ("snapshot_dir", args.snapshot_dir)):
        if val is not None:
            setattr(t, name, val)
    if args.milestones:
        t.milestones = tuple(int(m) for m in args.milestones.split(","))
    if args.test_initial:
        t.test_initial = True
    d = cfg.data
    for name, val in (("root", args.root),
                      ("filelists_train", args.filelists_train),
                      ("param_fp_train", args.param_fp_train)):
        if val is not None:
            setattr(d, name, val)

    logging.info("config:\n%s", cfg.to_json())
    from synergynet_tpu.train import Trainer, make_synthetic_eval_hook
    hook = None if args.no_eval else make_synthetic_eval_hook()
    trainer = Trainer(cfg, eval_hook=hook)
    trainer.fit()


if __name__ == "__main__":
    main()
