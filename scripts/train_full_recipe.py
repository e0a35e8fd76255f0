"""Run the COMPLETE reference training recipe on one TPU chip.

The reference trains mobilenet_v2 for 80 epochs over ~680K 300W-LP crops
at batch 1024 (reference train_script.sh:9-27, README.md:111) in ~6 h on
an RTX 3090 (README.md:116). This script executes the same recipe —
same batch size, LR schedule (0.08, milestones 48/64, warmup 5), epoch
count, and data scale — end to end through the production Trainer:
streaming 680K-crop synthetic dataset (GeneratedCropDataset; real 300W-LP
is not redistributable), fused on-device augmentation, bf16 compute,
periodic checkpoints, in-train AFLW2000-protocol eval.

Writes docs/FULL_RECIPE_RUN.json with per-epoch losses, eval metrics, and
total wall time. Expected ~1 h on a v5e chip (vs the reference's ~6 h).

Usage: python scripts/train_full_recipe.py [--epochs N] [--size N]
"""

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO,
                    format="[%(asctime)s] %(message)s", datefmt="%H:%M:%S")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--size", type=int, default=680_000)
    ap.add_argument("--resident", action="store_true",
                    help="device-resident mode: upload the dataset to HBM "
                         "once and run one program per epoch (the dataset "
                         "must fit device memory; 128K crops = 5.5 GB)")
    ap.add_argument("--generative", action="store_true",
                    help="device-GENERATIVE resident mode: only the (n, 62) "
                         "params upload; every batch's crops are rendered "
                         "on device inside the epoch program (shaded "
                         "appearance; supports the full 680K-crop scale "
                         "single-chip — 170 MB resident vs 29 GB)")
    ap.add_argument("--appearance", choices=("dots", "shaded"),
                    default="shaded",
                    help="synthetic crop appearance (shaded = lit surface "
                         "render, the learnable dense-signal task)")
    ap.add_argument("--dtype", choices=("bfloat16", "float32"),
                    default="bfloat16")
    ap.add_argument("--accum-steps", type=int, default=1,
                    help="run the bs1024 batch as N sequential microbatches "
                         "(exact-mean gradients; bs1024 measured fastest as "
                         "2 x bs512, docs/TRAINING.md)")
    ap.add_argument("--save-val-freq", type=int, default=20,
                    help="checkpoint + in-train AFLW2000-protocol eval "
                         "every N epochs")
    ap.add_argument("--eval-n", type=int, default=1024)
    ap.add_argument("--snapshot-dir", default="/tmp/syn_full_recipe")
    ap.add_argument("--out", default="docs/FULL_RECIPE_RUN.json")
    args = ap.parse_args()
    if args.generative and args.appearance != "shaded":
        ap.error("--generative renders on device; requires "
                 "--appearance shaded")

    import jax
    # Expose the host CPU backend alongside the TPU so bulk data prep
    # (GeneratedCropDataset's landmark decode) runs locally instead of
    # paying tunnel compiles. Must happen before backend initialization.
    try:
        cur = jax.config.jax_platforms
        if cur and "cpu" not in cur:
            jax.config.update("jax_platforms", cur + ",cpu")
    except Exception:
        pass

    from synergynet_tpu.core import Config, enable_compile_cache
    from synergynet_tpu.train import Trainer, make_synthetic_eval_hook
    enable_compile_cache()

    cfg = Config()
    cfg.train.batch_size = 1024               # train_script.sh:14
    cfg.train.base_lr = 0.08                  # train_script.sh:13
    cfg.train.milestones = (48, 64)
    cfg.train.warmup = 5
    cfg.train.epochs = args.epochs
    cfg.train.print_freq = 100
    cfg.train.save_val_freq = args.save_val_freq
    cfg.train.accum_steps = args.accum_steps
    cfg.train.snapshot_dir = args.snapshot_dir
    cfg.data.synthetic_size = args.size
    cfg.data.device_augment = True            # fused augmentation (bench_train best cfg)
    cfg.data.appearance = args.appearance
    # Generative mode reads only dataset.params — never materialize crops.
    cfg.data.streaming = args.generative
    cfg.model.compute_dtype = args.dtype

    t0 = time.time()
    trainer = Trainer(cfg, eval_hook=make_synthetic_eval_hook(
        n=args.eval_n, appearance=args.appearance))
    setup_s = time.time() - t0
    print(f"setup (incl. 680K-param decode) {setup_s:.1f}s", flush=True)

    t1 = time.time()
    if args.generative:
        from synergynet_tpu.train import fit_resident_generative
        history = fit_resident_generative(
            trainer, trainer.dataset.params,
            log_fn=lambda e, m: print(
                f"[epoch {e}] loss {m['loss_total']:.4f} "
                f"skipped {m['skipped']:.3f}", flush=True))
    elif args.resident:
        import numpy as np
        from synergynet_tpu.data import GeneratedCropDataset
        from synergynet_tpu.train import fit_resident
        crop_gib = args.size * 120 * 120 * 3 / 2**30
        if crop_gib > 8:
            raise SystemExit(
                f"--resident --size {args.size} needs {crop_gib:.1f} GiB of "
                "HBM per data shard; use <=196608 crops per chip (the full "
                "680K-crop scale is device-resident sharded over >=4 chips)")
        ds = trainer.dataset
        if not hasattr(ds, "generate_images"):
            # Sizes <= 100K route build_dataset to the materialized
            # ArrayDataset; resident mode always wants the generator.
            ds = GeneratedCropDataset(args.size, seed=cfg.train.seed)
        imgs = ds.generate_images(np.arange(len(ds)))
        print(f"generated {len(imgs)} crops "
              f"({imgs.nbytes / 2**30:.2f} GiB) in {time.time()-t1:.1f}s",
              flush=True)
        history = fit_resident(
            trainer, imgs, ds.params,
            log_fn=lambda e, m: print(
                f"[epoch {e}] loss {m['loss_total']:.4f} "
                f"skipped {m['skipped']:.3f}", flush=True))
    else:
        history = trainer.fit()
    train_s = time.time() - t1

    out = {
        "recipe": {"batch_size": 1024, "epochs": args.epochs,
                   "dataset_size": args.size, "base_lr": 0.08,
                   "milestones": [48, 64], "warmup": 5,
                   "device_resident": args.resident,
                   "device_generative": args.generative,
                   "appearance": args.appearance,
                   "device_augment": True,
                   "accum_steps": args.accum_steps,
                   "compute_dtype": args.dtype},
        "wall_seconds_train": round(train_s, 1),
        "wall_seconds_setup": round(setup_s, 1),
        "reference_wall_hours_rtx3090": 6.0,
        "steps_per_epoch": len(trainer.loader),
        "history": {str(k): {m: (round(v, 5) if isinstance(v, float) else v)
                             for m, v in d.items() if m != "eval"}
                    for k, d in history.items()},
        "evals": {str(k): d.get("eval") for k, d in history.items()
                  if "eval" in d},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps({"wall_hours": round(train_s / 3600, 3),
                      "speedup_vs_rtx3090": round(6.0 * 3600 / train_s, 2)}))


if __name__ == "__main__":
    main()
