"""Export a trained TrainState checkpoint as a compact inference asset.

The full recipe checkpoint (`scripts/train_full_recipe.py`) is a ~32 MB
TrainState (params + batch_stats + SGD momentum). For distribution we keep
only the inference variables, cast to float16, and compress — ~7 MB — the
same role as the reference's released `pretrained/best.pth.tar`
(reference README.md:105). Load with
`synergynet_tpu.core.checkpoint.load_trained_variables`.

Usage:
  python scripts/export_trained.py CKPT OUT [--verify]

--verify reloads the exported asset on the CPU backend and scores it on
the shaded synthetic AFLW2000 protocol (std=130) — the same in-train eval
the recipe run records — to prove the asset round-trips.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("out")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--eval-n", type=int, default=256)
    args = ap.parse_args()

    with np.load(args.ckpt, allow_pickle=False) as z:
        meta = json.loads(str(z["__metadata__"])) if "__metadata__" in z.files else {}
        keep = {}
        for k in z.files:
            # lstrip: pre-normalization TrainState snapshots prefix struct
            # fields with a dot (".params/..."); current ones don't.
            if k.lstrip(".").startswith(("params/", "batch_stats/")):
                arr = z[k]
                if arr.dtype == np.float32:
                    arr = arr.astype(np.float16)
                keep[k] = arr
    meta["format"] = "synergynet-tpu inference variables, fp16"
    tmp = args.out + f".tmp{os.getpid()}.npz"
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(tmp, __metadata__=json.dumps(meta), **keep)
    os.replace(tmp, args.out)
    mb = os.path.getsize(args.out) / 2**20
    print(f"wrote {args.out} ({mb:.1f} MB, {len(keep)} arrays, "
          f"arch={meta.get('arch')})")

    if not args.verify:
        return
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax.numpy as jnp
    from synergynet_tpu.core import enable_compile_cache
    from synergynet_tpu.core.checkpoint import load_trained_variables
    from synergynet_tpu.data import TestTransform, make_synthetic_aflw2000
    from synergynet_tpu.evals import benchmark_pipeline
    from synergynet_tpu.mm3d import load_param_pack
    from synergynet_tpu.nn import SynergyNet

    enable_compile_cache()
    variables = load_trained_variables(args.out)
    model = SynergyNet(arch=meta.get("arch", "mobilenet_v2"),
                       dtype=jnp.bfloat16)
    ep = make_synthetic_aflw2000(args.eval_n, seed=11, appearance="shaded")
    r = benchmark_pipeline(model, variables, ep, load_param_pack(),
                           std=130.0, batch=128, transform=TestTransform())
    print(r["report"])
    print(json.dumps({"nme_mean": r["nme_mean"],
                      "foe_mae": r["foe"]["mae_mean"]}))


if __name__ == "__main__":
    main()
