"""Standalone benchmark CLI — the ``benchmark.py`` equivalent.

Runs the AFLW2000-3D protocol (NME by yaw bin + FOE MAE, reference
benchmark.py:218-239) from a checkpoint. With the real ``aflw2000_data``
absent it evaluates on the synthetic protocol pack so the full harness
stays exercisable; pass ``--aflw2000-npz`` with keys
images/pts68_gt/roi_boxes/yaws/pose_gt_pyr/skip_indices for real data.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="SynergyNet-TPU evaluation")
    p.add_argument("-w", "--weights", default=None,
                   help=".npz (framework) or .pth.tar (reference) checkpoint")
    p.add_argument("--arch", default="mobilenet_v2")
    p.add_argument("--aflw2000-npz", default=None)
    p.add_argument("--aflw2000-dir", default=None, metavar="DIR",
                   help="reference-layout aflw2000_data directory "
                        "(AFLW2000-3D_crop + .list + eval/*.npy; "
                        "reference benchmark.py:222-227)")
    p.add_argument("--reannotated", action="store_true",
                   help="use the re-annotated 68-pt GT (calc_nme option "
                        "'re', reference benchmark_aflw2000.py:108)")
    p.add_argument("--save-npz", default=None, metavar="PATH",
                   help="persist the ingested eval pack for fast re-runs")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--std", type=float, default=128.0,
                   help="normalization std (reference: 128 standalone)")
    p.add_argument("-n", "--synthetic-size", type=int, default=512)
    p.add_argument("--dump-viz", default=None, metavar="DIR",
                   help="write landmark overlays for the first 50 crops "
                        "(reference benchmark.py:168-176)")
    args = p.parse_args(argv)

    import numpy as np
    import jax
    from synergynet_tpu.data import TestTransform
    from synergynet_tpu.evals import benchmark_pipeline
    from synergynet_tpu.nn import SynergyNet, init_synergy_variables

    model = SynergyNet(arch=args.arch)
    if args.weights:
        from synergynet_tpu.nn.torch_import import load_synergynet_variables
        variables = load_synergynet_variables(args.weights, arch=args.arch)
    else:
        variables = init_synergy_variables(model, jax.random.PRNGKey(0))

    if args.aflw2000_dir:
        from synergynet_tpu.data import load_aflw2000_dir, save_eval_pack
        eval_pack = load_aflw2000_dir(args.aflw2000_dir,
                                      reannotated=args.reannotated)
        if args.save_npz:
            save_eval_pack(eval_pack, args.save_npz)
            print(f"saved eval pack to {args.save_npz}")
    elif args.aflw2000_npz:
        z = np.load(args.aflw2000_npz)
        eval_pack = {k: z[k] for k in z.files}
    else:
        from synergynet_tpu.data import make_synthetic_aflw2000
        eval_pack = make_synthetic_aflw2000(args.synthetic_size)

    r = benchmark_pipeline(model, variables, eval_pack,
                           std=args.std, batch=args.batch_size,
                           transform=TestTransform())
    print(r["report"])

    if args.dump_viz:
        import os
        import cv2
        from synergynet_tpu.evals import make_param_extractor
        from synergynet_tpu.mm3d import decode_landmarks, load_param_pack
        import jax.numpy as jnp
        os.makedirs(args.dump_viz, exist_ok=True)
        imgs = eval_pack["images"][:50]
        params = make_param_extractor(model, variables, std=args.std,
                                      batch=min(64, len(imgs)))(imgs)
        lmk = np.asarray(decode_landmarks(jnp.asarray(params),
                                          load_param_pack()))
        for i, img in enumerate(imgs):
            canvas = np.ascontiguousarray(img)
            for x, y in zip(lmk[i, 0], lmk[i, 1]):
                cv2.circle(canvas, (int(round(x)), int(round(y))), 1,
                           (0, 255, 0), -1)
            cv2.imwrite(os.path.join(args.dump_viz, f"{i:04d}.jpg"), canvas)
        print(f"wrote {len(imgs)} landmark visualizations to {args.dump_viz}")
    return r


if __name__ == "__main__":
    main()
