"""Single/multi-image inference CLI — the ``singleImage.py`` equivalent.

Reference flow (singleImage.py:20-118): detect faces, crop+resize, regress
62-d params, decode 68 landmarks + dense mesh + pose, then write a mesh
overlay render, a landmark plot and a pose-axis drawing into
``inference_output/{rendering_overlay,landmarks,poses}``.

Here the per-face model work is one batched device program
(:class:`synergynet_tpu.pipeline.SynergyNet3DMM`); rendering and drawing
reuse the framework render stack.
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import Optional

import numpy as np


def run(files: str, *, out_dir: str = "inference_output",
        png: bool = False, alpha: float = 0.6,
        interpolation: str = "linear",
        checkpoint: Optional[str] = None,
        api=None) -> dict:
    import cv2
    from synergynet_tpu.mm3d import load_param_pack
    from synergynet_tpu.pipeline import (SynergyNet3DMM, draw_axis,
                                         draw_landmarks, write_obj)
    from synergynet_tpu.render import render_overlay

    if api is None:
        variables = None
        if checkpoint == "trained":
            variables = "trained"        # shipped full-recipe weights
        elif checkpoint and checkpoint.endswith(".npz"):
            from synergynet_tpu.core.checkpoint import \
                load_trained_variables
            variables = load_trained_variables(checkpoint)
        elif checkpoint:
            from synergynet_tpu.nn.torch_import import \
                load_synergynet_variables
            variables = load_synergynet_variables(checkpoint)
        api = SynergyNet3DMM(variables=variables)
    pack = load_param_pack()
    tri_1based = np.asarray(pack.tri) + 1

    if os.path.isdir(files):
        pat = "*.png" if png else "*.jpg"
        paths = sorted(glob.glob(os.path.join(files, pat)))
    else:
        paths = [files]

    for sub in ("rendering_overlay", "landmarks", "poses", "obj"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    results = {}
    for path in paths:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            continue
        name = os.path.splitext(os.path.basename(path))[0]
        pts, verts, poses = api.get_all_outputs(
            img, interpolation=interpolation)
        results[name] = {"faces": len(pts), "poses": poses}
        if not pts:
            continue

        overlay, solid = render_overlay(img, verts, np.asarray(pack.tri),
                                        alpha=alpha)
        wfp = os.path.join(out_dir, "rendering_overlay", f"{name}.jpg")
        cv2.imwrite(wfp[:-4] + "_solid.png", solid)
        cv2.imwrite(wfp, overlay)

        draw_landmarks(img, pts,
                       os.path.join(out_dir, "landmarks", f"{name}.jpg"))

        img_axis = img.copy()
        for lmk, (angles, _t3d) in zip(pts, poses):
            draw_axis(img_axis, angles[1], angles[0], angles[2], lmk)
        cv2.imwrite(os.path.join(out_dir, "poses", f"{name}.jpg"), img_axis)

        write_obj(os.path.join(out_dir, "obj", name), verts[0], tri_1based)
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description="SynergyNet-TPU inference")
    p.add_argument("-f", "--files", required=True,
                   help="image file or directory")
    p.add_argument("--png", action="store_true")
    p.add_argument("--out-dir", default="inference_output")
    p.add_argument("--alpha", type=float, default=0.6)
    p.add_argument("--checkpoint", default=None,
                   help="framework .npz, reference .pth.tar, or the "
                        "literal 'trained' for the shipped full-recipe "
                        "weights (synergynet_tpu/assets/trained/)")
    args = p.parse_args(argv)
    r = run(args.files, out_dir=args.out_dir, png=args.png,
            alpha=args.alpha, checkpoint=args.checkpoint)
    for name, info in r.items():
        print(f"{name}: {info['faces']} face(s)")


if __name__ == "__main__":
    main()
