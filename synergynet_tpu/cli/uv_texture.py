"""Real-face UV-textured mesh CLI — the ``uv_texture_realFaces.py``
equivalent.

Reference flow (uv_texture_realFaces.py:35-116): images are pre-cropped
256x256 faces (fixed roi [0, 0, 256, 256]); regress dense vertices, trim to
the face region, export a colored .obj from the matching UV texture
(``texture_data/uv_real/<name>_fake_B.png``), then render the textured mesh
over the input at alpha 0.6.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def run(files: str, *, tex_dir: str = "texture_data/uv_real",
        out_dir: str = "inference_output", png: bool = False,
        api=None, uv_mapper=None) -> list:
    import cv2
    from synergynet_tpu.pipeline import (SynergyNet3DMM, load_uv_assets,
                                         write_obj_with_colors)
    from synergynet_tpu.render import render_overlay

    api = api or SynergyNet3DMM()
    uv = uv_mapper or load_uv_assets()
    os.makedirs(os.path.join(out_dir, "obj"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "rendering_overlay"), exist_ok=True)

    if os.path.isdir(files):
        pat = "*.png" if png else "*.jpg"
        paths = sorted(glob.glob(os.path.join(files, pat)))
    else:
        paths = [files]

    written = []
    for path in paths:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            continue
        name = os.path.splitext(os.path.basename(path))[0]
        # Pre-cropped faces: fixed roi, no detector (reference :82).
        rect = [0.0, 0.0, 256.0, 256.0, 1.0]
        _, verts, _ = api.get_all_outputs(img, rects=[rect],
                                          interpolation="linear")
        if not verts:
            continue

        tex_path = os.path.join(tex_dir, f"{name}_fake_B.png")
        if os.path.exists(tex_path):
            tex_img = cv2.imread(tex_path, -1)[..., :3]
            colors = uv.colors_from_texture(tex_img)
        else:
            colors = np.tile(np.asarray([[140, 160, 205]], np.uint8),
                             (verts[0].shape[1], 1))

        v, c, tri = uv.trim(verts[0], colors)
        wfp = os.path.join(out_dir, "obj", f"{name}.obj")
        write_obj_with_colors(wfp, v, tri, c.astype(np.float32))
        written.append(wfp)

        tex01 = c.astype(np.float32) / 255.0
        overlay, _ = render_overlay(img, [v], None, alpha=0.6,
                                    connectivity=tri - 1, texture=tex01)
        cv2.imwrite(os.path.join(out_dir, "rendering_overlay",
                                 f"{name}.jpg"), overlay)
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description="UV-textured mesh export")
    p.add_argument("-f", "--files", required=True)
    p.add_argument("--png", action="store_true")
    p.add_argument("--tex-dir", default="texture_data/uv_real")
    p.add_argument("--out-dir", default="inference_output")
    args = p.parse_args(argv)
    for w in run(args.files, tex_dir=args.tex_dir, out_dir=args.out_dir,
                 png=args.png):
        print("wrote", w)


if __name__ == "__main__":
    main()
