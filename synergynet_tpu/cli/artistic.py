"""Artistic-face colored-mesh CLI — the ``artistic.py`` equivalent.

Reference flow (artistic.py:33-117): detect faces, regress dense vertices,
look up per-vertex colors from a UV-space texture image (BFM_UV mapping),
trim to the face region (keptInd/deletedTri) and export a colored .obj.
Texture images are searched as ``<uv_dir>/<name>_fake_B.png`` like the
reference's ``uv_art/`` convention; without one, a flat skin tone is used.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def run(files: str, *, uv_dir: str = "uv_art",
        out_dir: str = "inference_output/obj", png: bool = False,
        api=None, uv_mapper=None) -> list:
    import cv2
    from synergynet_tpu.pipeline import (SynergyNet3DMM, load_uv_assets,
                                         write_obj_with_colors)

    api = api or SynergyNet3DMM()
    uv = uv_mapper or load_uv_assets()
    os.makedirs(out_dir, exist_ok=True)

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
        _, verts, _ = api.get_all_outputs(img, interpolation="linear")
        if not verts:
            continue

        tex_path = os.path.join(uv_dir, f"{name}_fake_B.png")
        if os.path.exists(tex_path):
            tex = cv2.imread(tex_path, -1)[..., :3]
            colors = uv.colors_from_texture(tex)
        else:
            colors = np.tile(np.asarray([[140, 160, 205]], np.uint8),
                             (verts[0].shape[1], 1))    # flat BGR skin tone

        v, c, tri = uv.trim(verts[0], colors)
        wfp = os.path.join(out_dir, f"{name}.obj")
        write_obj_with_colors(wfp, v, tri, c.astype(np.float32))
        written.append(wfp)
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description="Artistic colored-mesh export")
    p.add_argument("-f", "--files", required=True)
    p.add_argument("--png", action="store_true")
    p.add_argument("--uv-dir", default="uv_art")
    p.add_argument("--out-dir", default="inference_output/obj")
    args = p.parse_args(argv)
    for w in run(args.files, uv_dir=args.uv_dir, out_dir=args.out_dir,
                 png=args.png):
        print("wrote", w)


if __name__ == "__main__":
    main()
