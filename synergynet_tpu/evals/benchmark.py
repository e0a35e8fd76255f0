"""AFLW2000-3D benchmark pipeline: params extraction -> NME + FOE reports.

The orchestration layer of the eval harness — the equivalent of the
reference's ``benchmark.py`` (standalone, :99-239) and
``benchmark_validate.benchmark_pipeline`` (in-training, :243-266), built on
the same primitives as inference: one jitted program extracts 62-d
parameters over the whole dataset in fixed-size batches, landmarks decode in
the same batched codec, and the NME/FOE math lives in
:mod:`synergynet_tpu.evals.nme` / :mod:`synergynet_tpu.evals.foe`.

Protocol notes preserved: eval normalization is (x - 127.5) / std with
std=128 standalone vs 130 in-training (reference quirk Q6 — configurable
here, default 128); the border zeroing uses CenterCrop mode='test'
(benchmark.py:117); pose MAE skips |yaw| > 99 samples and swaps the first
two decoded angles (benchmark.py:199-207).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from synergynet_tpu.evals.foe import foe_mae, format_foe_report
from synergynet_tpu.evals.nme import (analyze_by_yaw, calc_nme,
                                      format_nme_report)
from synergynet_tpu.mm3d import ParamPack, decode_landmarks, load_param_pack


def make_param_extractor(model, variables, *, std: float = 128.0,
                         batch: int = 128) -> Callable[[np.ndarray], np.ndarray]:
    """Returns ``extract(images_u8 (N,120,120,3)) -> (N, 62)`` running the
    backbone in fixed-size jitted batches (pad + trim)."""

    @jax.jit
    def forward(variables, images_u8):
        x = (images_u8.astype(jnp.float32) - 127.5) / std
        param62, _ = model.apply(variables, x, train=False)
        return param62.astype(jnp.float32)

    def extract(images_u8: np.ndarray) -> np.ndarray:
        n = images_u8.shape[0]
        out = []
        for s in range(0, n, batch):
            chunk = images_u8[s:s + batch]
            pad = batch - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            out.append(np.asarray(forward(variables, jnp.asarray(chunk)))
                       [:batch - pad])
        return np.concatenate(out) if out else np.zeros((0, 62), np.float32)

    return extract


def benchmark_params(params: np.ndarray, eval_pack: Dict[str, np.ndarray],
                     pack: Optional[ParamPack] = None) -> Dict:
    """Score extracted (N, 62) params against an AFLW2000-protocol eval pack
    (keys: pts68_gt, roi_boxes, yaws, pose_gt_pyr, skip_indices)."""
    pack = pack or load_param_pack()
    lmk = np.asarray(decode_landmarks(jnp.asarray(params), pack))
    nme = calc_nme(lmk, eval_pack["pts68_gt"], eval_pack["roi_boxes"])
    analysis = analyze_by_yaw(nme, eval_pack["yaws"])

    report = format_nme_report(analysis)
    foe = None
    if eval_pack.get("pose_gt_pyr") is not None:
        from synergynet_tpu.mm3d import pose_from_param
        angles, _ = pose_from_param(jnp.asarray(params), pack)
        foe = foe_mae(np.asarray(angles), eval_pack["pose_gt_pyr"],
                      skip_indices=eval_pack.get("skip_indices"))
        report += "\n" + format_foe_report(foe)
    return {
        "nme": analysis,
        "nme_mean": analysis["mean_of_means"],
        "foe": foe,
        "report": report,
    }


def benchmark_pipeline(model, variables, eval_pack: Dict[str, np.ndarray],
                       pack: Optional[ParamPack] = None, *,
                       std: float = 128.0, batch: int = 128,
                       transform=None) -> Dict:
    """Full eval: images -> params -> NME/FOE dict (the in-training
    validation hook, reference benchmark_validate.py:243-266)."""
    images = eval_pack["images"]
    if transform is not None:
        images = np.stack([transform(im) for im in images])
    extract = make_param_extractor(model, variables, std=std, batch=batch)
    params = extract(images)
    return benchmark_params(params, eval_pack, pack)
