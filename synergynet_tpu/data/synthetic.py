"""Synthetic 300W-LP / AFLW2000-style data for end-to-end runs and tests.

The reference's training (300W-LP ``train_aug_120x120``) and evaluation
(AFLW2000-3D) datasets are not redistributable; this module fabricates
shape- and protocol-compatible stand-ins with *learnable signal*: parameters
are sampled in whitened space, decoded through the active ``ParamPack`` to
landmarks, and the landmarks are painted into the 120x120 crop as bright
dots over structured noise. A model trained on this data can genuinely
reduce the synergy losses, and the eval harness reproduces the reference's
NME/FOE protocol (roi boxes, yaw list, |yaw|>99 skips) end to end.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from synergynet_tpu.mm3d import ParamPack, load_param_pack


def sample_params(rng: np.random.Generator, n: int, spread: float = 0.4,
                  pose_spread: float = 1.2) -> np.ndarray:
    """Whitened 62-d parameter vectors. Pose rows get a wider spread so the
    decoded yaw distribution populates all three AFLW2000 yaw bins."""
    p = rng.normal(0, spread, (n, 62)).astype(np.float32)
    p[:, :12] = rng.normal(0, pose_spread, (n, 12)).astype(np.float32)
    return p


def _paint_landmarks(images: np.ndarray, lmk: np.ndarray) -> None:
    """Draw 2x2 bright dots at each landmark (in place). lmk: (N, 3, 68)."""
    n, h, w = images.shape[:3]
    xs = np.clip(np.round(lmk[:, 0]).astype(np.int64), 0, w - 2)
    ys = np.clip(np.round(lmk[:, 1]).astype(np.int64), 0, h - 2)
    for dy in (0, 1):
        for dx in (0, 1):
            flat = (ys + dy) * w + (xs + dx)              # (N, 68)
            for c, val in enumerate((255, 220, 180)):
                ch = images[..., c].reshape(n, -1)
                np.put_along_axis(ch, flat, val, axis=1)


def make_crops_with_params(n: int, pack: Optional[ParamPack] = None,
                           seed: int = 0, size: int = 120,
                           appearance: str = "dots"
                           ) -> Dict[str, np.ndarray]:
    """n synthetic (crop, param62) pairs + decoded GT landmarks.

    ``appearance``: "dots" paints only the 68 landmarks over noise (sparse
    signal; a global-avgpool CNN plateaus at mean-collapse on it);
    "shaded" renders the lit deformed surface itself + dots
    (:mod:`synergynet_tpu.data.shaded`) — the dense-appearance task that
    actually exercises learning.
    """
    import jax.numpy as jnp
    from synergynet_tpu.mm3d import decode_landmarks

    pack = pack or load_param_pack()
    if appearance == "shaded":
        from synergynet_tpu.data.shaded import make_shaded_crops
        return make_shaded_crops(n, pack, seed=seed)
    if appearance != "dots":
        raise ValueError(f"unknown appearance {appearance!r}")
    rng = np.random.default_rng(seed)
    params = sample_params(rng, n)
    lmk = np.asarray(decode_landmarks(jnp.asarray(params), pack))

    # uint8 end to end: the default int64 draws cost ~24 bytes/pixel of
    # transient memory (~100 GB at n=100K); max value 89 + 29 < 256 needs
    # no clip.
    base = rng.integers(40, 90, (n, 1, 1, 3), dtype=np.uint8)
    noise = rng.integers(0, 30, (n, size, size, 3), dtype=np.uint8)
    images = base + noise
    _paint_landmarks(images, lmk)
    return {"images": images, "params": params, "landmarks": lmk}


def make_synthetic_aflw2000(n: int, pack: Optional[ParamPack] = None,
                            seed: int = 1, appearance: str = "dots"
                            ) -> Dict[str, np.ndarray]:
    """AFLW2000-protocol eval pack: crops, GT 68-pt landmarks in original
    image coordinates, roi boxes, GT yaw list, and pitch-yaw-roll pose GT
    with the |yaw|>99 skip indices (reference benchmark.py:183-216)."""
    import jax.numpy as jnp
    from synergynet_tpu.mm3d import pose_from_param, rescale_to_roi

    pack = pack or load_param_pack()
    d = make_crops_with_params(n, pack, seed=seed, appearance=appearance)
    rng = np.random.default_rng(seed + 1)

    # Random original-image rois the crops supposedly came from.
    sx = rng.uniform(0, 300, n)
    sy = rng.uniform(0, 200, n)
    side = rng.uniform(90, 240, n)
    roi = np.stack([sx, sy, sx + side, sy + side], 1).astype(np.float32)

    lmk_img = np.asarray(rescale_to_roi(
        jnp.asarray(d["landmarks"]), jnp.asarray(roi)))
    angles, _ = pose_from_param(jnp.asarray(d["params"]), pack)
    angles = np.asarray(angles)                     # [rx, ry, rz] degrees
    # The AFLW2000 protocol's GT pose list is [pitch, yaw, roll]; the decoded
    # order maps via the reference's swap (benchmark.py:204).
    pose_gt_pyr = angles[:, [1, 0, 2]]
    yaws = pose_gt_pyr[:, 1]
    skip = np.nonzero(np.abs(yaws) > 99)[0]
    return {
        **d,
        "roi_boxes": roi,
        "pts68_gt": lmk_img,                        # (N, 3, 68) image space
        "yaws": yaws.astype(np.float32),
        "pose_gt_pyr": np.delete(pose_gt_pyr, skip, axis=0).astype(np.float32),
        "skip_indices": skip,
    }


class GeneratedCropDataset:
    """Streaming variant of :func:`make_crops_with_params`: the 680K-crop
    300W-LP scale (reference README.md:111, train_script.sh:21-22) cannot be
    materialized (~29 GB of uint8 crops), so each crop is synthesized on
    demand from ``(seed, index)`` — bit-stable across epochs like a real
    on-disk dataset — while the 62-d parameters and painted landmarks are
    precomputed in bulk (float arrays, ~0.7 GB at 680K).

    Yields the same (image uint8 HWC, param62) item contract as
    :class:`synergynet_tpu.data.datasets.ArrayDataset`; the loader-supplied
    per-(epoch, index) rng drives only the optional transform, never the
    crop content.
    """

    def __init__(self, n: int, pack: Optional[ParamPack] = None,
                 seed: int = 0, size: int = 120, transform=None,
                 decode_chunk: int = None, appearance: str = "dots"):
        import contextlib

        import jax
        import jax.numpy as jnp
        from synergynet_tpu.data.shaded import DECODE_CHUNK
        from synergynet_tpu.mm3d import decode_landmarks

        if decode_chunk is None:
            # Shared with make_shaded_crops: identical decode chunking is
            # part of the streaming/materialized bit-identity contract.
            decode_chunk = DECODE_CHUNK

        if appearance not in ("dots", "shaded"):
            raise ValueError(f"unknown appearance {appearance!r}")

        pack = pack or load_param_pack()
        rng = np.random.default_rng(seed)
        self.params = sample_params(rng, n)
        self._lmk = None
        self._decode_chunk = decode_chunk
        self._lmk_pack = pack
        self.seed = seed
        self.size = size
        self.transform = transform
        self.appearance = appearance
        # Background bank: per-crop background = one of 997 precomputed
        # base-plus-noise rows (43 MB) picked by index, so generation is a
        # single row gather + landmark paint. Hashing fresh noise per pixel
        # was host-memory-bound (~0.6 s per 1024-crop batch); even a
        # separate base add cost a second 44 MB pass. The per-row base
        # levels reproduce make_crops_with_params' [40, 90) channel range.
        bank_rng = np.random.default_rng(seed + 1)
        base = bank_rng.integers(40, 90, (997, 1, 3))
        noise = bank_rng.integers(0, 30, (997, size * size, 3))
        self._bg_bank = (base + noise).astype(np.uint8).reshape(997, -1)

    @property
    def lmk(self) -> np.ndarray:
        """Bulk GT landmark decode, LAZY: the device-generative training
        path (train/resident.py) reads only ``params`` and decodes
        landmarks on device inside the epoch program, so eagerly decoding
        680K landmarks on the host (~minutes per 100K over this
        environment's single CPU core) would be pure setup waste. Host
        crop generation triggers the decode on first access. Pinned to
        the CPU backend when one exists (over the remote-TPU tunnel each
        fresh chunk shape costs minutes of compile; the 131K-crop
        recipe's setup was ~13 min of mostly this)."""
        if self._lmk is None:
            import contextlib

            import jax
            import jax.numpy as jnp
            from synergynet_tpu.mm3d import decode_landmarks

            pack, n = self._lmk_pack, len(self.params)
            n_lmk = len(pack.keypoints) // 3
            lmk = np.empty((n, 3, n_lmk), np.float32)
            try:
                ctx = jax.default_device(jax.devices("cpu")[0])
            except Exception:
                ctx = contextlib.nullcontext()
            with ctx:
                for s in range(0, n, self._decode_chunk):
                    e = min(s + self._decode_chunk, n)
                    lmk[s:e] = np.asarray(decode_landmarks(
                        jnp.asarray(self.params[s:e]), pack))
            self._lmk = lmk
        return self._lmk

    def __len__(self) -> int:
        return len(self.params)

    def generate_images(self, indices: np.ndarray) -> np.ndarray:
        """Vectorized crop synthesis for a batch of indices: one background
        bank row gather (per-index bit-stable) + painted landmarks.
        Per-item generation capped throughput at ~1.4K crops/s; this path
        sustains tens of thousands per second."""
        idx = np.asarray(indices, np.int64)
        b, size = len(idx), self.size
        if self.appearance == "shaded":
            return self._generate_shaded(idx)
        images = self._bg_bank[idx % self._bg_bank.shape[0]
                               ].reshape(b, size, size, 3)
        _paint_landmarks(images, self.lmk[idx])
        return images

    def _generate_shaded(self, idx: np.ndarray,
                         chunk: int = None) -> np.ndarray:
        """Host-side shaded render, pinned to the CPU backend (never
        competes with the training chip; the fast path for shaded data is
        on-device generation, train/resident.py generative mode).

        Every dispatch renders exactly ``chunk`` crops (short fetches are
        padded): one fixed program shape means one fixed matmul tiling, so
        a crop's pixels are bit-stable regardless of how the fetch batches
        indices — the dataset's bit-per-(seed, index) contract. Rendering
        the same index under a different batch shape may legally round
        differently in uint8; ``chunk`` therefore defaults to the SAME
        ``shaded.RENDER_CHUNK`` the materialized ``make_shaded_crops`` path
        uses, so streaming and materialized datasets agree bit-for-bit."""
        import contextlib

        import jax
        import jax.numpy as jnp
        from synergynet_tpu.data.shaded import RENDER_CHUNK, _render_shaded

        if chunk is None:
            chunk = RENDER_CHUNK
        try:
            ctx = jax.default_device(jax.devices("cpu")[0])
        except Exception:
            ctx = contextlib.nullcontext()
        key = jax.random.PRNGKey(self.seed)
        b, size = len(idx), self.size
        out = np.empty((b, size, size, 3), np.uint8)
        with ctx:
            for s in range(0, b, chunk):
                e = min(s + chunk, b)
                pad = chunk - (e - s)
                cidx = np.concatenate(
                    [idx[s:e], np.full(pad, idx[0], idx.dtype)]) if pad \
                    else idx[s:e]
                img = _render_shaded(
                    jnp.asarray(self.lmk[cidx]),
                    key, idx=jnp.asarray(cidx, jnp.int32))
                out[s:e] = np.asarray(img)[:e - s]
        return out

    def fetch_batch(self, indices: np.ndarray):
        """Vectorized (images, params) batch — the PrefetchLoader fast path
        (used when no host transform is configured)."""
        idx = np.asarray(indices)
        return self.generate_images(idx), self.params[idx]

    def __getitem__(self, index: int,
                    rng: Optional[np.random.Generator] = None):
        img = self.generate_images(np.asarray([index]))[0]
        if self.transform is not None:
            img = self.transform(img, rng)
        return img, self.params[index]
