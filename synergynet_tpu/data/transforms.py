"""Host-side training augmentations (numpy, per-sample).

Re-derivations of the reference's transform stack (reference
utils/ddfa.py:122-244,344-391 and its composition at main_train.py:196-205):

    ColorJitter(0.4, 0.4, 0.4) -> ToTensor -> CenterCrop(5) -> Normalize

Here color jitter and the border/occlusion zeroing run on uint8 HWC arrays on
the host; the (x - 127.5) / 128 normalization is fused into the device
program (one less float pass over the batch on the host, and the zeroed
borders normalize to the same -0.996 constant as the reference's
zero-after-ToTensor ordering).

Faithful quirks:
- The reference feeds BGR arrays to PIL as if RGB, so the luma weights of
  contrast/saturation land on swapped channels; reproduced by applying the
  (0.299, 0.587, 0.114) weights to the channels as given.
- ``rdown`` duplicates ``lup`` (keeps the top-left quadrant — reference
  utils/ddfa.py:204-207, quirk Q2), so "keep bottom-right" never occurs.
- Occlusion patterns fire with probability 0.01 *after* the 5-px border zero.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# PIL "L" luma weights, applied to channel order as-given (BGR in practice).
_LUMA = np.asarray([0.299, 0.587, 0.114], np.float32)


def _blend(a: np.ndarray, b: np.ndarray, factor: float) -> np.ndarray:
    """PIL ImageEnhance blend: degenerate * (1 - f) + img * f, clipped."""
    out = a.astype(np.float32) * (1.0 - factor) + b.astype(np.float32) * factor
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    return _blend(np.zeros_like(img), img, factor)


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    # PIL: blend with the mean of the grayscale image (rounded to int).
    gray_mean = float(np.round(
        (img.astype(np.float32) @ _LUMA).mean()))
    return _blend(np.full_like(img, np.uint8(np.clip(gray_mean, 0, 255))),
                  img, factor)


def adjust_saturation(img: np.ndarray, factor: float) -> np.ndarray:
    gray = (img.astype(np.float32) @ _LUMA)
    gray3 = np.repeat(np.round(gray)[..., None], 3, axis=-1)
    return _blend(np.clip(gray3, 0, 255).astype(np.uint8), img, factor)


class ColorJitter:
    """Random brightness/contrast/saturation in a random order
    (reference utils/ddfa.py:344-382). Hue defaults off like the reference's
    3-argument call (main_train.py:204)."""

    def __init__(self, brightness: float = 0.4, contrast: float = 0.4,
                 saturation: float = 0.4):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation

    def __call__(self, img: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = rng or np.random.default_rng()
        ops = []
        if self.brightness > 0:
            f = rng.uniform(max(0, 1 - self.brightness), 1 + self.brightness)
            ops.append(lambda im, f=f: adjust_brightness(im, f))
        if self.contrast > 0:
            f = rng.uniform(max(0, 1 - self.contrast), 1 + self.contrast)
            ops.append(lambda im, f=f: adjust_contrast(im, f))
        if self.saturation > 0:
            f = rng.uniform(max(0, 1 - self.saturation), 1 + self.saturation)
            ops.append(lambda im, f=f: adjust_saturation(im, f))
        rng.shuffle(ops)
        for op in ops:
            img = op(img)
        return img


class BorderOcclusion:
    """5-px border zero + rare occlusion patterns
    (reference CenterCrop, utils/ddfa.py:162-244). HWC uint8 in/out."""

    PATTERNS = ("lup", "rup", "ldown", "rdown", "lhalf", "rhalf", "center")

    def __init__(self, maximum: int = 5, prob: float = 0.01,
                 mode: str = "train"):
        self.maximum = maximum
        self.prob = prob
        self.mode = mode

    @staticmethod
    def _apply_pattern(img: np.ndarray, name: str) -> np.ndarray:
        h, w = img.shape[:2]
        out = np.zeros_like(img)
        if name in ("lup", "rdown"):          # rdown == lup (quirk Q2)
            out[: h // 2, : w // 2] = img[: h // 2, : w // 2]
        elif name == "rup":
            out[: h // 2, w // 2:] = img[: h // 2, w // 2:]
        elif name == "ldown":
            out[h // 2:, : w // 2] = img[h // 2:, : w // 2]
        elif name == "lhalf":
            out[:, : w // 2] = img[:, : w // 2]
        elif name == "rhalf":
            out[:, w // 2:] = img[:, w // 2:]
        elif name == "center":
            out[h // 4: -(h // 4), w // 4: -(w // 4)] = \
                img[h // 4: -(h // 4), w // 4: -(w // 4)]
        return out

    def __call__(self, img: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = rng or np.random.default_rng()
        m = self.maximum
        h, w = img.shape[:2]
        out = np.zeros_like(img)
        out[m:h - m, m:w - m] = img[m:h - m, m:w - m]
        if self.mode == "train" and rng.random() < self.prob:
            out = self._apply_pattern(
                out, self.PATTERNS[rng.integers(0, len(self.PATTERNS))])
        return out


class TrainTransform:
    """The full reference augmentation chain on uint8 HWC BGR crops."""

    def __init__(self, jitter: Tuple[float, float, float] = (0.4, 0.4, 0.4),
                 border: int = 5, occlusion_prob: float = 0.01):
        self.jitter = ColorJitter(*jitter)
        self.occlude = BorderOcclusion(border, occlusion_prob, mode="train")

    def __call__(self, img: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = rng or np.random.default_rng()
        return self.occlude(self.jitter(img, rng), rng)


class TestTransform:
    """Eval-time chain: border zero only (reference CenterCrop mode='test',
    benchmark.py:117)."""

    def __init__(self, border: int = 5):
        self.occlude = BorderOcclusion(border, prob=0.0, mode="test")

    def __call__(self, img: np.ndarray, rng=None) -> np.ndarray:
        return self.occlude(img)


def normalize_images(images_u8, mean: float = 127.5, std: float = 128.0):
    """Device-side normalization (reference Normalize, utils/ddfa.py:132-139;
    std=128 standalone eval vs 130 in-train eval — quirk Q6 — is the caller's
    choice)."""
    import jax.numpy as jnp
    return (images_u8.astype(jnp.float32) - mean) / std
