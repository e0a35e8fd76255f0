"""FaceBoxes detection CNN, TPU-native (flax / NHWC).

Re-design of the reference detector net (reference:
FaceBoxes/models/faceboxes.py:64-150): CRelu stem (conv + BN + cat[x, -x] +
ReLU) at strides 4 and 2 with two 3x3/2 max-pools, three Inception blocks,
and two extra conv stages; three detection sources at strides 32/64/128 feed
multibox heads with 21/1/1 anchors x (4 loc, 2 conf) each.

TPU choices:
- NHWC layout throughout (XLA's native TPU conv layout; reference is NCHW),
  which also makes the head reshape to (B, A, 4) a free view — the reference
  needs an explicit permute (faceboxes.py:138-141).
- CRelu computes the BN once and concatenates [x, -x] — half the stem conv
  FLOPs for the same representational trick as the reference.
- Softmax on the conf head is fused into the jitted pipeline, not a module
  flag (the reference switches on ``phase``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

NUM_CLASSES = 2
# Anchors per spatial cell for the three detection sources: the 32-px anchor
# is densified 4x4 and the 64-px 2x2 (reference FaceBoxes/utils/prior_box.py:
# 28-42), giving 16 + 4 + 1 = 21 on source 1.
ANCHORS_PER_CELL = (21, 1, 1)


class BasicConv2d(nn.Module):
    """Conv + BN + ReLU (reference faceboxes.py:8-19).

    ``folded``: inference-only variant with the BN affine pre-folded into
    the conv kernel/bias (see :func:`fold_bn_variables`) — one conv + relu,
    no separate normalization pass.
    """

    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=self.pad,
                    use_bias=self.folded, dtype=self.dtype, name="conv")(x)
        if not self.folded:
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class CRelu(nn.Module):
    """Conv + BN + cat[x, -x] + ReLU (reference faceboxes.py:49-61).

    ``folded``: the inference identity
    ``relu(cat[bn(conv(x)), -bn(conv(x))]) == relu(conv'(x))`` where
    ``conv'`` has the channel-doubled kernel ``[a*K, -a*K]`` and bias
    ``[b, -b]`` (``a, b`` the BN affine). On TPU this doubles the conv's
    output-channel (lane) occupancy on the 128-wide MXU — the stem's 24-
    channel convs were the serving profile's worst utilization offender
    (docs/SERVING.md: detnet 4% of peak) — and deletes the BN + negate +
    concat VPU chain.
    """

    features: int
    kernel: int
    stride: int
    pad: object           # int or explicit ((t, b), (l, r))
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.folded:
            x = nn.Conv(2 * self.features, (self.kernel, self.kernel),
                        strides=self.stride, padding=self.pad, use_bias=True,
                        dtype=self.dtype, name="conv")(x)
            return nn.relu(x)
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=self.pad, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, dtype=self.dtype, name="bn")(x)
        return nn.relu(jnp.concatenate([x, -x], axis=-1))


class Inception(nn.Module):
    """4-branch Inception block, 128 -> 128 channels (reference
    faceboxes.py:21-46)."""

    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, p, name: BasicConv2d(
            f, k, 1, p, dtype=self.dtype, folded=self.folded, name=name)
        b0 = conv(32, 1, 0, "branch1x1")(x, train)
        # count_include_pad=True: the reference pools with torch's
        # F.avg_pool2d default, which divides by the full 3x3 window even
        # at padded borders (faceboxes.py:35).
        pool = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                           count_include_pad=True)
        b1 = conv(32, 1, 0, "branch1x1_2")(pool, train)
        b2 = conv(24, 1, 0, "branch3x3_reduce")(x, train)
        b2 = conv(32, 3, 1, "branch3x3")(b2, train)
        b3 = conv(24, 1, 0, "branch3x3_reduce_2")(x, train)
        b3 = conv(32, 3, 1, "branch3x3_2")(b3, train)
        b3 = conv(32, 3, 1, "branch3x3_3")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def _maxpool_3x3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class StemS2D8(nn.Module):
    """conv1 + maxpool of the deep-s2d stem as one unit.

    Owns the phase-packed conv parameters (tree path
    ``params/<name>/{kernel,bias}``, from :func:`fold_to_s2d8`). On TPU
    the forward runs the fused Pallas kernel
    (:mod:`synergynet_tpu.detect.stem_pallas`: tap matmuls + bias + relu
    + phase maxpool per VMEM tile — the 4x-phase activation never
    round-trips HBM); elsewhere the same math runs as an XLA conv +
    :func:`_phase_maxpool_s2d8` (also the Pallas kernel's parity oracle,
    tests/test_detect.py::TestS2DStem).

    ``mode``: None means the XLA path (the proven production default);
    "pallas" opts into the fused kernel (interpret off-TPU); "conv_only"
    returns the pre-pool conv activation (profiling hook, always XLA).
    """

    dtype: jnp.dtype = jnp.float32
    cout: int = 48

    @nn.compact
    def __call__(self, x, mode: str = None):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, c, 4 * self.cout))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (4 * self.cout,))
        dt = self.dtype
        x = x.astype(dt)
        if mode is None:
            # Default to the XLA stem on every backend: it is the round-3
            # proven production path (bit parity + BN/CRelu fold, -21%
            # dispatch, docs/SERVING.md). The fused Pallas stem is opt-in
            # (mode="pallas") until an on-chip run proves it compiles AND
            # wins — round 4 made it the TPU default unvalidated and the
            # serving bench died at compile time (VERDICT r4 weak #2);
            # round 5's rewrite then failed one pass deeper
            # (infer-vector-layout), which no off-chip gate catches.
            mode = "xla"
        if mode == "pallas":
            from synergynet_tpu.detect import stem_pallas
            if stem_pallas._pick_row_band(
                    x.shape[1], x.shape[2], c, self.cout,
                    jnp.dtype(dt).itemsize) is not None:
                return stem_pallas.fused_stem1_s2d8(
                    x, kernel, bias.astype(dt), cout=self.cout,
                    interpret=jax.default_backend() != "tpu")
            # No VMEM-sized row band for this geometry: take the XLA path
            # below — the wired fallback CLAUDE.md's kernel policy
            # requires — instead of propagating the kernel's ValueError.
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(dt), window_strides=(1, 1),
            padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = nn.relu(y + bias.astype(dt))
        if mode == "conv_only":
            return y
        return _phase_maxpool_s2d8(y, self.cout)


def _phase_maxpool_s2d8(y, cout: int):
    """3x3 stride-2 pad-1 maxpool over the stride-4 grid, expressed on
    phase-packed conv outputs ``y`` (B, H/8, W/8, 4*cout) with phase
    channel block (2p+q)*cout holding the stride-4 output at
    (2i+p, 2j+q). Pool output (i, j) covers rows {2i-1, 2i, 2i+1} =
    {(i-1, p1), (i, p0), (i, p1)} and likewise for columns, so the
    reduce-window becomes two shifted maxes on the packed grid. Zero
    padding at the leading edge is exact here: inputs are post-relu
    (>= 0), so a 0 candidate never changes the window max (the real
    pool's -inf pad differs only below 0)."""
    y00 = y[..., 0 * cout:1 * cout]
    y01 = y[..., 1 * cout:2 * cout]
    y10 = y[..., 2 * cout:3 * cout]
    y11 = y[..., 3 * cout:4 * cout]

    def up(a):      # block i-1's value at position i (row -1 -> 0 pad)
        return jnp.pad(a, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]

    def left(a):
        return jnp.pad(a, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1]

    r0 = jnp.maximum(jnp.maximum(up(y10), y00), y10)    # col phase q=0
    r1 = jnp.maximum(jnp.maximum(up(y11), y01), y11)    # col phase q=1
    return jnp.maximum(jnp.maximum(left(r1), r0), r1)


class FaceBoxesNet(nn.Module):
    """(B, H, W, 3) mean-subtracted BGR -> (loc (B, A, 4), conf (B, A, 2)).

    ``conf`` is raw logits; the detector pipeline applies softmax. A = total
    anchor count for (H, W); anchor ordering matches
    :func:`synergynet_tpu.detect.anchors.generate_anchors`.

    ``stem_s2d``: expect a space-to-depth packed input (B, H/4, W/4, 48)
    (see :func:`space_to_depth`) and run the stem as an equivalent 2x2
    conv. A 3-channel 7x7/4 conv forces XLA into a slow input relayout
    (~0.6 ms/frame at 720x1088 — measured); packing on the host while the
    frame canvas is assembled makes the stem essentially free. Weights
    convert exactly via :func:`stem_kernel_to_s2d`.

    ``folded``: inference-only BN-folded topology (CRelu as one channel-
    doubled conv + relu; BasicConv2d as conv+bias+relu). Variables convert
    via :func:`fold_bn_variables`; ``train=True`` is invalid in this mode.

    ``stem_r = 8`` (requires ``stem_s2d`` + ``folded``): the deeper
    space-to-depth packing (docs/SERVING.md round-3 headroom item).
    Input is (B, H/8, W/8, 192); conv1 computes all four stride-4 output
    phases of one 8x8 block as a single 2x2 conv with 4x-packed output
    channels (192 in / 192 out — full 128-wide MXU lanes vs 48), and the
    3x3/2 maxpool that follows becomes shifted maxes over phase channels
    on the 4x-smaller spatial grid (:func:`_phase_maxpool_s2d8`) instead
    of a reduce-window over the full-resolution 150 MB activation.
    Exact same math: weights convert via :func:`fold_to_s2d8`.
    """

    dtype: jnp.dtype = jnp.float32
    stem_s2d: bool = False
    folded: bool = False
    stem_r: int = 4
    # stem_r=8 only: None = XLA (the proven production path); "pallas"
    # opts into the fused stem kernel. Lets callers (bench.py) pin a path
    # without touching the kernel (VERDICT r4 item 8).
    stem_mode: str = None

    @nn.compact
    def __call__(self, x, train: bool = False, upto: str = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``upto``: profiling aid — return the intermediate activation
        after the named prefix ("stem1" = conv1+pool, "stem2" = conv2+pool,
        "inception", "sources") instead of the heads; prefix deltas
        attribute detnet's time per segment (scripts/prof_serving_stages.py
        --stages detstem1,...). Unused parameters are simply not touched —
        ``apply`` with the full variable tree stays valid."""
        if self.folded and train:
            raise ValueError("folded FaceBoxesNet is inference-only")
        dt, fold = self.dtype, self.folded
        x = x.astype(dt)
        if self.stem_s2d and self.stem_r == 8:
            if not fold:
                raise ValueError("stem_r=8 requires the folded "
                                 "(inference) topology")
            stem = StemS2D8(dtype=dt, name="conv1_s2d8")
            if upto == "conv1":
                return stem(x, mode="conv_only")
            x = stem(x, mode=self.stem_mode)
        else:
            if self.stem_s2d:
                x = CRelu(24, 2, 1, ((1, 0), (1, 0)), dtype=dt, folded=fold,
                          name="conv1")(x, train)
            else:
                x = CRelu(24, 7, 4, 3, dtype=dt, folded=fold,
                          name="conv1")(x, train)
            if upto == "conv1":
                return x
            x = _maxpool_3x3_s2(x)
        if upto == "stem1":
            return x
        x = CRelu(64, 5, 2, 2, dtype=dt, folded=fold, name="conv2")(x, train)
        x = _maxpool_3x3_s2(x)
        if upto == "stem2":
            return x
        x = Inception(dtype=dt, folded=fold, name="inception1")(x, train)
        x = Inception(dtype=dt, folded=fold, name="inception2")(x, train)
        x = Inception(dtype=dt, folded=fold, name="inception3")(x, train)
        if upto == "inception":
            return x
        src1 = x                                             # stride 32
        x = BasicConv2d(128, 1, 1, 0, dtype=dt, folded=fold,
                        name="conv3_1")(x, train)
        x = BasicConv2d(256, 3, 2, 1, dtype=dt, folded=fold,
                        name="conv3_2")(x, train)
        src2 = x                                             # stride 64
        x = BasicConv2d(128, 1, 1, 0, dtype=dt, folded=fold,
                        name="conv4_1")(x, train)
        x = BasicConv2d(256, 3, 2, 1, dtype=dt, folded=fold,
                        name="conv4_2")(x, train)
        src3 = x                                             # stride 128
        if upto == "sources":
            return src3

        locs, confs = [], []
        for i, (src, n_anchor) in enumerate(
                zip((src1, src2, src3), ANCHORS_PER_CELL)):
            loc = nn.Conv(n_anchor * 4, (3, 3), padding=1, dtype=dt,
                          name=f"loc{i}")(src)
            conf = nn.Conv(n_anchor * NUM_CLASSES, (3, 3), padding=1,
                           dtype=dt, name=f"conf{i}")(src)
            b = loc.shape[0]
            # NHWC: (B, H, W, A*4) -> (B, H*W*A, 4) — the same (row, col,
            # anchor) flattening the reference reaches via permute+view.
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1, NUM_CLASSES))
        loc = jnp.concatenate(locs, axis=1).astype(jnp.float32)
        conf = jnp.concatenate(confs, axis=1).astype(jnp.float32)
        return loc, conf


def space_to_depth(x, r: int = 4):
    """(..., H, W, C) -> (..., H/r, W/r, r*r*C); channel (dy*r + dx)*C + c.

    Works on numpy or jnp arrays; on the host this is a cheap copy done
    while the frame canvas is assembled.
    """
    *lead, h, w, c = x.shape
    y = x.reshape(*lead, h // r, r, w // r, r, c)
    if len(lead) == 0:
        y = y.transpose(0, 2, 1, 3, 4)
    else:
        y = y.transpose(*range(len(lead)), len(lead), len(lead) + 2,
                        len(lead) + 1, len(lead) + 3, len(lead) + 4)
    return y.reshape(*lead, h // r, w // r, r * r * c)


def stem_kernel_to_s2d(kernel7):
    """Exact re-layout of the 7x7/4 stem kernel (7, 7, 3, 24) HWIO into the
    s2d-equivalent 2x2 kernel (2, 2, 48, 24): tap (ty, tx) of the original
    maps to block (by, bx) = ((ty+1)//4 ... ) with ty = 4*by + dy - 1 (the
    -1 absorbs the original padding=3 against the s2d conv's ((1,0),(1,0))
    block padding). Missing taps (ty or tx == -1) are zero.
    """
    import numpy as np
    k7 = np.asarray(kernel7)
    cin, cout = k7.shape[2], k7.shape[3]
    k2 = np.zeros((2, 2, 16 * cin, cout), k7.dtype)
    for by in range(2):
        for bx in range(2):
            for dy in range(4):
                for dx in range(4):
                    ty, tx = 4 * by + dy - 1, 4 * bx + dx - 1
                    if 0 <= ty < k7.shape[0] and 0 <= tx < k7.shape[1]:
                        ch = (dy * 4 + dx) * cin
                        k2[by, bx, ch:ch + cin] = k7[ty, tx]
    return k2


def stem_kernel_to_s2d8(kernel7):
    """Exact re-layout of the 7x7/4 stem kernel (7, 7, Cin, Cout) HWIO into
    the deep-s2d phase kernel (2, 2, 64*Cin, 4*Cout) for inputs packed by
    :func:`space_to_depth` with r=8.

    Output phase (p, q) of an 8x8 block is the stride-4 conv output at
    (2i+p, 2j+q): its tap rows are 4p + ty - 3 for ty in [0, 7) relative
    to block row 8i, landing in block i-1 (conv tap a=0, with the conv's
    ((1,0),(1,0)) padding) when negative, else block i (a=1). Packed-out
    channel = (2p+q)*Cout + o; packed-in channel = (dy8*8 + dx8)*Cin + c.
    """
    import numpy as np
    k7 = np.asarray(kernel7)
    cin, cout = k7.shape[2], k7.shape[3]
    k2 = np.zeros((2, 2, 64 * cin, 4 * cout), k7.dtype)
    for p in range(2):
        for q in range(2):
            for ty in range(7):
                for tx in range(7):
                    gy, gx = 4 * p + ty - 3, 4 * q + tx - 3
                    a, dy8 = (1, gy) if gy >= 0 else (0, gy + 8)
                    b, dx8 = (1, gx) if gx >= 0 else (0, gx + 8)
                    ch = (dy8 * 8 + dx8) * cin
                    oc = (2 * p + q) * cout
                    k2[a, b, ch:ch + cin, oc:oc + cout] = k7[ty, tx]
    return k2


def fold_to_s2d8(folded_variables):
    """Convert a BN-folded FaceBoxesNet tree (:func:`fold_bn_variables`,
    conv1 kernel still 7x7) to the ``stem_r=8`` topology: conv1 becomes
    ``conv1_s2d8`` with the phase-packed kernel (2, 2, 192, 192) and the
    bias tiled over the four phases."""
    import numpy as np
    params = dict(folded_variables["params"])
    c1 = params.pop("conv1")["conv"]
    k7, bias = np.asarray(c1["kernel"]), np.asarray(c1["bias"])
    if k7.shape[0] != 7:
        raise ValueError("fold_to_s2d8 expects the 7x7 stem kernel "
                         f"(got {k7.shape}) — fold before any r=4 s2d "
                         "conversion")
    params["conv1_s2d8"] = {
        "kernel": jnp.asarray(stem_kernel_to_s2d8(k7)),
        "bias": jnp.asarray(np.tile(bias, 4)),
    }
    return {"params": params}


def fold_bn_variables(variables, eps: float = 1e-5):
    """Fold every BatchNorm into its preceding conv for inference.

    The BN affine ``bn(z) = a*z + b`` with ``a = scale/sqrt(var + eps)``,
    ``b = bias - a*mean`` folds exactly into the conv as ``K' = K * a``
    (per output channel), ``bias' = b``. For the two CRelu stems (conv1,
    conv2) the ``cat[x, -x]`` doubles out too: ``K' = [a*K, -a*K]``,
    ``bias' = [b, -b]`` — the serving-path utilization fix (docs/SERVING.md:
    the 24/48-channel stem convs used <20% of the 128-wide MXU lanes;
    reference topology FaceBoxes/models/faceboxes.py:49-77).

    Input: a standard ``FaceBoxesNet`` variable tree (params + batch_stats,
    plain or s2d stem). Output: a params-only tree for
    ``FaceBoxesNet(folded=True)``. Exact affine algebra — parity with the
    unfolded net is float-rounding-level (tests/test_detect.py).
    """
    import numpy as np

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    crelu_modules = ("conv1", "conv2")

    def fold_one(p, s, crelu):
        k = np.asarray(p["conv"]["kernel"], np.float64)
        a = np.asarray(p["bn"]["scale"], np.float64) / np.sqrt(
            np.asarray(s["bn"]["var"], np.float64) + eps)
        b = np.asarray(p["bn"]["bias"], np.float64) - a * np.asarray(
            s["bn"]["mean"], np.float64)
        k2, b2 = k * a, b
        if crelu:
            k2 = np.concatenate([k2, -k2], axis=-1)
            b2 = np.concatenate([b2, -b2])
        return {"conv": {"kernel": jnp.asarray(k2, np.float32),
                         "bias": jnp.asarray(b2, np.float32)}}

    def walk(p, s, name=None):
        if "conv" in p and "bn" in p:
            return fold_one(p, s, crelu=name in crelu_modules)
        if "kernel" in p:              # head conv (loc*/conf*): no BN
            return p
        return {k: walk(p[k], s.get(k, {}), k) for k in p}

    return {"params": walk(params, stats)}


def variables_to_s2d(variables):
    """Convert a standard FaceBoxesNet variable tree to the stem_s2d form
    (only conv1's conv kernel changes; any folded bias rides along —
    dropping it crashed already-folded trees, round-5 review)."""
    import jax
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    import jax.numpy as jnp
    params["conv1"] = dict(params["conv1"])
    conv = dict(params["conv1"]["conv"])
    conv["kernel"] = jnp.asarray(stem_kernel_to_s2d(conv["kernel"]))
    params["conv1"]["conv"] = conv
    out = dict(variables)
    out["params"] = params
    return out
