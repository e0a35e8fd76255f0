"""Import reference SynergyNet PyTorch checkpoints into the flax model.

The reference ships ``pretrained/best.pth.tar`` — a torch ``state_dict``
with DataParallel ``module.`` prefixes (reference model_building.py:255-263,
synergy3DMM.py:156-164). This module maps that naming onto the flax
variable tree of :class:`synergynet_tpu.nn.SynergyNet` (mobilenet_v2 arch):

torch (reference)                         flax (this framework)
-----------------                         ---------------------
I2P.backbone.features.0.{0,1}             backbone/ConvBNReLU6_0/{Conv_0,BatchNorm_0}
I2P.backbone.features.k.conv...  (1<=k<=17)  backbone/InvertedResidual_{k-1}/...
I2P.backbone.features.18.{0,1}            backbone/ConvBNReLU6_1/...
I2P.backbone.classifier_{ori,shape,exp}.1 backbone/ParamHead_0/fc_{pose,shape,exp}
forwardDirection.conv{1-5}/bn{1-5}        forward_direction/PointEncoder_0/enc{1-5}_{fc,bn}
forwardDirection.conv{6-9}/bn{6-9}        forward_direction/dec{1-4}_{fc,bn}
reverseDirection.conv{1-5}/bn{1-5}        reverse_direction/PointEncoder_0/enc{1-5}_{fc,bn}
reverseDirection.conv6_{1,2,3}/bn6_{1,2,3} reverse_direction/head_{rot,shape,exp}_{fc,bn}

Weight layout conversions: conv OIHW -> HWIO (depthwise (C,1,H,W) ->
(H,W,1,C)), Conv1d (out,in,1) and Linear (out,in) -> Dense (in,out);
BatchNorm weight/bias -> scale/bias and running stats -> batch_stats.
Registered 3DMM buffers (param_mean, w_shp, ...) are dropped — the pack is
an explicit argument here, not model state.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

# MobileNetV2 schedule (t, c, n, s): 17 inverted-residual blocks.
_IR_EXPAND = [1] + [6] * 16


def _torch_to_flax_names() -> Dict[str, Tuple[str, ...]]:
    """Maps torch parameter name -> (collection, flax path...)."""
    m: Dict[str, Tuple[str, ...]] = {}

    def conv(tname, fpath):
        m[f"{tname}.weight"] = ("params",) + fpath + ("kernel",)

    def dense(tname, fpath):
        m[f"{tname}.weight"] = ("params",) + fpath + ("kernel",)
        m[f"{tname}.bias"] = ("params",) + fpath + ("bias",)

    def bn(tname, fpath):
        m[f"{tname}.weight"] = ("params",) + fpath + ("scale",)
        m[f"{tname}.bias"] = ("params",) + fpath + ("bias",)
        m[f"{tname}.running_mean"] = ("batch_stats",) + fpath + ("mean",)
        m[f"{tname}.running_var"] = ("batch_stats",) + fpath + ("var",)

    bb = "I2P.backbone"
    # Stem (features.0 = ConvBNReLU) and final 1x1 (features.18).
    conv(f"{bb}.features.0.0", ("backbone", "ConvBNReLU6_0", "Conv_0"))
    bn(f"{bb}.features.0.1", ("backbone", "ConvBNReLU6_0", "BatchNorm_0"))
    conv(f"{bb}.features.18.0", ("backbone", "ConvBNReLU6_1", "Conv_0"))
    bn(f"{bb}.features.18.1", ("backbone", "ConvBNReLU6_1", "BatchNorm_0"))

    for k, expand in enumerate(_IR_EXPAND, start=1):
        t = f"{bb}.features.{k}.conv"
        f = ("backbone", f"InvertedResidual_{k - 1}")
        if expand == 1:
            # [ConvBNReLU(dw), conv, bn]
            conv(f"{t}.0.0", f + ("ConvBNReLU6_0", "Conv_0"))
            bn(f"{t}.0.1", f + ("ConvBNReLU6_0", "BatchNorm_0"))
            conv(f"{t}.1", f + ("Conv_0",))
            bn(f"{t}.2", f + ("BatchNorm_0",))
        else:
            # [ConvBNReLU(1x1), ConvBNReLU(dw), conv, bn]
            conv(f"{t}.0.0", f + ("ConvBNReLU6_0", "Conv_0"))
            bn(f"{t}.0.1", f + ("ConvBNReLU6_0", "BatchNorm_0"))
            conv(f"{t}.1.0", f + ("ConvBNReLU6_1", "Conv_0"))
            bn(f"{t}.1.1", f + ("ConvBNReLU6_1", "BatchNorm_0"))
            conv(f"{t}.2", f + ("Conv_0",))
            bn(f"{t}.3", f + ("BatchNorm_0",))

    for tname, fname in (("ori", "pose"), ("shape", "shape"), ("exp", "exp")):
        dense(f"{bb}.classifier_{tname}.1",
              ("backbone", "ParamHead_0", f"fc_{fname}"))

    # Synergy MLPs.
    for tmod, fmod in (("forwardDirection", "forward_direction"),
                       ("reverseDirection", "reverse_direction")):
        for i in range(1, 6):
            dense(f"{tmod}.conv{i}", (fmod, "PointEncoder_0", f"enc{i}_fc"))
            bn(f"{tmod}.bn{i}", (fmod, "PointEncoder_0", f"enc{i}_bn"))
    for i, dec in zip(range(6, 10), ("dec1", "dec2", "dec3", "dec4")):
        dense(f"forwardDirection.conv{i}", ("forward_direction", f"{dec}_fc"))
        bn(f"forwardDirection.bn{i}", ("forward_direction", f"{dec}_bn"))
    for suffix, head in (("1", "head_rot"), ("2", "head_shape"),
                         ("3", "head_exp")):
        dense(f"reverseDirection.conv6_{suffix}",
              ("reverse_direction", f"{head}_fc"))
        bn(f"reverseDirection.bn6_{suffix}",
           ("reverse_direction", f"{head}_bn"))
    return m


def _convert_leaf(torch_name: str, arr: np.ndarray) -> np.ndarray:
    if not torch_name.endswith(".weight"):
        return arr
    if arr.ndim == 4:                       # conv OIHW -> HWIO
        return np.transpose(arr, (2, 3, 1, 0))
    if arr.ndim == 3:                       # Conv1d (out,in,1) -> (in,out)
        return np.transpose(arr[:, :, 0], (1, 0))
    if arr.ndim == 2:                       # Linear (out,in) -> (in,out)
        if ".bn" in torch_name or "running" in torch_name:
            return arr
        return np.transpose(arr, (1, 0))
    return arr


def convert_synergynet_state_dict(sd: Dict[str, np.ndarray],
                                  strict: bool = False) -> dict:
    """torch state_dict (numpy or tensors) -> flax variables
    {'params': ..., 'batch_stats': ...}. Unmapped torch keys (3DMM buffers,
    num_batches_tracked) are ignored; with ``strict`` a mapped-but-missing
    torch key raises."""
    mapping = _torch_to_flax_names()
    out: dict = {"params": {}, "batch_stats": {}}

    def put(path, leaf):
        node = out[path[0]]
        for k in path[1:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    seen = set()
    for name, val in sd.items():
        name = name.removeprefix("module.")
        if name not in mapping:
            continue
        arr = np.asarray(val.detach().cpu().numpy()
                         if hasattr(val, "detach") else val)
        put(mapping[name], _convert_leaf(name, arr))
        seen.add(name)
    if strict:
        missing = sorted(set(mapping) - seen)
        if missing:
            raise KeyError(f"checkpoint missing {len(missing)} leaves, "
                           f"first: {missing[:5]}")
    return out


def load_synergynet_variables(path: str, arch: str = "mobilenet_v2",
                              validate_against: Optional[dict] = None) -> dict:
    """Load a checkpoint: framework ``.npz`` or reference ``.pth.tar``."""
    if arch != "mobilenet_v2":
        raise NotImplementedError(
            "torch import implemented for the shipped mobilenet_v2 arch")
    if path.endswith(".npz"):
        import jax
        from synergynet_tpu.core.checkpoint import restore_checkpoint
        from synergynet_tpu.nn import SynergyNet, init_synergy_variables
        template = validate_against or jax.device_get(init_synergy_variables(
            SynergyNet(arch=arch), jax.random.PRNGKey(0)))
        return restore_checkpoint(path, template)
    from synergynet_tpu.core.checkpoint import load_torch_state_dict
    sd = load_torch_state_dict(path)
    variables = convert_synergynet_state_dict(sd, strict=True)
    if validate_against is not None:
        import jax
        want = {"/".join(map(str, [getattr(p, "key", p) for p in k])): v.shape
                for k, v in jax.tree_util.tree_flatten_with_path(
                    validate_against)[0]}
        got = {"/".join(map(str, [getattr(p, "key", p) for p in k])): v.shape
               for k, v in jax.tree_util.tree_flatten_with_path(
                   variables)[0]}
        if want != got:
            only_w = set(want) - set(got)
            only_g = set(got) - set(want)
            raise ValueError(f"tree mismatch: missing={sorted(only_w)[:4]} "
                             f"extra={sorted(only_g)[:4]}")
    return variables


def expected_torch_shapes() -> Dict[str, tuple]:
    """The torch-side shapes for every mapped leaf, derived from the flax
    init — lets tests fabricate a complete reference-style checkpoint
    without torch."""
    import jax
    from synergynet_tpu.nn import SynergyNet, init_synergy_variables
    variables = jax.device_get(init_synergy_variables(
        SynergyNet(), jax.random.PRNGKey(0)))

    def get(path):
        node = variables[path[0]]
        for k in path[1:]:
            node = node[k]
        return np.asarray(node)

    out = {}
    for tname, fpath in _torch_to_flax_names().items():
        arr = get(fpath)
        if tname.endswith(".weight") and arr.ndim == 4:
            h, w, i, o = arr.shape
            out[tname] = (o, i, h, w)
        elif tname.endswith(".weight") and arr.ndim == 2 and \
                "conv" in tname.split(".")[-2]:
            i, o = arr.shape
            out[tname] = (o, i, 1)          # Conv1d
        elif tname.endswith(".weight") and arr.ndim == 2:
            i, o = arr.shape
            out[tname] = (o, i)             # Linear
        else:
            out[tname] = tuple(arr.shape)
    return out
