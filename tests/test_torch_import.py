"""Torch checkpoint importer tests: structural completeness of the name
mapping + numerical layout-conversion parity against real torch layers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestSynergyImportMapping:
    def test_fabricated_checkpoint_fills_tree(self):
        """A fabricated reference-style state_dict must convert into the
        exact flax variable tree (every leaf, correct shapes)."""
        from synergynet_tpu.nn import SynergyNet, init_synergy_variables
        from synergynet_tpu.nn.torch_import import (
            convert_synergynet_state_dict, expected_torch_shapes)

        shapes = expected_torch_shapes()
        rng = np.random.default_rng(0)
        sd = {"module." + k: rng.normal(0, 0.02, s).astype(np.float32)
              for k, s in shapes.items()}
        sd["param_mean"] = np.zeros(62, np.float32)      # dropped buffer

        got = convert_synergynet_state_dict(sd, strict=True)
        want = jax.device_get(init_synergy_variables(
            SynergyNet(), jax.random.PRNGKey(0)))

        flat = lambda t: {
            "/".join(str(getattr(p, "key", p)) for p in k): np.asarray(v).shape
            for k, v in jax.tree_util.tree_flatten_with_path(t)[0]}
        assert flat(got) == flat(want)

    def test_converted_model_runs(self):
        from synergynet_tpu.nn import SynergyNet
        from synergynet_tpu.nn.torch_import import (
            convert_synergynet_state_dict, expected_torch_shapes)
        rng = np.random.default_rng(1)
        sd = {k: rng.normal(0, 0.02, s).astype(np.float32)
              for k, s in expected_torch_shapes().items()}
        # positive running_var so BN is well-defined
        for k in sd:
            if k.endswith("running_var"):
                sd[k] = np.abs(sd[k]) + 1.0
        variables = convert_synergynet_state_dict(sd, strict=True)
        model = SynergyNet()
        p62, feat = model.apply(variables, jnp.zeros((2, 120, 120, 3)),
                                train=False)
        assert p62.shape == (2, 62) and np.isfinite(np.asarray(p62)).all()

    def test_strict_raises_on_missing(self):
        from synergynet_tpu.nn.torch_import import (
            convert_synergynet_state_dict)
        with pytest.raises(KeyError):
            convert_synergynet_state_dict({}, strict=True)


class TestLayoutParity:
    """Micro-parity of the layout conversions vs real torch layers."""

    def test_conv2d(self):
        import torch
        from synergynet_tpu.core.checkpoint import import_conv
        rng = np.random.default_rng(0)
        w = rng.normal(0, 1, (8, 3, 3, 3)).astype(np.float32)
        x = rng.normal(0, 1, (2, 3, 10, 10)).astype(np.float32)
        conv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w))
            want = conv(torch.from_numpy(x)).numpy()
        from flax import linen as nn
        got = nn.Conv(8, (3, 3), strides=2, padding=1, use_bias=False).apply(
            {"params": {"kernel": jnp.asarray(import_conv(w))}},
            jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, atol=2e-5)

    def test_depthwise_conv2d(self):
        import torch
        from synergynet_tpu.core.checkpoint import import_depthwise_conv
        rng = np.random.default_rng(1)
        c = 6
        w = rng.normal(0, 1, (c, 1, 3, 3)).astype(np.float32)
        x = rng.normal(0, 1, (2, c, 8, 8)).astype(np.float32)
        conv = torch.nn.Conv2d(c, c, 3, padding=1, groups=c, bias=False)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w))
            want = conv(torch.from_numpy(x)).numpy()
        from flax import linen as nn
        got = nn.Conv(c, (3, 3), padding=1, feature_group_count=c,
                      use_bias=False).apply(
            {"params": {"kernel": jnp.asarray(import_depthwise_conv(w))}},
            jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, atol=2e-5)

    def test_conv1d_as_dense(self):
        """A torch 1x1 Conv1d over (B, C, N) equals Dense over (B, N, C)."""
        import torch
        rng = np.random.default_rng(2)
        w = rng.normal(0, 1, (5, 3, 1)).astype(np.float32)
        b = rng.normal(0, 1, (5,)).astype(np.float32)
        x = rng.normal(0, 1, (2, 3, 7)).astype(np.float32)
        conv = torch.nn.Conv1d(3, 5, 1)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w))
            conv.bias.copy_(torch.from_numpy(b))
            want = conv(torch.from_numpy(x)).numpy()        # (2, 5, 7)
        from flax import linen as nn
        from synergynet_tpu.nn.torch_import import _convert_leaf
        kernel = _convert_leaf("m.conv1.weight", w)
        got = nn.Dense(5).apply(
            {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(b)}},
            jnp.asarray(x.transpose(0, 2, 1)))              # (2, 7, 5)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                                   atol=2e-5)

    def test_batchnorm(self):
        import torch
        rng = np.random.default_rng(3)
        c = 4
        x = rng.normal(0, 2, (3, c, 5, 5)).astype(np.float32)
        bn = torch.nn.BatchNorm2d(c, eps=1e-5)
        with torch.no_grad():
            bn.weight.copy_(torch.from_numpy(
                rng.uniform(0.5, 1.5, c).astype(np.float32)))
            bn.bias.copy_(torch.from_numpy(
                rng.normal(0, 1, c).astype(np.float32)))
            bn.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 1, c).astype(np.float32)))
            bn.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 2, c).astype(np.float32)))
        bn.eval()
        with torch.no_grad():
            want = bn(torch.from_numpy(x)).numpy()
        from flax import linen as nn
        got = nn.BatchNorm(use_running_average=True, epsilon=1e-5).apply(
            {"params": {"scale": jnp.asarray(bn.weight.detach().numpy()),
                        "bias": jnp.asarray(bn.bias.detach().numpy())},
             "batch_stats": {"mean": jnp.asarray(bn.running_mean.numpy()),
                             "var": jnp.asarray(bn.running_var.numpy())}},
            jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, atol=2e-5)
