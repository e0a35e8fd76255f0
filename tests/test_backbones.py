"""Backbone contract tests: every registered arch returns (param62, feat)
on a 120x120 input and trains (batch_stats mutate)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synergynet_tpu.nn.backbones import available_backbones, make_backbone

# One representative per family (full registry is large; the heavyweight
# variants share their family's block code).
FAST_ARCHS = ["mobilenet_v2", "mobilenet_1_0.5", "ghostnet", "resnet18",
              "resnest50", "resnest50_fast_1s4x24d"]


@pytest.mark.parametrize("arch", FAST_ARCHS)
def test_contract(arch):
    model = make_backbone(arch)
    x = jnp.zeros((2, 120, 120, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    param, feat = model.apply(variables, x, train=False)
    assert param.shape == (2, 62)
    assert feat.ndim == 2 and feat.shape[0] == 2
    assert np.isfinite(np.asarray(param)).all()


def test_registry_contains_reference_families():
    have = set(available_backbones())
    for name in ("mobilenet_v2", "mobilenet_1", "ghostnet", "resnet50",
                 "resnet101", "resnext50_32x4d", "wide_resnet50_2",
                 "resnest50", "resnest101", "resnest50_fast_1s1x64d"):
        assert name in have, name


def test_texture_head_variant():
    model = make_backbone("resnet18", with_texture=True)
    x = jnp.zeros((1, 120, 120, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    param, feat = model.apply(variables, x, train=False)
    assert param.shape == (1, 62)        # texture branch exists, 62 exposed
    leaves = jax.tree_util.tree_leaves_with_path(variables["params"])
    assert any("fc_texture" in "/".join(str(getattr(p, "key", p))
                                        for p in path)
               for path, _ in leaves)


def test_train_mode_updates_batch_stats():
    model = make_backbone("mobilenet_1_0.5")
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (4, 120, 120, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (param, feat), updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_synergynet_with_alternate_backbone():
    from synergynet_tpu.nn import SynergyNet, init_synergy_variables
    model = SynergyNet(arch="mobilenet_1_0.5")
    variables = init_synergy_variables(model, jax.random.PRNGKey(0))
    p62, feat = model.apply(variables, jnp.zeros((1, 120, 120, 3)),
                            train=False)
    assert p62.shape == (1, 62)
