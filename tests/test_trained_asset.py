"""The shipped trained-model asset loads and scores like a trained model.

The repo distributes the full-recipe run's converged weights
(assets/trained/, exported by scripts/export_trained.py — the role of the
reference's released ``pretrained/best.pth.tar``, reference README.md:105).
These tests pin (a) the loader's tree reconstruction and (b) that the asset
actually performs: far below mean-collapse (~33-36% NME) on the shaded
synthetic AFLW2000 protocol it was trained against.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from synergynet_tpu.core.checkpoint import (checkpoint_metadata,
                                            load_trained_variables)

ASSET = os.path.join(os.path.dirname(__file__), os.pardir,
                     "synergynet_tpu", "assets", "trained",
                     "synergynet_mbv2_shaded680k_ep80.npz")


@pytest.fixture(scope="module")
def variables():
    return load_trained_variables(ASSET)


def test_asset_tree_shape(variables):
    assert set(variables) == {"params", "batch_stats"}
    assert set(variables["params"]) == {"backbone", "forward_direction",
                                        "reverse_direction"}
    assert "ConvBNReLU6_0" in variables["params"]["backbone"]
    assert all(a.dtype == np.float32
               for a in _leaves(variables["params"])), "loader must upcast"


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


def test_api_trained_spec():
    """SynergyNet3DMM(variables='trained') resolves the shipped asset —
    the reference's pretrained-by-default UX (synergy3DMM.py:95-104)."""
    from synergynet_tpu.pipeline import SynergyNet3DMM
    api = SynergyNet3DMM(variables="trained")
    assert "batch_stats" in api.variables
    with pytest.raises(ValueError):
        SynergyNet3DMM(variables="nope")
    with pytest.raises(ValueError):
        SynergyNet3DMM(arch="resnet50", variables="trained")


def test_asset_metadata():
    meta = checkpoint_metadata(ASSET)
    assert meta["arch"] == "mobilenet_v2"
    assert meta["epoch"] == 80


def test_asset_scores_like_a_trained_model(variables):
    from synergynet_tpu.data import TestTransform, make_synthetic_aflw2000
    from synergynet_tpu.evals import benchmark_pipeline
    from synergynet_tpu.mm3d import load_param_pack
    from synergynet_tpu.nn import SynergyNet

    model = SynergyNet(arch="mobilenet_v2", dtype=jnp.bfloat16)
    ep = make_synthetic_aflw2000(32, seed=11, appearance="shaded")
    r = benchmark_pipeline(model, variables, ep, load_param_pack(),
                           std=130.0, batch=32, transform=TestTransform())
    # CPU scores of the fp16 asset on the seed-11 shaded protocol:
    # 2.86% NME / 2.00 deg MAE at n=256, and 1.97% NME / 1.97 deg MAE at
    # the recipe's full n=1024 — matching the on-chip in-train eval's
    # 1.98%/1.97 at epoch 80 (docs/FULL_RECIPE_RUN.json). The round-4
    # "1.98 vs 2.86 discrepancy" was therefore pure protocol-subset
    # variance (the first 256 draws score worse than the full 1024;
    # adjacent-epoch evals jitter +-0.4 the same way), NOT fp16 export
    # loss or TPU-vs-CPU numerics (measured round 5, /tmp/probe_nme.py).
    # Mean-collapse sits at ~33-36% and an untrained model at ~36%.
    assert r["nme_mean"] < 8.0
    assert r["foe"]["mae_mean"] < 4.0
