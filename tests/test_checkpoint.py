"""Checkpoint round-trip and torch-import conversions."""

import numpy as np
import pytest

import jax

from synergynet_tpu.core.checkpoint import (
    save_checkpoint, restore_checkpoint, checkpoint_metadata,
    import_conv, import_linear, import_bn,
)


class TestPytreeCheckpoint:
    def test_roundtrip(self, tmp_path, rng):
        tree = {
            "params": {"dense": {"kernel": rng.normal(0, 1, (4, 8)).astype(np.float32),
                                 "bias": np.zeros(8, np.float32)}},
            "step": np.int32(17),
            "nested": [np.arange(3.0), np.arange(5.0)],
        }
        p = str(tmp_path / "ckpt.npz")
        save_checkpoint(p, tree, step=17, metadata={"arch": "mobilenet_v2"})
        template = jax.tree.map(np.zeros_like, tree)
        restored = restore_checkpoint(p, template)
        for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(a, b)
        meta = checkpoint_metadata(p)
        assert meta["step"] == 17 and meta["arch"] == "mobilenet_v2"

    def test_shape_mismatch_raises(self, tmp_path):
        p = str(tmp_path / "c.npz")
        save_checkpoint(p, {"a": np.zeros((2, 2))})
        with pytest.raises(ValueError):
            restore_checkpoint(p, {"a": np.zeros((3, 3))})

    def test_missing_leaf_raises(self, tmp_path):
        p = str(tmp_path / "c.npz")
        save_checkpoint(p, {"a": np.zeros(2)})
        with pytest.raises(KeyError):
            restore_checkpoint(p, {"a": np.zeros(2), "b": np.zeros(2)})

    def test_struct_state_restores_into_dict_template(self, tmp_path, rng):
        """A Trainer snapshot (flax struct.PyTreeNode -> GetAttrKey paths)
        must restore into cli.evaluate's plain ``{params, batch_stats}``
        dict template: attr keys str() with a leading dot (``.params``)
        which _path_key strips (caught by tests/test_dress_rehearsal.py)."""
        from flax import struct

        class State(struct.PyTreeNode):
            params: dict
            batch_stats: dict
            step: np.ndarray

        params = {"dense": {"kernel": rng.normal(0, 1, (3, 4)).astype(
            np.float32)}}
        stats = {"bn": {"mean": np.arange(4.0, dtype=np.float32)}}
        state = State(params=params, batch_stats=stats,
                      step=np.int32(7))
        p = str(tmp_path / "state.npz")
        save_checkpoint(p, state, step=7)
        got = restore_checkpoint(
            p, {"params": jax.tree.map(np.zeros_like, params),
                "batch_stats": jax.tree.map(np.zeros_like, stats)})
        np.testing.assert_array_equal(got["params"]["dense"]["kernel"],
                                      params["dense"]["kernel"])
        np.testing.assert_array_equal(got["batch_stats"]["bn"]["mean"],
                                      stats["bn"]["mean"])

    def test_pre_normalization_dotted_keys_restore(self, tmp_path):
        """Checkpoints written before _path_key (keys ``.params/...``)
        stay loadable: restore normalizes npz keys too."""
        import json
        p = str(tmp_path / "old.npz")
        np.savez(p, **{".params/dense/kernel": np.full((2, 2), 3.0),
                       "__metadata__": json.dumps({})})
        got = restore_checkpoint(
            p, {"params": {"dense": {"kernel": np.zeros((2, 2))}}})
        np.testing.assert_array_equal(got["params"]["dense"]["kernel"],
                                      np.full((2, 2), 3.0))


class TestTorchConversions:
    def test_conv_transpose(self, rng):
        w = rng.normal(0, 1, (16, 3, 5, 5))  # OIHW
        got = import_conv(w)
        assert got.shape == (5, 5, 3, 16)
        np.testing.assert_array_equal(got[0, 1, 2, 3], w[3, 2, 0, 1])

    def test_linear_transpose(self, rng):
        w = rng.normal(0, 1, (62, 1280))
        assert import_linear(w).shape == (1280, 62)

    def test_bn_mapping(self):
        sd = {"bn.weight": np.ones(4), "bn.bias": np.zeros(4),
              "bn.running_mean": np.full(4, 2.0),
              "bn.running_var": np.full(4, 3.0)}
        m = import_bn(sd, "bn")
        assert set(m) == {"scale", "bias", "mean", "var"}
        np.testing.assert_array_equal(m["var"], np.full(4, 3.0))


class TestCheckpointMetadata:
    def test_metadata_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        from synergynet_tpu.core import (save_checkpoint,
                                         checkpoint_metadata)
        p = str(tmp_path / "ck.npz")
        save_checkpoint(p, {"a": jnp.zeros(2)}, step=42,
                        metadata={"arch": "mobilenet_v2"})
        meta = checkpoint_metadata(p)
        assert meta["step"] == 42 and meta["arch"] == "mobilenet_v2"
