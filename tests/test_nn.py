"""Neural nets and losses: shapes, oracle parity, gradient flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synergynet_tpu.losses import wing_loss, param_loss
from synergynet_tpu.nn import (
    SynergyNet, synergy_criterion, MLPFor, MLPRev, make_backbone,
    available_backbones, REFINE_SCALE,
)
from tests.oracles import oracle_wing_loss, oracle_param_loss


class TestLosses:
    def test_wing_matches_oracle(self, rng):
        pred = rng.normal(0, 8, (4, 3, 68)).astype(np.float32)
        target = rng.normal(0, 8, (4, 3, 68)).astype(np.float32)
        got = float(wing_loss(jnp.asarray(pred), jnp.asarray(target)))
        want = oracle_wing_loss(pred.astype(np.float64), target.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_wing_both_branches_exercised(self, rng):
        # deltas straddling omega=10
        pred = np.zeros((1, 3, 10), np.float32)
        target = np.linspace(0, 30, 30).reshape(1, 3, 10).astype(np.float32)
        got = float(wing_loss(jnp.asarray(pred), jnp.asarray(target)))
        want = oracle_wing_loss(pred, target)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_param_loss_normal(self, rng):
        a = rng.normal(0, 1, (6, 62)).astype(np.float32)
        b = rng.normal(0, 1, (6, 62)).astype(np.float32)
        got = np.asarray(param_loss(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, oracle_param_loss(a, b), rtol=1e-5)

    def test_param_loss_only_3dmm_quirk(self, rng):
        a = rng.normal(0, 1, (6, 62)).astype(np.float32)
        b = rng.normal(0, 1, (6, 62)).astype(np.float32)
        got = np.asarray(param_loss(jnp.asarray(a), jnp.asarray(b),
                                    mode="only_3dmm"))
        np.testing.assert_allclose(got, oracle_param_loss(a, b, "only_3dmm"),
                                   rtol=1e-5)

    def test_param_loss_bad_mode(self):
        with pytest.raises(ValueError):
            param_loss(jnp.zeros((1, 62)), jnp.zeros((1, 62)), mode="bogus")


class TestBackbone:
    def test_mobilenet_v2_contract(self, rng):
        model = make_backbone("mobilenet_v2")
        x = jnp.asarray(rng.normal(0, 1, (2, 120, 120, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        param62, feat = model.apply(variables, x, train=False)
        assert param62.shape == (2, 62)
        assert feat.shape == (2, 1280)
        n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
        # MobileNetV2 1.0x trunk ~2.2M + 1280*62 head
        assert 2_000_000 < n_params < 4_000_000

    def test_unknown_backbone_raises(self):
        with pytest.raises(ValueError):
            make_backbone("definitely_not_a_net")
        assert "mobilenet_v2" in available_backbones()

    def test_width_mult_variant(self, rng):
        model = make_backbone("mobilenet_v2_0.5")
        x = jnp.zeros((1, 120, 120, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        param62, feat = model.apply(variables, x, train=False)
        assert param62.shape == (1, 62) and feat.shape == (1, 1280)


class TestPointNets:
    def test_mlp_for_shapes_and_channels(self, rng):
        m = MLPFor()
        lmk = jnp.asarray(rng.normal(60, 20, (2, 68, 3)).astype(np.float32))
        feat = jnp.zeros((2, 1280))
        sc, ec = jnp.zeros((2, 40)), jnp.zeros((2, 10))
        variables = m.init(jax.random.PRNGKey(0), lmk, feat, sc, ec)
        out = m.apply(variables, lmk, feat, sc, ec, train=False)
        assert out.shape == (2, 68, 3)
        assert (np.asarray(out) >= 0).all()  # output is BN+ReLU'd
        # concat width 64+1024+1280+40+10 = 2418 (reference quirk Q1)
        assert variables["params"]["dec1_fc"]["kernel"].shape[0] == 2418

    def test_mlp_rev_shapes(self, rng):
        m = MLPRev()
        lmk = jnp.asarray(rng.normal(60, 20, (3, 68, 3)).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), lmk)
        out = m.apply(variables, lmk, train=False)
        assert out.shape == (3, 62)
        assert (np.asarray(out) >= 0).all()


class TestSynergyNet:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        from synergynet_tpu.nn import init_synergy_variables
        model = SynergyNet(arch="mobilenet_v2")
        variables = init_synergy_variables(model, jax.random.PRNGKey(0), batch=2)
        return model, variables

    def test_forward_test(self, model_and_vars, rng):
        model, variables = model_and_vars
        x = jnp.asarray(rng.normal(0, 1, (2, 120, 120, 3)).astype(np.float32))
        param62, feat = model.apply(variables, x, train=False)
        assert param62.shape == (2, 62) and feat.shape == (2, 1280)
        assert np.isfinite(np.asarray(param62)).all()

    def test_criterion_losses_and_grads(self, model_and_vars, small_pack, rng):
        model, variables = model_and_vars
        x = jnp.asarray(rng.normal(0, 1, (2, 120, 120, 3)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(0, 1, (2, 62)).astype(np.float32))

        def loss_fn(params):
            total, losses, updates = synergy_criterion(
                model, {**variables, "params": params}, x, tgt, small_pack,
                train=True, dropout_rng=jax.random.PRNGKey(1))
            return total, (losses, updates)

        (total, (losses, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        assert np.isfinite(float(total))
        assert set(losses) == {"loss_LMK_f0", "loss_Param_In",
                               "loss_LMK_pointNet", "loss_Param_S2",
                               "loss_Param_S1S2"}
        assert all(np.isfinite(float(v)) for v in losses.values())
        assert "batch_stats" in updates
        gnorms = [float(jnp.linalg.norm(g)) for g in jax.tree.leaves(grads)]
        assert all(np.isfinite(g) for g in gnorms)
        assert sum(gnorms) > 0

    def test_criterion_eval_mode(self, model_and_vars, small_pack, rng):
        model, variables = model_and_vars
        x = jnp.zeros((2, 120, 120, 3))
        tgt = jnp.zeros((2, 62))
        total, losses, updates = synergy_criterion(
            model, variables, x, tgt, small_pack, train=False)
        assert np.isfinite(float(total))
        assert updates == {}
