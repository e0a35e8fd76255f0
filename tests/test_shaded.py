"""Shaded-surface synthetic task (data/shaded.py): separable blob-field
correctness, determinism, and dataset-contract compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synergynet_tpu.data.shaded import (DOT_BGR, make_shaded_crops,
                                        render_shaded_crops)
from synergynet_tpu.data.synthetic import sample_params
from synergynet_tpu.mm3d import decode_landmarks, load_param_pack


@pytest.fixture(scope="module")
def pack():
    return load_param_pack()


@pytest.fixture(scope="module")
def params4():
    return sample_params(np.random.default_rng(5), 4)


def test_blob_fields_match_naive():
    """The separable-matmul blob splat equals the naive per-pixel
    Gaussian sum (the math the matmul factorizes)."""
    from synergynet_tpu.data.shaded import (FIELD_EPS, SIGMA, _blob_fields,
                                            _tint)
    size, k = 16, 5
    rng = np.random.default_rng(3)
    lmk = rng.uniform(-2, size + 2, (3, k)).astype(np.float32)
    lmk[2] = rng.uniform(-20, 20, k)
    cover, zfield, tint = jax.tree.map(
        np.asarray, _blob_fields(jnp.asarray(lmk), size))

    ys, xs = np.mgrid[:size, :size].astype(np.float32)
    w = np.exp(-((xs[..., None] - lmk[0]) ** 2
                 + (ys[..., None] - lmk[1]) ** 2) / (2 * SIGMA * SIGMA))
    np.testing.assert_allclose(cover, w.sum(-1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        zfield, (w * lmk[2]).sum(-1) / (w.sum(-1) + FIELD_EPS),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        tint, (w[..., None] * _tint(k)[None, None]).sum(2)
        / (w.sum(-1)[..., None] + FIELD_EPS), rtol=1e-4, atol=1e-5)


def test_dot_mask_semantics():
    """The matmul dot mask is the exact union of 2x2 dots at rounded,
    [0, size-2]-clipped landmark coordinates (incl. out-of-bounds clip)."""
    from synergynet_tpu.data.shaded import _dot_mask
    size = 10
    lmk = jnp.asarray([[2.4, 7.6, -5.0, 30.0],      # x
                       [3.0, 0.0, 4.0, 9.9],        # y
                       [0.0, 0.0, 0.0, 0.0]])
    mask = np.asarray(_dot_mask(lmk, size))
    want = np.zeros((size, size), bool)
    for x, y in [(2, 3), (8, 0), (0, 4), (8, 8)]:
        want[y:y + 2, x:x + 2] = True
    np.testing.assert_array_equal(mask, want)


def test_render_shapes_coverage_determinism(pack, params4):
    key = jax.random.PRNGKey(0)
    img = np.asarray(render_shaded_crops(params4, key, pack))
    assert img.shape == (4, 120, 120, 3) and img.dtype == np.uint8
    # The lit surface covers a substantial crop fraction (bg max is 119).
    cov = (img.max(-1) > 119).mean()
    assert cov > 0.25, f"surface coverage too low: {cov}"
    # Shading varies across the surface (dense appearance, not flat fill).
    face = img[img.max(-1) > 119].astype(np.float32)
    assert face.std() > 10.0
    # Same key -> identical crops; different key -> different lighting/bg.
    img2 = np.asarray(render_shaded_crops(params4, key, pack))
    np.testing.assert_array_equal(img, img2)
    img3 = np.asarray(render_shaded_crops(params4, jax.random.PRNGKey(9),
                                          pack))
    assert (img3 != img).mean() > 0.1


def test_landmark_dots_painted(pack, params4):
    """Every in-bounds GT landmark pixel carries the exact dot color."""
    img = np.asarray(render_shaded_crops(params4, jax.random.PRNGKey(1),
                                         pack))
    lmk = np.asarray(decode_landmarks(jnp.asarray(params4), pack))
    xs = np.clip(np.round(lmk[:, 0]).astype(int), 0, 118)
    ys = np.clip(np.round(lmk[:, 1]).astype(int), 0, 118)
    for b in range(4):
        px = img[b, ys[b], xs[b]]                     # (68, 3)
        np.testing.assert_array_equal(
            px, np.broadcast_to(np.asarray(DOT_BGR, np.uint8), px.shape))


def test_make_shaded_crops_contract(pack):
    """Same dict contract as make_crops_with_params, padded-batch path."""
    d = make_shaded_crops(5, pack, seed=2, batch=4)   # n % batch != 0
    assert d["images"].shape == (5, 120, 120, 3)
    assert d["params"].shape == (5, 62)
    assert d["landmarks"].shape == (5, 3, 68)
    from synergynet_tpu.data.synthetic import make_crops_with_params
    d2 = make_crops_with_params(5, pack, seed=2, appearance="shaded")
    np.testing.assert_array_equal(d2["params"], d["params"])


def test_generative_epoch_program_trains_on_mesh(pack):
    """Device-generative resident training: params-only in HBM, crops
    rendered on device inside the epoch program, sharded over the mesh."""
    import optax
    from synergynet_tpu.core import make_mesh, replicate
    from synergynet_tpu.nn import SynergyNet
    from synergynet_tpu.train import (create_train_state,
                                      make_generative_epoch_program,
                                      shard_resident_params)
    mesh = make_mesh(n_model=2)                     # 4x2
    model = SynergyNet(arch="mobilenet_v2_0.5")
    opt = optax.sgd(2e-2)
    state = create_train_state(model, jax.random.PRNGKey(0), opt)
    state = replicate(mesh, state)
    n, b = 64, 16
    params = sample_params(np.random.default_rng(0), n)
    g_tgts = shard_resident_params(mesh, params)
    assert g_tgts.shape == (4, 16, 62)
    from synergynet_tpu.train.resident import _shard_epoch_perms
    epoch_fn = make_generative_epoch_program(model, pack, opt, mesh, b)
    key = jax.random.PRNGKey(1)
    losses = []
    # Lighting/background re-roll per epoch, so at 4 steps/epoch the
    # epoch-to-epoch loss delta is noisy: run enough epochs that the
    # training signal dominates the lighting draw.
    for e in range(8):
        ek = jax.random.fold_in(key, e)
        perms = _shard_epoch_perms(mesh, ek, g_tgts.shape[1])
        assert perms.shape == g_tgts.shape[:2]
        assert sorted(np.asarray(perms)[0].tolist()) == list(
            range(g_tgts.shape[1]))
        state, metrics = epoch_fn(state, g_tgts, perms, ek)
        losses.append(float(metrics["loss_total"]))
        assert float(metrics["skipped"]) == 0.0
    assert int(jax.device_get(state.step)) == 32
    assert np.isfinite(losses).all()
    assert min(losses[4:]) < losses[0]


def test_generated_dataset_shaded_contract(pack):
    """GeneratedCropDataset(appearance='shaded'): bit-stable per (seed,
    index), batch == per-item generation, same item contract."""
    from synergynet_tpu.data import GeneratedCropDataset
    ds = GeneratedCropDataset(32, pack, seed=4, appearance="shaded")
    img_a = ds.generate_images(np.asarray([3, 17, 5]))
    img_b = ds.generate_images(np.asarray([17, 3]))
    np.testing.assert_array_equal(img_a[0], img_b[1])
    np.testing.assert_array_equal(img_a[1], img_b[0])
    item_img, item_p = ds[17]
    np.testing.assert_array_equal(item_img, img_b[0])
    np.testing.assert_array_equal(item_p, ds.params[17])
    ds2 = GeneratedCropDataset(32, pack, seed=4, appearance="shaded")
    np.testing.assert_array_equal(ds2.generate_images(np.asarray([3])),
                                  img_a[:1])


def test_render_is_matmul_only():
    """The render must stay scatter-free: TPU scatters measured ~10M
    elem/s (5.4 s/batch for the old z-buffer splat) and long scatter
    dispatches crashed the TPU worker. Guard the compiled HLO."""
    from synergynet_tpu.data.shaded import _render_shaded
    lmk = jnp.asarray(np.random.default_rng(0)
                      .uniform(0, 119, (2, 3, 68)).astype(np.float32))
    hlo = jax.jit(lambda l, k: _render_shaded(l, k)).lower(
        lmk, jax.random.PRNGKey(0)).compile().as_text()
    assert "scatter" not in hlo
