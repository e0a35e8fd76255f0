"""Shaded-surface synthetic task (data/shaded.py): decode consistency,
splat correctness, determinism, and dataset-contract compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synergynet_tpu.data.shaded import (DOT_BGR, build_shaded_spec,
                                        decode_grid, make_shaded_crops,
                                        render_shaded_crops)
from synergynet_tpu.data.synthetic import sample_params
from synergynet_tpu.mm3d import (decode_dense, decode_landmarks,
                                 load_param_pack)
from synergynet_tpu.mm3d.assets import GRID_H, GRID_W


@pytest.fixture(scope="module")
def pack():
    return load_param_pack()


@pytest.fixture(scope="module")
def params4():
    return sample_params(np.random.default_rng(5), 4)


def test_decode_grid_matches_dense(pack, params4):
    """The grid decode is exactly the dense decode's grid-vertex prefix."""
    spec = build_shaded_spec(pack)
    v_grid = decode_grid(jnp.asarray(params4), spec, pack)
    v_dense = decode_dense(jnp.asarray(params4), pack)
    ng = GRID_H * GRID_W
    np.testing.assert_allclose(
        np.asarray(v_grid).reshape(4, 3, ng),
        np.asarray(v_dense)[:, :, :ng], rtol=1e-5, atol=1e-4)


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
    opt = optax.sgd(1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), opt)
    state = replicate(mesh, state)
    n, b = 64, 16
    params = sample_params(np.random.default_rng(0), n)
    g_tgts = shard_resident_params(mesh, params)
    assert g_tgts.shape == (4, 16, 62)
    epoch_fn = make_generative_epoch_program(model, pack, opt, mesh, b)
    key = jax.random.PRNGKey(1)
    losses = []
    for e in range(2):
        state, metrics = epoch_fn(state, g_tgts, jax.random.fold_in(key, e))
        losses.append(float(metrics["loss_total"]))
        assert float(metrics["skipped"]) == 0.0
    assert int(jax.device_get(state.step)) == 8
    assert np.isfinite(losses).all()
    assert losses[1] < losses[0]


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


def test_splat_zbuffer_semantics():
    """The splat primitive: nearest-z point wins its pixel, exact ties
    resolve to exactly one winner, out-of-bounds points are dropped, and
    uncovered pixels keep the background."""
    from synergynet_tpu.data.shaded import _splat_one
    size = 8
    xy = jnp.asarray([[2.0, 3.0],    # pixel (3, 2), far
                      [2.4, 3.2],    # same pixel after rounding, NEAR
                      [2.0, 3.0],    # same pixel, exact z tie with point 0
                      [5.0, 5.0],    # lone pixel
                      [-3.0, 1.0]])  # out of bounds
    zq = jnp.asarray([10, 500, 10, 7, 9999], jnp.int32)
    zkey = zq * 65536 + jnp.arange(5, dtype=jnp.int32)
    colors = jnp.asarray([[1, 1, 1], [2, 2, 2], [3, 3, 3],
                          [4, 4, 4], [5, 5, 5]], jnp.uint8)
    bg = jnp.zeros((size * size, 3), jnp.uint8)
    img = np.asarray(_splat_one(xy, zkey, colors, bg, size)
                     ).reshape(size, size, 3)
    assert tuple(img[3, 2]) == (2, 2, 2)      # nearest z won
    assert tuple(img[5, 5]) == (4, 4, 4)
    assert (img[1] == 0).all()                # OOB point dropped
    covered = (img.reshape(-1, 3) != 0).any(-1).sum()
    assert covered == 2                       # exactly one winner per pixel
