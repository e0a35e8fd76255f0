"""Composed end-to-end golden parity for the packaged API.

Round-2 VERDICT item 1: every pipeline stage had *individual* golden parity
but the reference's actual packaged chain was never executed as one
composition. These tests run the reference's own
``synergy3DMM.SynergyNet.get_all_outputs`` (/root/reference/synergy3DMM.py:
167-207) — Q10 bbox squaring, zero-padded ``crop_img``, LANCZOS4 resize,
``forward_test``, numpy sparse/dense/pose decode — end to end, with:

- ``utils.params.ParamsPack`` stubbed to this framework's asset pack,
- random-init reference torch weights exported through
  ``nn/torch_import.py``,
- the detector stubbed to fixed rects fed identically to both sides
  (detector e2e parity is proven separately in test_reference_parity.py),

and assert the final (lmk, mesh, pose) tuples against
``pipeline.api.SynergyNet3DMM.get_all_outputs``.  A second test covers the
demo-script variant (singleImage.py:66-93: INTER_LINEAR resize +
ToTensor/Normalize transforms — quirk Q7).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

needs_reference_code = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "synergy3DMM.py")),
    reason="reference checkout not mounted")


def _load_by_path(name, relpath):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class _StubFaceBoxes:
    """Stands in for the reference FaceBoxes detector: returns preset rects
    (fresh copies — get_all_outputs mutates them in place,
    synergy3DMM.py:178-185)."""

    rects = []

    def __call__(self, img):
        return [list(r) for r in _StubFaceBoxes.rects]


@pytest.fixture(scope="module")
def ref_env(pack):
    """The reference synergy3DMM module, executed with its ParamsPack backed
    by this framework's asset pack, plus its real utils.inference and
    utils.ddfa modules. Yields (synergy_mod, torch_net, inference_mod,
    ddfa_mod)."""
    torch = pytest.importorskip("torch")

    before = set(sys.modules)
    sys.path.insert(0, REF)

    class _Pack:
        u = np.asarray(pack.u, np.float64)
        w_shp = np.asarray(pack.w_shp, np.float64)
        w_exp = np.asarray(pack.w_exp, np.float64)
        u_base = np.asarray(pack.u_base, np.float64)
        w_shp_base = np.asarray(pack.w_shp_base, np.float64)
        w_exp_base = np.asarray(pack.w_exp_base, np.float64)
        param_mean = np.asarray(pack.param_mean, np.float64)
        param_std = np.asarray(pack.param_std, np.float64)
        keypoints = np.asarray(pack.keypoints)
        std_size = 120

    utils_pkg = types.ModuleType("utils")
    utils_pkg.__path__ = [os.path.join(REF, "utils")]
    params_mod = types.ModuleType("utils.params")
    params_mod.ParamsPack = _Pack
    params_mod.__all__ = ["ParamsPack"]
    io_mod = types.ModuleType("utils.io")
    io_mod._numpy_to_tensor = lambda x: torch.from_numpy(x)
    io_mod._load_cpu = lambda p: np.load(p)
    io_mod._load = lambda p: np.load(p)
    utils_pkg.params = params_mod
    utils_pkg.io = io_mod

    tv = types.ModuleType("torchvision")            # torchvision is not
    tv.transforms = types.ModuleType("torchvision.transforms")  # installed
    fb_pkg = types.ModuleType("FaceBoxes")
    fb_pkg.FaceBoxes = _StubFaceBoxes

    sys.modules.update({
        "utils": utils_pkg, "utils.params": params_mod, "utils.io": io_mod,
        "torchvision": tv, "torchvision.transforms": tv.transforms,
        "FaceBoxes": fb_pkg,
    })
    try:
        inf = _load_by_path("utils.inference", "utils/inference.py")
        utils_pkg.inference = inf
        ddfa = _load_by_path("utils.ddfa", "utils/ddfa.py")
        utils_pkg.ddfa = ddfa
        syn = _load_by_path("_ref_synergy3dmm", "synergy3DMM.py")
        # tri.mat is an unmounted large blob; stand in with the asset
        # pack's triangles re-encoded the way the .mat stores them
        # (1-based, 3 x ntri — synergy3DMM.py:73).
        tri = np.asarray(pack.tri, np.int64)
        if tri.shape[0] != 3:
            tri = tri.T
        syn.sio = types.SimpleNamespace(loadmat=lambda p: {"tri": tri + 1})
        torch.manual_seed(123)
        net = syn.SynergyNet()   # best.pth.tar absent -> silent random init
        net.eval()
        yield syn, net, inf, ddfa
    finally:
        sys.path.remove(REF)
        for k in set(sys.modules) - before:
            sys.modules.pop(k, None)


def _structured_image(h=260, w=340, seed=5):
    rng = np.random.default_rng(seed)
    img = (np.linspace(40, 200, w)[None, :, None]
           * np.ones((h, w, 3))).astype(np.float32)
    yy, xx = np.mgrid[:h, :w]
    for cx, cy, r, col in ((120, 130, 60, (190, 170, 160)),
                           (40, 60, 50, (120, 140, 200))):
        m = ((xx - cx) ** 2 + (yy - cy) ** 2) < r * r
        img[m] = col
    img = np.clip(img + rng.normal(0, 10, img.shape), 0, 255)
    return img.astype(np.uint8)


def _our_api(net, pack):
    from synergynet_tpu.nn.torch_import import convert_synergynet_state_dict
    from synergynet_tpu.pipeline import SynergyNet3DMM
    sd = {k: v for k, v in net.state_dict().items()
          if k.startswith(("I2P.", "forwardDirection.", "reverseDirection."))}
    return SynergyNet3DMM(variables=convert_synergynet_state_dict(sd),
                          pack=pack)


RECTS = [[70.0, 60.0, 180.0, 200.0, 0.97],
         [-12.0, 4.0, 100.0, 110.0, 0.81]]   # 2nd crop goes out of bounds


@pytest.fixture()
def ref_benchmark(ref_env, tmp_path, monkeypatch):
    """The reference benchmark.py module executed against a fabricated
    aflw2000_data/eval layout in a temp cwd (its GT paths are relative,
    benchmark.py:187-189 and benchmark_aflw2000.py:13-19). Yields
    (benchmark_mod, yaws, gt_pose_kept, skip_indices)."""
    rng = np.random.default_rng(21)
    n = 48
    yaws = np.concatenate([np.linspace(-120, 120, n - 4),
                           [-100.5, 99.5, 101.0, -99.0]]).astype(np.float32)
    skip = np.nonzero(np.abs(yaws) > 99.0)[0]
    gt_all = rng.uniform(-60, 60, (n, 3)).astype(np.float64)  # pitch-yaw-roll
    gt_kept = gt_all[np.setdiff1d(np.arange(n), skip)]

    d = tmp_path / "aflw2000_data" / "eval"
    d.mkdir(parents=True)
    np.save(d / "AFLW2000-3D.pose.npy", yaws)
    np.save(d / "AFLW2000-3D.pts68.npy",
            rng.uniform(0, 120, (n, 2, 68)).astype(np.float32))
    np.save(d / "AFLW2000-3D-Reannotated.pts68.npy",
            rng.uniform(0, 120, (n, 2, 68)).astype(np.float32))
    np.save(d / "AFLW2000-3D_crop.roi_box.npy",
            np.tile([20.0, 20.0, 140.0, 140.0], (n, 1)).astype(np.float32))
    np.save(d / "ALFW2000-3D_pose_3ANG_excl.npy", gt_kept)
    np.save(d / "ALFW2000-3D_pose_3ANG_skip.npy", skip)
    monkeypatch.chdir(tmp_path)

    mod = _load_by_path("_ref_benchmark", "benchmark.py")
    try:
        yield mod, yaws, gt_kept, skip
    finally:
        for k in ("_ref_benchmark", "benchmark_aflw2000", "model_building"):
            sys.modules.pop(k, None)


@needs_reference_code
class TestFOEGoldenParity:
    def test_benchmark_foe_executed_reference(self, ref_benchmark, pack):
        """Execute the reference's benchmark_FOE (benchmark.py:183-216) —
        skip rule, yaw/pitch angle swap, MAE math, report string — and
        reproduce its exact output with evals.foe on the same params."""
        import jax.numpy as jnp
        from synergynet_tpu.evals import foe_mae, format_foe_report
        from synergynet_tpu.evals.foe import derive_skip_indices
        from synergynet_tpu.mm3d import pose_from_param

        mod, yaws, gt_kept, skip = ref_benchmark
        rng = np.random.default_rng(22)
        params = rng.normal(0, 0.6, (len(yaws), 62)).astype(np.float32)

        want_msg = mod.benchmark_FOE(params)

        # the |yaw|>99 rule re-derives the shipped skip file exactly
        np.testing.assert_array_equal(derive_skip_indices(yaws), skip)

        angles, _ = pose_from_param(jnp.asarray(params), pack)
        got = foe_mae(np.asarray(angles), gt_kept,
                      skip_indices=derive_skip_indices(yaws))
        assert format_foe_report(got) == want_msg


@needs_reference_code
class TestComposedGoldenParity:
    def test_get_all_outputs_packaged_chain(self, ref_env, pack):
        """The full packaged composition (synergy3DMM.py:167-207,
        LANCZOS4) against SynergyNet3DMM.get_all_outputs on the same image,
        same rects, shared weights + asset pack."""
        syn, net, _, _ = ref_env
        img = _structured_image()

        _StubFaceBoxes.rects = RECTS
        want_pts, want_verts, want_poses = net.get_all_outputs(img)

        api = _our_api(net, pack)
        got_pts, got_verts, got_poses = api.get_all_outputs(
            img, rects=[list(r) for r in RECTS])

        assert len(got_pts) == len(want_pts) == len(RECTS)
        for i in range(len(RECTS)):
            np.testing.assert_allclose(got_pts[i], want_pts[i],
                                       rtol=1e-3, atol=2e-2)
            np.testing.assert_allclose(got_verts[i], want_verts[i],
                                       rtol=1e-3, atol=2e-2)
            want_angles, want_t3d = want_poses[i]
            got_angles, got_t3d = got_poses[i]
            np.testing.assert_allclose(got_angles, np.asarray(want_angles),
                                       rtol=1e-3, atol=5e-3)
            np.testing.assert_allclose(got_t3d[:2], np.asarray(want_t3d)[:2],
                                       rtol=1e-3, atol=2e-2)

    def test_single_image_demo_chain_inter_linear(self, ref_env, pack):
        """The demo-script composition (singleImage.py:66-93): same squaring
        but INTER_LINEAR resize + the ddfa ToTensor/Normalize transform
        stack (quirk Q7), against interpolation='linear' on our API."""
        torch = pytest.importorskip("torch")
        _, net, inf, ddfa = ref_env
        img = _structured_image(seed=6)

        to_tensor = ddfa.ToTensor()
        normalize = ddfa.Normalize(mean=127.5, std=128)

        import cv2
        want_pts, want_verts, want_poses = [], [], []
        for rect in [list(r) for r in RECTS]:
            roi_box = rect
            # singleImage.py:69-74 squaring (identical to the packaged one)
            hc = (rect[1] + rect[3]) / 2
            wc = (rect[0] + rect[2]) / 2
            side = roi_box[3] - roi_box[1]
            margin = side * 1.2 // 2
            roi_box[0], roi_box[1], roi_box[2], roi_box[3] = \
                wc - margin, hc - margin, wc + margin, hc + margin
            crop = inf.crop_img(img, roi_box)
            crop = cv2.resize(crop, dsize=(120, 120),
                              interpolation=cv2.INTER_LINEAR)
            x = normalize(to_tensor(crop)).unsqueeze(0)
            with torch.no_grad():
                param = net.forward_test(x)
            param = param.squeeze().cpu().numpy().flatten().astype(np.float32)
            want_pts.append(inf.predict_sparseVert(param, roi_box,
                                                   transform=True))
            want_verts.append(inf.predict_denseVert(param, roi_box,
                                                    transform=True))
            want_poses.append(inf.predict_pose(param, roi_box))

        api = _our_api(net, pack)
        got_pts, got_verts, got_poses = api.get_all_outputs(
            img, rects=[list(r) for r in RECTS], interpolation="linear")

        for i in range(len(RECTS)):
            np.testing.assert_allclose(got_pts[i], want_pts[i],
                                       rtol=1e-3, atol=2e-2)
            np.testing.assert_allclose(got_verts[i], want_verts[i],
                                       rtol=1e-3, atol=2e-2)
            want_angles, want_t3d = want_poses[i]
            got_angles, got_t3d = got_poses[i]
            np.testing.assert_allclose(got_angles, np.asarray(want_angles),
                                       rtol=1e-3, atol=5e-3)
            np.testing.assert_allclose(got_t3d[:2], np.asarray(want_t3d)[:2],
                                       rtol=1e-3, atol=2e-2)
