"""Reference on-disk layout ingestion tests (VERDICT round-1 item 3).

Fabricates tiny directories in the reference's exact layouts
(aflw2000_data: benchmark.py:222-227 + benchmark_aflw2000.py:13-19;
300W-LP: train_script.sh:12-22) and drives the ingest loaders, the eval
protocol self-check, and the training dataset through them.
"""

import os
import os.path as osp
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth_pack():
    from synergynet_tpu.data import make_synthetic_aflw2000
    return make_synthetic_aflw2000(16, seed=3)


@pytest.fixture()
def aflw_dir(tmp_path, synth_pack):
    """Write a reference-layout aflw2000_data directory from the synthetic
    protocol pack (lossless pngs so the GT self-check stays exact)."""
    import cv2

    base = tmp_path / "aflw2000_data"
    crop = base / "AFLW2000-3D_crop"
    ev = base / "eval"
    crop.mkdir(parents=True)
    ev.mkdir()
    names = []
    for i, img in enumerate(synth_pack["images"]):
        name = f"image{i:05d}.png"
        cv2.imwrite(str(crop / name), img)
        names.append(name)
    (base / "AFLW2000-3D_crop.list").write_text("\n".join(names) + "\n")

    np.save(ev / "AFLW2000-3D.pose.npy", synth_pack["yaws"])
    np.save(ev / "AFLW2000-3D.pts68.npy", synth_pack["pts68_gt"])
    np.save(ev / "AFLW2000-3D-Reannotated.pts68.npy", synth_pack["pts68_gt"])
    np.save(ev / "AFLW2000-3D_crop.roi_box.npy", synth_pack["roi_boxes"])
    np.save(ev / "ALFW2000-3D_pose_3ANG_excl.npy", synth_pack["pose_gt_pyr"])
    np.save(ev / "ALFW2000-3D_pose_3ANG_skip.npy",
            synth_pack["skip_indices"])
    return str(base)


class TestAFLW2000Ingest:
    def test_loads_reference_layout(self, aflw_dir, synth_pack):
        from synergynet_tpu.data import load_aflw2000_dir
        pack = load_aflw2000_dir(aflw_dir)
        assert pack["images"].shape == synth_pack["images"].shape
        np.testing.assert_array_equal(pack["images"], synth_pack["images"])
        np.testing.assert_allclose(pack["pts68_gt"],
                                   synth_pack["pts68_gt"], rtol=1e-6)
        np.testing.assert_allclose(pack["roi_boxes"],
                                   synth_pack["roi_boxes"], rtol=1e-6)
        np.testing.assert_array_equal(pack["skip_indices"],
                                      synth_pack["skip_indices"])

    def test_protocol_self_check(self, aflw_dir, synth_pack):
        """Ground-truth params through the ingested pack give ~0 NME/MAE —
        one command from reference-format data to a report."""
        from synergynet_tpu.data import load_aflw2000_dir
        from synergynet_tpu.evals import benchmark_params
        pack = load_aflw2000_dir(aflw_dir)
        r = benchmark_params(synth_pack["params"], pack)
        assert r["nme_mean"] < 1e-3
        assert r["foe"]["mae_mean"] < 1e-3
        assert "Mean MAE" in r["report"]

    def test_skip_indices_derived_when_file_absent(self, aflw_dir,
                                                   synth_pack):
        from synergynet_tpu.data import load_aflw2000_dir
        os.remove(osp.join(aflw_dir, "eval",
                           "ALFW2000-3D_pose_3ANG_skip.npy"))
        pack = load_aflw2000_dir(aflw_dir)
        np.testing.assert_array_equal(pack["skip_indices"],
                                      synth_pack["skip_indices"])

    def test_foe_omitted_when_pose_gt_absent(self, aflw_dir, synth_pack):
        from synergynet_tpu.data import load_aflw2000_dir
        from synergynet_tpu.evals import benchmark_params
        os.remove(osp.join(aflw_dir, "eval",
                           "ALFW2000-3D_pose_3ANG_excl.npy"))
        pack = load_aflw2000_dir(aflw_dir)
        r = benchmark_params(synth_pack["params"], pack)
        assert r["foe"] is None
        assert "Mean MAE" not in r["report"]
        assert r["nme_mean"] < 1e-3

    def test_missing_dir_raises_like_reference(self, tmp_path):
        from synergynet_tpu.data import load_aflw2000_dir
        with pytest.raises(RuntimeError, match="testing data"):
            load_aflw2000_dir(str(tmp_path / "nowhere"))

    def test_save_npz_roundtrip(self, aflw_dir, tmp_path):
        from synergynet_tpu.data import load_aflw2000_dir, save_eval_pack
        pack = load_aflw2000_dir(aflw_dir)
        out = save_eval_pack(pack, str(tmp_path / "pack.npz"))
        z = np.load(out)
        np.testing.assert_array_equal(z["images"], pack["images"])
        np.testing.assert_allclose(z["pts68_gt"], pack["pts68_gt"])


class Test300WLPIngest:
    @pytest.fixture()
    def wlp_dir(self, tmp_path):
        import cv2

        base = tmp_path / "ref_root"
        (base / "train_aug_120x120").mkdir(parents=True)
        (base / "3dmm_data").mkdir()
        rng = np.random.default_rng(5)
        names = []
        for i in range(12):
            name = f"LFPW_image_train_{i:04d}_0.jpg"
            img = rng.integers(0, 255, (120, 120, 3), np.uint8)
            cv2.imwrite(str(base / "train_aug_120x120" / name), img)
            names.append(name)
        (base / "3dmm_data" / "train_aug_120x120.list.train").write_text(
            "\n".join(names) + "\n")
        # >=62-d whitened params (the real pkl is 102-d; truncation to 62
        # happens at batch time like reference main_train.py:120).
        params = rng.normal(0, 1, (12, 102)).astype(np.float32)
        with open(base / "3dmm_data" / "param_all_norm_v201.pkl", "wb") as f:
            pickle.dump(params, f)
        return str(base), params

    def test_dataset_from_reference_layout(self, wlp_dir):
        from synergynet_tpu.data import load_300wlp_dir
        base, params = wlp_dir
        ds = load_300wlp_dir(base)
        assert len(ds) == 12
        img, p62 = ds[3]
        assert img.shape == (120, 120, 3) and img.dtype == np.uint8
        assert p62.shape == (62,)
        np.testing.assert_allclose(p62, params[3, :62])

    def test_incomplete_layout_raises(self, tmp_path):
        from synergynet_tpu.data import load_300wlp_dir
        with pytest.raises(RuntimeError, match="incomplete"):
            load_300wlp_dir(str(tmp_path))

    def test_trains_one_epoch(self, wlp_dir, tmp_path):
        """Reference-layout directory straight into the Trainer."""
        from synergynet_tpu.core import Config
        from synergynet_tpu.train import Trainer
        base, _ = wlp_dir
        cfg = Config()
        cfg.model.arch = "mobilenet_v2"
        cfg.data.root = osp.join(base, "train_aug_120x120")
        cfg.data.filelists_train = osp.join(
            base, "3dmm_data", "train_aug_120x120.list.train")
        cfg.data.param_fp_train = osp.join(
            base, "3dmm_data", "param_all_norm_v201.pkl")
        cfg.train.batch_size = 8   # divisible by the 8-device test mesh
        cfg.train.epochs = 1
        cfg.train.save_val_freq = 10
        cfg.train.snapshot_dir = str(tmp_path / "snap")
        history = Trainer(cfg).fit()
        assert np.isfinite(history[1]["loss_total"])


class TestFOEDerivation:
    def test_skip_rule(self):
        from synergynet_tpu.evals.foe import (derive_skip_indices,
                                              exclude_by_yaw)
        yaws = np.asarray([0.0, 99.0, 99.1, -120.0, 45.0, -99.01])
        np.testing.assert_array_equal(derive_skip_indices(yaws), [2, 3, 5])
        gt = np.arange(18, dtype=np.float64).reshape(6, 3)
        np.testing.assert_array_equal(exclude_by_yaw(gt, yaws),
                                      gt[[0, 1, 4]])
