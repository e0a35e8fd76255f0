"""Trainer driver + CLI smoke tests on tiny synthetic configs."""

import json
import os

import numpy as np
import pytest

from synergynet_tpu.core import Config


def tiny_cfg(tmp_path, epochs=1):
    cfg = Config()
    cfg.model.compute_dtype = "float32"
    cfg.train.batch_size = 8
    cfg.train.epochs = epochs
    cfg.train.save_val_freq = 1
    cfg.train.num_workers = 2
    cfg.train.print_freq = 1
    cfg.train.snapshot_dir = str(tmp_path / "ckpts")
    cfg.data.synthetic_size = 24
    return cfg


class TestConfig:
    def test_json_roundtrip(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        p = str(tmp_path / "cfg.json")
        cfg.to_json(p)
        back = Config.from_json(p)
        assert back.train.batch_size == 8
        assert back.train.milestones == (48, 64)
        assert back.model.compute_dtype == "float32"


class TestTrainer:
    def test_fit_one_epoch_and_resume(self, tmp_path):
        from synergynet_tpu.train import Trainer
        cfg = tiny_cfg(tmp_path, epochs=1)
        tr = Trainer(cfg)
        hist = tr.fit()
        assert 1 in hist
        assert np.isfinite(hist[1]["loss_total"])
        assert hist[1]["skipped"] == 0.0
        ckpt = tr.ckpt_path(1)
        assert os.path.exists(ckpt)

        # resume continues from epoch 2
        cfg2 = tiny_cfg(tmp_path, epochs=2)
        cfg2.train.resume = ckpt
        tr2 = Trainer(cfg2)
        assert tr2.start_epoch == 2
        assert int(tr2.state.step) == int(tr.state.step)

    def test_loss_decreases_over_steps(self, tmp_path):
        """The synthetic data carries learnable signal: a few epochs of
        SGD must reduce the total loss."""
        from synergynet_tpu.train import Trainer
        cfg = tiny_cfg(tmp_path, epochs=4)
        cfg.train.base_lr = 0.01
        cfg.train.save_val_freq = 100
        tr = Trainer(cfg)
        hist = tr.fit()
        assert hist[4]["loss_total"] < hist[1]["loss_total"]


class TestCLI:
    def test_train_cli_resident_runs(self, tmp_path):
        """The user-facing train CLI reaches the device-resident path
        (round-2 VERDICT item 4): one epoch, one dispatch, checkpoint
        written."""
        from synergynet_tpu.cli.train import main
        snap = tmp_path / "ckpts"
        main(["--resident", "--arch", "mobilenet_v2_0.5",
              "--epochs", "1", "--batch-size", "8",
              "--synthetic-size", "24", "--no-eval",
              "--snapshot-dir", str(snap),
              "--log-file", str(tmp_path / "train.log")])
        assert os.path.exists(str(snap / "synergynet_epoch_1.npz"))

    def test_evaluate_cli_runs(self, capsys):
        from synergynet_tpu.cli.evaluate import main
        r = main(["-n", "16", "--batch-size", "16"])
        out = capsys.readouterr().out
        assert "Facial Alignment" in out and "Mean MAE" in out
        assert np.isfinite(r["nme_mean"])

    def test_infer_cli_runs(self, tmp_path):
        import cv2
        from synergynet_tpu.cli.infer import run
        from synergynet_tpu.pipeline import SynergyNet3DMM

        img = np.random.default_rng(0).integers(
            0, 255, (140, 140, 3), np.uint8)
        p = str(tmp_path / "face.jpg")
        cv2.imwrite(p, img)

        api = SynergyNet3DMM()
        # monkeypatch detection to a fixed rect (random weights find nothing)
        api.detector_rects = None
        orig = api.get_all_outputs

        def with_fixed_rect(image, rects=None, **kw):
            return orig(image, rects=[[10.0, 10.0, 120.0, 126.0, 0.9]], **kw)
        api.get_all_outputs = with_fixed_rect

        out_dir = str(tmp_path / "out")
        r = run(p, out_dir=out_dir, api=api)
        assert r["face"]["faces"] == 1
        assert os.path.exists(os.path.join(out_dir, "rendering_overlay",
                                           "face.jpg"))
        assert os.path.exists(os.path.join(out_dir, "landmarks", "face.jpg"))
        assert os.path.exists(os.path.join(out_dir, "poses", "face.jpg"))
        assert os.path.exists(os.path.join(out_dir, "obj", "face.obj"))

    def test_artistic_cli_runs(self, tmp_path):
        import cv2
        from synergynet_tpu.cli.artistic import run
        from synergynet_tpu.pipeline import SynergyNet3DMM

        img = np.random.default_rng(1).integers(
            0, 255, (140, 140, 3), np.uint8)
        p = str(tmp_path / "art.jpg")
        cv2.imwrite(p, img)
        api = SynergyNet3DMM()
        orig = api.get_all_outputs
        api.get_all_outputs = lambda image, rects=None, **kw: orig(
            image, rects=[[10.0, 10.0, 120.0, 126.0, 0.9]], **kw)
        written = run(p, out_dir=str(tmp_path / "obj"), api=api)
        assert len(written) == 1 and os.path.exists(written[0])
        first = open(written[0]).readline()
        assert first.startswith("v ") and len(first.split()) == 7


class TestUVTextureCLI:
    def test_uv_texture_runs(self, tmp_path):
        import cv2
        from synergynet_tpu.cli.uv_texture import run
        from synergynet_tpu.pipeline import SynergyNet3DMM

        img = np.random.default_rng(2).integers(
            0, 255, (256, 256, 3), np.uint8)
        p = str(tmp_path / "real_crop.jpg")
        cv2.imwrite(p, img)
        api = SynergyNet3DMM()
        written = run(p, tex_dir=str(tmp_path), out_dir=str(tmp_path / "o"),
                      api=api)
        assert len(written) == 1 and os.path.exists(written[0])
        overlay = str(tmp_path / "o" / "rendering_overlay" / "real_crop.jpg")
        assert os.path.exists(overlay)
        out = cv2.imread(overlay)
        assert out is not None and (out != img).any()


class TestEmergencyCheckpoint:
    def test_saved_on_failure(self, tmp_path):
        from synergynet_tpu.train import Trainer
        cfg = tiny_cfg(tmp_path, epochs=2)
        tr = Trainer(cfg)

        calls = {"n": 0}
        orig = tr.train_epoch

        def boom(epoch):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("injected fault")
            return orig(epoch)
        tr.train_epoch = boom

        with pytest.raises(RuntimeError):
            tr.fit()
        emergency = os.path.join(cfg.train.snapshot_dir,
                                 "synergynet_emergency.npz")
        assert os.path.exists(emergency)
        from synergynet_tpu.core.checkpoint import checkpoint_metadata
        meta = checkpoint_metadata(emergency)
        assert meta.get("emergency") is True
