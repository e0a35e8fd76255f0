"""Test configuration: force an 8-device CPU platform before JAX import.

All tests run on CPU with 8 virtual devices so sharding/pjit paths are
exercised without TPU hardware (SURVEY.md §4 implication). Must run before
anything imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pin a hardware platform (e.g. a tunneled TPU plugin)
# via sitecustomize before conftest runs; the config update wins over both.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: full-model train-step compiles on CPU take
# minutes; cache them across test runs. The dir is fingerprinted by
# platform/XLA flags/host CPU/jax version (core.profiling.cache_fingerprint)
# — AOT entries written by processes under other XLA flags (e.g. the TPU
# tunnel's host-side compiles with +prefer-no-scatter) load with
# cpu_aot_loader feature-mismatch errors and can SIGILL or perturb
# reduction codegen.
from synergynet_tpu.core.profiling import enable_compile_cache  # noqa: E402

enable_compile_cache("/tmp/synergy_jax_cache", min_compile_secs=5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on host CPU"
assert jax.device_count() == 8, "tests expect an 8-device virtual CPU mesh"

# Quick tier: `-m "not slow"` skips the compile/subprocess-heavy files below
# (multi-process gloo runs, executed-torch-reference parity, full Trainer
# fits). The full suite stays the merge gate; the quick tier is for
# inner-loop iteration. Files, not tests, are marked: a file that compiles
# one big program is slow regardless of which test in it runs first.
_SLOW_FILES = {
    "test_multihost.py",          # 2 OS processes + gloo warmup, 900s budget
    "test_reference_parity.py",   # executes the torch reference per backbone
    "test_composed_parity.py",    # end-to-end torch pipeline golden parity
    "test_torch_import.py",       # torch checkpoint round-trips
    "test_trainer_cli.py",        # full Trainer.fit runs + CLI subprocesses
    "test_train.py",              # sharded train-step compiles (8-dev mesh)
    "test_shaded.py",             # shaded-render epoch-program compiles
    "test_detect_train.py",       # detector trainer fits
    "test_dress_rehearsal.py",    # raw BFM -> cli.train 2 epochs -> cli.eval
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.path.name in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def pack():
    from synergynet_tpu.mm3d import load_param_pack
    return load_param_pack()


@pytest.fixture(scope="session")
def small_pack():
    """A tiny ParamPack (97 vertices) for fast exact-math tests."""
    from synergynet_tpu.mm3d.assets import pack_from_arrays
    rng = np.random.default_rng(7)
    nver, ntri = 97, 160
    n_lmk = 12
    d = {
        "u_shp": rng.normal(60, 20, (nver * 3, 1)).astype(np.float32),
        "u_exp": rng.normal(0, 1, (nver * 3, 1)).astype(np.float32),
        "w_shp": rng.normal(0, 5, (nver * 3, 40)).astype(np.float32),
        "w_exp": rng.normal(0, 2, (nver * 3, 10)).astype(np.float32),
        "param_mean": rng.normal(0, 0.2, 62).astype(np.float32),
        "param_std": rng.uniform(0.5, 2.0, 62).astype(np.float32),
        "tri": rng.integers(0, nver, (3, ntri)).astype(np.int32),
    }
    kp_vert = rng.choice(nver, n_lmk, replace=False).astype(np.int64)
    d["keypoints"] = np.stack(
        [kp_vert * 3, kp_vert * 3 + 1, kp_vert * 3 + 2], 1
    ).reshape(-1).astype(np.int32)
    return pack_from_arrays(d)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
