"""Test config: run everything on an emulated 8-device CPU mesh.

This is the standard way to test pjit/sharding logic without TPU hardware
(SURVEY.md §4). Must run before jax is imported anywhere.
"""
import os

# NOTE: this environment's sitecustomize registers a TPU PJRT plugin and
# pins JAX_PLATFORMS=axon in the env, so plain env-var overrides are
# ineffective; jax.config.update before first backend use is authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import pytest
from PIL import Image

# Fast lane (VERDICT r3 next #7): the suite's wall time tripled r2->r3
# on this 1-core host; these modules carry the long chains (multi-step
# trajectory parity, composed-stack equality, end-to-end canaries,
# subprocess preemption/multiprocess, 8-device equivalence sweeps,
# sequential-reference accumulation contracts). They are marked `slow`
# at collection so `pytest -m "not slow"` keeps the edit-test loop
# under ~10 min while the full suite stays the CI gate. Durations
# source: full-suite --durations run, 2026-08-20.
SLOW_MODULES = {
    "test_analysis", "test_bf16_quality", "test_canary_wgan_cgan",
    "test_determinism", "test_ema", "test_export", "test_fold_resume",
    "test_gan_grad_accum", "test_graft_entry", "test_grad_accum",
    "test_multiprocess", "test_multistep", "test_parallel_cv",
    "test_predict", "test_preempt", "test_quality_canary",
    "test_reference_analyzer", "test_remat", "test_scaling_compose",
    "test_serve", "test_sharding", "test_tail_exact",
    "test_torch_trajectory", "test_tp", "test_wgan_grad_accum",
    "test_zero1",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1] if item.module \
            else ""
        if mod in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def fake_dataset(tmp_path_factory):
    """Tiny on-disk RSNA-layout dataset + synthetic dir (SURVEY.md §4).

    Mirrors the structure checked by the reference data layer
    (data_loader.py:129-143): stage2_{train,test}_metadata.csv,
    Training/Images/*.png, Test/*.png.
    """
    root = tmp_path_factory.mktemp("rsna")
    rng = np.random.default_rng(0)

    train_dir = root / "Training" / "Images"
    test_dir = root / "Test"
    synth_dir = root / "synthetic"
    for d in (train_dir, test_dir, synth_dir):
        d.mkdir(parents=True)

    n_train, n_test, n_synth = 24, 10, 12
    classes = ["Lung Opacity", "Normal", "No Lung Opacity / Not Normal"]
    rows = ["patientId,class"]
    for i in range(n_train):
        pid = f"train{i:03d}"
        cls = classes[i % 3]
        rows.append(f"{pid},{cls}")
        img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        Image.fromarray(img).save(train_dir / f"{pid}.png")
    (root / "stage2_train_metadata.csv").write_text("\n".join(rows) + "\n")

    rows = ["patientId,PredictionString"]
    for i in range(n_test):
        pid = f"test{i:03d}"
        pred = "0.5 0 0 100 100" if i % 2 == 0 else "0.9 10 10 50 50"
        rows.append(f"{pid},{pred}")
        img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        Image.fromarray(img).save(test_dir / f"{pid}.png")
    (root / "stage2_test_metadata.csv").write_text("\n".join(rows) + "\n")

    for i in range(n_synth):
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(img).save(synth_dir / f"synthetic_{i + 1:05d}.png")

    return {"data_dir": str(root), "synthetic_dir": str(synth_dir),
            "n_train": n_train, "n_test": n_test, "n_synth": n_synth}
