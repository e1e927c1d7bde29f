"""Seeded determinism: identical args + seed => identical training run.

The reference is unseeded (torch default RNGs); our --seed flag makes
whole runs reproducible — histories must match exactly across runs.
"""
import argparse
import json


def _args(fake_dataset, tmp_path, tag):
    return argparse.Namespace(
        data_dir=fake_dataset["data_dir"],
        model_dir=str(tmp_path / tag / "models"),
        output_dir=str(tmp_path / tag / "results"),
        results_dir=str(tmp_path / tag / "results/metrics"),
        figures_dir=str(tmp_path / tag / "results/figures"),
        num_channels=3, latent_dim=8, feature_maps_g=4, feature_maps_d=4,
        epochs=2, batch_size=8, lr=2e-4, beta1=0.5, workers=0,
        vis_batch_size=4, save_interval=500, checkpoint_interval=10,
        image_size=32, seed=7, compute_dtype="f32",
        cache_dir=str(tmp_path / "cache"), limit_batches=2, trace_dir="",
        resume_from="", cpu=True)


def test_same_seed_same_history(fake_dataset, tmp_path):
    from xgan.train.gan_loop import train_dcgan
    h1 = train_dcgan(_args(fake_dataset, tmp_path, "a"))
    h2 = train_dcgan(_args(fake_dataset, tmp_path, "b"))
    assert h1 == h2

    j1 = json.loads((tmp_path / "a/results/metrics/"
                     "gan_training_history.json").read_text())
    j2 = json.loads((tmp_path / "b/results/metrics/"
                     "gan_training_history.json").read_text())
    assert j1 == j2


def test_different_seed_differs(fake_dataset, tmp_path):
    from xgan.train.gan_loop import train_dcgan
    a = _args(fake_dataset, tmp_path, "c")
    b = _args(fake_dataset, tmp_path, "d")
    b.seed = 8
    h1 = train_dcgan(a)
    h2 = train_dcgan(b)
    assert h1["G_losses_iter"] != h2["G_losses_iter"]
