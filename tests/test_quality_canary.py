"""Fixture-scale deterministic quality canary (VERDICT r2 next #5).

One seeded CPU end-to-end chain — tiny DCGAN -> sampler -> all three
classifier strategies — asserting the FINAL metrics land inside a pinned
band. Unit parity tests pin step semantics; this is the regression alarm
for training-dynamics drift that only shows up through the composed
pipeline (initializer changes, RNG-stream reshuffles, loss reweighting,
schedule bugs), in miniature of the reference protocol
(reference README.md:457-477).

Band derivation (2026-08, this host): the chain was run at seeds 0/1/2;
measured ranges were D_loss_final [1.378, 1.386], G_loss_final
[0.708, 0.756], D_x(last 3 iters) [0.467, 0.495], classifier test loss
[0.6927, 0.7127] (ln 2 = chance on the random-noise fixture), accuracy
[0.50, 0.55], AUROC [0.52, 0.66]. The asserted bands widen those ranges
several-fold to absorb cross-BLAS drift; a semantic regression (loss
reweighting, label smoothing, BN-mode, schedule bugs) moves these
metrics far outside them (e.g. dropping the 0.9 smoothing moves D_loss
by >0.3; a CE reduction bug scales the classifier loss 2x). The
committed test runs seed 0 only.
"""
import argparse
import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def canary_run(fake_dataset, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("canary")
    from xgan.train.gan_loop import train_dcgan

    gan_args = argparse.Namespace(
        data_dir=fake_dataset["data_dir"],
        model_dir=str(tmp_path / "models"),
        output_dir=str(tmp_path / "results"),
        results_dir=str(tmp_path / "results/metrics"),
        figures_dir=str(tmp_path / "results/figures"),
        num_channels=3, latent_dim=16, feature_maps_g=8, feature_maps_d=8,
        epochs=3, batch_size=8, lr=2e-4, beta1=0.5, workers=0,
        vis_batch_size=8, save_interval=500, checkpoint_interval=10,
        image_size=32, seed=0, compute_dtype="f32",
        cache_dir=str(tmp_path / "cache"), limit_batches=0, trace_dir="",
        cpu=True)
    gan_history = train_dcgan(gan_args)

    # sample synthetic images from the trained generator
    import jax.numpy as jnp

    from xgan.models import dcgan
    from xgan.train.sample import generate_images, load_generator
    synth_dir = tmp_path / "synthetic"
    model = dcgan.Generator(latent_dim=16, feature_maps=8, image_size=32)
    variables = load_generator(
        model, str(tmp_path / "models/gan/generator_final.msgpack"),
        (jnp.zeros((2, 16)),))
    generate_images(model, variables, output_dir=str(synth_dir),
                    num_images=12, latent_dim=16, batch_size=8, seed=0)

    from xgan.train.classifier_loop import train_classifier
    summaries = {}
    for strategy in ("baseline", "augmented", "curriculum"):
        cargs = argparse.Namespace(
            data_dir=fake_dataset["data_dir"],
            synthetic_dir=str(synth_dir),
            model_dir=str(tmp_path / f"models_{strategy}"),
            output_dir=str(tmp_path / f"results_{strategy}"),
            results_dir=str(tmp_path / f"results_{strategy}/metrics"),
            figures_dir=str(tmp_path / f"results_{strategy}/figures"),
            epochs=2, batch_size=8, lr=1e-3, unfreeze=False, k_folds=2,
            workers=0, use_synthetic=strategy != "baseline",
            use_curriculum=strategy == "curriculum",
            curriculum_schedule="0:0.5", pretrained_path="",
            image_size=32, seed=0, compute_dtype="f32",
            cache_dir=str(tmp_path / "cache"), limit_batches=0,
            trace_dir="", cpu=True, resnet_stages=(1, 1, 1, 1))
        summaries[strategy] = train_classifier(cargs)
    return gan_history, summaries


def test_gan_dynamics_band(canary_run):
    history, _ = canary_run
    d_final = history["D_losses_epoch"][-1]
    g_final = history["G_losses_epoch"][-1]
    d_x_last = float(np.mean(history["D_x_iter"][-3:]))
    # measured seed ranges in the module docstring; widened several-fold
    assert 1.1 < d_final < 1.7, d_final
    assert 0.50 < g_final < 1.10, g_final
    assert 0.38 < d_x_last < 0.60, d_x_last


def test_classifier_metrics_band(canary_run):
    _, summaries = canary_run
    for strategy, summary in summaries.items():
        avg = summary["average"]
        # Random-noise fixture: accuracy is chance-level; the band pins
        # the LOSS scale (chance CE = ln 2 = 0.693; measured seed range
        # [0.6927, 0.7127]) — a loss-weighting or label regression
        # scales it 2x+ — plus sanity on accuracy/AUROC.
        assert 0.60 < avg["loss"] < 0.80, (strategy, avg)
        assert 0.2 <= avg["accuracy"] <= 0.8, (strategy, avg)
        assert 0.0 <= avg["auroc"] <= 1.0


def test_history_artifacts_consistent(canary_run):
    history, summaries = canary_run
    # 3 epochs x 3 batches of 8 over 24 fixture images
    assert len(history["G_losses_iter"]) == 9
    for strategy, summary in summaries.items():
        assert len(summary["folds"]) == 2
