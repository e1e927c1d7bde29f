"""WGAN-GP and CGAN composed-pipeline quality canaries (VERDICT r3
next #4) — the same fixture-scale regression alarm
tests/test_quality_canary.py gives the DCGAN chain: train the tiny
model for 3 seeded epochs, sample from the final checkpoint, and pin
the endpoint metrics inside bands derived from 3 seeds. Unit/trajectory
tests pin step semantics; these catch training-dynamics drift that only
shows through the composed loop (critic-schedule bugs, GP/λ slips,
adaptive-gate or loss-weight regressions), in miniature of the
reference protocol (reference README.md:457-477).

Band derivation (2026-08-20, this host, f32 seeds 0-2):
- WGAN: D_final [7.54, 7.93] — POSITIVE because the λ=10 gradient
  penalty dominates at random init ((‖∇‖-1)² ≈ 1 while E[D] terms
  cancel); dropping GP entirely lands D_final negative, a λ or
  critic_iters slip moves it by >2. G_final [0.0003, 0.029] ≈ 0
  (-E[critic(fake)] at near-init critic). bf16 seeds 0-2 landed inside
  the same ranges (tests/test_bf16_quality.py).
- CGAN: D_final [3.68, 4.08] (two-sided noisy-smoothed BCE),
  D_x(last 3) [0.399, 0.545], perc_final [0.81, 3.14] (random-VGG
  features: wide seed spread), fm_final [5.18, 5.59]. G_final is
  dominated by 10·perc + 5·fm, so instead of a wide useless band the
  canary checks the LINEAR STRUCTURE: the per-epoch histories satisfy
  G = adv + 10·perc + 5·fm with adv = G − 10·perc − 5·fm measured
  [1.49, 3.37] — any perceptual/FM reweighting moves the residual
  negative by 9·perc or 4·fm (≈ −12 / −20), far outside.
Asserted bands widen the measured ranges several-fold (canary policy).
"""
import argparse

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _gan_args(fake_dataset, tmp_path, **over):
    args = dict(
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
        cpu=True, grad_accum=1)
    args.update(over)
    return argparse.Namespace(**args)


@pytest.fixture(scope="module")
def wgan_canary(fake_dataset, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("wgan_canary")
    from xgan.train.wgan_loop import train_wgan
    history = train_wgan(_gan_args(fake_dataset, tmp_path,
                                   critic_iters=2, lambda_gp=10.0))

    import jax.numpy as jnp

    from xgan.models import wgan
    from xgan.train.sample import generate_images, load_generator
    synth_dir = tmp_path / "synthetic"
    model = wgan.Generator(latent_dim=16, feature_maps=8, image_size=32)
    variables = load_generator(
        model, str(tmp_path / "models/wgan/generator_final.msgpack"),
        (jnp.zeros((2, 16)),))
    generate_images(model, variables, output_dir=str(synth_dir),
                    num_images=8, latent_dim=16, batch_size=8, seed=0)
    return history, synth_dir


def test_wgan_canary_bands(wgan_canary):
    history, synth_dir = wgan_canary
    d_final = history["D_losses_epoch"][-1]
    g_final = history["G_losses_epoch"][-1]
    assert np.isfinite(d_final) and np.isfinite(g_final)
    assert 6.0 < d_final < 10.0, d_final
    assert -0.5 < g_final < 0.5, g_final
    # composed chain: the final checkpoint actually samples
    assert len(list(synth_dir.glob("*.png"))) == 8


@pytest.fixture(scope="module")
def cgan_canary(fake_dataset, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("cgan_canary")
    from xgan.train.cgan_loop import train_cgan
    history = train_cgan(_gan_args(fake_dataset, tmp_path, vgg_path=""))

    import jax.numpy as jnp

    from xgan.models import cgan
    from xgan.train.sample import generate_images, load_generator
    synth_dir = tmp_path / "synthetic"
    model = cgan.Generator(latent_dim=16, feature_maps=8, image_size=32)
    variables = load_generator(
        model, str(tmp_path / "models/cgan/generator_final.msgpack"),
        (jnp.zeros((2, 16)), jnp.zeros((2,), jnp.int32)))
    generate_images(model, variables, output_dir=str(synth_dir),
                    num_images=8, latent_dim=16, batch_size=8, seed=0,
                    conditional=True, num_classes=2)
    return history, synth_dir


def test_cgan_canary_bands(cgan_canary):
    history, synth_dir = cgan_canary
    d_final = history["D_losses_epoch"][-1]
    d_x_last = float(np.mean(history["D_x_iter"][-3:]))
    perc = history["perceptual_losses"][-1]
    fm = history["feature_matching_losses"][-1]
    assert 2.8 < d_final < 5.2, d_final
    assert 0.30 < d_x_last < 0.65, d_x_last
    assert 0.3 < perc < 6.0, perc
    assert 4.0 < fm < 7.0, fm
    assert len(list(synth_dir.glob("*.png"))) == 8


def test_cgan_loss_weight_structure(cgan_canary):
    """G = adv + 10·perc + 5·fm per epoch (all three histories are
    means over the same iterations, so the identity is linear): the
    residual adv must stay a small positive BCE — measured
    [1.49, 3.37] over seeds; a 10× perceptual or 5× FM weight slip
    sends it to ≈ −12 / −20."""
    history, _ = cgan_canary
    for g, p, f in zip(history["G_losses_epoch"],
                       history["perceptual_losses"],
                       history["feature_matching_losses"]):
        adv = g - 10.0 * p - 5.0 * f
        assert 0.1 < adv < 6.0, (g, p, f, adv)
