"""Exact short-tail-batch semantics (VERDICT r2 next #3).

The reference DataLoader's final batch per epoch is SMALLER
(drop_last=False, reference data_loader.py:189-197); our epochs wrap-pad
every batch to a static shape. The per-sample validity mask threaded
through losses, gradient reductions and BN batch statistics
(xgan/ops/norm.py) must make the masked wide batch EQUAL a literal
small batch:

1. masked(B=8, 5 valid) == unmasked(B=5) for every trainer step —
   params, BN running stats, and metrics (internal equivalence, the
   strongest direct statement of the mask semantics);
2. a masked DCGAN tail step matches eager torch run on the actual
   small batch (B∤N torch-parity variant);
3. masked steps stay 1-device == 8-device under DP sharding (B∤N
   DP-equivalence variant).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgan.train.common import adam, create_state

B, VALID, SIZE, LATENT, FM = 8, 5, 32, 8, 8


def _images(n=16, seed=3, size=SIZE):
    return jnp.asarray(np.random.default_rng(seed).integers(
        0, 255, (n, size, size, 3), np.uint8))


def _mask():
    return jnp.asarray([1.0] * VALID + [0.0] * (B - VALID), jnp.float32)


def _tree_close(a, b, rtol=1e-5, atol=1e-5):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# 1) masked wide batch == literal small batch, per trainer
# ---------------------------------------------------------------------------

def test_dcgan_masked_equals_small_batch():
    """The masked step must match an unmasked step on the literal small
    batch — with the SAME per-sample randomness. The step draws noise
    (B, latent) and flip bits (B,) internally from its key, so the first
    VALID rows of both programs see identical draws only if B == idx
    length... they don't (split shapes differ). Instead both programs
    get randomness-neutralized inputs: flip is exercised via the same
    key by making every image symmetric (flip = identity), and the
    noise difference is avoided by comparing against a torch replica in
    test_dcgan_tail_matches_torch below. Here we instead assert the
    pure-BN/loss mask algebra on the discriminator path, which has no
    internal randomness given fixed inputs."""
    from xgan.models import dcgan
    from xgan.train.common import apply_updates, bce_with_logits

    d_model = dcgan.Discriminator(feature_maps=FM, image_size=SIZE)
    d_tx = adam(2e-4, 0.5)
    k = jax.random.key(0)
    d_state = create_state(d_model, d_tx, k, jnp.zeros((2, SIZE, SIZE, 3)),
                           train=False)
    x_wide = jax.random.normal(jax.random.key(1), (B, SIZE, SIZE, 3))
    x_small = x_wide[:VALID]
    mask = _mask()

    def update(state, x, mask=None):
        def loss_fn(params):
            logits, upd = d_model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mask=mask, mutable=["batch_stats"])
            return (bce_with_logits(logits, 0.9, mask),
                    upd["batch_stats"])
        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return apply_updates(d_tx, state, grads, stats), loss

    s_masked, l_masked = jax.jit(update)(d_state, x_wide, mask)
    s_small, l_small = jax.jit(update)(d_state, x_small)
    np.testing.assert_allclose(float(l_masked), float(l_small),
                               rtol=1e-6, atol=1e-6)
    # params: atol 1e-4 — Adam normalizes tiny gradient differences up
    # to ~lr (2e-4), so reduction-order noise on near-zero-gradient
    # coordinates shows as isolated ~4e-5 deltas; a real mask bug (BN
    # or loss including padded rows) shifts the whole tree.
    _tree_close(s_masked.params, s_small.params, rtol=1e-4, atol=1e-4)
    _tree_close(s_masked.batch_stats, s_small.batch_stats)


def test_classifier_masked_equals_small_batch():
    from xgan.models.resnet import ResNet50
    from xgan.train.classifier import classifier_optimizer, make_train_step

    model = ResNet50(num_classes=2)
    tx = classifier_optimizer(1e-3, freeze_base=True)
    variables = model.init(jax.random.key(4),
                           jnp.zeros((2, SIZE, SIZE, 3)), train=False)
    from xgan.train.common import ModelState
    state = ModelState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    images = _images()
    labels = jnp.asarray((np.arange(16) % 2).astype(np.int32))
    step = make_train_step(model, tx, mode="real", jit_compile=False)
    step = jax.jit(step, static_argnames=())

    # neutralize the internal flip randomness: key with flip probability
    # decided per-row — use horizontally symmetric images so flipping is
    # the identity and the (B,)-shaped draws cannot differ.
    sym = jnp.concatenate([images[:, :, :SIZE // 2, :],
                           images[:, :, :SIZE // 2, :][:, :, ::-1, :]],
                          axis=2)
    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.uint8)
    dummy_l = jnp.zeros((1,), jnp.int32)
    key = jax.random.key(7)

    idx_wide = jnp.asarray(np.arange(B), jnp.int32)
    idx_small = idx_wide[:VALID]
    s_m, losses_m, preds_m, _ = step(state, sym, labels, dummy, dummy_l,
                                     idx_wide, jnp.float32(0.0), key,
                                     mask=_mask())
    s_s, losses_s, preds_s, _ = step(state, sym, labels, dummy, dummy_l,
                                     idx_small, jnp.float32(0.0), key)
    # rtol 3e-3: the weighted-sum and plain-mean BN reductions use
    # different summation trees, and ResNet-50 stacks 53 BN layers, so
    # ~1e-7 per-layer float noise compounds to ~1e-3 relative at the
    # logits (measured 1.0e-3). A mask bug (padded rows in the batch
    # statistics) shifts losses by ~10% at this batch size.
    np.testing.assert_allclose(np.asarray(losses_m)[:VALID],
                               np.asarray(losses_s), rtol=3e-3, atol=1e-3)
    assert np.array_equal(np.asarray(preds_m)[:VALID], np.asarray(preds_s))
    _tree_close(s_m.params, s_s.params, rtol=1e-3, atol=1e-3)
    _tree_close(s_m.batch_stats, s_s.batch_stats, rtol=3e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# 2) B∤N torch-parity variant: masked tail step vs torch on the actual
#    small batch (same update ordering as test_torch_trajectory).
# ---------------------------------------------------------------------------

def test_dcgan_tail_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    from tests.test_torch_parity import (build_torch_models,
                                         copy_weights_to_torch)
    from tests.test_torch_trajectory import _nchw, _normalize
    from xgan.models import dcgan
    from xgan.train.gan import make_dcgan_step

    g_model = dcgan.Generator(latent_dim=LATENT, feature_maps=FM,
                              image_size=SIZE)
    d_model = dcgan.Discriminator(feature_maps=FM, image_size=SIZE)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    key = jax.random.key(0)
    g_state = create_state(g_model, g_tx, key, jnp.zeros((2, LATENT)),
                           train=False)
    d_state = create_state(d_model, d_tx, key,
                           jnp.zeros((2, SIZE, SIZE, 3)), train=False)
    gt, dt = build_torch_models()
    copy_weights_to_torch(g_state.params, gt, transpose_conv=True)
    copy_weights_to_torch(d_state.params, dt, transpose_conv=False)

    images = np.random.default_rng(9).integers(
        0, 255, (16, SIZE, SIZE, 3), np.uint8)
    idx = np.arange(B)  # tail batch: first VALID rows valid
    k_step = jax.random.key(21)

    step = make_dcgan_step(g_model, d_model, g_tx, d_tx,
                           latent_dim=LATENT, donate=False)
    g2, d2, m = step(g_state, d_state, jnp.asarray(images),
                     jnp.asarray(idx), k_step, mask=_mask())
    ours = np.asarray(m)

    # torch runs the ACTUAL small batch, consuming the first VALID rows
    # of the identical internal draws (noise/flip are (B,)-shaped in our
    # program; the mask makes rows >= VALID inert).
    k_flip, k_noise = jax.random.split(k_step)
    flip = np.asarray(jax.random.bernoulli(k_flip, 0.5, (B,)))[:VALID]
    noise = np.asarray(jax.random.normal(k_noise, (B, LATENT)))[:VALID]
    batch = images[idx[:VALID]]
    batch = np.where(flip[:, None, None, None], batch[:, :, ::-1, :],
                     batch)
    real = _nchw(_normalize(batch))

    bce = tnn.BCELoss()
    opt_d = torch.optim.Adam(dt.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_g = torch.optim.Adam(gt.parameters(), lr=2e-4, betas=(0.5, 0.999))
    dt.zero_grad()
    out_real = torch.sigmoid(dt(real)).view(-1)
    loss_real = bce(out_real, torch.full((VALID,), 0.9))
    loss_real.backward()
    fake = gt(torch.from_numpy(noise.reshape(VALID, LATENT, 1, 1).copy()))
    out_fake = torch.sigmoid(dt(fake.detach())).view(-1)
    loss_fake = bce(out_fake, torch.zeros(VALID))
    loss_fake.backward()
    opt_d.step()
    gt.zero_grad()
    out = torch.sigmoid(dt(fake)).view(-1)
    loss_g = bce(out, torch.full((VALID,), 0.9))
    loss_g.backward()
    opt_g.step()
    theirs = np.asarray([loss_g.item(),
                         (loss_real + loss_fake).item(),
                         out_real.mean().item(), out_fake.mean().item(),
                         out.mean().item()])
    np.testing.assert_allclose(ours, theirs, atol=2e-3)

    from tests.test_torch_trajectory import _param_drift
    assert _param_drift(g2.params, gt, transpose_conv=True) < 1e-4
    assert _param_drift(d2.params, dt, transpose_conv=False) < 1e-4


def test_cgan_tail_matches_torch():
    """Masked CGAN tail step vs eager torch on the actual small batch —
    covers the weighted perceptual/feature-matching means and weighted
    gate metrics, the only masked path without a direct check."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    from tests.test_generator_pth import _RefCGANGenerator
    from tests.test_torch_trajectory import (_RefCGANDiscriminator,
                                             _TorchVGGBlocks, _copy_cgan_d,
                                             _copy_vgg, _nchw, _normalize)
    from xgan.models import cgan
    from xgan.models.pretrained import save_torch_cgan_generator
    from xgan.models.vgg import VGG16Features
    from xgan.train.cgan import make_cgan_step

    EPOCH = 0
    g_model = cgan.Generator(latent_dim=LATENT, num_classes=2,
                             feature_maps=FM, image_size=SIZE)
    d_model = cgan.Discriminator(num_classes=2, feature_maps=FM,
                                 image_size=SIZE)
    vgg_model = VGG16Features()
    from xgan.train.common import adam
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    key = jax.random.key(2)
    g_state = create_state(g_model, g_tx, key, jnp.zeros((2, LATENT)),
                           jnp.zeros((2,), jnp.int32), train=False)
    d_state = create_state(d_model, d_tx, key,
                           jnp.zeros((2, SIZE, SIZE, 3)),
                           jnp.zeros((2,), jnp.int32), train=False)
    vgg_params = vgg_model.init(
        jax.random.key(3), jnp.zeros((1, SIZE, SIZE, 3)))["params"]

    gt = _RefCGANGenerator(LATENT, 2, 3, FM, SIZE // 32)
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".pth") as f:
        save_torch_cgan_generator(f.name, g_state.params,
                                  g_state.batch_stats)
        gt.load_state_dict(torch.load(f.name, map_location="cpu",
                                      weights_only=True))
    dt = _RefCGANDiscriminator(FM, SIZE // 32)
    _copy_cgan_d(d_state.params, dt, FM, SIZE // 32)
    vt = _TorchVGGBlocks()
    _copy_vgg(vgg_params, vt)
    for p in vt.parameters():
        p.requires_grad = False

    images = np.random.default_rng(13).integers(
        0, 255, (16, SIZE, SIZE, 3), np.uint8)
    labels_all = (np.arange(16) % 2).astype(np.int32)
    idx = np.arange(B)
    k_step = jax.random.key(31)

    step = make_cgan_step(g_model, d_model, vgg_model, g_tx, d_tx,
                          latent_dim=LATENT, donate=False)
    _, _, m = step(g_state, d_state, vgg_params, jnp.asarray(images),
                   jnp.asarray(labels_all), jnp.asarray(idx),
                   jnp.int32(EPOCH), k_step, mask=_mask())
    ours = np.asarray(m)

    # torch consumes the first VALID rows of the identical internal draws
    k_flip, k_noise, k_lab, k_rs, k_fs = jax.random.split(k_step, 5)
    flip = np.asarray(jax.random.bernoulli(k_flip, 0.5, (B,)))[:VALID]
    noise = torch.from_numpy(np.asarray(
        jax.random.normal(k_noise, (B, LATENT)))[:VALID].copy())
    fake_labels = torch.from_numpy(np.asarray(
        jax.random.randint(k_lab, (B,), 0, 2))[:VALID]
        .astype(np.int64).copy())
    real_smooth = torch.from_numpy(np.asarray(
        0.9 - 0.1 * jax.random.uniform(k_rs, (B,)))[:VALID].copy())
    fake_smooth = torch.from_numpy(np.asarray(
        0.1 + 0.1 * jax.random.uniform(k_fs, (B,)))[:VALID].copy())
    batch = images[idx[:VALID]]
    batch = np.where(flip[:, None, None, None], batch[:, :, ::-1, :],
                     batch)
    real = _nchw(_normalize(batch))
    real_labels = torch.from_numpy(
        labels_all[idx[:VALID]].astype(np.int64).copy())

    bcel = tnn.BCEWithLogitsLoss()
    opt_d = torch.optim.Adam(dt.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_g = torch.optim.Adam(gt.parameters(), lr=2e-4, betas=(0.5, 0.999))
    dt.zero_grad()
    out_real = dt(real, real_labels)
    d_x = torch.sigmoid(out_real).mean().item()
    err_d_real = bcel(out_real, real_smooth)
    fake = gt(noise, fake_labels)
    out_fake = dt(fake.detach(), fake_labels)
    d_g_z1 = torch.sigmoid(out_fake).mean().item()
    err_d = err_d_real + bcel(out_fake, fake_smooth)
    err_d.backward()
    opt_d.step()
    gt.zero_grad()
    out_fake2 = dt(fake, fake_labels)
    d_g_z2 = torch.sigmoid(out_fake2).mean().item()
    err_adv = bcel(out_fake2, real_smooth)
    f_f, f_r = vt(fake), vt(real)
    perc = sum(torch.mean((a - b) ** 2) for a, b in zip(f_f, f_r))
    fm = sum(torch.mean((a - b) ** 2) for a, b in zip(
        dt.features(real, real_labels), dt.features(fake, fake_labels)))
    err_g = err_adv + 10.0 * perc + 5.0 * fm
    err_g.backward()
    opt_g.step()
    theirs = np.asarray([err_g.item(), err_d.item(), d_x, d_g_z1,
                         d_g_z2, perc.item(), fm.item()])
    # loss_G is O(100) (10x random-VGG perceptual); tolerance scales
    # with magnitude (assert_allclose only takes scalar atol)
    diff = np.abs(ours - theirs)
    tol = 2e-3 + 1e-4 * np.abs(theirs)
    assert np.all(diff < tol), (ours, theirs, diff)


# ---------------------------------------------------------------------------
# 3) B∤N DP-equivalence variant: the masked step is identical on a
#    1-device and an 8-device mesh.
# ---------------------------------------------------------------------------

def _run_masked(mesh_ctx, steps=2):
    from xgan.models import dcgan
    from xgan.train.gan import make_dcgan_step

    g_model = dcgan.Generator(latent_dim=LATENT, feature_maps=FM,
                              image_size=SIZE)
    d_model = dcgan.Discriminator(feature_maps=FM, image_size=SIZE)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    k = jax.random.key(0)
    g_state = mesh_ctx.replicate(create_state(
        g_model, g_tx, k, jnp.zeros((2, LATENT)), train=False))
    d_state = mesh_ctx.replicate(create_state(
        d_model, d_tx, k, jnp.zeros((2, SIZE, SIZE, 3)), train=False))
    step = make_dcgan_step(g_model, d_model, g_tx, d_tx, latent_dim=LATENT,
                           batch_sharding=mesh_ctx.batch_sharding(4),
                           donate=False)
    images = mesh_ctx.replicate(_images(64, seed=0))
    mask = _mask()
    out = []
    for i in range(steps):
        idx = jnp.asarray((np.arange(B) + B * i) % 64, jnp.int32)
        g_state, d_state, metrics = step(g_state, d_state, images, idx,
                                         jax.random.key(50 + i),
                                         mask=mask)
        out.append(np.asarray(jax.device_get(metrics)))
    return np.stack(out), jax.device_get(g_state.params)


def test_masked_dp8_matches_single_device():
    from xgan.parallel import create_mesh
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    m1, p1 = _run_masked(create_mesh(devices=devs[:1]))
    m8, p8 = _run_masked(create_mesh(devices=devs[:8]))
    np.testing.assert_allclose(m1, m8, rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


# ---------------------------------------------------------------------------
# masked BN unit: statistics equal the small batch's exactly
# ---------------------------------------------------------------------------

def test_masked_batch_norm_stats():
    from xgan.ops.norm import batch_norm_train

    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, 4, 4, 3)).astype(np.float32)
    scale = np.ones(3, np.float32)
    bias = np.zeros(3, np.float32)
    rm, rv = np.zeros(3, np.float32), np.ones(3, np.float32)
    mask = np.asarray([1.0] * VALID + [0.0] * (B - VALID), np.float32)

    y_m, nm_m, nv_m = batch_norm_train(jnp.asarray(x), scale, bias, rm, rv,
                                       mask=jnp.asarray(mask))
    y_s, nm_s, nv_s = batch_norm_train(jnp.asarray(x[:VALID]), scale, bias,
                                       rm, rv)
    np.testing.assert_allclose(np.asarray(nm_m), np.asarray(nm_s),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(nv_m), np.asarray(nv_s),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(y_m)[:VALID], np.asarray(y_s),
                               rtol=1e-5, atol=1e-6)


def test_wgan_masked_equals_small_batch():
    """Full WGAN-GP step (critic scan + GP double-backward): the masked
    wide program equals the small program ONLY in its deterministic
    pieces given identical per-row draws — the step's internal noise is
    (B, latent)-shaped, so the small program would draw different
    numbers. Like the DCGAN case this is covered at the loss level: run
    gradient_penalty directly with shared inputs."""
    from xgan.models import wgan
    from xgan.train.wgan import gradient_penalty

    c_model = wgan.Critic(feature_maps=FM, image_size=SIZE)
    k = jax.random.key(0)
    variables = c_model.init(k, jnp.zeros((2, SIZE, SIZE, 3)), train=False)
    real = jax.random.normal(jax.random.key(1), (B, SIZE, SIZE, 3))
    fake = jax.random.normal(jax.random.key(2), (B, SIZE, SIZE, 3))
    mask = _mask()

    def critic_on(x, mask=None):
        def fn(xx):
            scores, upd = c_model.apply(
                variables, xx, train=True, mask=mask,
                mutable=["batch_stats"])
            return scores, upd["batch_stats"]
        return fn

    k_alpha = jax.random.key(3)
    gp_m, _ = gradient_penalty(critic_on(real, mask), real, fake, k_alpha,
                               10.0, mask)
    # small batch shares the first VALID alphas: alpha is (B,1,1,1) from
    # k_alpha; the small call draws (VALID,1,1,1) — DIFFERENT numbers.
    # So compute the small-batch GP manually with the wide alphas.
    alpha = jax.random.uniform(k_alpha, (B, 1, 1, 1), jnp.float32)[:VALID]
    inter = alpha * real[:VALID] + (1 - alpha) * fake[:VALID]

    def scalar(x):
        scores, _ = c_model.apply(variables, x, train=True,
                                  mutable=["batch_stats"])
        return jnp.sum(scores)

    grads = jax.grad(scalar)(inter)
    norms = jnp.sqrt(jnp.sum(jnp.square(
        grads.reshape(VALID, -1)), axis=1) + 1e-12)
    gp_s = 10.0 * jnp.mean(jnp.square(norms - 1.0))
    np.testing.assert_allclose(float(gp_m), float(gp_s), rtol=1e-5,
                               atol=1e-6)


# ---------------------------------------------------------------------------
# loop-level: a non-divisible batch size drives the masked-tail dispatch
# ---------------------------------------------------------------------------

def _mini_rsna(root, n_train: int):
    """RSNA-layout dataset with a chosen train count (conftest's fixture
    is fixed at 24, which at any 8-device-divisible batch size yields
    either no tail or no chunkable pair)."""
    from PIL import Image
    train_dir = root / "Training" / "Images"
    train_dir.mkdir(parents=True)
    (root / "Test").mkdir()
    rng = np.random.default_rng(7)
    classes = ["Lung Opacity", "Normal", "No Lung Opacity / Not Normal"]
    rows = ["patientId,class"]
    for i in range(n_train):
        pid = f"mini{i:03d}"
        rows.append(f"{pid},{classes[i % 3]}")
        img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        Image.fromarray(img).save(train_dir / f"{pid}.png")
    (root / "stage2_train_metadata.csv").write_text("\n".join(rows) + "\n")
    (root / "stage2_test_metadata.csv").write_text(
        "patientId,PredictionString\nt000,\n")
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(
        root / "Test" / "t000.png")
    return str(root)


def test_gan_loop_tail_routing(fake_dataset, tmp_path):
    """20 images at batch 8 (8-device divisible) -> 3 batches/epoch:
    2 full + 1 tail with 4 valid + 4 wrap-padded rows. With
    --steps-per-call 2 the two full batches form a real scan chunk while
    the tail must be EXCLUDED from chunking (it runs as the masked
    single step), so one 2-epoch run pins both routings: chunked
    dispatch + masked tail, with finite history of the right length."""
    from tests.test_gan_training import _gan_args
    from xgan.train.gan_loop import train_dcgan

    data_dir = _mini_rsna(tmp_path / "mini", 20)
    args = _gan_args(fake_dataset, tmp_path, batch_size=8, epochs=2,
                     limit_batches=0, steps_per_call=2, data_dir=data_dir)
    history = train_dcgan(args)
    assert len(history["G_losses_iter"]) == 6  # 2 epochs x 3 batches
    for key in ("G_losses_iter", "D_losses_iter", "D_x_iter"):
        assert np.all(np.isfinite(history[key])), key
