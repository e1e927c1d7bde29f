"""--grad-accum correctness: K microbatches scanned inside one program
must reproduce torch gradient-accumulation semantics exactly — the
gradient is the valid-row-weighted mean over the FULL batch, BN batch
statistics are per-microbatch and running stats advance sequentially,
and one optimizer update fires. The reference has no counterpart
(torch users write the loss.backward()-per-microbatch loop by hand);
this is the activation-memory lever for effective batches past the
fused step's HBM ceiling (where --remat measured zero max-batch gain,
tools/bench_remat.py)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from xgan.models.resnet import ResNet50
from xgan.ops.reduce import weighted_mean
from xgan.train.classifier import (_microbatch_grads, classifier_optimizer,
                                   make_train_step, softmax_ce)
from xgan.train.common import ModelState, apply_updates


def _resnet_state(freeze=False):
    model = ResNet50(num_classes=2, stage_sizes=(1, 1, 1, 1))
    v = model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)),
                   train=False)
    tx = classifier_optimizer(1e-3, freeze_base=freeze)
    return model, tx, ModelState(params=v["params"],
                                 batch_stats=v["batch_stats"],
                                 opt_state=tx.init(v["params"]))


def _batch(b=16, seed=0):
    rng = np.random.default_rng(seed)
    imgs = jnp.asarray(
        rng.normal(size=(b, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, (b,)).astype(np.int32))
    return imgs, labels


def _sequential_reference(model, state, imgs, labels, mask, k):
    """The defining contract, written as the obvious python loop:
    per-microbatch value_and_grad of the valid-row loss SUM with the
    running stats threaded through, gradient sum divided by the full
    batch's valid count. The per-microbatch computation is jitted so
    its XLA program matches the scan body's — eager-vs-compiled BN
    reductions otherwise amplify through the random-init backward to
    ~1% gradient noise (same phenomenon as tests/test_remat.py's
    jitted-path tolerances)."""
    b = imgs.shape[0]
    mb = b // k
    stats = state.batch_stats
    gsum = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    losses_all = []

    def mb_loss(params, stats, imgs_mb, labels_mb, mask_mb):
        mkw = {} if mask_mb is None else {"mask": mask_mb}
        logits, upd = model.apply(
            {"params": params, "batch_stats": stats}, imgs_mb,
            train=True, mutable=["batch_stats"], **mkw)
        losses = softmax_ce(logits, labels_mb)
        if mask_mb is None:
            wsum = jnp.sum(losses)
        else:
            wsum = jnp.sum(jnp.where(
                mask_mb > 0, losses * mask_mb, 0.0))
        return wsum, (losses, upd["batch_stats"])

    mb_grad = jax.jit(jax.value_and_grad(mb_loss, has_aux=True),
                      static_argnames=())
    for i in range(k):
        sl = slice(i * mb, (i + 1) * mb)
        imgs_mb, labels_mb = imgs[sl], labels[sl]
        mask_mb = None if mask is None else mask[sl]
        (_, (losses, new_stats)), g = mb_grad(
            state.params, stats, imgs_mb, labels_mb, mask_mb)
        if mask_mb is None or float(jnp.sum(mask_mb)) > 0:
            # a fully-padded microbatch contributes nothing: stats
            # freeze AND its (NaN-poisoned — 0*NaN jacobians) gradient
            # is dropped, mirroring the select-zero in the scan
            stats = new_stats
            gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
        losses_all.append(losses)
    total_w = (jnp.float32(b) if mask is None
               else jnp.maximum(jnp.sum(mask), 1e-9))
    grads = jax.tree_util.tree_map(lambda g: g / total_w, gsum)
    return jnp.concatenate(losses_all), stats, grads


def _assert_trees_close(a, b, **kw):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


@pytest.mark.parametrize("mask_case", ["none", "partial"])
def test_accum_matches_sequential_microbatches(mask_case):
    """_microbatch_grads == the hand-written sequential loop: losses,
    BN running stats, and the accumulated gradient. Both sides run the
    same jitted per-microbatch program, so the measured deltas are
    ≤5e-6 on gradients and 0 on losses (see _sequential_reference)."""
    model, _, state = _resnet_state()
    imgs, labels = _batch(16)
    mask = (None if mask_case == "none"
            else jnp.asarray([1] * 13 + [0] * 3, jnp.float32))
    losses, logits, stats, grads = _microbatch_grads(
        model, state, imgs, labels, mask, 4, None)
    exp_losses, exp_stats, exp_grads = _sequential_reference(
        model, state, imgs, labels, mask, 4)
    nvalid = 16 if mask is None else 13
    np.testing.assert_allclose(np.asarray(losses)[:nvalid],
                               np.asarray(exp_losses)[:nvalid],
                               rtol=1e-6, atol=1e-6)
    _assert_trees_close(stats, exp_stats, rtol=1e-5, atol=1e-6)
    _assert_trees_close(grads, exp_grads, rtol=1e-4, atol=1e-5)


def test_fully_padded_microbatch_freezes_stats_and_contributes_zero():
    """A tail batch shorter than (k-1) microbatches leaves whole
    microbatches fully padded: their BN running-stat update must freeze
    and their gradient contribution must be exactly zero — the state
    after the step equals accumulating over the valid prefix only."""
    model, _, state = _resnet_state()
    imgs, labels = _batch(16, seed=3)
    # microbatch 3 (rows 12:16) fully padded; microbatch 2 part padded
    mask = jnp.asarray([1] * 9 + [0] * 7, jnp.float32)
    losses, logits, stats, grads = _microbatch_grads(
        model, state, imgs, labels, mask, 4, None)
    exp_losses, exp_stats, exp_grads = _sequential_reference(
        model, state, imgs, labels, mask, 4)
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
    _assert_trees_close(stats, exp_stats, rtol=1e-5, atol=1e-6)
    _assert_trees_close(grads, exp_grads, rtol=1e-4, atol=1e-5)
    # valid rows' losses match; padded rows are garbage by contract
    np.testing.assert_allclose(np.asarray(losses)[:9],
                               np.asarray(exp_losses)[:9],
                               rtol=1e-6, atol=1e-6)


class _NoBN(nn.Module):
    """BN-free double: grad accumulation is EXACTLY the full-batch
    gradient when nothing depends on batch statistics."""
    @nn.compact
    def __call__(self, x, train=False):
        x = x.reshape((x.shape[0], -1))
        x = nn.tanh(nn.Dense(16)(x))
        return nn.Dense(2)(x)


def test_bn_free_accum_equals_full_batch_gradient():
    model = _NoBN()
    v = model.init(jax.random.key(1), jnp.zeros((2, 8, 8, 3)))
    tx = classifier_optimizer(1e-3, freeze_base=False)
    state = ModelState(params=v["params"], batch_stats={},
                       opt_state=tx.init(v["params"]))
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.normal(size=(16, 8, 8, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, (16,)).astype(np.int32))

    _, _, _, grads = _microbatch_grads(model, state, imgs, labels,
                                       None, 8, None)

    def full_loss(params):
        logits = model.apply({"params": params, "batch_stats": {}},
                             imgs, train=True)
        return weighted_mean(softmax_ce(logits, labels), None)

    exp = jax.grad(full_loss)(state.params)
    _assert_trees_close(grads, exp, rtol=1e-5, atol=1e-7)


def test_jitted_step_end_to_end_k4_vs_sequential_state():
    """Through the real jitted train step (donated state, u8 store,
    flip+normalize): the post-Adam state must match applying the
    sequential-reference gradient. Jit fuses/reorders reductions, so
    post-Adam params carry the usual near-zero-gradient envelope (see
    tests/test_tp.py)."""
    model, tx, state = _resnet_state()
    rng = np.random.default_rng(7)
    store = jnp.asarray(rng.integers(0, 255, (16, 32, 32, 3), np.uint8))
    labels_all = jnp.asarray(rng.integers(0, 2, (16,)).astype(np.int32))
    dummy = jnp.zeros((1, 32, 32, 3), jnp.uint8)
    dummy_l = jnp.zeros((1,), jnp.int32)
    idx = jnp.arange(8, dtype=jnp.int32)
    key = jax.random.key(9)

    # expected: reproduce the step's preprocessing eagerly, then the
    # sequential accumulation contract + one optimizer update
    from xgan.data.pipeline import normalize_images, random_flip, take_rows
    _, k_flip = jax.random.split(key)
    imgs = normalize_images(
        random_flip(take_rows(store, idx), k_flip), dtype=jnp.float32)
    labels = jnp.take(labels_all, idx, axis=0)
    _, exp_stats, exp_grads = _sequential_reference(
        model, state, imgs, labels, None, 4)
    exp_state = apply_updates(
        tx, ModelState(params=state.params,
                       batch_stats=state.batch_stats,
                       opt_state=state.opt_state), exp_grads, exp_stats)

    step = make_train_step(model, tx, mode="real", grad_accum=4)
    fresh = ModelState(
        params=jax.tree_util.tree_map(jnp.array, state.params),
        batch_stats=jax.tree_util.tree_map(jnp.array, state.batch_stats),
        opt_state=jax.tree_util.tree_map(jnp.array, state.opt_state))
    new_state, losses, preds, lb = step(fresh, store, labels_all, dummy,
                                        dummy_l, idx, jnp.float32(0.0),
                                        key)
    assert np.isfinite(np.asarray(losses)).all()
    # one fused program (gather+flip+normalize+scan) vs the per-
    # microbatch jitted reference: reductions fuse differently, BN
    # stats carry ~1e-5 noise; post-Adam params the near-zero-gradient
    # ±lr envelope (see tests/test_tp.py)
    _assert_trees_close(new_state.batch_stats, exp_state.batch_stats,
                        rtol=1e-3, atol=1e-4)
    _assert_trees_close(new_state.params, exp_state.params,
                        rtol=2e-3, atol=2.5e-3)


def test_dp_equivalence_k2():
    """grad-accum under the 8-device data mesh == single-device: the
    microbatch scan's P(None, 'data') layout must not change the math
    (the property tests/test_sharding.py pins for the K=1 step)."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 emulated devices")
    from xgan.parallel import create_mesh

    def run(mesh_ctx):
        model, tx, state = _resnet_state()
        if mesh_ctx is not None:
            state = mesh_ctx.replicate(state)
            bsh = mesh_ctx.batch_sharding(4)
        else:
            bsh = None
        step = make_train_step(model, tx, mode="real",
                               batch_sharding=bsh, grad_accum=2)
        rng = np.random.default_rng(11)
        store = jnp.asarray(rng.integers(0, 255, (64, 32, 32, 3),
                                         np.uint8))
        labels = jnp.asarray(rng.integers(0, 2, (64,)).astype(np.int32))
        if mesh_ctx is not None:
            store, labels = (mesh_ctx.replicate(store),
                             mesh_ctx.replicate(labels))
        dummy = jnp.zeros((1, 32, 32, 3), jnp.uint8)
        dummy_l = jnp.zeros((1,), jnp.int32)
        out = []
        for i in range(2):
            idx = jnp.asarray((np.arange(16) + 16 * i) % 64, jnp.int32)
            state, losses, _, _ = step(state, store, labels, dummy,
                                       dummy_l, idx, jnp.float32(0.0),
                                       jax.random.key(50 + i))
            out.append(np.asarray(jax.device_get(losses)))
        return np.stack(out), jax.device_get(state)

    l1, s1 = run(None)
    l8, s8 = run(create_mesh(devices=devs[:8]))
    # step 0: cross-device reduction reorder only; step 1 additionally
    # rides step 0's post-Adam ±lr param envelope (lr=1e-3), so its
    # losses shift by O(1e-3)
    np.testing.assert_allclose(l1[0], l8[0], rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(l1[1], l8[1], rtol=1e-2, atol=5e-3)
    _assert_trees_close(s1.params, s8.params, rtol=2e-3, atol=2.5e-3)
