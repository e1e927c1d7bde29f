"""Multi-process (emulated multi-host) DP worker, launched by
tests/test_multiprocess.py as ``python multiproc_worker.py PID NPROC PORT
OUTDIR``.

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the launcher);
``jax.distributed.initialize`` joins them into one 8-device global mesh
— the same topology every single-process test emulates, but now spanning
process boundaries, so the previously-unexecuted multi-host branches
actually run (VERDICT r3 next #2):

- ``DeviceStore``'s ``jax.make_array_from_process_local_data`` assembly
  for replicated stores,
- the ``--shard-store`` cross-process sharded store: the
  ``make_array_from_callback`` branch hands each LOCAL device its global
  row block and ``store.take``'s one-owner psum gather recovers exact u8
  rows across process boundaries (xgan/data/pipeline.py, shard branch),
- one DP DCGAN train step over the cross-process mesh (XLA's gradient
  all-reduces + sync-BN reductions ride the cross-process transport),
- one composed --model-parallel 2 --shard-opt-state classifier step on
  a (data=4, model=2) mesh whose MODEL axis spans the process boundary
  (r5: TP parameter all-gathers + ZeRO-1 moment re-layouts cross
  processes, not just the DP grad all-reduce),
- process-0 snapshot write + reload of the post-step state.

With NPROC=1 the identical code runs single-process over 8 local
devices, producing the reference outputs the launcher compares against.
"""
import json
import os
import sys


def host_tree(tree):
    """Global (possibly non-fully-addressable) replicated tree -> host
    numpy tree via each leaf's first addressable replica. jax.device_get
    raises on arrays spanning non-addressable devices; for a replicated
    array every process's local shard 0 holds the full value."""
    import jax
    import numpy as np

    def fetch(x):
        if hasattr(x, "addressable_data"):
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    return jax.tree_util.tree_map(fetch, tree)


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc, process_id=pid)
    assert jax.device_count() == 8, jax.devices()
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    import numpy as np

    from xgan.data.pipeline import DeviceStore
    from xgan.data.store import ImageStore
    from xgan.models import dcgan
    from xgan.parallel import create_mesh
    from xgan.train.common import ModelState, adam, create_state
    from xgan.train.gan import make_dcgan_step

    size, latent, fm, batch = 32, 16, 8, 16
    mesh_ctx = create_mesh()

    def repl(tree):
        """Replicate host values over the global mesh. Single-process:
        plain device_put; multi-process: every process contributes its
        identical local copy (deterministic construction below), the
        documented multi-host assembly path."""
        if nproc == 1:
            return mesh_ctx.replicate(tree)
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                mesh_ctx.replicated(), np.asarray(x)), tree)

    # --- DeviceStore: multi-host assembly branch (process_count > 1)
    rng = np.random.default_rng(0)
    host_store = ImageStore(
        images=rng.integers(0, 256, (40, size, size, 3), np.uint8),
        labels=(np.arange(40) % 2).astype(np.int32), size=size)
    store = DeviceStore(host_store, mesh_ctx)
    assert len(store) == 40

    # --- --shard-store across processes (r4): rows shard over the
    # GLOBAL mesh via make_array_from_callback, the one-owner psum
    # gather reassembles batches over the cross-process transport.
    # Exact u8 row recovery is the whole correctness story.
    sharded = DeviceStore(host_store, mesh_ctx, shard=True)
    assert sharded.sharded
    take_jit = jax.jit(sharded.take)
    ix = jnp.asarray([0, 5, 13, 39, 17, 2, 38, 21], jnp.int32)
    rows = host_tree(take_jit(sharded.images, ix))
    np.testing.assert_array_equal(
        rows, np.asarray(host_store.images)[np.asarray(ix)])

    # --- one DP DCGAN fused step over the cross-process mesh
    g_model = dcgan.Generator(latent_dim=latent, feature_maps=fm,
                              image_size=size)
    d_model = dcgan.Discriminator(feature_maps=fm, image_size=size)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    k = jax.random.key(0)
    g_host = create_state(g_model, g_tx, k, jnp.zeros((2, latent)),
                          train=False)
    d_host = create_state(d_model, d_tx, k,
                          jnp.zeros((2, size, size, 3)), train=False)
    g_state, d_state = repl(host_tree(g_host)), repl(host_tree(d_host))
    step = make_dcgan_step(g_model, d_model, g_tx, d_tx,
                           latent_dim=latent,
                           batch_sharding=mesh_ctx.batch_sharding(4),
                           donate=False)

    # Typed PRNG keys cannot be np.asarray'd for the process-local
    # assembly; ship the raw uint32 key data and re-wrap inside the
    # jitted program.
    @jax.jit
    def step_kd(g_state, d_state, images, idx, key_data):
        return step(g_state, d_state, images, idx,
                    jax.random.wrap_key_data(key_data))

    idx = jnp.arange(batch, dtype=jnp.int32)
    kd = repl(np.asarray(jax.random.key_data(jax.random.key(1))))
    g_state, d_state, metrics = step_kd(g_state, d_state, store.images,
                                        idx, kd)
    metrics = host_tree(metrics)
    assert np.all(np.isfinite(metrics)), metrics

    # --- TP + ZeRO-1 composed classifier step across processes (r5,
    # VERDICT r4 weak #4): --model-parallel 2 --shard-opt-state layouts
    # had only ever run single-process. The mesh's device order is
    # chosen so that with 2 processes the MODEL axis spans the process
    # boundary (column 0 = proc0's devices, column 1 = proc1's): every
    # GSPMD parameter all-gather and moment re-layout rides the
    # cross-process transport, not just the DP grad all-reduce.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from xgan.models.resnet import ResNet50
    from xgan.parallel.tp import shard_opt_state, shard_over_model
    from xgan.train.classifier import classifier_optimizer, make_train_step

    devs = jax.devices()
    order = [devs[r + c * 4] for r in range(4) for c in range(2)]
    tp_mesh = create_mesh(devices=order, model_parallel=2)
    clf_model = ResNet50(num_classes=2, stage_sizes=(1, 1, 1, 1))
    tx = classifier_optimizer(1e-3, freeze_base=True)
    v = host_tree(clf_model.init(
        jax.random.key(6), jnp.zeros((2, size, size, 3)), train=False))
    clf_state = ModelState(params=v["params"],
                           batch_stats=v["batch_stats"],
                           opt_state=tx.init(v["params"]))
    clf_state = shard_over_model(tp_mesh, clf_state, min_features=64)
    clf_state = shard_opt_state(tp_mesh, clf_state, min_features=64)
    if nproc > 1:
        # the wide fc kernel (2048, 2) must actually be sharded: this
        # process's addressable piece holds half the rows
        fc_k = clf_state.params["fc"]["kernel"]
        local = fc_k.addressable_shards[0].data.shape
        assert local[0] == fc_k.shape[0] // 2, (local, fc_k.shape)
    clf_step = make_train_step(clf_model, tx, mode="real",
                               batch_sharding=tp_mesh.batch_sharding(4))

    @jax.jit
    def clf_step_kd(state, real, labels, synth, synth_l, idx, key_data):
        return clf_step(state, real, labels, synth, synth_l, idx,
                        jnp.float32(0.0),
                        jax.random.wrap_key_data(key_data))

    def repl_tp(x):
        # replicate over the TP mesh: its device ORDER differs from
        # mesh_ctx's (the model-axis transpose above), and one jit call
        # cannot mix shardings with different device lists
        if nproc == 1:
            return tp_mesh.replicate(np.asarray(x))
        return jax.make_array_from_process_local_data(
            tp_mesh.replicated(), np.asarray(x))

    clf_imgs = repl_tp(rng.integers(0, 256, (2 * batch, size, size, 3),
                                    np.uint8))
    clf_labels = repl_tp((np.arange(2 * batch) % 2).astype(np.int32))
    dummy = repl_tp(np.zeros((1, size, size, 3), np.uint8))
    dummy_l = repl_tp(np.zeros((1,), np.int32))
    kd2 = repl_tp(np.asarray(jax.random.key_data(jax.random.key(2))))
    clf_state, clf_losses, _, _ = clf_step_kd(
        clf_state, clf_imgs, clf_labels, dummy, dummy_l,
        jnp.arange(batch, dtype=jnp.int32), kd2)
    # un-shard before fetching: addressable_data(0) of a sharded leaf is
    # only this process's piece
    unshard = jax.jit(lambda t: t,
                      out_shardings=NamedSharding(tp_mesh.mesh, P()))
    clf_losses = host_tree(unshard(clf_losses))
    fc_host = host_tree(unshard(clf_state.params["fc"]))
    assert np.all(np.isfinite(clf_losses)), clf_losses

    if pid == 0:
        # --- process-0 snapshot write + reload roundtrip
        from flax import serialization
        params_host = host_tree(g_state.params)
        snap_path = os.path.join(outdir, f"params_nproc{nproc}.msgpack")
        with open(snap_path, "wb") as f:
            f.write(serialization.to_bytes(params_host))
        with open(snap_path, "rb") as f:
            restored = serialization.from_bytes(params_host, f.read())
        for a, b in zip(jax.tree_util.tree_leaves(params_host),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        with open(os.path.join(outdir, f"clf_fc_nproc{nproc}.msgpack"),
                  "wb") as f:
            f.write(serialization.to_bytes(fc_host))
        print("RESULT " + json.dumps(
            {"metrics": [float(x) for x in np.asarray(metrics)],
             "clf_losses": [float(x) for x in np.asarray(clf_losses)],
             "nproc": nproc}), flush=True)

    if nproc > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("multiproc_worker_done")


if __name__ == "__main__":
    main()
