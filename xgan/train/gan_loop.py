"""DCGAN experiment orchestration (the role of reference train_gan.py:48-210).

Flow: data availability check -> decode-once uint8 store -> device mesh ->
jitted fused step -> epoch loop with on-device metrics -> sample sheets,
checkpoints, history JSON (reference schema) and the loss figure.
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from xgan.data import rsna
from xgan.data.pipeline import DeviceStore, epoch_batches
from xgan.data.store import ImageStore
from xgan.io_.checkpoint import save_variables
from xgan.io_.figures import plot_gan_losses, save_image_grid
from xgan.io_.metrics import write_json
from xgan.models import dcgan
from xgan.parallel import create_mesh
from xgan.parallel.tp import (model_parallel_from_args, shard_opt_state,
                              shard_over_model)
from xgan.train.common import adam, create_state
from xgan.train.ema import dispatch_with_ema, init_ema
from xgan.train.gan import make_dcgan_step
from xgan.train.loop_common import batch_tail_mask, checkpoint_boundary, \
    gan_live_postfix, grid_iters, EpochProgress, GracefulShutdown, \
    export_generator_pth, preempt_notice, replay_data_rng, \
    resume_history, resume_preflight, save_ema_final, trace_epoch
from xgan.train.snapshot import SnapshotManager
from xgan.utils import StepTimer, check_create_dir
from xgan.utils.timer import maybe_trace
# re-export: the other trainer loops import resolve_dtype from here
from xgan.config import resolve_dtype  # noqa: F401


def load_train_store(data_dir: str, image_size: int, cache_dir: str):
    if not rsna.check_dataset_availability(data_dir):
        raise FileNotFoundError(
            f"Dataset not available in {data_dir}. "
            "Run `python src/download_dataset.py` first.")
    ids, labels = rsna.load_train_metadata(
        os.path.join(data_dir, "stage2_train_metadata.csv"))
    paths = rsna.train_paths(data_dir, ids)
    print(f"Decoding/loading {len(paths)} training images at "
          f"{image_size}px (cached)...")
    return ImageStore.build(paths, labels, image_size, cache_dir=cache_dir,
                            name=f"train{image_size}")


def train_dcgan(args):
    """args: namespace with the reference train_gan.py flag surface
    (data_dir, model_dir, output_dir, results_dir, figures_dir,
    num_channels, latent_dim, feature_maps_g, feature_maps_d, epochs,
    batch_size, lr, beta1, workers, vis_batch_size, save_interval,
    checkpoint_interval, cpu) + TPU-native extras (image_size, seed,
    compute_dtype, cache_dir, limit_batches, trace_dir)."""
    if not resume_preflight(args):
        return None
    gan_model_dir = check_create_dir(os.path.join(args.model_dir, "gan"))
    gan_output_dir = check_create_dir(
        os.path.join(args.output_dir, "gan_images"))
    metrics_dir = check_create_dir(args.results_dir)
    figures_dir = check_create_dir(args.figures_dir)

    try:
        store = load_train_store(args.data_dir, args.image_size,
                                 args.cache_dir)
    except FileNotFoundError as e:
        print(f"Error: {e}")
        return None
    print(f"Loaded training data with {len(store)} samples.")

    mesh_ctx = create_mesh(model_parallel=model_parallel_from_args(args))
    n_dev = mesh_ctx.n_data
    batch_size = mesh_ctx.pad_batch(args.batch_size)
    if batch_size != args.batch_size:
        print(f"Note: batch size {args.batch_size} -> {batch_size} "
              f"(multiple of {n_dev} devices)")
    dtype = resolve_dtype(args.compute_dtype)
    print(f"Mesh: {mesh_ctx.mesh.shape}; compute dtype {dtype.__name__}")

    device_store = DeviceStore(store, mesh_ctx,
                               shard=getattr(args, "shard_store", False))

    g_model = dcgan.Generator(latent_dim=args.latent_dim,
                              num_channels=args.num_channels,
                              feature_maps=args.feature_maps_g,
                              image_size=args.image_size, dtype=dtype)
    d_model = dcgan.Discriminator(num_channels=args.num_channels,
                                  feature_maps=args.feature_maps_d,
                                  image_size=args.image_size, dtype=dtype)

    g_tx = adam(args.lr, args.beta1)
    d_tx = adam(args.lr, args.beta1)
    root_key = jax.random.key(args.seed)
    k_g, k_d, k_fix, k_data = jax.random.split(root_key, 4)
    g_state = create_state(g_model, g_tx, k_g,
                           jnp.zeros((2, args.latent_dim)), train=False)
    d_state = create_state(
        d_model, d_tx, k_d,
        jnp.zeros((2, args.image_size, args.image_size, args.num_channels)),
        train=False)
    # --model-parallel N: wide layers shard over the 'model' axis
    # (xgan/parallel/tp.py); N=1 is exactly replicate().
    g_state = shard_over_model(mesh_ctx, g_state)
    d_state = shard_over_model(mesh_ctx, d_state)
    if getattr(args, "shard_opt_state", False):  # ZeRO-1 Adam moments
        g_state = shard_opt_state(mesh_ctx, g_state)
        d_state = shard_opt_state(mesh_ctx, d_state)
    print("Generator and Discriminator initialized.")

    # --ema-decay: generator-weight EMA, fused into the step (write-only
    # inside it, so training is untouched; see xgan/train/ema.py)
    ema_decay = float(getattr(args, "ema_decay", 0.0) or 0.0)
    ema = init_ema(g_state.params) if ema_decay > 0 else None
    ga = int(getattr(args, "grad_accum", 1) or 1)
    if ga > 1 and batch_size % ga:
        print(f"Note: --grad-accum {ga} does not divide the "
              f"(device-padded) batch size {batch_size}; running "
              "without accumulation.")
        ga = 1
    step_kwargs = dict(latent_dim=args.latent_dim, dtype=dtype,
                       batch_sharding=mesh_ctx.batch_sharding(4),
                       store_take=device_store.take,
                       ema_decay=ema_decay if ema is not None else None,
                       grad_accum=ga)
    step_fn = make_dcgan_step(g_model, d_model, g_tx, d_tx, **step_kwargs)
    # K>1: a second program that runs K steps per dispatch (lax.scan over
    # the same body, identical PRNG stream); the tail of an epoch that
    # doesn't fill a chunk falls back to the single-step program.
    k_steps = max(1, int(getattr(args, "steps_per_call", 1) or 1))
    multi_fn = (make_dcgan_step(g_model, d_model, g_tx, d_tx,
                                steps_per_call=k_steps, **step_kwargs)
                if k_steps > 1 else None)
    fixed_noise = jax.random.normal(
        k_fix, (args.vis_batch_size, args.latent_dim), jnp.float32)

    def sample_grid(path):
        imgs = g_model.apply(g_state.variables(), fixed_noise, train=False)
        # min-max normalized like the reference's sample sheets
        # (save_image(normalize=True), train_gan.py:169)
        from xgan.data.pipeline import minmax_to_u8
        save_image_grid(np.asarray(jax.device_get(minmax_to_u8(imgs))), path,
                        nrow=8)

    history = {"G_losses_iter": [], "D_losses_iter": [], "D_x_iter": [],
               "D_G_z1_iter": [], "D_G_z2_iter": [],
               "G_losses_epoch": [], "D_losses_epoch": []}
    history_path = os.path.join(metrics_dir, "gan_training_history.json")

    data_rng = np.random.default_rng(args.seed)
    snap_mgr = SnapshotManager(
        os.path.join(gan_model_dir, "snapshot_last.msgpack"), mesh_ctx,
        async_io=True)  # overlap D2H+write with the next epoch's compute
    snap_template = {"g": g_state, "d": d_state}
    if ema is not None:  # EMA resumes with the run (part of the snapshot)
        snap_template["ema"] = ema
    try:
        states, start_epoch, iters = snap_mgr.try_resume(
            getattr(args, "resume_from", ""), snap_template)
    except (FileNotFoundError, ValueError) as e:
        print(f"Error: {e}")
        return None
    g_state, d_state = states["g"], states["d"]
    ema = states.get("ema", ema)
    # try_resume hands back REPLICATED states; re-apply the run's
    # parameter placement so a resumed --model-parallel/--shard-opt-state
    # run keeps its TP/ZeRO-1 layout instead of silently degrading to
    # replicated (no-op on the default replicated mesh).
    g_state = shard_over_model(mesh_ctx, g_state)
    d_state = shard_over_model(mesh_ctx, d_state)
    if getattr(args, "shard_opt_state", False):
        g_state = shard_opt_state(mesh_ctx, g_state)
        d_state = shard_opt_state(mesh_ctx, d_state)
    if ema is not None:
        ema = shard_over_model(mesh_ctx, ema)
    replay_data_rng(len(store), batch_size, data_rng, start_epoch)
    history = resume_history(history_path, history, start_epoch)

    timer = StepTimer()
    start_time = time.time()
    print("Starting Training Loop...")

    preempted = 0
    shutdown = GracefulShutdown()
    shutdown.install()  # restored in the finally below
    try:
        for epoch in range(start_epoch, args.epochs):
            epoch_start = time.time()
            batches = epoch_batches(len(store), batch_size, data_rng)
            if args.limit_batches:
                batches = batches[:args.limit_batches]
            num_batches = batches.shape[0]
            t_mask = batch_tail_mask(len(store), num_batches, batch_size)
            chunkable = num_batches - (1 if t_mask is not None else 0)
            epoch_metrics = []

            # Optional XLA profiler capture (first post-compile epoch, or the
            # only epoch on 1-epoch runs); the with-block finalizes the trace
            # even if a dispatch raises mid-epoch.
            trace_dir = getattr(args, "trace_dir", "")  # match the other loops
            with maybe_trace(
                    trace_dir
                    if (trace_dir
                        and epoch == trace_epoch(start_epoch, args.epochs))
                    else None), \
                    EpochProgress(f"Epoch {epoch + 1}/{args.epochs}",
                                  num_batches,
                                  postfix_fn=gan_live_postfix) as progress:
                i = 0
                while i < num_batches:
                    chunk = (k_steps if (multi_fn is not None
                                         and i + k_steps <= chunkable) else 1)
                    if chunk > 1:
                        g_state, d_state, ema, (metrics,) = dispatch_with_ema(
                            multi_fn, g_state, d_state, ema,
                            device_store.images,
                            jnp.asarray(batches[i:i + chunk]), jnp.int32(iters),
                            k_data)
                    else:
                        is_tail = (t_mask is not None
                                   and i == num_batches - 1)
                        g_state, d_state, ema, (metrics,) = dispatch_with_ema(
                            step_fn, g_state, d_state, ema,
                            device_store.images, jnp.asarray(batches[i]),
                            jax.random.fold_in(k_data, iters),
                            mask=jnp.asarray(t_mask) if is_tail else None)
                    epoch_metrics.append(metrics)

                    for t in grid_iters(iters, chunk, args.save_interval,
                                        epoch == args.epochs - 1, i,
                                        num_batches):
                        sample_grid(os.path.join(
                            gan_output_dir,
                            f"fake_samples_epoch_{epoch + 1:03d}_"
                            f"iter_{t:06d}.png"))
                    iters += chunk
                    i += chunk
                    progress.update(i, metrics)

                # One device->host sync per epoch for all per-iter metrics.
                em = np.asarray(jax.device_get(jnp.concatenate(
                    [jnp.atleast_2d(m) for m in epoch_metrics], axis=0)))
            timer.tick(num_batches)
            history["G_losses_iter"].extend(em[:, 0].tolist())
            history["D_losses_iter"].extend(em[:, 1].tolist())
            history["D_x_iter"].extend(em[:, 2].tolist())
            history["D_G_z1_iter"].extend(em[:, 3].tolist())
            history["D_G_z2_iter"].extend(em[:, 4].tolist())
            history["G_losses_epoch"].append(float(em[:, 0].mean()))
            history["D_losses_epoch"].append(float(em[:, 1].mean()))

            print(f"Epoch {epoch + 1}/{args.epochs} Summary - "
                  f"Time: {time.time() - epoch_start:.2f}s, "
                  f"Avg Loss_D: {em[:, 1].mean():.4f}, "
                  f"Avg Loss_G: {em[:, 0].mean():.4f}, "
                  f"{timer.rate * batch_size:.1f} imgs/s")

            def save_ckpt():
                snap_mgr.save_file(os.path.join(
                    gan_model_dir, f"generator_epoch_{epoch + 1:03d}.msgpack"),
                    g_state.variables())
                snap_mgr.save_file(os.path.join(
                    gan_model_dir,
                    f"discriminator_epoch_{epoch + 1:03d}.msgpack"),
                    d_state.variables())
                snap = {"g": g_state, "d": d_state}
                if ema is not None:
                    snap["ema"] = ema
                snap_mgr.save(snap, epoch + 1, iters)
                # history persists WITH the snapshot: the shared FIFO
                # writer lands it AFTER the snapshot even in async mode,
                # so a crash never leaves history ahead of the snapshot
                # (resume_history contract)
                snap_mgr.save_json(history_path, history)
                print(f"Saved checkpoints for epoch {epoch + 1} "
                      f"to {gan_model_dir}")

            if checkpoint_boundary(shutdown, epoch, args.epochs,
                                   args.checkpoint_interval, save_ckpt):
                preempted = epoch + 1  # snapshot queued by save_ckpt
                break

    finally:
        # Land queued async writes on EVERY exit path: normally before
        # the final saves below; on a crash so bytes for snapshots the
        # loop already reported saved aren't lost with the daemon
        # writer thread. Worker errors re-raise only on the clean path
        # (they must not mask an in-flight exception). Flush BEFORE
        # restoring handlers: the preempt snapshot's drain can take
        # minutes over this relay, and a repeated SIGTERM in that window
        # must hit the graceful handler (deliberate KeyboardInterrupt),
        # not the restored default disposition (hard kill that silently
        # drops a snapshot already reported saved).
        try:
            snap_mgr.flush(reraise=sys.exc_info()[0] is None)
        finally:
            shutdown.restore()
    if preempted:
        preempt_notice(preempted)
        return history
    print(f"Training finished in {time.time() - start_time:.2f} seconds.")
    save_variables(os.path.join(gan_model_dir, "generator_final.msgpack"),
                   g_state.variables())
    save_variables(os.path.join(gan_model_dir,
                                "discriminator_final.msgpack"),
                   d_state.variables())
    export_generator_pth(gan_model_dir, "dcgan", g_state)
    save_ema_final(gan_model_dir, "dcgan", g_state, ema)
    print(f"Saved final models to {gan_model_dir}")

    write_json(history_path, history)
    plot_gan_losses(history,
                    os.path.join(figures_dir, "gan_loss_curve.png"))
    return history
