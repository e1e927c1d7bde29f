"""CGAN experiment orchestration (role of reference train_cgan.py:78-247).

Deviations from the reference, both documented in SURVEY.md §7 quirks:
- outputs go to models/cgan/, results/cgan_images/,
  cgan_training_history.json and cgan_loss_curve.png — the per-GAN-type
  layout the reference README documents; the reference code instead
  collides with the DCGAN's models/gan/ + gan_training_history.json
  (train_cgan.py:82,:238);
- the history's per-iteration keys are actually populated (the reference
  declares them but never appends, leaving empty lists);
- the vestigial progressive-resolution/alpha schedule (computed but never
  applied, train_cgan.py:132-144) is not reproduced.

VGG-16 perceptual weights load from --vgg-path when given; otherwise the
loss uses randomly-initialized VGG features with a warning (no network
egress for torchvision downloads here).
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from xgan.data.pipeline import DeviceStore, epoch_batches, minmax_to_u8
from xgan.io_.checkpoint import save_variables
from xgan.io_.figures import plot_cgan_losses, save_image_grid
from xgan.io_.metrics import write_json
from xgan.models import cgan
from xgan.models.vgg import VGG16Features
from xgan.parallel import create_mesh
from xgan.parallel.tp import (model_parallel_from_args, shard_opt_state,
                              shard_over_model)
from xgan.train.cgan import make_cgan_step
from xgan.train.common import adam, create_state
from xgan.train.ema import dispatch_with_ema, init_ema
from xgan.train.gan_loop import load_train_store, resolve_dtype
from xgan.train.loop_common import batch_tail_mask, checkpoint_boundary, \
    gan_live_postfix, grid_iters, EpochProgress, GracefulShutdown, \
    export_generator_pth, preempt_notice, replay_data_rng, \
    save_ema_final, resume_history, resume_preflight, trace_epoch
from xgan.train.snapshot import SnapshotManager
from xgan.utils import StepTimer, check_create_dir
from xgan.utils.timer import maybe_trace

NUM_CLASSES = 2


def _init_vgg(args, dtype, rng):
    model = VGG16Features(dtype=dtype)
    size = min(args.image_size, 64)
    variables = model.init(rng, jnp.zeros((1, size, size, 3)))
    params = variables["params"]
    vgg_path = getattr(args, "vgg_path", "")
    if vgg_path:
        from xgan.models.pretrained import load_torch_vgg16
        params = jax.tree_util.tree_map(jnp.asarray,
                                        load_torch_vgg16(vgg_path))
        print(f"Loaded VGG16 ImageNet weights from {vgg_path}")
    else:
        print("WARNING: no --vgg-path given; perceptual loss uses "
              "randomly-initialized VGG features (random-feature perceptual "
              "losses still provide a training signal, but quality parity "
              "with the reference needs the ImageNet checkpoint).")
    return model, params


def train_cgan(args):
    # Fail fast on an explicit-path user error before any compile/decode.
    vgg_path = getattr(args, "vgg_path", "")
    if vgg_path and not os.path.exists(vgg_path):
        print(f"Error: VGG16 checkpoint {vgg_path} not found.")
        return None
    if vgg_path:
        # content check too (keys/shapes/not-vgg19), not just existence —
        # a wrong .pth otherwise dies with a raw KeyError only AFTER the
        # minutes-long dataset decode, or loads as a silent frankenmodel
        from xgan.models.pretrained import validate_torch_vgg16
        try:
            validate_torch_vgg16(vgg_path)
        except Exception as e:  # noqa: BLE001 — structured CLI contract
            print(f"Error: --vgg-path {vgg_path} is not a vgg16 "
                  f"checkpoint: {e}")
            return None

    if not resume_preflight(args):
        return None
    model_dir = check_create_dir(os.path.join(args.model_dir, "cgan"))
    image_dir = check_create_dir(os.path.join(args.output_dir,
                                              "cgan_images"))
    metrics_dir = check_create_dir(args.results_dir)
    figures_dir = check_create_dir(args.figures_dir)

    try:
        store = load_train_store(args.data_dir, args.image_size,
                                 args.cache_dir)
    except FileNotFoundError as e:
        print(f"Error: {e}")
        return None

    mesh_ctx = create_mesh(model_parallel=model_parallel_from_args(args))
    batch_size = mesh_ctx.pad_batch(args.batch_size)
    dtype = resolve_dtype(args.compute_dtype)
    print(f"Mesh: {dict(mesh_ctx.mesh.shape)}; compute dtype "
          f"{dtype.__name__}")
    device_store = DeviceStore(store, mesh_ctx,
                               shard=getattr(args, "shard_store", False))

    g_model = cgan.Generator(latent_dim=args.latent_dim,
                             num_classes=NUM_CLASSES,
                             num_channels=args.num_channels,
                             feature_maps=args.feature_maps_g,
                             image_size=args.image_size, dtype=dtype)
    d_model = cgan.Discriminator(num_classes=NUM_CLASSES,
                                 num_channels=args.num_channels,
                                 feature_maps=args.feature_maps_d,
                                 image_size=args.image_size, dtype=dtype)

    g_tx = adam(args.lr, args.beta1)
    d_tx = adam(args.lr, args.beta1)
    root_key = jax.random.key(args.seed)
    k_g, k_d, k_v, k_fix, k_data = jax.random.split(root_key, 5)
    ex_labels = jnp.zeros((2,), jnp.int32)
    g_state = create_state(g_model, g_tx, k_g,
                           jnp.zeros((2, args.latent_dim)), ex_labels,
                           train=False)
    d_state = create_state(
        d_model, d_tx, k_d,
        jnp.zeros((2, args.image_size, args.image_size,
                   args.num_channels)), ex_labels, train=False)
    vgg_model, vgg_params = _init_vgg(args, dtype, k_v)
    # --model-parallel N: wide layers shard over the 'model' axis.
    g_state = shard_over_model(mesh_ctx, g_state)
    d_state = shard_over_model(mesh_ctx, d_state)
    if getattr(args, "shard_opt_state", False):  # ZeRO-1 Adam moments
        g_state = shard_opt_state(mesh_ctx, g_state)
        d_state = shard_opt_state(mesh_ctx, d_state)
    vgg_params = mesh_ctx.replicate(vgg_params)

    # --ema-decay: generator-weight EMA fused into the step
    # (write-only inside it; see xgan/train/ema.py)
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
    step_fn = make_cgan_step(g_model, d_model, vgg_model, g_tx, d_tx,
                             **step_kwargs)
    # K>1: K steps per dispatch; epoch tails use the single-step program.
    k_steps = max(1, int(getattr(args, "steps_per_call", 1) or 1))
    multi_fn = (make_cgan_step(g_model, d_model, vgg_model, g_tx, d_tx,
                               steps_per_call=k_steps, **step_kwargs)
                if k_steps > 1 else None)

    fixed_noise = jax.random.normal(
        k_fix, (args.vis_batch_size, args.latent_dim), jnp.float32)
    fixed_labels = jnp.asarray(
        np.tile(np.arange(NUM_CLASSES),
                args.vis_batch_size // NUM_CLASSES + 1)
        [:args.vis_batch_size].astype(np.int32))

    def sample_grid(path):
        imgs = g_model.apply(g_state.variables(), fixed_noise,
                             fixed_labels, train=False)
        save_image_grid(np.asarray(jax.device_get(minmax_to_u8(imgs))), path,
                        nrow=8)

    history = {"G_losses_iter": [], "D_losses_iter": [], "D_x_iter": [],
               "D_G_z1_iter": [], "D_G_z2_iter": [], "G_losses_epoch": [],
               "D_losses_epoch": [], "perceptual_losses": [],
               "feature_matching_losses": []}
    data_rng = np.random.default_rng(args.seed)
    snap_mgr = SnapshotManager(
        os.path.join(model_dir, "snapshot_last.msgpack"), mesh_ctx,
        async_io=True)  # overlap D2H+write with the next epoch
    snap_template = {"g": g_state, "d": d_state}
    if ema is not None:  # EMA resumes with the run
        snap_template["ema"] = ema
    try:
        states, start_epoch, iters = snap_mgr.try_resume(
            getattr(args, "resume_from", ""), snap_template)
    except (FileNotFoundError, ValueError) as e:
        print(f"Error: {e}")
        return None
    g_state, d_state = states["g"], states["d"]
    ema = states.get("ema", ema)
    # re-apply TP/ZeRO-1 placement after resume (see gan_loop.py)
    g_state = shard_over_model(mesh_ctx, g_state)
    d_state = shard_over_model(mesh_ctx, d_state)
    if getattr(args, "shard_opt_state", False):
        g_state = shard_opt_state(mesh_ctx, g_state)
        d_state = shard_opt_state(mesh_ctx, d_state)
    if ema is not None:
        ema = shard_over_model(mesh_ctx, ema)
    replay_data_rng(len(store), batch_size, data_rng, start_epoch)
    history_path = os.path.join(metrics_dir, "cgan_training_history.json")
    history = resume_history(history_path, history, start_epoch)
    timer = StepTimer()
    start = time.time()

    preempted = 0
    shutdown = GracefulShutdown()
    shutdown.install()  # restored in the finally below
    try:
        for epoch in range(start_epoch, args.epochs):
            t0 = time.time()
            batches = epoch_batches(len(store), batch_size, data_rng)
            if args.limit_batches:
                batches = batches[:args.limit_batches]
            num_batches = batches.shape[0]
            t_mask = batch_tail_mask(len(store), num_batches, batch_size)
            chunkable = num_batches - (1 if t_mask is not None else 0)
            epoch_metrics = []

            # Optional XLA profiler capture (first post-compile epoch, or the
            # only epoch on 1-epoch runs); exception-safe via the with-block.
            with maybe_trace(
                    getattr(args, "trace_dir", "")
                    if (getattr(args, "trace_dir", "")
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
                            multi_fn, g_state, d_state, ema, vgg_params,
                            device_store.images, device_store.labels,
                            jnp.asarray(batches[i:i + chunk]),
                            jnp.int32(epoch), jnp.int32(iters), k_data)
                    else:
                        is_tail = (t_mask is not None
                                   and i == num_batches - 1)
                        g_state, d_state, ema, (metrics,) = dispatch_with_ema(
                            step_fn, g_state, d_state, ema, vgg_params,
                            device_store.images, device_store.labels,
                            jnp.asarray(batches[i]),
                            jnp.int32(epoch), jax.random.fold_in(k_data, iters),
                            mask=jnp.asarray(t_mask) if is_tail else None)
                    epoch_metrics.append(metrics)

                    for t in grid_iters(iters, chunk, args.save_interval,
                                        epoch == args.epochs - 1, i,
                                        num_batches):
                        sample_grid(os.path.join(
                            image_dir, f"fake_samples_epoch_{epoch + 1:03d}_"
                                       f"iter_{t:06d}.png"))
                    iters += chunk
                    i += chunk
                    progress.update(i, metrics)

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
            history["perceptual_losses"].append(float(em[:, 5].mean()))
            history["feature_matching_losses"].append(float(em[:, 6].mean()))

            print(f"Epoch {epoch + 1}/{args.epochs} Summary - "
                  f"Time: {time.time() - t0:.2f}s, "
                  f"Avg Loss_D: {em[:, 1].mean():.4f}, "
                  f"Avg Loss_G: {em[:, 0].mean():.4f}, "
                  f"{timer.rate * batch_size:.1f} imgs/s")

            def save_ckpt():
                snap_mgr.save_file(os.path.join(
                    model_dir, f"generator_epoch_{epoch + 1:03d}.msgpack"),
                    g_state.variables())
                snap_mgr.save_file(os.path.join(
                    model_dir,
                    f"discriminator_epoch_{epoch + 1:03d}.msgpack"),
                    d_state.variables())
                snap = {"g": g_state, "d": d_state}
                if ema is not None:
                    snap["ema"] = ema
                snap_mgr.save(snap, epoch + 1, iters)
                # history persists with the snapshot (see gan_loop.py)
                snap_mgr.save_json(history_path, history)
                print(f"Saved checkpoints for epoch {epoch + 1} to {model_dir}")

            if checkpoint_boundary(shutdown, epoch, args.epochs,
                                   args.checkpoint_interval, save_ckpt):
                preempted = epoch + 1  # snapshot queued by save_ckpt
                break

    finally:
        # Flush queued async writes on EVERY exit path, BEFORE restoring
        # signal handlers (ordering rationale: gan_loop.py finally).
        try:
            snap_mgr.flush(reraise=sys.exc_info()[0] is None)
        finally:
            shutdown.restore()
    if preempted:
        preempt_notice(preempted)
        return history
    print(f"Training finished in {time.time() - start:.2f} seconds.")
    save_variables(os.path.join(model_dir, "generator_final.msgpack"),
                   g_state.variables())
    save_variables(os.path.join(model_dir, "discriminator_final.msgpack"),
                   d_state.variables())
    export_generator_pth(model_dir, "cgan", g_state)
    save_ema_final(model_dir, "cgan", g_state, ema)
    print(f"Saved final models to {model_dir}")

    write_json(history_path, history)
    plot_cgan_losses(history,
                     os.path.join(figures_dir, "cgan_loss_curve.png"))
    return history
