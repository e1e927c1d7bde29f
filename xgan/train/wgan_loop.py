"""WGAN-GP experiment orchestration (role of reference train_wggan.py:29-124).

Outputs: models/wgan/* checkpoints, results/wgan_images/* sample sheets,
wgan_training_history.json (keys D_losses, G_losses, D_losses_epoch,
G_losses_epoch — train_wggan.py:57) and wgan_loss_curve.png.
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
from xgan.io_.figures import plot_wgan_losses, save_image_grid
from xgan.io_.metrics import write_json
from xgan.models import wgan
from xgan.parallel import create_mesh
from xgan.parallel.tp import (model_parallel_from_args, shard_opt_state,
                              shard_over_model)
from xgan.train.common import adam, create_state
from xgan.train.ema import dispatch_with_ema, init_ema
from xgan.train.gan_loop import load_train_store, resolve_dtype
from xgan.train.loop_common import batch_tail_mask, checkpoint_boundary, \
    grid_iters, EpochProgress, GracefulShutdown, export_generator_pth, \
    preempt_notice, replay_data_rng, save_ema_final, resume_history, \
    resume_preflight, trace_epoch, wgan_live_postfix
from xgan.train.snapshot import SnapshotManager
from xgan.train.wgan import make_wgan_step
from xgan.utils import StepTimer, check_create_dir
from xgan.utils.timer import maybe_trace


def train_wgan(args):
    if not resume_preflight(args):
        return None
    model_dir = check_create_dir(os.path.join(args.model_dir, "wgan"))
    image_dir = check_create_dir(os.path.join(args.output_dir,
                                              "wgan_images"))
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
          f"{dtype.__name__}; critic_iters {args.critic_iters}; "
          f"lambda_gp {args.lambda_gp}")
    device_store = DeviceStore(store, mesh_ctx,
                               shard=getattr(args, "shard_store", False))

    g_model = wgan.Generator(latent_dim=args.latent_dim,
                             num_channels=args.num_channels,
                             feature_maps=args.feature_maps_g,
                             image_size=args.image_size, dtype=dtype)
    c_model = wgan.Critic(num_channels=args.num_channels,
                          feature_maps=args.feature_maps_d,
                          image_size=args.image_size, dtype=dtype)

    # Adam betas (beta1, 0.9) — reference train_wggan.py:53-54.
    g_tx = adam(args.lr, args.beta1, beta2=0.9)
    c_tx = adam(args.lr, args.beta1, beta2=0.9)
    root_key = jax.random.key(args.seed)
    k_g, k_c, k_fix, k_data = jax.random.split(root_key, 4)
    g_state = create_state(g_model, g_tx, k_g,
                           jnp.zeros((2, args.latent_dim)), train=False)
    c_state = create_state(
        c_model, c_tx, k_c,
        jnp.zeros((2, args.image_size, args.image_size, args.num_channels)),
        train=False)
    # --model-parallel N: wide layers shard over the 'model' axis.
    g_state = shard_over_model(mesh_ctx, g_state)
    c_state = shard_over_model(mesh_ctx, c_state)
    if getattr(args, "shard_opt_state", False):  # ZeRO-1 Adam moments
        g_state = shard_opt_state(mesh_ctx, g_state)
        c_state = shard_opt_state(mesh_ctx, c_state)

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
    step_kwargs = dict(latent_dim=args.latent_dim,
                       critic_iters=args.critic_iters,
                       lambda_gp=args.lambda_gp, dtype=dtype,
                       batch_sharding=mesh_ctx.batch_sharding(4),
                       store_take=device_store.take,
                       ema_decay=ema_decay if ema is not None else None,
                       grad_accum=ga)
    step_fn = make_wgan_step(g_model, c_model, g_tx, c_tx, **step_kwargs)
    # K>1: K steps per dispatch; epoch tails use the single-step program.
    k_steps = max(1, int(getattr(args, "steps_per_call", 1) or 1))
    multi_fn = (make_wgan_step(g_model, c_model, g_tx, c_tx,
                               steps_per_call=k_steps, **step_kwargs)
                if k_steps > 1 else None)
    fixed_noise = jax.random.normal(
        k_fix, (args.vis_batch_size, args.latent_dim), jnp.float32)

    def sample_grid(path):
        imgs = g_model.apply(g_state.variables(), fixed_noise, train=False)
        save_image_grid(np.asarray(jax.device_get(minmax_to_u8(imgs))), path,
                        nrow=8)

    history = {"D_losses": [], "G_losses": [], "D_losses_epoch": [],
               "G_losses_epoch": []}
    data_rng = np.random.default_rng(args.seed)
    snap_mgr = SnapshotManager(
        os.path.join(model_dir, "snapshot_last.msgpack"), mesh_ctx,
        async_io=True)  # overlap D2H+write with the next epoch
    snap_template = {"g": g_state, "c": c_state}
    if ema is not None:  # EMA resumes with the run
        snap_template["ema"] = ema
    try:
        states, start_epoch, iters = snap_mgr.try_resume(
            getattr(args, "resume_from", ""), snap_template)
    except (FileNotFoundError, ValueError) as e:
        print(f"Error: {e}")
        return None
    g_state, c_state = states["g"], states["c"]
    ema = states.get("ema", ema)
    # re-apply TP/ZeRO-1 placement after resume (see gan_loop.py)
    g_state = shard_over_model(mesh_ctx, g_state)
    c_state = shard_over_model(mesh_ctx, c_state)
    if getattr(args, "shard_opt_state", False):
        g_state = shard_opt_state(mesh_ctx, g_state)
        c_state = shard_opt_state(mesh_ctx, c_state)
    if ema is not None:
        ema = shard_over_model(mesh_ctx, ema)
    replay_data_rng(len(store), batch_size, data_rng, start_epoch)
    history_path = os.path.join(metrics_dir, "wgan_training_history.json")
    history = resume_history(history_path, history, start_epoch)
    timer = StepTimer()

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
            d_acc, g_acc = [], []

            # Optional XLA profiler capture (first post-compile epoch, or the
            # only epoch on 1-epoch runs); exception-safe via the with-block.
            with maybe_trace(
                    getattr(args, "trace_dir", "")
                    if (getattr(args, "trace_dir", "")
                        and epoch == trace_epoch(start_epoch, args.epochs))
                    else None), \
                    EpochProgress(f"Epoch {epoch + 1}/{args.epochs}",
                                  num_batches,
                                  postfix_fn=wgan_live_postfix) as progress:
                i = 0
                while i < num_batches:
                    chunk = (k_steps if (multi_fn is not None
                                         and i + k_steps <= chunkable) else 1)
                    if chunk > 1:
                        g_state, c_state, ema, (d_losses, g_loss) = \
                            dispatch_with_ema(
                                multi_fn, g_state, c_state, ema,
                                device_store.images,
                                jnp.asarray(batches[i:i + chunk]),
                                jnp.int32(iters), k_data)
                    else:
                        is_tail = (t_mask is not None
                                   and i == num_batches - 1)
                        g_state, c_state, ema, (d_losses, g_loss) = \
                            dispatch_with_ema(
                                step_fn, g_state, c_state, ema,
                                device_store.images, jnp.asarray(batches[i]),
                                jax.random.fold_in(k_data, iters),
                                mask=(jnp.asarray(t_mask) if is_tail
                                      else None))
                    d_acc.append(d_losses)
                    g_acc.append(g_loss)

                    for t in grid_iters(iters, chunk, args.save_interval,
                                        epoch == args.epochs - 1, i,
                                        num_batches):
                        sample_grid(os.path.join(
                            image_dir, f"fake_samples_epoch_{epoch + 1:03d}_"
                                       f"iter_{t:06d}.png"))
                    iters += chunk
                    i += chunk
                    progress.update(i, d_losses)

                # (critic_iters,) per single step, (K, critic_iters) per
                # chunk; flatten in iteration order either way.
                d_ep = np.concatenate([np.asarray(x).reshape(-1)
                                       for x in jax.device_get(d_acc)])
                g_ep = np.concatenate([np.atleast_1d(np.asarray(x))
                                       for x in jax.device_get(g_acc)])
            timer.tick(num_batches)
            history["D_losses"].extend(d_ep.tolist())
            history["G_losses"].extend(g_ep.tolist())
            history["D_losses_epoch"].append(float(d_ep.mean()))
            history["G_losses_epoch"].append(float(g_ep.mean()))
            print(f"Epoch {epoch + 1}/{args.epochs} Summary - "
                  f"Time: {time.time() - t0:.2f}s, "
                  f"Avg Loss_D: {d_ep.mean():.4f}, "
                  f"Avg Loss_G: {g_ep.mean():.4f}, "
                  f"{timer.rate * batch_size:.1f} imgs/s")

            def save_ckpt():
                snap_mgr.save_file(os.path.join(
                    model_dir, f"generator_epoch_{epoch + 1:03d}.msgpack"),
                    g_state.variables())
                snap_mgr.save_file(os.path.join(
                    model_dir, f"discriminator_epoch_{epoch + 1:03d}.msgpack"),
                    c_state.variables())
                snap = {"g": g_state, "c": c_state}
                if ema is not None:
                    snap["ema"] = ema
                snap_mgr.save(snap, epoch + 1, iters)
                # history persists with the snapshot (see gan_loop.py)
                snap_mgr.save_json(history_path, history)

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
    save_variables(os.path.join(model_dir, "generator_final.msgpack"),
                   g_state.variables())
    save_variables(os.path.join(model_dir, "discriminator_final.msgpack"),
                   c_state.variables())
    export_generator_pth(model_dir, "wgan", g_state)
    save_ema_final(model_dir, "wgan", g_state, ema)
    print("Saved final models.")
    write_json(history_path, history)
    plot_wgan_losses(history,
                     os.path.join(figures_dir, "wgan_loss_curve.png"))
    return history
