"""Shared CLI flag definitions.

The reference re-declares overlapping argparse flags in every script with
per-script defaults (SURVEY.md §1); here one module owns the definitions and
each entry point picks its defaults, keeping the exact flag names and
default values of the corresponding reference script
(train_gan.py:213-249, train_cgan.py:249-274, train_wggan.py:126-155,
train_classifier.py:697-747, generate_synthetic*.py, analyze_results.py).

TPU-native extra flags (accepted by every trainer):
  --image-size      spatial size (default 224 = reference; 64 for the
                    BASELINE.json CPU-runnable bench config)
  --seed            deterministic PRNG seed (the reference is unseeded)
  --compute-dtype   auto|bf16|f32 (auto: bf16 on TPU, f32 on CPU)
  --cache-dir       decode-once uint8 store cache
  --limit-batches   cap batches/epoch (smoke tests)
  --steps-per-call  K>1 fuses K train steps into one lax.scan dispatch
                    (GAN trainers; amortizes per-step dispatch overhead)
"""
from __future__ import annotations

import argparse


def _ema_decay(value: str) -> float:
    """Range-checked --ema-decay: the EMA lerp e*d + (1-d)*p diverges
    for d outside [0, 1), and because the EMA tree is write-only the
    run would LOOK healthy for hours — only the final EMA checkpoint
    would come out inf/garbage. Fail the typo at parse time."""
    f = float(value)
    if not 0.0 <= f < 1.0:
        raise argparse.ArgumentTypeError(
            f"--ema-decay must be in [0, 1) (e.g. 0.999); got {value}")
    return f


def add_compute_dtype_arg(p: argparse.ArgumentParser):
    """For inference-only CLIs (samplers, predict, serve, export): the
    compute dtype the trainers get via add_tpu_args. Without it these
    paths ran fp32 on TPU — roughly half the MXU rate for free."""
    p.add_argument("--compute-dtype", type=str, default="auto",
                   choices=["auto", "bf16", "f32"],
                   help="auto: bf16 on TPU, f32 on CPU")


def resolve_dtype(name: str):
    """Map a --compute-dtype value to a jnp dtype ('auto' resolves per
    backend). Lives here, not in a trainer module, so inference CLIs can
    resolve it without importing the training stack."""
    import jax
    import jax.numpy as jnp
    if name == "auto":
        return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    return {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
            "f32": jnp.float32, "float32": jnp.float32}[name]


def add_path_args(p: argparse.ArgumentParser):
    p.add_argument("--data-dir", type=str, default="./data/processed",
                   help="Path to the processed dataset directory")
    p.add_argument("--model-dir", type=str, default="./models",
                   help="Base directory to save model checkpoints")
    p.add_argument("--output-dir", type=str, default="./results",
                   help="Base directory for outputs")
    p.add_argument("--results-dir", type=str, default="./results/metrics",
                   help="Directory to save training history JSON")
    p.add_argument("--figures-dir", type=str, default="./results/figures",
                   help="Directory to save generated plot images")


def add_gan_model_args(p: argparse.ArgumentParser, fm_default: int = 64):
    p.add_argument("--num-channels", type=int, default=3)
    p.add_argument("--latent-dim", type=int, default=100)
    p.add_argument("--feature-maps-g", type=int, default=fm_default)
    p.add_argument("--feature-maps-d", type=int, default=fm_default)


def add_gan_train_args(p: argparse.ArgumentParser, *, epochs: int,
                       batch_size: int, vis_batch_size: int = 64,
                       save_interval: int = 500,
                       checkpoint_interval: int = 10):
    p.add_argument("--epochs", type=int, default=epochs)
    p.add_argument("--batch-size", type=int, default=batch_size)
    p.add_argument("--lr", type=float, default=0.0002)
    p.add_argument("--beta1", type=float, default=0.5)
    p.add_argument("--workers", type=int, default=4,
                   help="(compat) host decode workers for the one-time "
                        "store build; steady state is on-device")
    p.add_argument("--vis-batch-size", type=int, default=vis_batch_size)
    p.add_argument("--save-interval", type=int, default=save_interval)
    p.add_argument("--checkpoint-interval", type=int,
                   default=checkpoint_interval)
    p.add_argument("--grad-accum", type=int, default=1,
                   help="Split every D/critic and G update into K "
                        "sequential microbatches inside the one program: "
                        "gradients accumulate, one optimizer update "
                        "fires per update, and only one microbatch's "
                        "activations are live (~K× activation-memory "
                        "reduction — the effective-batch lever for "
                        "batches past the fused step's HBM ceiling; for "
                        "WGAN-GP this covers the GP double-backward, "
                        "the most memory-hungry backward in the repo). "
                        "BN batch statistics are per-microbatch (torch "
                        "accumulation semantics). Must divide the batch "
                        "size.")
    p.add_argument("--ema-decay", type=_ema_decay, default=0.0,
                   help="Keep an exponential moving average of the "
                        "generator weights (e.g. 0.999) and save it as "
                        "generator_ema_final.msgpack/.pth next to the "
                        "raw finals — the standard GAN sample-quality "
                        "lever; the lerp fuses into the jitted step. "
                        "0 disables (default; training math is "
                        "identical either way)")


def add_tpu_args(p: argparse.ArgumentParser):
    p.add_argument("--image-size", type=int, default=224,
                   help="Image size (multiple of 32; 224 = reference)")
    p.add_argument("--seed", type=int, default=0)
    add_compute_dtype_arg(p)
    p.add_argument("--cache-dir", type=str, default="./data/cache")
    p.add_argument("--limit-batches", type=int, default=0,
                   help="Debug: cap batches per epoch (0 = all)")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="Fuse K training steps into one dispatched "
                        "lax.scan program (K=1 reproduces the reference "
                        "loop exactly; K>1 amortizes per-step dispatch "
                        "overhead, with sample-sheet emission quantized "
                        "to chunk boundaries)")
    p.add_argument("--trace-dir", type=str, default="",
                   help="Write a jax.profiler trace of one epoch here")
    p.add_argument("--shard-store", action="store_true",
                   help="Row-shard the uint8 image store(s) across ALL "
                        "mesh devices (each chip holds 1/N of the "
                        "dataset; batches assemble via one on-ICI "
                        "all-reduce per step) — the HBM lever for "
                        "datasets that outgrow replication. Classifier: "
                        "real+test stores shard, synthetic stays "
                        "replicated; disables the Pallas mixed gather.")
    p.add_argument("--shard-opt-state", action="store_true",
                   help="ZeRO-1: shard the wide layers' Adam moments "
                        "across ALL mesh devices (each chip keeps 1/N "
                        "of the optimizer state; math unchanged — the "
                        "update slices the all-reduced gradient locally "
                        "and all-gathers the delta)")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="Shard the widest layers' params/moments/BN stats "
                        "N-ways over the mesh's 'model' axis (tensor "
                        "parallelism; devices/N become the data axis). "
                        "1 = replicated params (default; fastest at "
                        "ResNet-50/DCGAN scale — TP is a memory-ceiling "
                        "capability, not a speedup here)")
    p.add_argument("--resume-from", type=str, default="",
                   help="Resume from a snapshot_last.msgpack ('auto' = "
                        "pick up the run's own last snapshot)")
    p.add_argument("--cpu", action="store_true",
                   help="Force CPU even if a TPU is available")


def apply_device_flag(args):
    """Honor --cpu before the first jax backend use."""
    import jax
    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")


def print_args(args):
    print("--- Training Arguments ---")
    for k, v in sorted(vars(args).items()):
        print(f"  {k}: {v}")
    print("-------------------------")
