#!/usr/bin/env python
"""Full benchmark table -> BENCH_DETAIL.json (bench.py prints only the
headline DCGAN number for the driver).

Covers the BASELINE.json metric set: DCGAN train steps/sec + imgs/sec
(64px and the reference's 224px), WGAN-GP fused step (critic_iters=5),
CGAN step, ResNet-50 train imgs/sec/chip (frozen-base, batch 32 + 128),
and sharded generator inference imgs/sec (device-side and end-to-end with
native PNG encode).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    """Chain-slope timing with device_get as the true sync.

    Every bench fn threads its states (dependency chain), so timing two
    chain lengths and taking the slope yields the per-step cost free of
    the remote tunnel's dispatch/sync overhead; block_until_ready is not
    a reliable sync on this backend (CLAUDE.md).
    """
    def chain(n):
        out = None
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.device_get(out))
        return time.time() - t0

    chain(warmup)  # compile + warm
    n_short, n_long = 3, 3 + iters
    # Median of 3 slopes: single-slope estimates can go negative under
    # the remote tunnel's run-to-run variance (seen on the CGAN step).
    slopes = []
    for _ in range(3):
        t_short = chain(n_short)
        t_long = chain(n_long)
        slopes.append((t_long - t_short) / (n_long - n_short))
    good = sorted(s for s in slopes if s > 0)
    if not good:
        # silently recording batch/1e-9 would be indistinguishable from
        # a measurement; fail the task loudly instead (main() records
        # the error for the key and keeps the prior value)
        raise RuntimeError(
            f"all chain slopes non-positive ({slopes}); tunnel variance "
            "swamped the measurement — rerun")
    # median of the positive slopes; with exactly two left (one negative
    # variance artifact), average them rather than picking an extreme
    return good[1] if len(good) == 3 else sum(good) / len(good)


def bench_dcgan(mesh_ctx, dtype, size, batch, steps_per_call=1):
    from xgan.models import dcgan
    from xgan.train.common import adam, create_state
    from xgan.train.gan import make_dcgan_step
    g_model = dcgan.Generator(latent_dim=100, feature_maps=64,
                              image_size=size, dtype=dtype)
    d_model = dcgan.Discriminator(feature_maps=64, image_size=size,
                                  dtype=dtype)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    k = jax.random.key(0)
    g_state = mesh_ctx.replicate(create_state(
        g_model, g_tx, k, jnp.zeros((2, 100)), train=False))
    d_state = mesh_ctx.replicate(create_state(
        d_model, d_tx, k, jnp.zeros((2, size, size, 3)), train=False))
    step = make_dcgan_step(g_model, d_model, g_tx, d_tx, latent_dim=100,
                           dtype=dtype,
                           batch_sharding=mesh_ctx.batch_sharding(4),
                           donate=False, steps_per_call=steps_per_call)
    n_store = 2048 if size <= 64 else 512
    images = mesh_ctx.replicate(jnp.asarray(np.random.default_rng(0)
                                            .integers(0, 255,
                                                      (n_store, size, size,
                                                       3), np.uint8)))
    idx = jnp.arange(batch, dtype=jnp.int32) % n_store
    rng = np.random.default_rng(5)
    holder = {"g": g_state, "d": d_state, "i": 0}

    def run(_):
        holder["i"] += 1
        if steps_per_call > 1:
            # distinct rows per scanned step: identical rows would let
            # XLA hoist the gather out of the scan
            idx_chunk = jnp.asarray(
                rng.integers(0, n_store, (steps_per_call, batch), np.int64)
                .astype(np.int32))
            holder["g"], holder["d"], metrics = step(
                holder["g"], holder["d"], images, idx_chunk,
                jnp.int32(holder["i"] * steps_per_call), jax.random.key(1))
        else:
            holder["g"], holder["d"], metrics = step(
                holder["g"], holder["d"], images, idx,
                jax.random.fold_in(jax.random.key(1), holder["i"]))
        return metrics
    dt = timeit(run, 0, iters=20) / steps_per_call
    out = {"sec_per_step": dt, "imgs_per_sec": batch / dt}
    if steps_per_call > 1:
        out["steps_per_call"] = steps_per_call
    return out


def bench_wgan(mesh_ctx, dtype, size, batch, critic_iters=5):
    from xgan.models import wgan
    from xgan.train.common import adam, create_state
    from xgan.train.wgan import make_wgan_step
    g_model = wgan.Generator(latent_dim=100, feature_maps=64,
                             image_size=size, dtype=dtype)
    c_model = wgan.Critic(feature_maps=64, image_size=size, dtype=dtype)
    g_tx, c_tx = adam(2e-4, 0.5, 0.9), adam(2e-4, 0.5, 0.9)
    k = jax.random.key(0)
    g_state = mesh_ctx.replicate(create_state(
        g_model, g_tx, k, jnp.zeros((2, 100)), train=False))
    c_state = mesh_ctx.replicate(create_state(
        c_model, c_tx, k, jnp.zeros((2, size, size, 3)), train=False))
    step = make_wgan_step(g_model, c_model, g_tx, c_tx, latent_dim=100,
                          critic_iters=critic_iters, lambda_gp=10.0,
                          dtype=dtype,
                          batch_sharding=mesh_ctx.batch_sharding(4),
                          donate=False)
    images = mesh_ctx.replicate(jnp.asarray(np.random.default_rng(0)
                                            .integers(0, 255,
                                                      (512, size, size, 3),
                                                      np.uint8)))
    idx = jnp.arange(batch, dtype=jnp.int32)
    holder = {"g": g_state, "c": c_state, "i": 0}

    def run(_):
        holder["i"] += 1
        holder["g"], holder["c"], _, g_loss = step(
            holder["g"], holder["c"], images, idx,
            jax.random.fold_in(jax.random.key(1), holder["i"]))
        return g_loss
    dt = timeit(run, 0, iters=10)
    return {"sec_per_step": dt, "imgs_per_sec": batch / dt,
            "critic_iters": critic_iters}


def bench_cgan(mesh_ctx, dtype, size, batch):
    from xgan.models import cgan
    from xgan.models.vgg import VGG16Features
    from xgan.train.cgan import make_cgan_step
    from xgan.train.common import adam, create_state
    g_model = cgan.Generator(latent_dim=100, feature_maps=32,
                             image_size=size, dtype=dtype)
    d_model = cgan.Discriminator(feature_maps=32, image_size=size,
                                 dtype=dtype)
    vgg = VGG16Features(dtype=dtype)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    k = jax.random.key(0)
    lab = jnp.zeros((2,), jnp.int32)
    g_state = mesh_ctx.replicate(create_state(
        g_model, g_tx, k, jnp.zeros((2, 100)), lab, train=False))
    d_state = mesh_ctx.replicate(create_state(
        d_model, d_tx, k, jnp.zeros((2, size, size, 3)), lab, train=False))
    vgg_params = mesh_ctx.replicate(
        vgg.init(k, jnp.zeros((1, size, size, 3)))["params"])
    step = make_cgan_step(g_model, d_model, vgg, g_tx, d_tx,
                          latent_dim=100, dtype=dtype,
                          batch_sharding=mesh_ctx.batch_sharding(4),
                          donate=False)
    images = mesh_ctx.replicate(jnp.asarray(np.random.default_rng(0)
                                            .integers(0, 255,
                                                      (512, size, size, 3),
                                                      np.uint8)))
    labels = mesh_ctx.replicate(jnp.asarray(
        (np.arange(512) % 2).astype(np.int32)))
    idx = jnp.arange(batch, dtype=jnp.int32)
    holder = {"g": g_state, "d": d_state, "i": 0}

    def run(_):
        holder["i"] += 1
        holder["g"], holder["d"], metrics = step(
            holder["g"], holder["d"], vgg_params, images, labels, idx,
            jnp.int32(0), jax.random.fold_in(jax.random.key(1),
                                             holder["i"]))
        return metrics
    dt = timeit(run, 0, iters=10)
    return {"sec_per_step": dt, "imgs_per_sec": batch / dt}


def bench_resnet(mesh_ctx, dtype, size, batch, freeze=True):
    from xgan.models.resnet import ResNet50
    from xgan.train.classifier import classifier_optimizer, make_train_step
    from xgan.train.common import ModelState
    model = ResNet50(num_classes=2, dtype=dtype)
    tx = classifier_optimizer(1e-3, freeze_base=freeze)
    k = jax.random.key(0)
    v = model.init(k, jnp.zeros((2, size, size, 3)), train=False)
    state = mesh_ctx.replicate(ModelState(
        params=v["params"], batch_stats=v["batch_stats"],
        opt_state=tx.init(v["params"])))
    step = make_train_step(model, tx, mode="real", dtype=dtype,
                           batch_sharding=mesh_ctx.batch_sharding(4))
    images = mesh_ctx.replicate(jnp.asarray(np.random.default_rng(0)
                                            .integers(0, 255,
                                                      (512, size, size, 3),
                                                      np.uint8)))
    labels = mesh_ctx.replicate(jnp.asarray(
        (np.arange(512) % 2).astype(np.int32)))
    dummy = mesh_ctx.replicate(jnp.zeros((1, size, size, 3), jnp.uint8))
    dummy_l = mesh_ctx.replicate(jnp.ones((1,), jnp.int32))
    idx = jnp.arange(batch, dtype=jnp.int32)
    holder = {"state": state}

    def run(i):
        holder["state"], losses, _, _ = step(
            holder["state"], images, labels, dummy, dummy_l, idx,
            jnp.float32(0.0), jax.random.fold_in(jax.random.key(1), i))
        return losses
    dt = timeit(run, 0, iters=10)
    return {"sec_per_step": dt, "imgs_per_sec": batch / dt,
            "frozen_base": freeze}


def bench_sampler(mesh_ctx, dtype, size, batch, out_dir):
    """Three rates (VERDICT r1 #7): pure device compute (chain-slope on
    the jitted sampler), device+transfer (the sampler's own overlap-loop
    rate), and end-to-end incl. native PNG encode+write. On this
    environment the latter two are bound by the ~2 MB/s tunnel relay, not
    the design (CLAUDE.md perf findings)."""
    from xgan.data.pipeline import tanh_to_u8
    from xgan.models import dcgan
    from xgan.train.sample import generate_images
    model = dcgan.Generator(latent_dim=100, feature_maps=64,
                            image_size=size, dtype=dtype)
    variables = model.init(jax.random.key(0), jnp.zeros((2, 100)),
                           train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    os.makedirs(out_dir, exist_ok=True)

    # pure device-compute rate: same program the sampler jits
    vs = mesh_ctx.replicate(variables)
    zspec = jax.sharding.NamedSharding(
        mesh_ctx.mesh, jax.sharding.PartitionSpec("data", None))

    @jax.jit
    def sample(vs, key, bump):
        z = jax.random.normal(key, (batch, 100), jnp.float32) + bump
        z = jax.lax.with_sharding_constraint(z, zspec)
        img = tanh_to_u8(model.apply(vs, z, train=False))
        # carry a reduction of the output so successive calls form a
        # true dependency chain (CLAUDE.md dedup/overlap pitfall)
        return img, jnp.sum(img.astype(jnp.float32)) * 1e-30

    holder = {"i": 0, "bump": jnp.float32(0.0)}

    def run(_):
        holder["i"] += 1
        img, holder["bump"] = sample(
            vs, jax.random.fold_in(jax.random.key(2), holder["i"]),
            holder["bump"])
        return img
    dt = timeit(run, 0, iters=10)
    out = {"device_compute_imgs_per_sec": batch / dt}

    # warm-up covers the jit compile so the timed run is steady-state;
    # the timed run uses a DIFFERENT seed — its step 0 would otherwise
    # byte-identically replay the warm-up dispatch, which the runtime
    # can dedup-serve (CLAUDE.md benchmarking pitfalls), gifting ~1/8
    # of the batches for free
    generate_images(model, variables, output_dir=out_dir,
                    num_images=batch, latent_dim=100, batch_size=batch,
                    seed=0)
    n = 2048
    stats = {}
    t0 = time.time()
    generate_images(model, variables, output_dir=out_dir, num_images=n,
                    latent_dim=100, batch_size=batch, seed=1, stats=stats)
    dt = time.time() - t0
    out.update({"num_images": n, "end_to_end_imgs_per_sec": n / dt,
                "device_plus_transfer_imgs_per_sec":
                    stats.get("device_plus_transfer_imgs_per_sec")})
    return out


def bench_exported_classifier(dtype, size, batch, quantize=False):
    """Serving rate of the StableHLO export artifact
    (src/export_model.py): deserialize, wrap .call in jit, and
    chain-slope-time uint8-batch inference — the number a deployment of
    the self-contained artifact gets, model code not loaded. With
    ``quantize``, the int8 weight-only artifact (--quantize int8)."""
    from jax import export as jexport

    from xgan.io_.export import export_classifier
    from xgan.models.resnet import ResNet50

    model = ResNet50(num_classes=2, dtype=dtype)
    v = model.init(jax.random.key(0), jnp.zeros((2, size, size, 3)),
                   train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    if quantize:
        from xgan.io_.quant import quantize_params
        v = dict(v, params=quantize_params(v["params"]))
    blob = export_classifier(model, v, size)
    art = jexport.deserialize(blob)
    images = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (512, size, size, 3), np.uint8))

    @jax.jit
    def step(idx_base):
        idx = (jnp.arange(batch, dtype=jnp.int32) + idx_base) % 512
        labels, probs = art.call(jnp.take(images, idx, axis=0))
        # fold an output value into the next call's input indices so
        # successive calls form a true dependency chain (dedup pitfall)
        return labels, idx_base + 1 + labels[0]

    holder = {"c": jnp.int32(0)}

    def run(_):
        labels, holder["c"] = step(holder["c"])
        return labels
    dt = timeit(run, 0, iters=10)
    return {"sec_per_batch": dt, "imgs_per_sec": batch / dt,
            "batch": batch, "artifact_mb": round(len(blob) / 1e6, 1)}


def bench_sharded_sampling_cpu8():
    """Sharded sampling on the 8-virtual-device CPU mesh in a subprocess
    (this process is pinned to the TPU backend): correctness (PNG count)
    plus the scaling shape of the sharded program (VERDICT r1 #7)."""
    import subprocess
    import sys as _sys
    script = r"""
import os, json, time, tempfile
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags +
        " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from xgan.models import dcgan
from xgan.train.sample import generate_images
model = dcgan.Generator(latent_dim=16, feature_maps=8, image_size=64)
v = model.init(jax.random.key(0), jnp.zeros((2, 16)), train=False)
v = {"params": v["params"], "batch_stats": v["batch_stats"]}
out = tempfile.mkdtemp()
stats = {}
n = generate_images(model, v, output_dir=out, num_images=64,
                    latent_dim=16, batch_size=64, seed=0, stats=stats)
import glob
pngs = len(glob.glob(os.path.join(out, "*.png")))
print(json.dumps({"n_devices": jax.device_count(),
                  "images_written": pngs,
                  "device_plus_transfer_imgs_per_sec":
                      stats["device_plus_transfer_imgs_per_sec"],
                  "ok": pngs == 64}))
"""
    r = subprocess.run([_sys.executable, "-c", script],
                       capture_output=True, text=True, timeout=600,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    if r.returncode != 0:
        return {"ok": False, "error": r.stderr[-500:]}
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    import argparse
    from xgan.parallel import create_mesh
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated result keys to (re)measure; "
                         "others keep their existing BENCH_DETAIL values")
    args = ap.parse_args()
    backend = jax.default_backend()
    dtype = jnp.float32 if backend == "cpu" else jnp.bfloat16
    mesh_ctx = create_mesh()
    results = {"backend": backend, "mesh": dict(mesh_ctx.mesh.shape),
               "dtype": dtype.__name__}

    tasks = [
        ("dcgan_train_64px_b128", "DCGAN 64px batch 128",
         lambda: bench_dcgan(mesh_ctx, dtype, 64, 128)),
        ("dcgan_train_64px_b128_k8",
         "DCGAN 64px batch 128, --steps-per-call 8",
         lambda: bench_dcgan(mesh_ctx, dtype, 64, 128, steps_per_call=8)),
        ("dcgan_train_64px_b256_k8",
         "DCGAN 64px batch 256, --steps-per-call 8 (scaling headroom)",
         lambda: bench_dcgan(mesh_ctx, dtype, 64, 256, steps_per_call=8)),
        ("dcgan_train_224px_b128", "DCGAN 224px batch 128 (reference)",
         lambda: bench_dcgan(mesh_ctx, dtype, 224, 128)),
        ("wgan_gp_train_224px_b64", "WGAN-GP 224px batch 64, 5 critic iters",
         lambda: bench_wgan(mesh_ctx, dtype, 224, 64)),
        ("cgan_train_224px_b32", "CGAN 224px batch 32",
         lambda: bench_cgan(mesh_ctx, dtype, 224, 32)),
        ("resnet50_train_224px_b32", "ResNet-50 224px b32 (frozen)",
         lambda: bench_resnet(mesh_ctx, dtype, 224, 32)),
        ("resnet50_train_224px_b128", "ResNet-50 224px b128 (frozen)",
         lambda: bench_resnet(mesh_ctx, dtype, 224, 128)),
        ("resnet50_train_224px_b128_unfrozen",
         "ResNet-50 224px b128 (unfrozen)",
         lambda: bench_resnet(mesh_ctx, dtype, 224, 128, freeze=False)),
        ("generate_synthetic_224px", "Sampler 224px b256 end-to-end",
         lambda: bench_sampler(mesh_ctx, dtype, 224, 256,
                               "/tmp/bench_sampler_out")),
        ("sharded_sampling_cpu8", "Sharded sampling, 8-device CPU mesh",
         lambda: bench_sharded_sampling_cpu8()),
        ("exported_resnet50_infer_224px_b128",
         "Exported StableHLO classifier artifact, 224px b128 inference",
         lambda: bench_exported_classifier(dtype, 224, 128)),
        ("exported_resnet50_infer_224px_b128_f32",
         "Same artifact in f32: the A/B for the inference CLIs' "
         "--compute-dtype default (auto->bf16 on TPU)",
         lambda: bench_exported_classifier(jnp.float32, 224, 128)),
        ("exported_resnet50_infer_224px_b128_int8w",
         "Same artifact with int8 weight-only quantization "
         "(--quantize int8): the throughput side of the ~4x artifact "
         "size reduction A/B",
         lambda: bench_exported_classifier(dtype, 224, 128,
                                           quantize=True)),
    ]
    only = set(args.only.split(",")) if args.only else None
    if only is not None:
        known = {key for key, _, _ in tasks}
        unknown = only - known
        if unknown:
            raise SystemExit(f"--only: unknown keys {sorted(unknown)}; "
                             f"valid: {sorted(known)}")
    for key, desc, fn in tasks:
        if only is not None and key not in only:
            continue
        print(f"{desc}...")
        try:
            results[key] = fn()
        except Exception as e:
            # keep the prior BENCH_DETAIL value for this key (merge step
            # below only overwrites measured keys) and record the failure
            print(f"FAILED {key}: {e}")
            results.pop(key, None)
            continue
        print(results[key])

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAIL.json")
    merged = {}
    if os.path.exists(out):
        # keep entries other tools recorded (phase A/B, kernel
        # rejections) — only refresh the keys this run measured.
        with open(out) as f:
            merged = json.load(f)
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
