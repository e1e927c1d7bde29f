#!/usr/bin/env python
"""Trace-backed MXU-gap analysis (VERDICT r1 #8).

Captures a jax.profiler trace of the fused DCGAN-224 train step and the
frozen ResNet-50 step on the real TPU, parses the xplane via
jax.profiler.ProfileData, and aggregates device-plane event time by HLO
category — so "where does the non-MXU half of the step go" is answered
from the device timeline, not from an analytic guess.

Output: one JSON line per workload with total device time, per-category
breakdown (convolution / fusion / copy / reduce / all-others), and the
top-10 individual ops; plus a human table. Findings live in
docs/MXU_NOTES.md.

Usage: python tools/trace_mxu.py [--workload dcgan|resnet|all]
"""
import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


_XSPACE_CACHE = {}


def _load_xspace(path):
    """Deserialize an xplane.pb once per path (analyze() reads both the
    'XLA Ops' and 'Async XLA Ops' lines of the same trace)."""
    if path not in _XSPACE_CACHE:
        with open(path, "rb") as f:
            _XSPACE_CACHE[path] = (
                jax.profiler.ProfileData.from_serialized_xspace(f.read()))
    return _XSPACE_CACHE[path]


def _device_plane_events(trace_dir, which="XLA Ops"):
    """Yield (op_name, dur_ns) from the device plane's serialized-op
    line in the newest xplane.pb under trace_dir.

    The device plane carries several lines: 'Steps' / 'XLA Modules'
    (umbrella spans), 'XLA Ops' (the serialized compute timeline — sums
    to device-busy time), and 'Async XLA Ops' (DMA/copy spans that
    overlap compute; their sum exceeds wall time by design). Only the
    requested line is aggregated; event names carry the full HLO def
    ("%fusion.41 = bf16[...] ...") so the op id is the ' = ' prefix."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    data = _load_xspace(paths[-1])
    for plane in data.planes:
        if not plane.name.startswith("/device:"):
            continue
        for line in plane.lines:
            if line.name != which:
                continue
            for ev in line.events:
                yield ev.name.split(" = ")[0], ev.duration_ns


_CATEGORIES = (
    # NB: must not match %convert_... / %convert_reduce_fusion events
    # (a BN-stat reduce epilogue, not a convolution) — an earlier
    # r"%conv" alternative did, inflating the convolution bucket.
    ("convolution", re.compile(r"convolution|%conv[0-9._-]")),
    ("matmul", re.compile(r"\bdot\b|dot_general|matmul")),
    ("fusion", re.compile(r"fusion")),
    ("copy/transpose", re.compile(r"copy|transpose|reshape|bitcast")),
    ("reduce", re.compile(r"reduce")),
    ("dynamic-slice/update", re.compile(r"dynamic.(update.)?slice|gather|scatter")),
)


def categorize(name):
    low = name.lower()
    for cat, pat in _CATEGORIES:
        if pat.search(low):
            return cat
    return "other"


def _layer_of(op_name_meta):
    """Collapse an XLA metadata op_name to model/layer granularity."""
    if not op_name_meta:
        return "(no-meta)"
    parts = [p for p in op_name_meta.split("/") if p != "jit(step)"]
    out = []
    for p in parts:
        if "Generator" in p or "Discriminator" in p or "ResNet" in p \
                or "Bottleneck" in p:
            out.append(p.split("(")[-1].rstrip(")"))
        elif re.match(r"(Conv|ConvTranspose|TorchBatchNorm|Dense|_ConvBN)"
                      r"_?\w*_\d+", p) or p in ("stem", "fc"):
            out.append(p)
            break
    if out:
        tag = "/".join(out)
        if "transpose(" in op_name_meta:
            tag += " [bwd]"
        return tag
    return parts[-1].split(" ")[0][:44]


def analyze(trace_dir, label, steps, step_flops=None, hlo_text=None):
    per_op = collections.Counter()
    per_cat = collections.Counter()
    per_layer = collections.Counter()
    name2meta = {}
    if hlo_text:
        pat = re.compile(r"^\s+(%[\w.\-]+) = ")
        meta_pat = re.compile(r'op_name="([^"]+)"')
        for ln in hlo_text.splitlines():
            m = pat.match(ln)
            if m:
                mm = meta_pat.search(ln)
                name2meta[m.group(1)] = mm.group(1) if mm else ""
    for name, dur_ns in _device_plane_events(trace_dir):
        # control-flow umbrellas (while/conditional/call) nest their
        # body ops, which the timeline also reports individually —
        # counting both would double the loop body (seen on the WGAN
        # critic lax.scan).
        if re.match(r"%?(while|conditional|call)[.\d]*$", name):
            continue
        per_op[name] += dur_ns
        per_cat[categorize(name)] += dur_ns
        if name2meta:
            key = name if name.startswith("%") else "%" + name
            per_layer[_layer_of(name2meta.get(key, ""))] += dur_ns
    async_ns = sum(d for _, d in _device_plane_events(
        trace_dir, which="Async XLA Ops"))
    total_ns = sum(per_cat.values())
    out = {
        "workload": label,
        "device_time_ms_total": round(total_ns / 1e6, 3),
        "per_step_ms": round(total_ns / 1e6 / max(steps, 1), 3),
        "async_copy_demand_ms_per_step": round(
            async_ns / 1e6 / max(steps, 1), 3),
        "category_pct": {k: round(100.0 * v / max(total_ns, 1), 1)
                         for k, v in per_cat.most_common()},
        "top_ops": [
            {"op": n[:60], "ms_per_step": round(d / 1e6 / steps, 3),
             "pct": round(100.0 * d / max(total_ns, 1), 1)}
            for n, d in per_op.most_common(10)],
    }
    if per_layer:
        out["per_layer_ms_per_step"] = {
            k: round(v / 1e6 / steps, 3)
            for k, v in per_layer.most_common(24)}
    if step_flops is not None and total_ns:
        out["achieved_tflops"] = round(
            step_flops * steps / (total_ns / 1e9) / 1e12, 1)
    print(json.dumps(out), flush=True)
    return out


def _traced_run(run, trace_dir, steps):
    """Warm (compile) then run ``steps`` chained iterations under the
    profiler; run(i) must thread device state via a holder (CLAUDE.md
    dedup pitfall) and return an array to sync on."""
    out = None
    for i in range(2):
        out = run(i)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    with jax.profiler.trace(trace_dir):
        for i in range(2, 2 + steps):
            out = run(i)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))


def run_dcgan(trace_root, steps=8):
    from xgan.models import dcgan
    from xgan.parallel import create_mesh
    from xgan.train.common import adam, create_state
    from xgan.train.gan import make_dcgan_step
    mesh_ctx = create_mesh()
    dtype = jnp.bfloat16
    size, batch = 224, 128
    g_model = dcgan.Generator(latent_dim=100, feature_maps=64,
                              image_size=size, dtype=dtype)
    d_model = dcgan.Discriminator(feature_maps=64, image_size=size,
                                  dtype=dtype)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    k = jax.random.key(0)
    holder = {
        "g": mesh_ctx.replicate(create_state(
            g_model, g_tx, k, jnp.zeros((2, 100)), train=False)),
        "d": mesh_ctx.replicate(create_state(
            d_model, d_tx, k, jnp.zeros((2, size, size, 3)), train=False)),
    }
    step = make_dcgan_step(g_model, d_model, g_tx, d_tx, latent_dim=100,
                           dtype=dtype,
                           batch_sharding=mesh_ctx.batch_sharding(4),
                           donate=False)
    images = mesh_ctx.replicate(jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (512, size, size, 3),
                                          np.uint8)))
    idx = jnp.arange(batch, dtype=jnp.int32) % 512

    # AOT-compile once: the same executable serves the traced run AND the
    # HLO text (lower().compile() after the fact would recompile the
    # whole program a second time).
    compiled = step.lower(holder["g"], holder["d"], images, idx,
                          jax.random.key(1)).compile()

    def run(i):
        holder["g"], holder["d"], metrics = compiled(
            holder["g"], holder["d"], images, idx,
            jax.random.fold_in(jax.random.key(1), i))
        return metrics

    d = os.path.join(trace_root, "dcgan224")
    _traced_run(run, d, steps)
    from tools.roofline import dcgan_d_fwd, dcgan_g_fwd
    flops = (3 * dcgan_g_fwd(size) + 8 * dcgan_d_fwd(size)) * batch
    return analyze(d, "dcgan_train_224px_b128", steps, flops,
                   hlo_text=compiled.as_text())


def run_wgan(trace_root, steps=4):
    from xgan.models import wgan
    from xgan.parallel import create_mesh
    from xgan.train.common import adam, create_state
    from xgan.train.wgan import make_wgan_step
    mesh_ctx = create_mesh()
    dtype = jnp.bfloat16
    size, batch, n_critic = 224, 64, 5
    g_model = wgan.Generator(latent_dim=100, feature_maps=64,
                             image_size=size, dtype=dtype)
    c_model = wgan.Critic(feature_maps=64, image_size=size, dtype=dtype)
    g_tx, c_tx = adam(2e-4, 0.5, 0.9), adam(2e-4, 0.5, 0.9)
    k = jax.random.key(0)
    holder = {
        "g": mesh_ctx.replicate(create_state(
            g_model, g_tx, k, jnp.zeros((2, 100)), train=False)),
        "c": mesh_ctx.replicate(create_state(
            c_model, c_tx, k, jnp.zeros((2, size, size, 3)), train=False)),
    }
    step = make_wgan_step(g_model, c_model, g_tx, c_tx, latent_dim=100,
                          critic_iters=n_critic, lambda_gp=10.0,
                          dtype=dtype,
                          batch_sharding=mesh_ctx.batch_sharding(4),
                          donate=False)
    images = mesh_ctx.replicate(jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (512, size, size, 3),
                                          np.uint8)))
    idx = jnp.arange(batch, dtype=jnp.int32)

    compiled = step.lower(holder["g"], holder["c"], images, idx,
                          jax.random.key(1)).compile()

    def run(i):
        holder["g"], holder["c"], _, g_loss = compiled(
            holder["g"], holder["c"], images, idx,
            jax.random.fold_in(jax.random.key(1), i))
        return g_loss

    d = os.path.join(trace_root, "wgan224")
    _traced_run(run, d, steps)
    hlo = compiled.as_text()
    from tools.roofline import wgan_c_fwd, wgan_g_fwd
    g, c = wgan_g_fwd(size), wgan_c_fwd(size)
    flops = (n_critic * (3 * g / n_critic + (2 * 3 + 3 * 3) * c)
             + 3 * g) * batch
    return analyze(d, "wgan_gp_train_224px_b64", steps, flops,
                   hlo_text=hlo)


def run_dcgan64_multistep(trace_root, chunks=3, k=8):
    """The bench.py headline config: DCGAN-64 b128, --steps-per-call 8.

    The scan body's ops are reported individually in the XLA Ops line
    (the %while umbrella is excluded by analyze), so dividing by
    chunks*k yields true per-train-step time."""
    from xgan.models import dcgan
    from xgan.parallel import create_mesh
    from xgan.train.common import adam, create_state
    from xgan.train.gan import make_dcgan_step
    mesh_ctx = create_mesh()
    dtype = jnp.bfloat16
    size, batch = 64, 128
    g_model = dcgan.Generator(latent_dim=100, feature_maps=64,
                              image_size=size, dtype=dtype)
    d_model = dcgan.Discriminator(feature_maps=64, image_size=size,
                                  dtype=dtype)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    key = jax.random.key(0)
    holder = {
        "g": mesh_ctx.replicate(create_state(
            g_model, g_tx, key, jnp.zeros((2, 100)), train=False)),
        "d": mesh_ctx.replicate(create_state(
            d_model, d_tx, key, jnp.zeros((2, size, size, 3)),
            train=False)),
    }
    step = make_dcgan_step(g_model, d_model, g_tx, d_tx, latent_dim=100,
                           dtype=dtype,
                           batch_sharding=mesh_ctx.batch_sharding(4),
                           donate=False, steps_per_call=k)
    images = mesh_ctx.replicate(jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2048, size, size, 3),
                                          np.uint8)))
    rng = np.random.default_rng(5)
    compiled = step.lower(holder["g"], holder["d"], images,
                          jnp.zeros((k, batch), jnp.int32), jnp.int32(0),
                          jax.random.key(1)).compile()

    def run(i):
        idx_chunk = jnp.asarray(
            rng.integers(0, 2048, (k, batch), np.int64).astype(np.int32))
        holder["g"], holder["d"], metrics = compiled(
            holder["g"], holder["d"], images, idx_chunk,
            jnp.int32(i * k), jax.random.key(1))
        return metrics

    d = os.path.join(trace_root, "dcgan64k8")
    _traced_run(run, d, chunks)
    hlo = compiled.as_text()
    from tools.roofline import dcgan_d_fwd, dcgan_g_fwd
    flops = (3 * dcgan_g_fwd(size) + 8 * dcgan_d_fwd(size)) * batch
    return analyze(d, "dcgan_train_64px_b128_k8", chunks * k, flops,
                   hlo_text=hlo)


def run_cgan(trace_root, steps=6):
    """CGAN 224px b32 (reference config): G upsample-conv ladder +
    projection D + VGG16 perceptual + feature matching, one fused step.
    FLOPs come from the compiled program's own cost_analysis() (no
    hand model for the VGG/FM multiplicities in tools/roofline.py)."""
    from xgan.models import cgan
    from xgan.models.vgg import VGG16Features
    from xgan.parallel import create_mesh
    from xgan.train.cgan import make_cgan_step
    from xgan.train.common import adam, create_state
    mesh_ctx = create_mesh()
    dtype = jnp.bfloat16
    size, batch = 224, 32
    g_model = cgan.Generator(latent_dim=100, feature_maps=32,
                             image_size=size, dtype=dtype)
    d_model = cgan.Discriminator(feature_maps=32, image_size=size,
                                 dtype=dtype)
    vgg = VGG16Features(dtype=dtype)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    key = jax.random.key(0)
    lab = jnp.zeros((2,), jnp.int32)
    holder = {
        "g": mesh_ctx.replicate(create_state(
            g_model, g_tx, key, jnp.zeros((2, 100)), lab, train=False)),
        "d": mesh_ctx.replicate(create_state(
            d_model, d_tx, key, jnp.zeros((2, size, size, 3)), lab,
            train=False)),
    }
    vgg_params = mesh_ctx.replicate(
        vgg.init(key, jnp.zeros((1, size, size, 3)))["params"])
    step = make_cgan_step(g_model, d_model, vgg, g_tx, d_tx,
                          latent_dim=100, dtype=dtype,
                          batch_sharding=mesh_ctx.batch_sharding(4),
                          donate=False)
    images = mesh_ctx.replicate(jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (256, size, size, 3),
                                          np.uint8)))
    labels = mesh_ctx.replicate(jnp.asarray(
        (np.arange(256) % 2).astype(np.int32)))
    idx = jnp.arange(batch, dtype=jnp.int32)

    compiled = step.lower(holder["g"], holder["d"], vgg_params, images,
                          labels, idx, jnp.int32(0),
                          jax.random.key(1)).compile()

    def run(i):
        holder["g"], holder["d"], metrics = compiled(
            holder["g"], holder["d"], vgg_params, images, labels, idx,
            jnp.int32(0), jax.random.fold_in(jax.random.key(1), i))
        return metrics

    d = os.path.join(trace_root, "cgan224")
    _traced_run(run, d, steps)
    hlo = compiled.as_text()
    ca = compiled.cost_analysis() or {}
    flops = float(ca.get("flops", 0.0)) or None
    return analyze(d, "cgan_train_224px_b32", steps, flops, hlo_text=hlo)


def run_resnet(trace_root, steps=8, frozen=True):
    from xgan.models.resnet import ResNet50
    from xgan.parallel import create_mesh
    from xgan.train.classifier import classifier_optimizer, make_train_step
    from xgan.train.common import ModelState
    mesh_ctx = create_mesh()
    dtype = jnp.bfloat16
    size, batch = 224, 128
    model = ResNet50(num_classes=2, dtype=dtype)
    tx = classifier_optimizer(1e-3, freeze_base=frozen)
    k = jax.random.key(0)
    v = model.init(k, jnp.zeros((2, size, size, 3)), train=False)
    holder = {"state": mesh_ctx.replicate(ModelState(
        params=v["params"], batch_stats=v["batch_stats"],
        opt_state=tx.init(v["params"])))}
    step = make_train_step(model, tx, mode="real", dtype=dtype,
                           batch_sharding=mesh_ctx.batch_sharding(4))
    images = mesh_ctx.replicate(jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (512, size, size, 3),
                                          np.uint8)))
    labels = mesh_ctx.replicate(jnp.asarray(
        (np.arange(512) % 2).astype(np.int32)))
    dummy = mesh_ctx.replicate(jnp.zeros((1, size, size, 3), jnp.uint8))
    dummy_l = mesh_ctx.replicate(jnp.ones((1,), jnp.int32))
    idx = jnp.arange(batch, dtype=jnp.int32)

    compiled = step.lower(holder["state"], images, labels, dummy, dummy_l,
                          idx, jnp.float32(0.0),
                          jax.random.key(1)).compile()

    def run(i):
        holder["state"], losses, _, _ = compiled(
            holder["state"], images, labels, dummy, dummy_l, idx,
            jnp.float32(0.0), jax.random.fold_in(jax.random.key(1), i))
        return losses

    tag = "frozen" if frozen else "unfrozen"
    d = os.path.join(trace_root, f"resnet224_{tag}")
    _traced_run(run, d, steps)
    hlo = compiled.as_text()
    from tools.roofline import resnet50_fwd
    mult = 1.05 if frozen else 3.0
    flops = resnet50_fwd(size) * mult * batch
    return analyze(d, f"resnet50_{tag}_224px_b128", steps, flops,
                   hlo_text=hlo)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workload", default="all",
                   choices=["dcgan", "dcgan64k8", "cgan", "resnet",
                            "resnet-unfrozen", "wgan", "all"])
    p.add_argument("--trace-root", default=None)
    args = p.parse_args()
    root = args.trace_root or tempfile.mkdtemp(prefix="xgan_trace_")
    print(f"traces -> {root}", flush=True)
    if args.workload in ("dcgan", "all"):
        run_dcgan(root)
    if args.workload in ("dcgan64k8", "all"):
        run_dcgan64_multistep(root)
    if args.workload in ("cgan", "all"):
        run_cgan(root)
    if args.workload in ("resnet", "all"):
        run_resnet(root)
    if args.workload in ("resnet-unfrozen", "all"):
        run_resnet(root, frozen=False)
    if args.workload in ("wgan", "all"):
        run_wgan(root)


if __name__ == "__main__":
    main()
