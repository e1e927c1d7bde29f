"""Import torchvision checkpoints (.pth state dicts) into our flax pytrees.

The reference relies on torchvision's ImageNet weights downloaded at runtime
(reference src/classifier.py:17, src/train_cgan.py:60). This environment has
no network egress, so pretrained weights are an *optional input file*: pass
``--pretrained-path`` pointing at a torchvision ``resnet50`` / ``vgg16``
state dict and it is converted on the fly (OIHW -> HWIO, fc transposed).
Without a file the models run with their native initializers and the
trainers print a clear warning (quality numbers will differ from the
reference, throughput will not).
"""
from __future__ import annotations

import numpy as np


def _load_state_dict(path: str):
    import torch  # CPU torch is available in this image; used only as a .pth reader
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def _conv(sd, name):
    # torch OIHW -> flax HWIO
    return np.transpose(sd[name], (2, 3, 1, 0))


def _bn(sd, prefix):
    return (
        {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
        {"mean": sd[f"{prefix}.running_mean"],
         "var": sd[f"{prefix}.running_var"]},
    )


def load_torch_resnet50(path: str, num_classes: int = 2,
                        stage_sizes=(3, 4, 6, 3)):
    """Returns (params, batch_stats) pytrees matching xgan.models.ResNet50.

    The checkpoint fc (1000-way ImageNet head) is dropped; the caller keeps
    its freshly initialized ``fc`` for ``num_classes`` outputs — mirroring
    the reference's head swap (classifier.py:23-25). If the checkpoint's fc
    already has ``num_classes`` outputs (i.e. one of *our* exports), it is
    loaded too.
    """
    sd = _load_state_dict(path)
    # Reject DEEPER torchvision nets up front: a resnet101/152 state dict
    # contains every key a resnet50 load reads (identical channel shapes
    # in each stage's first blocks), so without this check it would load
    # "successfully" as a frankenmodel with the extra blocks ignored —
    # garbage predictions with no error (torch's strict load_state_dict
    # rejects via unexpected-keys; we mirror that).
    for stage, blocks in enumerate(stage_sizes, start=1):
        extra = f"layer{stage}.{blocks}.conv1.weight"
        if extra in sd:
            raise ValueError(
                f"state dict has unexpected block {extra!r}: not a "
                f"torchvision resnet with stages {tuple(stage_sizes)} "
                "(deeper variant, e.g. resnet101/152?)")
    params, stats = {}, {}

    bn_p, bn_s = _bn(sd, "bn1")
    params["stem"] = {"kernel": _conv(sd, "conv1.weight"), "bn": bn_p}
    stats["stem"] = {"bn": bn_s}

    for stage, blocks in enumerate(stage_sizes, start=1):
        for b in range(blocks):
            src = f"layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            p, s = {}, {}
            for i in (1, 2, 3):
                bn_p, bn_s = _bn(sd, f"{src}.bn{i}")
                p[f"conv{i}"] = {"kernel": _conv(sd, f"{src}.conv{i}.weight"),
                                 "bn": bn_p}
                s[f"conv{i}"] = {"bn": bn_s}
            if f"{src}.downsample.0.weight" in sd:
                bn_p, bn_s = _bn(sd, f"{src}.downsample.1")
                p["downsample"] = {
                    "kernel": _conv(sd, f"{src}.downsample.0.weight"),
                    "bn": bn_p}
                s["downsample"] = {"bn": bn_s}
            params[dst] = p
            stats[dst] = s

    if "fc.weight" in sd and sd["fc.weight"].shape[0] == num_classes:
        params["fc"] = {"kernel": np.transpose(sd["fc.weight"], (1, 0)),
                        "bias": sd["fc.bias"]}
    return params, stats


def save_torch_resnet50(path: str, params, batch_stats,
                        stage_sizes=(3, 4, 6, 3)) -> None:
    """Export our flax ResNet-50 variables as a torchvision ``resnet50``
    state dict (.pth) — the exact inverse of :func:`load_torch_resnet50`.

    The reference analyzer's Grad-CAM loads ``{prefix}resnet50.pth`` into
    ``torchvision.models.resnet50`` with a 2-way head
    (reference analyze_results.py:455-470, train_classifier.py:182-183);
    writing this file alongside our msgpack checkpoints lets the
    reference tooling run unchanged on our training runs.

    Layout transposes mirror the importer: flax HWIO conv kernels ->
    torch OIHW; fc kernel (in, out) -> (out, in). ``num_batches_tracked``
    buffers (present in every torchvision BN) are written as zeros —
    they only matter for momentum-free cumulative averaging, which
    neither side uses.
    """
    import torch

    def t(x):
        # .copy(): jax-backed numpy views are non-writable; torch wants
        # writable storage
        return torch.from_numpy(np.asarray(x, np.float32).copy())

    sd = {}

    def put_bn(prefix, bn_p, bn_s):
        sd[f"{prefix}.weight"] = t(bn_p["scale"])
        sd[f"{prefix}.bias"] = t(bn_p["bias"])
        sd[f"{prefix}.running_mean"] = t(bn_s["mean"])
        sd[f"{prefix}.running_var"] = t(bn_s["var"])
        sd[f"{prefix}.num_batches_tracked"] = torch.zeros((), dtype=torch.long)

    def put_conv(name, kernel):
        sd[name] = t(np.transpose(np.asarray(kernel), (3, 2, 0, 1)))

    put_conv("conv1.weight", params["stem"]["kernel"])
    put_bn("bn1", params["stem"]["bn"], batch_stats["stem"]["bn"])

    for stage, blocks in enumerate(stage_sizes, start=1):
        for b in range(blocks):
            src = f"layer{stage}_{b}"
            dst = f"layer{stage}.{b}"
            for i in (1, 2, 3):
                put_conv(f"{dst}.conv{i}.weight",
                         params[src][f"conv{i}"]["kernel"])
                put_bn(f"{dst}.bn{i}", params[src][f"conv{i}"]["bn"],
                       batch_stats[src][f"conv{i}"]["bn"])
            if "downsample" in params[src]:
                put_conv(f"{dst}.downsample.0.weight",
                         params[src]["downsample"]["kernel"])
                put_bn(f"{dst}.downsample.1",
                       params[src]["downsample"]["bn"],
                       batch_stats[src]["downsample"]["bn"])

    sd["fc.weight"] = t(np.transpose(np.asarray(params["fc"]["kernel"]),
                                     (1, 0)))
    sd["fc.bias"] = t(params["fc"]["bias"])
    torch.save(sd, path)


# --- GAN generator checkpoint interop --------------------------------------
# The reference samplers load torch generator state dicts
# (generate_synthetic.py:23-32); these converters make .pth generator
# checkpoints a two-way interchange format: our samplers read
# reference-trained generators, and the trainers write .pth twins the
# reference samplers can read (VERDICT r2 missing #1).
#
# DCGAN and WGAN-GP generators share one nn.Sequential layout — 6 ConvT +
# 5 BN at indices below (reference dcgan.py:26-47, wggan.py:18-41; only the
# channel widths differ, and those live in the tensors). CGAN's generator is
# label-embedding + fc + [BN, 5 x (Upsample, Conv3x3, BN)] (cgan.py:22-51)
# and additionally needs a CHW<->HWC permutation of the fc output axis.

_SEQ_CONVT = [0, 3, 6, 9, 12, 15]
_SEQ_BN = [1, 4, 7, 10, 13]


def _convt_to_flax(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kh, kw) -> our HWIO kernel.

    Our conv_transpose2d correlates with a spatially-flipped kernel
    relative to torch's transposed-conv convention (pinned by
    tests/test_torch_parity.py), hence the [::-1, ::-1]. Explicit .copy():
    flipping size-1 axes (k=1 kernels) leaves negative strides that numpy
    still reports as contiguous, so ascontiguousarray would NOT copy and
    torch.from_numpy would reject the view."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def _convt_to_torch(w) -> np.ndarray:
    return np.transpose(
        np.asarray(w, np.float32)[::-1, ::-1], (2, 3, 0, 1)).copy()


def _bn_from_torch(sd, prefix):
    p, s = _bn(sd, prefix)
    return ({"scale": np.asarray(p["scale"], np.float32),
             "bias": np.asarray(p["bias"], np.float32)},
            {"mean": np.asarray(s["mean"], np.float32),
             "var": np.asarray(s["var"], np.float32)})


def load_torch_gan_generator(path: str):
    """torch DCGAN/WGAN-GP generator state dict -> (params, batch_stats)
    pytrees for xgan.models.{dcgan,wgan}.Generator."""
    sd = _load_state_dict(path)
    params, stats = {}, {}
    for i, seq in enumerate(_SEQ_CONVT):
        params[f"ConvTranspose_{i}"] = {
            "kernel": _convt_to_flax(sd[f"main.{seq}.weight"])}
    for i, seq in enumerate(_SEQ_BN):
        p, s = _bn_from_torch(sd, f"main.{seq}")
        params[f"TorchBatchNorm_{i}"] = p
        stats[f"TorchBatchNorm_{i}"] = s
    return params, stats


def save_torch_gan_generator(path: str, params, batch_stats) -> None:
    """Inverse of :func:`load_torch_gan_generator`: write a state dict the
    reference samplers load into their torch Generator unchanged."""
    import torch

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32).copy())

    sd = {}
    for i, seq in enumerate(_SEQ_CONVT):
        sd[f"main.{seq}.weight"] = torch.from_numpy(
            _convt_to_torch(params[f"ConvTranspose_{i}"]["kernel"]))
    for i, seq in enumerate(_SEQ_BN):
        sd[f"main.{seq}.weight"] = t(params[f"TorchBatchNorm_{i}"]["scale"])
        sd[f"main.{seq}.bias"] = t(params[f"TorchBatchNorm_{i}"]["bias"])
        sd[f"main.{seq}.running_mean"] = t(
            batch_stats[f"TorchBatchNorm_{i}"]["mean"])
        sd[f"main.{seq}.running_var"] = t(
            batch_stats[f"TorchBatchNorm_{i}"]["var"])
        sd[f"main.{seq}.num_batches_tracked"] = torch.zeros(
            (), dtype=torch.long)
    torch.save(sd, path)


# CGAN generator Sequential indices (reference cgan.py:25-51): BN at 0,
# then 5 x (Upsample, Conv3x3-with-bias, BN, ReLU) — convs at 3,7,11,15,19
# (the last followed by Tanh instead of BN), BNs at 0,4,8,12,16.
_CGAN_SEQ_CONV = [3, 7, 11, 15, 19]
_CGAN_SEQ_BN = [0, 4, 8, 12, 16]


def _chw_to_hwc_perm(c: int, s0: int) -> np.ndarray:
    """perm[i_hwc] = i_chw for a flattened (c, s0, s0) <-> (s0, s0, c)
    reindexing: the reference fc output is viewed as CHW
    (cgan.py:48 ``out.view(B, -1, 7, 7)``), ours as HWC."""
    chw = np.arange(c * s0 * s0).reshape(c, s0, s0)
    return np.transpose(chw, (1, 2, 0)).reshape(-1)


def load_torch_cgan_generator(path: str):
    """torch CGAN generator state dict -> (params, batch_stats) pytrees
    for xgan.models.cgan.Generator."""
    sd = _load_state_dict(path)
    params, stats = {}, {}
    params["label_emb"] = np.asarray(sd["label_emb.weight"], np.float32)

    nf8 = sd["main.0.weight"].shape[0]
    out_dim = sd["fc.weight"].shape[0]
    s0 = int(round((out_dim / nf8) ** 0.5))
    perm = _chw_to_hwc_perm(nf8, s0)
    # torch fc.weight (out, in) -> our Dense kernel (in, out), HWC order
    params["Dense_0"] = {
        "kernel": np.ascontiguousarray(
            np.transpose(sd["fc.weight"], (1, 0))[:, perm]),
        "bias": np.asarray(sd["fc.bias"], np.float32)[perm]}

    for i, seq in enumerate(_CGAN_SEQ_CONV):
        params[f"Conv_{i}"] = {
            "kernel": _conv(sd, f"main.{seq}.weight"),
            "bias": np.asarray(sd[f"main.{seq}.bias"], np.float32)}
    for i, seq in enumerate(_CGAN_SEQ_BN):
        p, s = _bn_from_torch(sd, f"main.{seq}")
        params[f"TorchBatchNorm_{i}"] = p
        stats[f"TorchBatchNorm_{i}"] = s
    return params, stats


def save_torch_cgan_generator(path: str, params, batch_stats) -> None:
    """Inverse of :func:`load_torch_cgan_generator`."""
    import torch

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32).copy())

    sd = {"label_emb.weight": t(params["label_emb"])}
    kernel = np.asarray(params["Dense_0"]["kernel"], np.float32)
    nf8 = np.asarray(params["TorchBatchNorm_0"]["scale"]).shape[0]
    s0 = int(round((kernel.shape[1] / nf8) ** 0.5))
    inv = np.argsort(_chw_to_hwc_perm(nf8, s0))
    sd["fc.weight"] = t(np.transpose(kernel[:, inv], (1, 0)))
    sd["fc.bias"] = t(np.asarray(params["Dense_0"]["bias"], np.float32)[inv])

    for i, seq in enumerate(_CGAN_SEQ_CONV):
        sd[f"main.{seq}.weight"] = t(np.transpose(
            np.asarray(params[f"Conv_{i}"]["kernel"], np.float32),
            (3, 2, 0, 1)))
        sd[f"main.{seq}.bias"] = t(params[f"Conv_{i}"]["bias"])
    for i, seq in enumerate(_CGAN_SEQ_BN):
        sd[f"main.{seq}.weight"] = t(params[f"TorchBatchNorm_{i}"]["scale"])
        sd[f"main.{seq}.bias"] = t(params[f"TorchBatchNorm_{i}"]["bias"])
        sd[f"main.{seq}.running_mean"] = t(
            batch_stats[f"TorchBatchNorm_{i}"]["mean"])
        sd[f"main.{seq}.running_var"] = t(
            batch_stats[f"TorchBatchNorm_{i}"]["var"])
        sd[f"main.{seq}.num_batches_tracked"] = torch.zeros(
            (), dtype=torch.long)
    torch.save(sd, path)


GENERATOR_TORCH_CODECS = {
    "dcgan": (load_torch_gan_generator, save_torch_gan_generator),
    "wgan": (load_torch_gan_generator, save_torch_gan_generator),
    "cgan": (load_torch_cgan_generator, save_torch_cgan_generator),
}


# torchvision vgg16.features conv indices for the first three blocks.
_VGG_LAYERS = [("conv1_1", 0), ("conv1_2", 2), ("conv2_1", 5), ("conv2_2", 7),
               ("conv3_1", 10), ("conv3_2", 12), ("conv3_3", 14)]


_VGG_OUT_CHANNELS = [64, 64, 128, 128, 256, 256, 256]


def _validate_vgg16_sd(sd):
    """The three failure classes a plain index walk misses or reports
    badly: missing keys (vgg11/13/vgg16_bn layouts -> raw KeyError),
    wrong per-layer shapes, and vgg19 — whose state dict contains every
    key vgg16's first three blocks read at identical indices/shapes and
    would load as a silent frankenmodel (its block 3 has a 4th conv at
    features.16; vgg16 has a pool there, no weight)."""
    missing = [f"features.{idx}.weight" for _, idx in _VGG_LAYERS
               if f"features.{idx}.weight" not in sd]
    if missing:
        raise ValueError(
            f"missing {missing[:3]}...: not a torchvision vgg16 "
            "features state dict (vgg16_bn / other depths have "
            "different layer indices)")
    if "features.16.weight" in sd:
        raise ValueError(
            "state dict has an extra conv at features.16: a deeper VGG "
            "(vgg19?) — its first blocks would load as a silent "
            "frankenmodel, refusing instead")
    for (name, idx), out_ch in zip(_VGG_LAYERS, _VGG_OUT_CHANNELS):
        got = tuple(sd[f"features.{idx}.weight"].shape)
        if got[0] != out_ch or got[-2:] != (3, 3):
            raise ValueError(
                f"features.{idx}.weight has shape {got}, expected "
                f"({out_ch}, C, 3, 3) for vgg16 {name}")


def validate_torch_vgg16(path: str) -> None:
    """Cheap fail-fast content check (keys + shapes, no conversion) so
    CLIs can reject a wrong --vgg-path before the dataset decode."""
    _validate_vgg16_sd(_load_state_dict(path))


def load_torch_vgg16(path: str):
    """Returns a params pytree for xgan.models.vgg.VGG16Features."""
    sd = _load_state_dict(path)
    _validate_vgg16_sd(sd)
    params = {}
    for name, idx in _VGG_LAYERS:
        params[f"{name}_kernel"] = _conv(sd, f"features.{idx}.weight")
        params[f"{name}_bias"] = sd[f"features.{idx}.bias"]
    return params
