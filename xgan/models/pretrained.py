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


def load_torch_resnet50(path: str, num_classes: int = 2):
    """Returns (params, batch_stats) pytrees matching xgan.models.ResNet50.

    The checkpoint fc (1000-way ImageNet head) is dropped; the caller keeps
    its freshly initialized ``fc`` for ``num_classes`` outputs — mirroring
    the reference's head swap (classifier.py:23-25). If the checkpoint's fc
    already has ``num_classes`` outputs (i.e. one of *our* exports), it is
    loaded too.
    """
    sd = _load_state_dict(path)
    params, stats = {}, {}

    bn_p, bn_s = _bn(sd, "bn1")
    params["stem"] = {"kernel": _conv(sd, "conv1.weight"), "bn": bn_p}
    stats["stem"] = {"bn": bn_s}

    for stage, blocks in enumerate((3, 4, 6, 3), start=1):
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


# torchvision vgg16.features conv indices for the first three blocks.
_VGG_LAYERS = [("conv1_1", 0), ("conv1_2", 2), ("conv2_1", 5), ("conv2_2", 7),
               ("conv3_1", 10), ("conv3_2", 12), ("conv3_3", 14)]


def load_torch_vgg16(path: str):
    """Returns a params pytree for xgan.models.vgg.VGG16Features."""
    sd = _load_state_dict(path)
    params = {}
    for name, idx in _VGG_LAYERS:
        params[f"{name}_kernel"] = _conv(sd, f"features.{idx}.weight")
        params[f"{name}_bias"] = sd[f"features.{idx}.bias"]
    return params
