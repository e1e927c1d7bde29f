"""Numeric parity of our flax ResNet-50 with a torch ResNet-50 (v1.5).

Builds the torchvision-architecture bottleneck ResNet in torch, copies OUR
random weights into it through the same name mapping the .pth importer
uses (in reverse), and compares eval-mode logits. This validates the whole
graph — stem geometry, maxpool padding, stride-on-conv2 (v1.5),
downsample branches, BN eval semantics, head — and, by construction, the
pretrained-checkpoint converter's layout conventions.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from xgan.models.resnet import ResNet50  # noqa: E402


class TorchBottleneck(tnn.Module):
    def __init__(self, cin, width, stride, downsample):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, width * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(width * 4))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idn)


class TorchResNet50(tnn.Module):
    def __init__(self, num_classes=2, stages=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        layers, cin = [], 64
        for stage, (blocks, width) in enumerate(
                zip(stages, (64, 128, 256, 512))):
            stage_layers = []
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                stage_layers.append(
                    TorchBottleneck(cin, width, stride, downsample=b == 0))
                cin = width * 4
            layers.append(tnn.Sequential(*stage_layers))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def _copy_convbn(src, conv, bn, stats):
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(
            np.transpose(np.asarray(src["kernel"]), (3, 2, 0, 1)).copy()))
        bn.weight.copy_(torch.from_numpy(np.asarray(src["bn"]["scale"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(src["bn"]["bias"])))
        bn.running_mean.copy_(torch.from_numpy(
            np.asarray(stats["bn"]["mean"])))
        bn.running_var.copy_(torch.from_numpy(
            np.asarray(stats["bn"]["var"])))


def test_resnet50_forward_matches_torch():
    model = ResNet50(num_classes=2)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
    params, stats = variables["params"], variables["batch_stats"]
    # make running stats nontrivial so eval-BN is actually exercised
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.uniform(0.5, 1.5, a.shape).astype(np.float32)), stats)
    variables = {"params": params, "batch_stats": stats}

    tm = TorchResNet50()
    _copy_convbn(params["stem"], tm.conv1, tm.bn1, stats["stem"])
    for stage, blocks in enumerate((3, 4, 6, 3), start=1):
        layer = getattr(tm, f"layer{stage}")
        for b in range(blocks):
            p, s = params[f"layer{stage}_{b}"], stats[f"layer{stage}_{b}"]
            blk = layer[b]
            for i, (conv, bn) in enumerate(
                    [(blk.conv1, blk.bn1), (blk.conv2, blk.bn2),
                     (blk.conv3, blk.bn3)], start=1):
                _copy_convbn(p[f"conv{i}"], conv, bn, s[f"conv{i}"])
            if blk.downsample is not None:
                _copy_convbn(p["downsample"], blk.downsample[0],
                             blk.downsample[1], s["downsample"])
    with torch.no_grad():
        tm.fc.weight.copy_(torch.from_numpy(
            np.transpose(np.asarray(params["fc"]["kernel"]), (1, 0)).copy()))
        tm.fc.bias.copy_(torch.from_numpy(np.asarray(params["fc"]["bias"])))
    tm.eval()

    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    theirs = tm(torch.from_numpy(
        np.transpose(x, (0, 3, 1, 2)).copy())).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)
