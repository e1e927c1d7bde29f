"""torchvision .pth export: save our flax ResNet-50 as a torch state dict,
strict-load it into the torchvision-graph torch model, and verify numeric
forward parity — the inverse of tests/test_pretrained_import.py.

This is what lets the reference analyzer's Grad-CAM
(/root/reference/src/analyze_results.py:455-470) load checkpoints produced
by our classifier runs unchanged (VERDICT r1 #6).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from xgan.models.pretrained import (load_torch_resnet50,  # noqa: E402
                                    save_torch_resnet50)
from xgan.models.resnet import ResNet50  # noqa: E402
from tests.test_resnet_parity import TorchResNet50  # noqa: E402


def _init_flax(rng_seed=0, stage_sizes=(3, 4, 6, 3), size=64):
    model = ResNet50(num_classes=2, stage_sizes=stage_sizes)
    variables = model.init(jax.random.key(rng_seed),
                           jnp.zeros((1, size, size, 3)), train=False)
    # randomize BN running stats so the export path is exercised beyond
    # the (0, 1) init values
    k = jax.random.key(rng_seed + 1)
    stats = jax.tree_util.tree_map(
        lambda x: x + 0.1 * jax.random.normal(k, x.shape),
        variables["batch_stats"])
    return model, variables["params"], stats


def test_export_strict_loads_into_torchvision_graph(tmp_path):
    """torch.load + load_state_dict(strict=True) — every torchvision key
    present, nothing extra — then forward parity torch vs flax."""
    model, params, stats = _init_flax()
    path = str(tmp_path / "export.pth")
    save_torch_resnet50(path, params, stats)

    tm = TorchResNet50(num_classes=2)
    sd = torch.load(path, map_location="cpu", weights_only=True)
    tm.load_state_dict(sd, strict=True)
    tm.eval()

    x = np.random.default_rng(3).normal(size=(2, 64, 64, 3)) \
        .astype(np.float32)
    ours = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False))
    theirs = tm(torch.from_numpy(
        np.transpose(x, (0, 3, 1, 2)).copy())).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_export_import_roundtrip_identity(tmp_path):
    """export -> load_torch_resnet50 reproduces the original pytrees
    bit-exactly (fc included, since the exported head is already 2-way)."""
    _, params, stats = _init_flax(rng_seed=5, stage_sizes=(1, 1, 1, 1),
                                  size=32)
    path = str(tmp_path / "tiny.pth")
    save_torch_resnet50(path, params, stats, stage_sizes=(1, 1, 1, 1))
    params2, stats2 = load_torch_resnet50(path, num_classes=2,
                                          stage_sizes=(1, 1, 1, 1))
    assert "fc" in params2

    flat1, _ = jax.tree_util.tree_flatten_with_path(
        {"p": params, "s": stats})
    got = {"p": params2, "s": stats2}
    flat2, _ = jax.tree_util.tree_flatten_with_path(got)
    assert len(flat1) == len(flat2)
    for (k1, v1), (k2, v2) in zip(sorted(flat1, key=lambda t: str(t[0])),
                                  sorted(flat2, key=lambda t: str(t[0]))):
        assert str(k1) == str(k2)
        np.testing.assert_array_equal(np.asarray(v1, np.float32),
                                      np.asarray(v2, np.float32),
                                      err_msg=str(k1))


def test_load_classifier_variables_both_formats(tmp_path):
    """The extension-aware classifier reader (analysis Grad-CAM +
    src/predict.py) returns identical trees from our msgpack and from a
    reference-layout torchvision .pth, deriving stage sizes from the
    ``like`` tree."""
    from xgan.io_.checkpoint import (load_classifier_variables,
                                     save_variables)

    _, params, stats = _init_flax(rng_seed=7, stage_sizes=(1, 1, 1, 1),
                                  size=32)
    variables = {"params": params, "batch_stats": stats}
    mp = str(tmp_path / "baseline_resnet50.msgpack")
    pp = str(tmp_path / "baseline_resnet50.pth")
    save_variables(mp, variables)
    save_torch_resnet50(pp, params, stats, stage_sizes=(1, 1, 1, 1))

    like = jax.tree_util.tree_map(np.zeros_like, variables)
    a = load_classifier_variables(mp, like)
    b = load_classifier_variables(pp, like)
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for va, vb in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(va, np.float32),
                                      np.asarray(vb, np.float32))


def test_load_classifier_variables_rejects_imagenet_head(tmp_path):
    """A .pth whose fc is not num_classes-way (e.g. a raw 1000-way
    ImageNet backbone) must fail with the structured fc-head message,
    not load a half-initialized tree."""
    from xgan.io_.checkpoint import load_classifier_variables

    _, params, stats = _init_flax(rng_seed=9, stage_sizes=(1, 1, 1, 1),
                                  size=32)
    path = str(tmp_path / "backbone.pth")
    save_torch_resnet50(path, params, stats, stage_sizes=(1, 1, 1, 1))
    # rewrite the head as 1000-way, as an ImageNet checkpoint would have
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd["fc.weight"] = torch.zeros((1000, sd["fc.weight"].shape[1]))
    sd["fc.bias"] = torch.zeros((1000,))
    torch.save(sd, path)

    like = {"params": params, "batch_stats": stats}
    with pytest.raises(ValueError, match="fc head"):
        load_classifier_variables(path, like)


def test_import_rejects_deeper_torchvision_net(tmp_path):
    """A deeper torchvision state dict (resnet101-style: extra blocks per
    stage) must be REJECTED, not silently loaded as a frankenmodel built
    from each stage's first blocks — every key a shallower load reads is
    present with identical shapes, so only an unexpected-block check can
    catch it (torch's strict load_state_dict rejects the mirror case via
    unexpected-keys)."""
    import pytest
    import torch

    from xgan.models.pretrained import load_torch_resnet50

    _, params, stats = _init_flax(rng_seed=11, stage_sizes=(1, 1, 1, 1),
                                  size=32)
    path = str(tmp_path / "deep.pth")
    save_torch_resnet50(path, params, stats, stage_sizes=(1, 1, 1, 1))
    sd = torch.load(path, weights_only=True)
    sd["layer1.1.conv1.weight"] = torch.zeros((64, 256, 1, 1))  # extra block
    torch.save(sd, path)
    with pytest.raises(ValueError, match="unexpected block"):
        load_torch_resnet50(path, stage_sizes=(1, 1, 1, 1))
