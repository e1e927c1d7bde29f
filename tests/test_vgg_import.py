"""VGG-16 .pth import: fabricate a torchvision-features-format state dict,
convert, and verify forward parity of the three perceptual blocks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from xgan.models.pretrained import load_torch_vgg16  # noqa: E402
from xgan.models.vgg import VGG16Features, perceptual_loss  # noqa: E402


def build_torch_vgg_features():
    """First 16 layers of torchvision vgg16().features (conv indices
    0,2,5,7,10,12,14)."""
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 3, padding=1), tnn.ReLU(True),
        tnn.Conv2d(64, 64, 3, padding=1), tnn.ReLU(True),
        tnn.MaxPool2d(2, 2),
        tnn.Conv2d(64, 128, 3, padding=1), tnn.ReLU(True),
        tnn.Conv2d(128, 128, 3, padding=1), tnn.ReLU(True),
        tnn.MaxPool2d(2, 2),
        tnn.Conv2d(128, 256, 3, padding=1), tnn.ReLU(True),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(True),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(True),
    )


def test_vgg_pth_import_block_parity(tmp_path):
    feats = build_torch_vgg_features()
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    path = str(tmp_path / "vgg16.pth")
    torch.save(sd, path)

    params = load_torch_vgg16(path)
    model = VGG16Features()
    x = np.random.default_rng(0).normal(size=(1, 32, 32, 3)) \
        .astype(np.float32)
    f1, f2, f3 = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x))

    feats.eval()
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        t1 = feats[:4](xt)            # relu1_2
        t2 = feats[4:9](t1)           # relu2_2
        t3 = feats[9:16](t2)          # relu3_3
    for ours, theirs in [(f1, t1), (f2, t2), (f3, t3)]:
        np.testing.assert_allclose(
            np.asarray(ours),
            np.transpose(theirs.numpy(), (0, 2, 3, 1)),
            rtol=2e-3, atol=2e-3)


def test_perceptual_loss_zero_for_identical(tmp_path):
    model = VGG16Features()
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    loss = perceptual_loss(
        lambda p, v: model.apply({"params": p}, v), params, x, x)
    assert float(loss) == 0.0


def test_perceptual_loss_all_zero_mask_is_zero_not_nan():
    """All-zero validity masks (a fully-padded lockstep batch) must
    yield 0, matching ops.reduce.weighted_mean's freeze contract —
    the unguarded sum/sum(w) form returned NaN here."""
    model = VGG16Features()
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    loss = perceptual_loss(
        lambda p, v: model.apply({"params": p}, v), params, x, y,
        weights=jnp.zeros((2,), jnp.float32))
    assert float(loss) == 0.0


def test_vgg_import_rejects_wrong_checkpoints(tmp_path):
    """Content validation: a deeper VGG (vgg19-style extra conv at
    features.16) must be rejected instead of loading its first blocks as
    a silent frankenmodel; missing keys (vgg11/13/bn layouts) and wrong
    shapes get structured errors, not raw KeyErrors."""
    from xgan.models.pretrained import validate_torch_vgg16

    feats = build_torch_vgg_features()
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}

    deep = dict(sd)
    deep["features.16.weight"] = torch.zeros((256, 256, 3, 3))
    deep["features.16.bias"] = torch.zeros((256,))
    p = str(tmp_path / "vgg19ish.pth")
    torch.save(deep, p)
    with pytest.raises(ValueError, match="deeper VGG"):
        validate_torch_vgg16(p)
    with pytest.raises(ValueError, match="deeper VGG"):
        load_torch_vgg16(p)

    shallow = {k: v for k, v in sd.items() if "features.14" not in k}
    p = str(tmp_path / "vgg13ish.pth")
    torch.save(shallow, p)
    with pytest.raises(ValueError, match="not a torchvision vgg16"):
        validate_torch_vgg16(p)

    wrong = dict(sd)
    wrong["features.0.weight"] = torch.zeros((32, 3, 3, 3))
    p = str(tmp_path / "wrongshape.pth")
    torch.save(wrong, p)
    with pytest.raises(ValueError, match="expected"):
        validate_torch_vgg16(p)
