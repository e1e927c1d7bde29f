"""torchvision .pth import: save a torch ResNet-50 state dict (torchvision
key names), convert via load_torch_resnet50, and verify numeric forward
parity of the converted flax model against the torch source."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from xgan.models.pretrained import load_torch_resnet50  # noqa: E402
from xgan.models.resnet import ResNet50  # noqa: E402
from tests.test_resnet_parity import TorchResNet50  # noqa: E402


def test_pth_roundtrip_forward_parity(tmp_path):
    tm = TorchResNet50(num_classes=2)
    # randomize BN running stats so eval-mode conversion is exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    tm.eval()
    path = str(tmp_path / "resnet50.pth")
    torch.save(tm.state_dict(), path)

    params, stats = load_torch_resnet50(path, num_classes=2)
    # structure must slot into our module
    model = ResNet50(num_classes=2)
    like = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                      train=False)
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: 0, like["params"])) == \
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(lambda x: 0, params))

    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)) \
        .astype(np.float32)
    ours = np.asarray(model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x), train=False))
    theirs = tm(torch.from_numpy(
        np.transpose(x, (0, 3, 1, 2)).copy())).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_pth_import_drops_imagenet_fc(tmp_path):
    tm = TorchResNet50(num_classes=1000)
    path = str(tmp_path / "resnet50_1000.pth")
    torch.save(tm.state_dict(), path)
    params, _ = load_torch_resnet50(path, num_classes=2)
    assert "fc" not in params  # caller keeps its fresh 2-way head
