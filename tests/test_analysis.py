"""Analyzer tests: SSIM golden vs direct numpy, metrics loading against the
reference's own checked-in artifacts, report/figures end-to-end."""
import json
import shutil
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from xgan.ops.ssim import mean_ssim_per_synthetic, ssim_pair_matrix


def _ssim_numpy_reference(a, b, win=7, k1=0.01, k2=0.03, data_range=1.0):
    """Direct (slow) SSIM matching skimage defaults: uniform valid windows,
    sample covariance, border crop."""
    h, w = a.shape
    npix = win * win
    cov_norm = npix / (npix - 1)
    vals = []
    for i in range(h - win + 1):
        for j in range(w - win + 1):
            pa = a[i:i + win, j:j + win].astype(np.float64)
            pb = b[i:i + win, j:j + win].astype(np.float64)
            mua, mub = pa.mean(), pb.mean()
            va = cov_norm * (np.mean(pa * pa) - mua * mua)
            vb = cov_norm * (np.mean(pb * pb) - mub * mub)
            cab = cov_norm * (np.mean(pa * pb) - mua * mub)
            c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
            vals.append(((2 * mua * mub + c1) * (2 * cab + c2))
                        / ((mua ** 2 + mub ** 2 + c1) * (va + vb + c2)))
    return float(np.mean(vals))


def test_ssim_matches_direct_computation():
    rng = np.random.default_rng(0)
    a = rng.random((16, 16)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.random((16, 16)).astype(np.float32), 0, 1)
    got = float(ssim_pair_matrix(jnp.asarray(a[None]),
                                 jnp.asarray(b[None]))[0, 0])
    want = _ssim_numpy_reference(a, b)
    assert abs(got - want) < 1e-4


def test_ssim_identity_and_bounds():
    rng = np.random.default_rng(1)
    imgs = rng.random((3, 16, 16)).astype(np.float32)
    mat = np.asarray(ssim_pair_matrix(jnp.asarray(imgs), jnp.asarray(imgs)))
    np.testing.assert_allclose(np.diag(mat), 1.0, atol=1e-5)
    assert (mat <= 1.0 + 1e-5).all()

    means = np.asarray(mean_ssim_per_synthetic(jnp.asarray(imgs),
                                               jnp.asarray(imgs)))
    np.testing.assert_allclose(means, mat.mean(axis=1), atol=1e-6)


def test_load_metrics_on_reference_artifacts():
    """Our loader must consume the REFERENCE's own checked-in metric files
    (the compatibility contract, SURVEY.md §5)."""
    ref = Path("/root/reference/results/metrics")
    if not ref.exists():
        pytest.skip("reference artifacts not mounted")
    from xgan.analysis import load_metrics
    for prefix in ["baseline_", "augmented_", "curriculum_"]:
        m = load_metrics(str(ref), prefix)
        assert m is not None
        assert "cv" in m
        assert {"folds", "average", "std_dev"} <= set(m["cv"].keys())
        assert "fold_histories" in m and len(m["fold_histories"]) == 5
        h = m["history"]
        for key in ["train_loss", "train_acc", "val_loss", "val_acc"]:
            assert key in h


def test_analyzer_end_to_end_on_reference_metrics(tmp_path):
    """Full report+plots pass over the reference's metrics files."""
    ref = Path("/root/reference/results/metrics")
    if not ref.exists():
        pytest.skip("reference artifacts not mounted")
    from xgan.analysis import (generate_summary_report, load_metrics,
                               plot_cv_comparison, plot_training_comparison)
    data = {p[:-1]: load_metrics(str(ref), p)
            for p in ["baseline_", "augmented_", "curriculum_"]}
    out = tmp_path / "analysis"
    out.mkdir()
    plot_training_comparison(data, str(out))
    plot_cv_comparison(data, str(out))
    report = generate_summary_report(data, str(out))
    assert (out / "comparison_report.txt").exists()
    assert "Cross-Validation Performance" in report
    assert "Baseline" in report and "Augmented" in report
    # the reference's own numbers must surface in our report
    assert "0.7333" in report  # baseline CV avg accuracy
    assert (out / "cv_comparison.png").exists()
    assert (out / "comparison_acc.png").exists()


def test_eigen_smooth_matches_numpy_svd_golden():
    """eigen_smooth_2d (power iteration on the Gram matrix) == the
    pytorch_grad_cam get_2d_projection algorithm, written out in numpy:
    center the (H*W, C) weighted activations per channel and project onto
    the first right singular vector (reference analyze_results.py:550-552
    passes eigen_smooth=True). Both sides get the same deterministic sign
    convention (align with the channel-sum map) since SVD sign is
    arbitrary."""
    from xgan.analysis import eigen_smooth_2d

    rng = np.random.default_rng(7)
    h, w, c = 7, 7, 64
    weighted = rng.normal(size=(h, w, c)).astype(np.float32)
    # add a dominant rank-1 spatial structure so the top component is
    # well-separated (power iteration converges fast)
    spatial = rng.normal(size=(h, w, 1)).astype(np.float32)
    chan = rng.normal(size=(1, 1, c)).astype(np.float32)
    weighted = weighted + 4.0 * spatial * chan

    # numpy reference: the library's get_2d_projection
    x = weighted.reshape(h * w, c)
    xc = x - x.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(xc, full_matrices=True)
    proj_np = (xc @ vt[0]).reshape(h, w)
    if np.dot(proj_np.ravel(), x.sum(axis=1)) < 0:  # same sign convention
        proj_np = -proj_np

    proj = np.asarray(eigen_smooth_2d(jnp.asarray(weighted)))
    np.testing.assert_allclose(proj, proj_np, rtol=1e-4, atol=1e-4)


def test_eigen_smooth_degenerate_shapes():
    """1x1 feature maps (32px inputs) and all-zero maps don't blow up."""
    from xgan.analysis import eigen_smooth_2d

    out = np.asarray(eigen_smooth_2d(jnp.ones((1, 1, 16))))
    assert out.shape == (1, 1) and np.isfinite(out).all()
    out = np.asarray(eigen_smooth_2d(jnp.zeros((4, 4, 8))))
    assert out.shape == (4, 4) and np.isfinite(out).all()


def test_eigen_smooth_zero_rowsum_map():
    """Regression: a map whose per-row channel sums cancel exactly (here
    channel 1 = -channel 0) used to collapse to an all-zero CAM — the
    old ones-vector power-iteration seed lies exactly in the Gram
    matrix's null space (x.T @ ones == 0 by the centering), so only
    fp32 rounding noise ever seeded convergence. The projection must
    match the numpy SVD reference up to sign (the channel-sum sign
    convention is vacuous at row_sums == 0)."""
    from xgan.analysis import eigen_smooth_2d

    rng = np.random.default_rng(3)
    h, w = 7, 7
    a = rng.normal(size=(h, w, 1)).astype(np.float32)
    weighted = np.concatenate([a, -a], axis=-1)  # row sums exactly 0

    x = weighted.reshape(h * w, 2)
    xc = x - x.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(xc, full_matrices=True)
    proj_np = (xc @ vt[0]).reshape(h, w)

    proj = np.asarray(eigen_smooth_2d(jnp.asarray(weighted)))
    assert np.linalg.norm(proj) > 0.5 * np.linalg.norm(proj_np)
    err = min(np.abs(proj - proj_np).max(), np.abs(proj + proj_np).max())
    assert err < 1e-3 * np.abs(proj_np).max()


def test_gradcam_on_trained_checkpoint(tmp_path, fake_dataset, capsys):
    """Grad-CAM panel generation from a real (tiny) checkpoint, plus a
    reference-layout .pth-only checkpoint (torchvision state dict) that
    the loader must pick up by extension fallback."""
    import jax
    from xgan.analysis import generate_grad_cam_comparison, grad_cam_resnet
    from xgan.io_.checkpoint import save_variables
    from xgan.models.resnet import ResNet50

    model = ResNet50(num_classes=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    pred, cam = grad_cam_resnet(
        model, variables,
        np.random.default_rng(0).normal(size=(32, 32, 3))
        .astype(np.float32))
    assert pred in (0, 1)
    assert cam.shape == (1, 1) or cam.ndim == 2
    assert cam.min() >= 0.0 and cam.max() <= 1.0

    mdir = tmp_path / "models"
    mdir.mkdir()
    save_variables(str(mdir / "baseline_resnet50.msgpack"), variables)
    try:
        from xgan.models.pretrained import save_torch_resnet50
        save_torch_resnet50(str(mdir / "augmented_resnet50.pth"),
                            variables["params"], variables["batch_stats"])
        # corrupt msgpack + valid .pth twin: the fallback must be
        # success-based, not existence-based
        (mdir / "curriculum_resnet50.msgpack").write_bytes(b"corrupt")
        save_torch_resnet50(str(mdir / "curriculum_resnet50.pth"),
                            variables["params"], variables["batch_stats"])
        expect_loaded = 3
    except ImportError:  # torch absent: msgpack-only path still covered
        expect_loaded = 1
    out = tmp_path / "analysis"
    out.mkdir()
    generate_grad_cam_comparison(
        str(mdir), fake_dataset["data_dir"], fake_dataset["synthetic_dir"],
        str(out), num_samples=1, image_size=32)
    stdout = capsys.readouterr().out
    loaded = [l for l in stdout.splitlines() if l.startswith("Loaded model")]
    assert len(loaded) == expect_loaded
    if expect_loaded == 3:
        assert any(l.endswith("augmented_resnet50.pth") for l in loaded)
        assert any(l.endswith("curriculum_resnet50.pth") for l in loaded)
        assert "failed to load" in stdout  # the corrupt msgpack warning
    panels = list(out.glob("gradcam_*.png"))
    assert len(panels) == 3  # real_pos, real_neg, synthetic


def test_gradcam_conv3_matches_torch_hook_replica():
    """Cross-implementation Grad-CAM golden (VERDICT r4 weak #3): our
    default conv3-target CAM == a torch-hook replica of the reference's
    exact pipeline (pytorch_grad_cam.GradCAM on `model.layer4[-1].conv3`
    with eigen_smooth=True, reference analyze_results.py:466,550-552;
    the library itself is absent here, so its algorithm is written out:
    forward-hook the conv3 module output, backward from the top-class
    logit, channel weights = spatial mean of the gradient, PC1 of the
    weighted activations via centered SVD, ReLU, max-normalize).

    Weights are synced through the same layout mapping the .pth
    importer uses (tests/test_resnet_parity.py). The SVD leaves PC1's
    sign arbitrary (pytorch_grad_cam maps occasionally come out
    inverted — a known quirk); both sides get OUR deterministic
    alignment rule (match the channel-sum map) so the comparison pins
    the map, not the ambiguity."""
    import jax
    import pytest
    torch = pytest.importorskip("torch")
    from tests.test_resnet_parity import TorchResNet50, _copy_convbn
    from xgan.analysis import grad_cam_resnet
    from xgan.models.resnet import ResNet50

    stages = (1, 1, 1, 1)
    model = ResNet50(num_classes=2, stage_sizes=stages)
    rng = np.random.default_rng(7)
    x = rng.normal(size=(128, 128, 3)).astype(np.float32)
    variables = model.init(jax.random.key(3), jnp.asarray(x[None]),
                           train=False)
    params = variables["params"]
    # nontrivial running stats so eval-BN (and the conv3 pre-BN tap
    # location relative to it) is actually exercised
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.uniform(0.5, 1.5, a.shape).astype(np.float32)),
        variables["batch_stats"])
    variables = {"params": params, "batch_stats": stats}

    tm = TorchResNet50(stages=stages)
    _copy_convbn(params["stem"], tm.conv1, tm.bn1, stats["stem"])
    for stage, blocks in enumerate(stages, start=1):
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
            np.transpose(np.asarray(params["fc"]["kernel"]),
                         (1, 0)).copy()))
        tm.fc.bias.copy_(torch.from_numpy(np.asarray(params["fc"]["bias"])))
    tm.eval()

    # --- torch side: the reference's CAM, hooks written out
    captured = {}

    def fwd_hook(_mod, _inp, out):
        captured["act"] = out.detach()
        out.register_hook(lambda g: captured.__setitem__("grad", g))

    tm.layer4[-1].conv3.register_forward_hook(fwd_hook)
    xt = torch.from_numpy(np.transpose(x[None], (0, 3, 1, 2)).copy())
    xt.requires_grad_(False)
    logits = tm(xt)
    pred_t = int(logits[0].argmax())
    tm.zero_grad()
    logits[0, pred_t].backward()
    act = captured["act"][0].numpy()          # (C, H', W')
    grad = captured["grad"][0].numpy()        # (C, H', W')
    weights = grad.mean(axis=(1, 2))          # GradCAM: GAP of gradient
    weighted = act * weights[:, None, None]   # (C, H', W')
    # pytorch_grad_cam get_2d_projection: (HW, C), center, SVD, project
    c, h, w = weighted.shape
    flat = weighted.reshape(c, h * w).T       # (HW, C)
    row_sums = flat.sum(axis=1)
    centered = flat - flat.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(centered, full_matrices=True)
    proj = centered @ vt[0]
    if np.dot(proj, row_sums) < 0:            # our sign-alignment rule
        proj = -proj
    cam_t = np.maximum(proj.reshape(h, w), 0.0)
    if cam_t.max() > 0:
        cam_t = cam_t / cam_t.max()

    # --- our side
    pred_j, cam_j = grad_cam_resnet(model, variables, x, target="conv3")

    assert pred_j == pred_t
    assert cam_j.shape == cam_t.shape == (4, 4)
    np.testing.assert_allclose(cam_j, cam_t, atol=5e-3,
                               err_msg="conv3 Grad-CAM map != torch "
                                       "replica of the reference CAM")
