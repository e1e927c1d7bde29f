"""Results analysis: run comparison, report, SSIM distribution, Grad-CAM.

Re-implements the reference ResultsAnalyzer (analyze_results.py:47-584)
against this framework's artifacts:

- load_metrics / comparison plots / comparison_report.txt consume the SAME
  JSON schemas (they also work unchanged on metrics produced by the
  reference, since the schemas are identical);
- the SSIM distribution uses the batched on-device kernel in
  xgan.ops.ssim instead of a 50,000-iteration host loop;
- Grad-CAM runs on our flax ResNet-50 checkpoints with the REFERENCE'S
  exact target by default: the pre-BN output of layer4's last conv3
  (analyze_results.py:466 hooks `model.layer4[-1].conv3`, an nn.Conv2d,
  so pytorch_grad_cam captures the raw conv output), with GAP-of-gradient
  channel weights — golden-tested map-for-map against a torch-hook
  replica of the reference pipeline in tests/test_analysis.py. A
  `target="stage_output"` mode keeps the r1-r4 analytic form (layer4
  block output feeding avgpool: cam = relu(sum_k fc_w[k, class] * A_k),
  exact Grad-CAM for that map, no backward needed). The reference's
  eigen_smooth PCA variant (its CAM call passes eigen_smooth=True,
  analyze_results.py:550-552) is reproduced by ``eigen_smooth_2d`` below
  (default-on, golden-tested against numpy SVD in tests/test_analysis.py).
"""
from __future__ import annotations

import functools
import json
import os
import random
from pathlib import Path
from typing import Dict, List, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


RUN_COLORS = {"baseline": "#1f77b4", "augmented": "#2ca02c",
              "curriculum": "#ff7f0e"}
METRIC_KEYS = [("accuracy", "Accuracy"),
               ("weighted_precision", "Precision (Weighted)"),
               ("weighted_recall", "Recall (Weighted)"),
               ("weighted_f1_score", "F1 Score (Weighted)")]


def load_metrics(metrics_dir: str, prefix: str,
                 max_folds: int = 5) -> Optional[Dict]:
    """Load one run's metrics set (reference load_metrics semantics,
    analyze_results.py:93-145)."""
    metrics_dir = Path(metrics_dir)
    metrics: Dict = {}
    cv_path = metrics_dir / f"{prefix}cv_summary.json"
    if cv_path.exists():
        metrics["cv"] = json.loads(cv_path.read_text())
        fold_histories = []
        for fold in range(1, max_folds + 1):
            p = metrics_dir / f"fold_{fold}_{prefix}training_history.json"
            if p.exists():
                h = json.loads(p.read_text())
                h["fold"] = fold
                fold_histories.append(h)
        if fold_histories:
            metrics["history"] = fold_histories[0]
            metrics["fold_histories"] = fold_histories
        return metrics

    hist_path = metrics_dir / f"{prefix}training_history.json"
    if hist_path.exists():
        metrics["history"] = json.loads(hist_path.read_text())
    else:
        # no CV summary and no history -> the run is excluded entirely,
        # like the reference's essential_missing path
        # (analyze_results.py:123-140)
        print(f"Warning: training history not found: {hist_path}")
        return None
    final_path = metrics_dir / f"{prefix}final_metrics.json"
    if final_path.exists():
        metrics["final"] = json.loads(final_path.read_text())
    return metrics or None


def plot_training_comparison(metrics_dict: Dict[str, Dict],
                             figures_dir: str) -> None:
    """Overlay train/val curves across runs: comparison_{acc,loss,
    synthetic_ratio}.png (analyze_results.py:147-213)."""
    valid = {k: v for k, v in metrics_dict.items() if v and "history" in v}
    if not valid:
        print("No valid training history found to plot comparisons.")
        return
    for metric, title in [("acc", "Accuracy"), ("loss", "Loss"),
                          ("synthetic_ratio", "Synthetic Ratio")]:
        plt.figure(figsize=(12, 6))
        has_data = False
        for run, m in valid.items():
            h = m["history"]
            color = RUN_COLORS.get(run, "#808080")
            label = run.replace("_", " ").title()
            if metric == "synthetic_ratio":
                vals = h.get("synthetic_ratio", [])
                if vals and any(vals):
                    plt.plot(range(1, len(vals) + 1), vals,
                             label=f"{label} Ratio", color=color,
                             linestyle="-.")
                    has_data = True
                    for fh in m.get("fold_histories", [])[1:]:
                        fv = fh.get("synthetic_ratio", [])
                        if fv:
                            plt.plot(range(1, len(fv) + 1), fv, color=color,
                                     alpha=0.3, linestyle="-.")
            else:
                tk, vk = f"train_{metric}", f"val_{metric}"
                if tk in h and vk in h:
                    ep = range(1, len(h[tk]) + 1)
                    plt.plot(ep, h[tk], label=f"{label} Train", color=color)
                    plt.plot(ep, h[vk], label=f"{label} Val", color=color,
                             linestyle="--")
                    has_data = True
                    for fh in m.get("fold_histories", [])[1:]:
                        if tk in fh and vk in fh:
                            fe = range(1, len(fh[tk]) + 1)
                            plt.plot(fe, fh[tk], color=color, alpha=0.3)
                            plt.plot(fe, fh[vk], color=color, alpha=0.3,
                                     linestyle="--")
        if not has_data:
            plt.close()
            continue
        plt.title(f"Training {title} Comparison")
        plt.xlabel("Epoch")
        plt.ylabel(title)
        plt.legend()
        plt.grid(True, alpha=0.3)
        path = os.path.join(figures_dir, f"comparison_{metric}.png")
        plt.savefig(path, dpi=300, bbox_inches="tight")
        plt.close()
        print(f"Saved {title} comparison plot to {path}")


def plot_cv_comparison(metrics_dict: Dict[str, Dict],
                       figures_dir: str) -> None:
    """Grouped bars with std error bars: cv_comparison.png
    (analyze_results.py:215-283)."""
    valid = {k: v for k, v in metrics_dict.items() if v and "cv" in v}
    if not valid:
        print("No valid cross-validation results found to plot comparison.")
        return
    names = [lbl for _, lbl in METRIC_KEYS]
    index = np.arange(len(names))
    n_runs = len(valid)
    bar_w = 0.8 / n_runs
    plt.figure(figsize=(max(10, len(names) * n_runs * 0.8), 6))
    for i, (run, m) in enumerate(valid.items()):
        avg = m["cv"].get("average", {})
        std = m["cv"].get("std_dev", {})
        vals = [avg.get(k, np.nan) for k, _ in METRIC_KEYS]
        errs = [std.get(k, 0.0) for k, _ in METRIC_KEYS]
        plt.bar(index - (n_runs / 2 - 0.5 - i) * bar_w, vals, bar_w,
                label=run.replace("_", " ").title(),
                color=RUN_COLORS.get(run, f"C{i}"), yerr=errs, capsize=5,
                alpha=0.8)
    plt.xlabel("Metrics")
    plt.ylabel("Score")
    plt.title("Cross-Validation Results Comparison (Mean ± Std Dev)")
    plt.xticks(index, names)
    plt.legend()
    plt.grid(True, alpha=0.3, axis="y")
    plt.tight_layout()
    path = os.path.join(figures_dir, "cv_comparison.png")
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close()
    print(f"Saved CV comparison plot to {path}")


def generate_summary_report(metrics_dict: Dict[str, Dict],
                            analysis_dir: str) -> str:
    """comparison_report.txt with delta-vs-baseline lines
    (analyze_results.py:285-355)."""
    lines = ["=== Model Performance Comparison Report ===\n"]
    valid = {k: v for k, v in metrics_dict.items() if v}

    finals = {n: r["final"]["metrics"] for n, r in valid.items()
              if "final" in r and "metrics" in r.get("final", {})}
    if finals:
        lines.append("\n--- Final Test Set Performance ---")
        base = finals.get("baseline")
        for name, m in finals.items():
            lines.append(f"\n* {name.replace('_', ' ').title()}:")
            for key, label in METRIC_KEYS:
                v = m.get(key, "N/A")
                line = (f"  - {label:<20}: {v:.4f}"
                        if isinstance(v, float) else
                        f"  - {label:<20}: {v}")
                if base and name != "baseline" and key in base:
                    bv = base[key]
                    if isinstance(v, float) and isinstance(bv, float) \
                            and bv != 0:
                        line += f" ({(v - bv) / bv * 100:+.1f}% vs Baseline)"
                    elif isinstance(v, float) and isinstance(bv, float):
                        line += " (Baseline: 0)"  # analyze_results.py:314
                lines.append(line)
        lines.append("")
    else:
        lines.append("\n--- Final Test Set Performance: No data found ---")

    cvs = {n: r["cv"] for n, r in valid.items()
           if "cv" in r and "average" in r["cv"] and "std_dev" in r["cv"]}
    if cvs:
        lines.append("\n--- Cross-Validation Performance "
                     "(Average ± Std Dev) ---")
        base = cvs.get("baseline", {}).get("average")
        for name, cv in cvs.items():
            lines.append(f"\n* {name.replace('_', ' ').title()}:")
            for key, label in METRIC_KEYS:
                av, sd = cv["average"].get(key, "N/A"), \
                    cv["std_dev"].get(key, "N/A")
                line = (f"  - {label:<20}: {av:.4f} ± {sd:.4f}"
                        if isinstance(av, float) and isinstance(sd, float)
                        else f"  - {label:<20}: {av} ± {sd}")
                if base and name != "baseline" and key in base:
                    bv = base[key]
                    if isinstance(av, float) and isinstance(bv, float) \
                            and bv != 0:
                        line += (f" ({(av - bv) * 100:+.1f} percentage "
                                 "points vs Baseline Avg)")
                    elif isinstance(av, float) and isinstance(bv, float):
                        line += " (Baseline Avg: 0)"  # :341
                lines.append(line)
        lines.append("")
    else:
        lines.append("\n--- Cross-Validation Performance: "
                     "No data found ---")

    report = "\n".join(lines)
    path = os.path.join(analysis_dir, "comparison_report.txt")
    with open(path, "w") as f:
        f.write(report)
    print(f"Saved comparison report to {path}")
    return report


def _load_grayscale(paths: List[str], size: int) -> np.ndarray:
    """Decode -> resize -> grayscale [0,1] float stack (the reference's
    ssim_transform, analyze_results.py:362-366)."""
    from PIL import Image
    out = []
    for p in paths:
        try:
            img = Image.open(p).convert("L").resize((size, size),
                                                    Image.BILINEAR)
            out.append(np.asarray(img, np.float32) / 255.0)
        except Exception as e:
            print(f"Warning: could not load {p}: {e}")
    return np.stack(out) if out else np.zeros((0, size, size), np.float32)


def calculate_ssim_distribution(data_dir: str, synthetic_dir: str,
                                analysis_dir: str, *,
                                num_real_samples: int = 100,
                                num_synthetic_samples: int = 500,
                                image_size: int = 224,
                                seed: int = 42) -> Optional[np.ndarray]:
    """On-device all-pairs SSIM; histogram+KDE figure
    (reference analyze_results.py:358-445)."""
    import pandas as pd

    print("\n--- Calculating SSIM Distribution ---")
    meta = Path(data_dir) / "stage2_train_metadata.csv"
    if not meta.exists():
        print(f"Error: real metadata not found at {meta}")
        return None
    from xgan.data.rsna import POSITIVE_CLASS, train_paths
    df = pd.read_csv(meta)
    df["label"] = (df["class"] == POSITIVE_CLASS).astype(int)
    pos = df[df["label"] == 1]
    if pos.empty:
        print("Error: no positive real images found in metadata.")
        return None
    pos = pos.sample(n=min(num_real_samples, len(pos)), random_state=seed)
    real_paths = train_paths(data_dir, list(pos["patientId"]))
    synth_files = sorted(Path(synthetic_dir).glob("*.png"))
    if not synth_files:
        print(f"Error: no synthetic images found in {synthetic_dir}")
        return None
    rng = random.Random(seed)
    synth_files = rng.sample(
        synth_files, min(num_synthetic_samples, len(synth_files)))

    real = _load_grayscale(real_paths, image_size)
    synth = _load_grayscale([str(p) for p in synth_files], image_size)
    if not len(real) or not len(synth):
        return None

    import jax.numpy as jnp
    from xgan.ops.ssim import mean_ssim_per_synthetic
    scores = np.asarray(mean_ssim_per_synthetic(jnp.asarray(synth),
                                                jnp.asarray(real)))

    plt.figure(figsize=(10, 6))
    try:
        import seaborn as sns
        sns.histplot(scores, kde=True, bins=30)
    except ImportError:
        plt.hist(scores, bins=30)
    plt.title(f"Distribution of Average SSIM (Synthetic vs. {len(real)} "
              f"Real Positives)\nMean: {scores.mean():.3f}, "
              f"Median: {np.median(scores):.3f}")
    plt.xlabel("Average SSIM Score")
    plt.ylabel("Frequency")
    plt.grid(True, alpha=0.3)
    path = os.path.join(analysis_dir, "ssim_distribution.png")
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close()
    print(f"Saved SSIM distribution plot to {path}")
    return scores


def eigen_smooth_2d(weighted_hwc, n_iter: int = 64):
    """First-principal-component projection of the weighted activation map
    — pytorch_grad_cam's ``eigen_smooth=True``
    (reference analyze_results.py:550-552; library semantics: reshape the
    (C, H, W) weighted activations to (H*W, C), center each channel, and
    project the rows onto the first right singular vector).

    TPU-native form: power iteration on the tiny (HW, HW) Gram matrix —
    a handful of matmuls instead of a host SVD. The SVD sign ambiguity
    (the library's maps occasionally come out inverted) is resolved
    deterministically by aligning the projection with the channel-sum
    (plain Grad-CAM) map; golden-tested against a numpy SVD reference in
    tests/test_analysis.py.

    weighted_hwc: (H, W, C) float array. Returns (H, W) float32.
    """
    import jax
    import jax.numpy as jnp

    h, w, c = weighted_hwc.shape
    x = weighted_hwc.reshape(h * w, c).astype(jnp.float32)
    row_sums = jnp.sum(x, axis=1)            # plain Grad-CAM map (flat)
    x = x - jnp.mean(x, axis=0, keepdims=True)
    gram = x @ x.T                           # (HW, HW), HW = 49 at 224px
    # Seed INSIDE the column space: a constant vector is exactly in
    # gram's null space (x.T @ ones == 0 by the centering), so the old
    # ones-seed converged only via fp32 rounding noise and collapsed to
    # an all-zero map when the cancellation was exact. The centered row
    # sums (x @ 1_c) are generically aligned with PC1; the non-constant
    # cosine term keeps the seed alive when they vanish too.
    seed = x @ jnp.ones((c,), jnp.float32)
    wave = jnp.cos(jnp.arange(h * w, dtype=jnp.float32))
    u0 = (seed / (jnp.linalg.norm(seed) + 1e-12)
          + 0.01 * wave / (jnp.linalg.norm(wave) + 1e-12))

    def body(_, u):
        v = gram @ u
        return v / (jnp.linalg.norm(v) + 1e-12)

    u = jax.lax.fori_loop(0, n_iter, body, u0)
    proj = u * jnp.linalg.norm(x.T @ u)      # = x @ v_top, up to sign
    sign = jnp.where(jnp.dot(proj, row_sums) < 0, -1.0, 1.0)
    return (sign * proj).reshape(h, w)


def grad_cam_resnet(model, variables, image_normed: np.ndarray, *,
                    eigen_smooth: bool = True, target: str = "conv3"):
    """(pred_label, cam (H, W) in [0,1]) for one normalized image.

    ``target="conv3"`` (default — the reference's exact target,
    analyze_results.py:466 hooks `model.layer4[-1].conv3`): activation =
    the last stage-4 bottleneck's conv3 output PRE-BN, channel weights =
    spatial mean of d(score)/d(activation) (pytorch_grad_cam's GradCAM
    weighting), computed via jax.grad w.r.t. a zero flax perturbation at
    the tap (xgan.models.resnet._ConvBN.tap). Golden-tested against a
    torch-hook replica in tests/test_analysis.py.

    ``target="stage_output"``: the layer4 block output feeding avgpool.
    There dscore/dA_k is constant over space (fc_w[k, class] / (H'*W')),
    so the weighted activations are fc_w[k, c] * A_k exactly — no
    backward needed.

    ``eigen_smooth=True`` (the reference's actual setting,
    analyze_results.py:550-552) replaces the channel sum with the first
    principal component of the weighted activation map; False gives the
    plain CAM.
    """
    pred, cam = _cam_program(model, eigen_smooth, target)(variables,
                                                          image_normed)
    pred, cam = int(pred), np.asarray(cam)
    if cam.max() > 0:
        cam = cam / cam.max()
    return pred, cam


@functools.lru_cache(maxsize=8)
def _cam_program(model, eigen_smooth: bool, target: str = "conv3"):
    """One jitted (variables, image) -> (pred, relu'd CAM) program per
    (model, mode): the eager form dispatched every ResNet op per call —
    3 models x 9 samples of per-op remote dispatches dominated analysis
    runtime on the tunneled backend (same pitfall CLAUDE.md records for
    eager Exported.call). flax Modules are frozen dataclasses, hence
    hashable cache keys."""
    import jax
    import jax.numpy as jnp

    if target == "conv3":
        tap_model = model.clone(cam_tap=True)

        def fwd(variables, image_normed):
            img = image_normed[None]
            # zero-perturbation template: one traced forward with the
            # "perturbations" collection mutable materializes the tap
            # leaf's shape; its gradient is d(score)/d(activation).
            _, aux0 = tap_model.apply(
                variables, img, train=False,
                mutable=["perturbations", "intermediates"])
            perts0 = jax.tree_util.tree_map(jnp.zeros_like,
                                            aux0["perturbations"])

            def score_fn(perts):
                logits, aux = tap_model.apply(
                    {**variables, "perturbations": perts}, img,
                    train=False, mutable=["intermediates"])
                pred = jax.lax.stop_gradient(jnp.argmax(logits[0]))
                return jnp.take(logits[0], pred), \
                    (pred, aux["intermediates"])

            (_, (pred, inter)), grads = jax.value_and_grad(
                score_fn, has_aux=True)(perts0)
            act = jax.tree_util.tree_leaves(inter)[0][0]     # (H', W', C)
            grad = jax.tree_util.tree_leaves(grads)[0][0]    # (H', W', C)
            # pytorch_grad_cam GradCAM: w_c = GAP of the gradient
            weights = jnp.mean(grad.astype(jnp.float32), axis=(0, 1))
            weighted = act.astype(jnp.float32) * weights     # (H', W', C)
            if eigen_smooth:
                cam = eigen_smooth_2d(weighted)
            else:
                cam = jnp.sum(weighted, axis=-1)
            return pred, jnp.maximum(cam, 0.0)
        return jax.jit(fwd)

    def fwd(variables, image_normed):
        logits, feats = model.apply(variables, image_normed[None],
                                    train=False, return_features=True)
        pred = jnp.argmax(logits[0])
        fc_w = variables["params"]["fc"]["kernel"]   # (2048, num_classes)
        # jnp.take, not fc_w[:, pred]: checkpoint-restored params can be
        # numpy leaves, and numpy indexing by a tracer raises
        weighted = (feats[0].astype(jnp.float32)
                    * jnp.take(fc_w, pred, axis=1)
                         .astype(jnp.float32))       # (H', W', C)
        if eigen_smooth:
            cam = eigen_smooth_2d(weighted)
        else:
            cam = jnp.sum(weighted, axis=-1)
        return pred, jnp.maximum(cam, 0.0)
    return jax.jit(fwd)


def generate_grad_cam_comparison(model_dir: str, data_dir: str,
                                 synthetic_dir: str, analysis_dir: str, *,
                                 num_samples: int = 3,
                                 image_size: int = 224,
                                 compute_dtype=None,
                                 seed_pos: int = 43, seed_neg: int = 44):
    """Side-by-side original/CAM panels per sample for every available
    {prefix}resnet50 checkpoint (reference analyze_results.py:448-584)."""
    import jax.numpy as jnp
    import pandas as pd
    from PIL import Image

    from xgan.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    from xgan.io_.checkpoint import load_classifier_variables
    from xgan.models.resnet import ResNet50

    print("\n--- Generating Grad-CAM Comparison ---")
    model = ResNet50(num_classes=2,
                     dtype=compute_dtype or jnp.float32)
    import jax
    like = model.init(jax.random.key(0),
                      jnp.zeros((1, image_size, image_size, 3)),
                      train=False)
    like = {"params": like["params"], "batch_stats": like["batch_stats"]}

    models = {}
    for prefix in ["baseline_", "augmented_", "curriculum_"]:
        # Prefer our msgpack; fall back to the reference's torchvision
        # .pth (what its train_classifier.py:179-184 writes and its
        # analyzer loads, analyze_results.py:455-470) so reference-trained
        # classifiers can be Grad-CAM'd here directly. The fallback is
        # success-based, not existence-based: a corrupt/mismatched
        # msgpack must not block the loadable .pth twin beside it.
        candidates = [p for p in
                      (Path(model_dir) / f"{prefix}resnet50.msgpack",
                       Path(model_dir) / f"{prefix}resnet50.pth")
                      if p.exists()]
        for path in candidates:
            try:
                models[prefix[:-1]] = load_classifier_variables(
                    str(path), like)
                print(f"Loaded model: {path}")
                break
            except Exception as e:
                print(f"Warning: failed to load {path}: {e}")
        if not candidates:
            print(f"Info: model file not found, skipping Grad-CAM for "
                  f"{prefix[:-1]}: "
                  f"{Path(model_dir) / (prefix + 'resnet50.msgpack')}")
    if not models:
        print("Error: no models loaded successfully for Grad-CAM.")
        return

    meta = Path(data_dir) / "stage2_train_metadata.csv"
    if not meta.exists():
        return
    from xgan.data.rsna import POSITIVE_CLASS, train_paths
    df = pd.read_csv(meta)
    df["label"] = (df["class"] == POSITIVE_CLASS).astype(int)
    n = num_samples
    samples = []
    pos = df[df["label"] == 1]
    neg = df[df["label"] == 0]
    for s in pos.sample(n=min(n, len(pos)),
                        random_state=seed_pos).to_dict("records"):
        samples.append({**s, "type": "real_positive"})
    for s in neg.sample(n=min(n, len(neg)),
                        random_state=seed_neg).to_dict("records"):
        samples.append({**s, "type": "real_negative"})
    synth_files = sorted(Path(synthetic_dir).glob("*.png"))
    if synth_files:
        for f in random.Random(seed_pos).sample(
                synth_files, min(n, len(synth_files))):
            samples.append({"patientId": f.stem, "path": f, "label": 1,
                            "type": "synthetic"})

    for sample in samples:
        pid, label, stype = sample["patientId"], sample["label"], \
            sample["type"]
        img_path = (sample["path"] if stype == "synthetic" else
                    train_paths(data_dir, [pid])[0])
        try:
            rgb = Image.open(img_path).convert("RGB").resize(
                (image_size, image_size), Image.BILINEAR)
            rgb_np = np.asarray(rgb, np.float32) / 255.0
            normed = (rgb_np - IMAGENET_MEAN) / IMAGENET_STD

            fig, axes = plt.subplots(1, 1 + len(models),
                                     figsize=(5 * (1 + len(models)), 5))
            axes = np.atleast_1d(axes)
            axes[0].imshow(rgb_np)
            axes[0].set_title(f"Original ({stype})\nID: {pid}, "
                              f"Label: {label}")
            axes[0].axis("off")
            for i, (run, variables) in enumerate(models.items()):
                pred, cam = grad_cam_resnet(model, variables, normed)
                cam_img = np.asarray(Image.fromarray(
                    (cam * 255).astype(np.uint8)).resize(
                        (image_size, image_size), Image.BILINEAR),
                    np.float32) / 255.0
                heat = plt.get_cmap("jet")(cam_img)[..., :3]
                overlay = np.clip(0.5 * rgb_np + 0.5 * heat, 0, 1)
                axes[i + 1].imshow(overlay)
                axes[i + 1].set_title(f"{run.title()} CAM\n"
                                      f"Pred: {pred}, True: {label}")
                axes[i + 1].axis("off")
            plt.tight_layout()
            out = os.path.join(analysis_dir,
                               f"gradcam_{stype}_{pid}.png")
            plt.savefig(out, dpi=150, bbox_inches="tight")
            plt.close()
        except Exception as e:
            print(f"Warning: failed Grad-CAM for {pid} ({stype}): {e}")
    print(f"Finished Grad-CAM generation. Images saved in {analysis_dir}")
