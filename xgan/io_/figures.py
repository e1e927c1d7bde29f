"""Matplotlib figure writers with the reference's filenames and content.

GAN loss curves: gan_loss_curve.png (train_gan.py:18-45), the CGAN 2-panel
variant (train_cgan.py:20-55), wgan_loss_curve.png (train_wggan.py:17-27).
Classifier curves + CV bars live in xgan.train.classifier's plotting
helpers and reuse these primitives.
"""
from __future__ import annotations

from typing import Dict

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plot_gan_losses(history: Dict, output_path: str) -> None:
    """Per-iteration G/D loss curves (DCGAN schema)."""
    g = history.get("G_losses_iter", [])
    d = history.get("D_losses_iter", [])
    if not g or not d:
        print("Warning: loss data missing; skipping plot.")
        return
    plt.figure(figsize=(12, 6))
    plt.plot(range(len(g)), g, label="Generator Loss", alpha=0.8)
    plt.plot(range(len(d)), d, label="Discriminator Loss", alpha=0.8)
    plt.title("Generator and Discriminator Loss During Training (Per Iteration)")
    plt.xlabel("Iterations")
    plt.ylabel("Loss (BCE)")
    plt.legend()
    plt.grid(True, linestyle="--", alpha=0.6)
    plt.tight_layout()
    plt.savefig(output_path)
    plt.close()
    print(f"Saved GAN loss plot to {output_path}")


def plot_cgan_losses(history: Dict, output_path: str) -> None:
    """Two-panel per-epoch plot (CGAN schema, train_cgan.py:20-55)."""
    g = history.get("G_losses_epoch", [])
    d = history.get("D_losses_epoch", [])
    if not g or not d:
        print("Warning: loss data missing; skipping plot.")
        return
    epochs = range(1, len(g) + 1)
    plt.figure(figsize=(12, 6))
    plt.subplot(2, 1, 1)
    plt.plot(epochs, g, label="Generator Loss", alpha=0.8)
    plt.plot(epochs, d, label="Discriminator Loss", alpha=0.8)
    plt.title("Generator and Discriminator Loss During Training (Per Epoch)")
    plt.xlabel("Epochs")
    plt.ylabel("Loss")
    plt.legend()
    plt.grid(True, linestyle="--", alpha=0.6)
    plt.subplot(2, 1, 2)
    plt.plot(epochs, history.get("perceptual_losses", []),
             label="Perceptual Loss", alpha=0.8)
    plt.plot(epochs, history.get("feature_matching_losses", []),
             label="Feature Matching Loss", alpha=0.8)
    plt.title("Additional Loss Components During Training")
    plt.xlabel("Epochs")
    plt.ylabel("Loss")
    plt.legend()
    plt.grid(True, linestyle="--", alpha=0.6)
    plt.tight_layout()
    plt.savefig(output_path)
    plt.close()
    print(f"Saved GAN loss plot to {output_path}")


def plot_wgan_losses(history: Dict, output_path: str) -> None:
    """Critic/generator per-iteration curves (train_wggan.py:17-27)."""
    plt.figure(figsize=(12, 6))
    plt.plot(history.get("D_losses", []), label="Critic (D) Loss")
    plt.plot(history.get("G_losses", []), label="Generator Loss")
    plt.legend()
    plt.xlabel("Iterations")
    plt.ylabel("Loss")
    plt.grid(True)
    plt.tight_layout()
    plt.savefig(output_path)
    plt.close()
    print(f"Saved GAN loss plot to {output_path}")


def save_image_grid(images_u8: np.ndarray, path: str, nrow: int = 8,
                    pad: int = 2) -> None:
    """Tile (B,S,S,3) uint8 images into a PNG grid.

    Plays the role of torchvision.utils.save_image(normalize=True, nrow=8)
    for sample sheets (train_gan.py:166-169); input is already uint8 so no
    renormalization is needed.
    """
    from PIL import Image
    import os
    b, s, _, c = images_u8.shape
    if b == 0:
        raise ValueError("save_image_grid: empty image batch")
    ncol = min(b, nrow)
    nrows = (b + ncol - 1) // ncol
    canvas = np.full((nrows * (s + pad) + pad, ncol * (s + pad) + pad, c),
                     255, np.uint8)
    for i in range(b):
        r, col = divmod(i, ncol)
        y = pad + r * (s + pad)
        x = pad + col * (s + pad)
        canvas[y:y + s, x:x + s] = images_u8[i]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(canvas).save(path)
