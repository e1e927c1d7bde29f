"""Batched SSIM on device — replaces the reference's O(N_synth x N_real)
host-side skimage loop (analyze_results.py:406-424, SURVEY.md §3.4).

Matches skimage.metrics.structural_similarity defaults for 2-D float
images: uniform 7x7 window, K1=0.01, K2=0.03, sample covariance
normalization (N/(N-1)), and border cropping of win_size//2 before
averaging. The all-pairs mean-SSIM matrix for 500x100 224px images is a
few fused reduce-window programs instead of 50,000 python-loop calls.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

WIN = 7
K1, K2 = 0.01, 0.03


def _uniform_filter(x: jnp.ndarray) -> jnp.ndarray:
    """Valid-window 7x7 mean over the last two dims of (..., H, W)."""
    w = jnp.ones((WIN, WIN), x.dtype) / (WIN * WIN)
    batch = x.reshape((-1,) + x.shape[-2:])[:, None]  # (B,1,H,W)
    out = lax.conv_general_dilated(
        batch, w[None, None], window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out[:, 0].reshape(x.shape[:-2] + out.shape[-2:])


def ssim_pair_matrix(a: jnp.ndarray, b: jnp.ndarray,
                     data_range: float = 1.0) -> jnp.ndarray:
    """(Na, H, W) x (Nb, H, W) float images -> (Na, Nb) mean-SSIM matrix."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    na, nb = a.shape[0], b.shape[0]

    mu_a = _uniform_filter(a)          # (Na, h, w)
    mu_b = _uniform_filter(b)
    # skimage uses sample (unbiased) covariance: cov_norm = N / (N - 1)
    npix = WIN * WIN
    cov_norm = npix / (npix - 1)
    var_a = cov_norm * (_uniform_filter(a * a) - mu_a * mu_a)
    var_b = cov_norm * (_uniform_filter(b * b) - mu_b * mu_b)

    c1 = (K1 * data_range) ** 2
    c2 = (K2 * data_range) ** 2

    def per_a(ai, mu_ai, var_ai):
        # ai: (H, W); broadcast against all of b
        mu_ab = _uniform_filter(ai[None] * b)          # (Nb, h, w)
        cov = cov_norm * (mu_ab - mu_ai[None] * mu_b)
        num = (2 * mu_ai[None] * mu_b + c1) * (2 * cov + c2)
        den = (mu_ai[None] ** 2 + mu_b ** 2 + c1) * (
            var_ai[None] + var_b + c2)
        return jnp.mean(num / den, axis=(-2, -1))      # (Nb,)

    return lax.map(lambda t: per_a(*t), (a, mu_a, var_a))  # (Na, Nb)


@jax.jit
def mean_ssim_per_synthetic(synth: jnp.ndarray,
                            real: jnp.ndarray) -> jnp.ndarray:
    """Mean SSIM of each synthetic image against all real references
    (the reference's avg_ssim_scores, analyze_results.py:414-420)."""
    return jnp.mean(ssim_pair_matrix(synth, real), axis=1)
