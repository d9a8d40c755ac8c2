"""Structural Similarity (SSIM) on TPU.

Parity with torchmetrics.StructuralSimilarityIndexMeasure as the reference
uses it (reference src/classes/CnnAutoEncoder.py:48, data_range=1.0,
elementwise_mean reduction; SSIM loss = 1 - SSIM, :77-83): gaussian kernel
11x11 sigma 1.5, k1=0.01, k2=0.03, VALID (unpadded) windows, biased variance
estimates, per-channel then global mean.

Implemented as two separable depthwise 1-D convolutions per moment — XLA
fuses the five moment maps into a handful of fused convolutions; no Pallas
needed at these sizes. Cross-checked against an independent NumPy
implementation in tests/test_ssim.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _gaussian_kernel_1d(size: int, sigma: float) -> np.ndarray:
    # torchmetrics: gaussian over [-size/2 + 0.5 ... size/2 - 0.5] / sigma
    coords = (np.arange(size, dtype=np.float64) - (size - 1) / 2.0) / sigma
    g = np.exp(-0.5 * coords**2)
    return (g / g.sum()).astype(np.float32)


def _blur(x: Array, kernel: np.ndarray) -> Array:
    """Separable VALID gaussian filter over H,W of [B,H,W,C]."""
    k = jnp.asarray(kernel, x.dtype)
    kh = k.reshape(-1, 1, 1, 1)  # [K,1,1,1] → filter over H
    kw = k.reshape(1, -1, 1, 1)
    c = x.shape[-1]
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kh, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
    )
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kw, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
    )
    return x


@partial(
    jax.jit,
    static_argnames=("data_range", "kernel_size", "sigma", "k1", "k2"),
)
def ssim_per_image(
    preds: Array,
    target: Array,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> Array:
    """Per-image SSIM [B]. Inputs [B,H,W,C], float."""
    kernel = _gaussian_kernel_1d(kernel_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    x = preds.astype(jnp.float32)
    y = target.astype(jnp.float32)
    mu_x = _blur(x, kernel)
    mu_y = _blur(y, kernel)
    mu_xx = _blur(x * x, kernel)
    mu_yy = _blur(y * y, kernel)
    mu_xy = _blur(x * y, kernel)

    sigma_x = mu_xx - mu_x * mu_x
    sigma_y = mu_yy - mu_y * mu_y
    sigma_xy = mu_xy - mu_x * mu_y

    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))


def ssim(preds: Array, target: Array, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> Array:
    """Mean SSIM over the batch. Inputs [B,H,W,C], float."""
    return jnp.mean(
        ssim_per_image(preds, target, data_range, kernel_size, sigma, k1, k2)
    )


def ssim_loss(preds: Array, target: Array, data_range: float = 1.0) -> Array:
    """1 - SSIM (reference VanillaAutoEncoder.SSIMLoss,
    CnnAutoEncoder.py:77-83)."""
    return 1.0 - ssim(preds, target, data_range)
