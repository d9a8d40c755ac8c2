"""SSIM: independent NumPy cross-check + metric properties."""

import numpy as np
import pytest

from vit_ad_tpu.ops.ssim import _gaussian_kernel_1d, ssim, ssim_loss


def _numpy_ssim(x, y, data_range=1.0, size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Direct (non-separable) NumPy SSIM with VALID windows."""
    g1 = _gaussian_kernel_1d(size, sigma).astype(np.float64)
    kern = np.outer(g1, g1)

    def blur(img):  # img [H,W]
        h, w = img.shape
        out = np.zeros((h - size + 1, w - size + 1))
        for i in range(out.shape[0]):
            for j in range(out.shape[1]):
                out[i, j] = np.sum(img[i : i + size, j : j + size] * kern)
        return out

    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    vals = []
    for b in range(x.shape[0]):
        for c in range(x.shape[-1]):
            xi, yi = x[b, :, :, c].astype(np.float64), y[b, :, :, c].astype(np.float64)
            mx, my = blur(xi), blur(yi)
            sx = blur(xi * xi) - mx * mx
            sy = blur(yi * yi) - my * my
            sxy = blur(xi * yi) - mx * my
            s = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
                (mx**2 + my**2 + c1) * (sx + sy + c2)
            )
            vals.append(s.mean())
    return float(np.mean(vals))


def test_matches_numpy(rng):
    x = rng.uniform(size=(2, 20, 20, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, size=x.shape), 0, 1).astype(np.float32)
    got = float(ssim(x, y))
    want = _numpy_ssim(x, y)
    assert got == pytest.approx(want, abs=2e-5)


def test_identity_is_one(rng):
    x = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-6)
    assert float(ssim_loss(x, x)) == pytest.approx(0.0, abs=1e-6)


def test_noise_decreases_ssim(rng):
    x = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    small = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    big = np.clip(x + rng.normal(0, 0.4, x.shape), 0, 1).astype(np.float32)
    assert float(ssim(x, big)) < float(ssim(x, small)) < 1.0


def test_per_image_ssim_masks_padding(rng):
    """ssim_per_image is independent across batch rows, so a masked mean over
    the real rows ignores padded duplicates entirely (the padded-static-batch
    SSIM objective in train_recon relies on this)."""
    import jax.numpy as jnp

    from vit_ad_tpu.ops.ssim import ssim_per_image

    x = jnp.asarray(rng.random((3, 16, 16, 3)).astype(np.float32))
    y = jnp.asarray(rng.random((3, 16, 16, 3)).astype(np.float32))
    valid = jnp.asarray([1.0, 1.0, 0.0])

    per = ssim_per_image(x, y)
    assert per.shape == (3,)
    assert float(ssim(x, y)) == pytest.approx(float(per.mean()), abs=1e-6)

    masked = float(jnp.sum(per * valid) / jnp.sum(valid))
    # garbage in the padding row must not move the masked mean
    x2 = x.at[2].set(0.0)
    per2 = ssim_per_image(x2, y)
    masked2 = float(jnp.sum(per2 * valid) / jnp.sum(valid))
    assert masked == pytest.approx(masked2, abs=1e-7)
    assert float(per2.mean()) != pytest.approx(float(per.mean()), abs=1e-4)
