"""Bilinear interpolation matching torch.nn.functional.interpolate.

The reference upsamples anomaly maps with both conventions:
  * align_corners=True  — MDN validator (reference src/pipeline/ValidatorMDN.py:137-162)
  * align_corners=False — NF head (reference src/classes/NormalizingFlow.py:134-144)

jax.image.resize implements neither exactly (it uses scale-and-translate
half-pixel sampling without the clamp-at-edges behavior for upscaling), so
this is a standalone implementation: separable row/column gathers with
precomputed (static) indices and weights — two gathers + two FMAs, fully
fusible by XLA. Golden-tested against torch in tests/test_resize.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _source_coords(
    out_size: int, in_size: int, align_corners: bool
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static (lo index, hi index, hi weight) per output position."""
    out = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = out * (in_size - 1) / max(out_size - 1, 1)
    else:
        src = (out + 0.5) * in_size / out_size - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int32)
    lo = np.minimum(lo, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    return lo, hi, w_hi


@partial(jax.jit, static_argnums=(1, 2), static_argnames=("align_corners",))
def interpolate_bilinear(
    x: Array, out_h: int, out_w: int, align_corners: bool = False
) -> Array:
    """Resize the two middle spatial dims of [B, H, W, C] (or trailing dims of
    [B, H, W]) to (out_h, out_w)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    b, h, w, c = x.shape
    lo_r, hi_r, wr = _source_coords(out_h, h, align_corners)
    lo_c, hi_c, wc = _source_coords(out_w, w, align_corners)

    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    xf = x.astype(dtype)
    wr = jnp.asarray(wr, dtype)[None, :, None, None]
    wc = jnp.asarray(wc, dtype)[None, None, :, None]

    rows = jnp.take(xf, lo_r, axis=1) * (1 - wr) + jnp.take(xf, hi_r, axis=1) * wr
    out = jnp.take(rows, lo_c, axis=2) * (1 - wc) + jnp.take(rows, hi_c, axis=2) * wc
    return out[..., 0] if squeeze else out
