"""FastFlow-style 2-D normalizing flow anomaly head.

Capability parity with reference NormalizingFlow (reference
src/classes/NormalizingFlow.py:22-145), which stacks FrEIA `AllInOneBlock`s
(affine coupling + learned global affine + fixed channel permutation) with
conv subnets alternating 3x3 / 1x1 kernels and `affine_clamping=2.0`.

FrEIA AllInOneBlock semantics reproduced here (FrEIA is not a dependency):

  * channel split: x1 = first (C - C//2) channels (subnet input),
    x2 = last C//2 channels (transformed half)
  * subnet output `a` is pre-scaled by 0.1; log-scale = clamp * 0.636 *
    atan(a_s) (the default "ATAN" soft clamp), shift = a_t
  * per-block order: coupling → global affine (per-channel learned scale
    via 0.1 * softplus_{beta=0.5}, init exactly 1.0, plus offset) → fixed
    random channel permutation
  * log|det J| = sum(log-scale over transformed half) +
    H*W * sum_c log(global_scale_c)

Loss and anomaly map follow the reference forward (NormalizingFlow.py:118-145):
loss = mean(0.5*sum(z^2) - logdet); anomaly map = bilinear-upsampled
(1 - exp(-0.5 * mean_c z^2)) at img_size (align_corners=False).

Everything is NHWC; the convs and couplings fuse into a single XLA graph.
An exact `inverse()` is provided — invertibility and logdet-vs-autodiff are
the correctness tests (tests/test_flow.py).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.outputs import FlowOutput
from vit_ad_tpu.ops.resize import interpolate_bilinear

Array = jax.Array

# softplus_{beta=0.5} parameter value p with 0.1 * softplus(p) == 1.0:
# 0.2 * log(1 + exp(0.5 p)) = 1  →  p = 2 * log(e^5 - 1)
_GLOBAL_SCALE_INIT = 2.0 * math.log(math.exp(5.0) - 1.0)


def _soft_clamp(a: Array, clamp: float) -> Array:
    """FrEIA's default ATAN clamp: clamp * 0.636 * atan(u) ∈ (-clamp, clamp)."""
    return clamp * 0.636 * jnp.arctan(a)


class CouplingSubnet(nn.Module):
    """conv(k) → ReLU → conv(k), hidden = int(in_ch * hidden_ratio)
    (reference NormalizingFlow.subnet_conv_fun, :61-82)."""

    kernel: int
    hidden: int
    out_channels: int
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = (self.kernel, self.kernel)
        x = nn.Conv(
            self.hidden, k, padding="SAME",
            dtype=self.dtypes.compute_dtype, param_dtype=self.dtypes.param_dtype,
            name="conv1",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.out_channels, k, padding="SAME",
            dtype=self.dtypes.compute_dtype, param_dtype=self.dtypes.param_dtype,
            name="conv2",
        )(x)
        return x


class FlowStep(nn.Module):
    """One AllInOneBlock-equivalent invertible step (NHWC)."""

    channels: int
    kernel: int
    hidden_ratio: float
    clamp: float = 2.0
    perm_seed: int = 0
    dtypes: DtypePolicy = DtypePolicy()

    def setup(self) -> None:
        c = self.channels
        self.split1 = c - c // 2
        self.split2 = c // 2
        self.subnet = CouplingSubnet(
            kernel=self.kernel,
            hidden=int(self.split1 * self.hidden_ratio),
            out_channels=2 * self.split2,
            dtypes=self.dtypes,
        )
        self.global_scale_p = self.param(
            "global_scale",
            nn.initializers.constant(_GLOBAL_SCALE_INIT),
            (c,),
            self.dtypes.param_dtype,
        )
        self.global_offset = self.param(
            "global_offset", nn.initializers.zeros, (c,), self.dtypes.param_dtype
        )
        # Fixed (non-learned) channel permutation, deterministic per step.
        # NumPy RNG (not jax.random): must be concrete at trace time.
        perm = np.random.default_rng(self.perm_seed).permutation(c)
        self.perm = jnp.asarray(perm)
        self.inv_perm = jnp.asarray(np.argsort(perm))

    def _global_scale(self) -> Array:
        p = self.global_scale_p.astype(jnp.float32)
        # 0.1 * softplus_{beta=0.5}(p) = 0.2 * log(1 + exp(0.5 p))
        return 0.2 * jnp.logaddexp(0.0, 0.5 * p)

    def __call__(self, x: Array) -> Tuple[Array, Array]:
        """x: [B,H,W,C] → (y, logdet [B])."""
        b, h, w, _ = x.shape
        x1 = x[..., : self.split1]
        x2 = x[..., self.split1 :]
        a = self.subnet(x1).astype(jnp.float32) * 0.1
        s = _soft_clamp(a[..., : self.split2], self.clamp)
        t = a[..., self.split2 :]
        x2 = x2 * jnp.exp(s) + t
        logdet = jnp.sum(s, axis=(1, 2, 3))

        y = jnp.concatenate([x1, x2], axis=-1)
        scale = self._global_scale()
        y = y * scale + self.global_offset.astype(jnp.float32)
        logdet = logdet + h * w * jnp.sum(jnp.log(scale))
        y = jnp.take(y, self.perm, axis=-1)
        return y, logdet

    def inverse(self, y: Array) -> Tuple[Array, Array]:
        """Exact inverse; returns (x, logdet of the forward map)."""
        b, h, w, _ = y.shape
        y = jnp.take(y, self.inv_perm, axis=-1)
        scale = self._global_scale()
        y = (y - self.global_offset.astype(jnp.float32)) / scale
        x1 = y[..., : self.split1]
        x2 = y[..., self.split1 :]
        a = self.subnet(x1).astype(jnp.float32) * 0.1
        s = _soft_clamp(a[..., : self.split2], self.clamp)
        t = a[..., self.split2 :]
        x2 = (x2 - t) * jnp.exp(-s)
        logdet = jnp.sum(s, axis=(1, 2, 3)) + h * w * jnp.sum(jnp.log(scale))
        return jnp.concatenate([x1, x2], axis=-1), logdet


class NormalizingFlow(nn.Module):
    """Stack of FlowSteps with kernels alternating 3x3 (even i) / 1x1 (odd i)
    (reference NormalizingFlow.fast_flow_steps, :84-116)."""

    num_channels: int
    img_size: int
    num_patches: int
    hidden_ratio: float = 1.0
    flow_steps: int = 8
    clamp: float = 2.0
    dtypes: DtypePolicy = DtypePolicy()

    def setup(self) -> None:
        self.steps = [
            FlowStep(
                channels=self.num_channels,
                kernel=1 if i % 2 == 1 else 3,
                hidden_ratio=self.hidden_ratio,
                clamp=self.clamp,
                perm_seed=i,
                dtypes=self.dtypes,
                name=f"step_{i}",
            )
            for i in range(self.flow_steps)
        ]

    @property
    def feature_side(self) -> int:
        return int(math.isqrt(self.num_patches))

    def transform(self, x: Array) -> Tuple[Array, Array]:
        """[B,H,W,C] → (z, logdet [B])."""
        logdet = jnp.zeros(x.shape[0], dtype=jnp.float32)
        z = x.astype(jnp.float32)
        for step in self.steps:
            z, ld = step(z)
            logdet = logdet + ld
        return z, logdet

    def inverse(self, z: Array) -> Array:
        x = z.astype(jnp.float32)
        for step in reversed(self.steps):
            x, _ = step.inverse(x)
        return x

    def __call__(self, x: Array) -> FlowOutput:
        """Loss + anomaly map (reference NormalizingFlow.forward, :118-145).
        x: [B, H', W', C] feature map (NHWC)."""
        z, logdet = self.transform(x)
        loss = jnp.mean(0.5 * jnp.sum(z * z, axis=(1, 2, 3)) - logdet)
        log_likelihood = -0.5 * jnp.mean(z * z, axis=-1)  # [B, H', W']
        prob = jnp.exp(log_likelihood)
        anomaly = 1.0 - prob
        anomaly_map = interpolate_bilinear(
            anomaly, self.img_size, self.img_size, align_corners=False
        )
        return FlowOutput(loss=loss, anomaly_score_map=anomaly_map)


def patch_tokens_to_map(patch_embedding: Array) -> Array:
    """[B, P, D] → [B, √P, √P, D] (reference LearnerNF.py:140-144 does the
    NCHW analogue)."""
    b, p, d = patch_embedding.shape
    side = int(math.isqrt(p))
    return patch_embedding.reshape(b, side, side, d)
