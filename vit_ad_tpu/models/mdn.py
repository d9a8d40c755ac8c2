"""Gaussian Mixture Density Network anomaly head.

Capability parity with reference GaussianMixtureDensityNetwork
(reference src/classes/MixtureDensityNetwork.py:117-171): three linear heads
over per-patch features — pi: D→K mixture logits, sigma: D→D*K (ELU+1+1e-15
positivity), mu: D→D*K — plus the NLL loss and probability map.

Parameters are stored in a chunk-friendly [D_in, D_out, K] layout so the fused
streaming log-likelihood (ops/gmm.py) can slice K without reshuffles; the
torch→JAX converter handles the reshape from torch's [D*K, D] Linear layout.

Init parity: xavier-normal weights everywhere; mu bias constant 0.001
(reference src/util/HelperFunctions.py:19-23); pi/sigma biases zero (torch
Linear default is uniform, but xavier_normal_ was applied only to weights —
we use zeros for determinism, a documented deviation with no effect on the
trained optimum).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.outputs import MdnOutput
from vit_ad_tpu.ops import gmm

Array = jax.Array


class GaussianMDN(nn.Module):
    features: int          # D — patch embedding size
    num_gaussians: int     # K
    dtypes: DtypePolicy = DtypePolicy()
    k_chunk: int = 8       # K streaming chunk for the fused likelihood

    def setup(self) -> None:
        d, k = self.features, self.num_gaussians
        xavier = nn.initializers.xavier_normal()
        # xavier stats must match a [D, D*K] dense layer, not [D, D, K].
        flat_xavier = lambda key, shape, dtype: xavier(
            key, (shape[0], shape[1] * shape[2]), dtype
        ).reshape(shape)
        pdt = self.dtypes.param_dtype
        self.w_pi = self.param("w_pi", xavier, (d, k), pdt)
        self.b_pi = self.param("b_pi", nn.initializers.zeros, (k,), pdt)
        self.w_sigma = self.param("w_sigma", flat_xavier, (d, d, k), pdt)
        self.b_sigma = self.param("b_sigma", nn.initializers.zeros, (d, k), pdt)
        self.w_mu = self.param("w_mu", flat_xavier, (d, d, k), pdt)
        self.b_mu = self.param(
            "b_mu", nn.initializers.constant(0.001), (d, k), pdt
        )

    def __call__(self, x: Array) -> MdnOutput:
        """Materialized pi/sigma/mu (API parity; memory O(B*P*D*K) — use
        log_likelihood() for training)."""
        xf = x.astype(jnp.float32)
        pi = jnp.einsum("bpd,dk->bpk", xf, self.w_pi.astype(jnp.float32)) + self.b_pi
        sigma = (
            jax.nn.elu(
                jnp.einsum("bpd,dek->bpek", xf, self.w_sigma.astype(jnp.float32))
                + self.b_sigma
            )
            + 1.0
            + 1e-15
        )
        mu = (
            jnp.einsum("bpd,dek->bpek", xf, self.w_mu.astype(jnp.float32))
            + self.b_mu
        )
        return MdnOutput(pi=pi, sigma=sigma, mu=mu)

    def log_likelihood(
        self, x: Array, rng: Optional[jax.Array] = None, tau: float = 1.0
    ) -> Array:
        """Fused per-feature log-likelihood [B,P,D].

        On TPU targets this dispatches to the Pallas custom-VJP kernel
        (ops/pallas/gmm_train.py) — forward AND backward keep every
        [..., K]-extent temporary in VMEM, which is what makes the MDN
        train step HBM-viable at large batch (PERF.md round 3). Wide heads
        (up to the D=2048 ResNet stage-3 envelope) run output-feature-tiled
        kernel variants — measured train-step winners at every supported
        width (+39% at the D=1024 stage-2 shapes, +5% at D=2048; PERF.md);
        exotic widths fall back to the XLA K-chunk scan. Both paths share
        the pi head / gumbel math, so scores and gradients agree to matmul
        rounding."""
        from vit_ad_tpu.ops.pallas.gmm_train import use_pallas_gmm_train

        f32 = lambda a: a.astype(jnp.float32)
        if use_pallas_gmm_train(self.features):
            from vit_ad_tpu.ops.pallas.gmm_train import (
                gmm_log_likelihood_train,
            )
            from vit_ad_tpu.ops.pallas.window_attention import (
                _target_platform,
            )

            on_tpu = _target_platform() == "tpu"
            xf = x.astype(jnp.float32)
            logits = (
                jnp.einsum("bpd,dk->bpk", xf, f32(self.w_pi)) + f32(self.b_pi)
            )
            log_pi = gmm.mixture_log_weights(logits, rng, tau)
            return gmm_log_likelihood_train(
                xf, log_pi,
                f32(self.w_sigma), f32(self.b_sigma),
                f32(self.w_mu), f32(self.b_mu),
                interpret=not on_tpu,
                # bf16 weight blocks match JAX's default TPU matmul
                # precision (f32 operands are rounded to bf16 on the MXU)
                matmul_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            )
        return gmm.fused_log_likelihood(
            x,
            f32(self.w_pi), f32(self.b_pi),
            f32(self.w_sigma), f32(self.b_sigma),
            f32(self.w_mu), f32(self.b_mu),
            rng=rng, tau=tau, k_chunk=self.k_chunk,
        )

    def loss(self, x: Array, rng: Optional[jax.Array] = None) -> Array:
        return gmm.mdn_loss_from_log_likelihood(self.log_likelihood(x, rng))

    def probability_map(self, x: Array, rng: Optional[jax.Array] = None) -> Array:
        """[B, P] per-patch probability map for scoring."""
        return gmm.probability_map(self.log_likelihood(x, rng))
