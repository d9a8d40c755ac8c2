"""Typed model outputs.

JAX-pytree dataclasses mirroring the reference's typed returns:
TransformerEncoderOutput (reference src/classes/transformer/TransformerEncoder.py:15-20),
AutoEncoderOutput (reference src/classes/CnnAutoEncoder.py:18-24),
MdnReturn (reference src/classes/MixtureDensityNetwork.py:26-32),
NormalizingFlowReturn (reference src/classes/NormalizingFlow.py:14-19).
"""

from __future__ import annotations

from typing import Optional

import jax
from flax import struct


@struct.dataclass
class EncoderOutput:
    """patch_embedding: [B, P, D] patch tokens; latent: [B, D] pooled/cls."""

    patch_embedding: jax.Array
    latent: jax.Array


@struct.dataclass
class AutoEncoderOutput:
    """latent: [B, D]; reconstruction: [B, H, W, 3] (NHWC);
    patch_embedding: [B, P, D] for transformer AEs, else None."""

    latent: jax.Array
    reconstruction: jax.Array
    patch_embedding: Optional[jax.Array] = None


@struct.dataclass
class MdnOutput:
    """pi: [B, P, K] mixture logits; sigma/mu: [B, P, D, K].

    NOTE: materializing sigma/mu is the reference's memory hot spot
    (B*P*D*K floats, reference src/pipeline/LearnerMDN.py:147-169). The fused
    loss path in ops/gmm.py never builds these tensors; MdnOutput exists for
    API parity and small-scale inspection."""

    pi: jax.Array
    sigma: jax.Array
    mu: jax.Array


@struct.dataclass
class FlowOutput:
    """loss: scalar NLL; anomaly_score_map: [B, H, W] upsampled to img_size."""

    loss: jax.Array
    anomaly_score_map: jax.Array
