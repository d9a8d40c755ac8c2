"""Variational auto-encoder.

Parity-plus: the reference's VariationalAutoEncoder
(reference src/classes/VariationalAutoEncoder.py) is dead code — it references
attributes removed from its base classes (:70 uses self.flatten/flatten_size,
commented out in CnnEncoder.py:89-97) and no MODEL_DICT key constructs it, so
LearnerRecon.learn_vae (:165) is unreachable. This implementation makes the
capability real: vanilla CNN encoder → flatten → mu / log_var heads
(ELU+1+1e-15 positivity on log_var, reference :35-54), reparameterized
sampling, small decoder from the latent, and the KL term
(-0.5 * sum(1 + log_var - mu^2 - exp(log_var)), reference :57-62).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.cnn import VanillaCNNEncoder
from vit_ad_tpu.models.decoders import SmallDecoder
from vit_ad_tpu.models.outputs import AutoEncoderOutput

Array = jax.Array


class VariationalAutoEncoder(nn.Module):
    img_size: int = 224
    latent_dim: int = 256
    dtypes: DtypePolicy = DtypePolicy()

    def setup(self) -> None:
        self.encoder = VanillaCNNEncoder(img_size=self.img_size, dtypes=self.dtypes)
        s = math.ceil(self.img_size / 32)
        self.flatten_size = 768 * s * s
        self.fc_mu = nn.Dense(self.latent_dim, dtype=self.dtypes.compute_dtype,
                              param_dtype=self.dtypes.param_dtype)
        self.fc_log_var = nn.Dense(self.latent_dim, dtype=self.dtypes.compute_dtype,
                                   param_dtype=self.dtypes.param_dtype)
        self.decoder = SmallDecoder(
            img_size=self.img_size, z_space=self.latent_dim, dtypes=self.dtypes
        )

    def encode(self, x: Array, train: bool = False) -> Tuple[Array, Array]:
        z = self.encoder(x, train=train).patch_embedding
        z = z.reshape(z.shape[0], -1)
        mu = self.fc_mu(z)
        # ELU+1+1e-15 positivity on the variance head (reference :46-54)
        log_var = jax.nn.elu(self.fc_log_var(z)) + 1.0 + 1e-15
        return mu.astype(jnp.float32), log_var.astype(jnp.float32)

    def __call__(
        self, x: Array, rng: jax.Array, train: bool = False
    ) -> AutoEncoderOutput:
        out, _, _ = self.forward_with_posterior(x, rng, train=train)
        return out

    def forward_with_posterior(
        self, x: Array, rng: jax.Array, train: bool = False
    ) -> Tuple[AutoEncoderOutput, Array, Array]:
        """(output, mu, log_var) from ONE encode — the training loss must
        penalize the same posterior the reconstruction's z was sampled from
        (the reference uses the single forward's latent_space.mu/log_var,
        LearnerRecon.py learn_vae); a second train=False encode would see
        different BatchNorm statistics AND double the encoder FLOPs."""
        mu, log_var = self.encode(x, train=train)
        std = jnp.exp(0.5 * log_var)
        z = mu + std * jax.random.normal(rng, mu.shape)
        recon = self.decoder(z, train=train)
        return AutoEncoderOutput(latent=z, reconstruction=recon), mu, log_var

    @staticmethod
    def kl_loss(mu: Array, log_var: Array) -> Array:
        """KL(q || N(0,1)) per batch mean (reference :57-62)."""
        return jnp.mean(
            -0.5 * jnp.sum(1 + log_var - mu**2 - jnp.exp(log_var), axis=-1)
        )
