"""Auto-encoder assemblies.

Parity with reference CnnAutoEncoder.py / TransformerAutoEncoder.py:
  * VanillaAutoEncoder — vanilla CNN encoder + small decoder
    (reference src/classes/CnnAutoEncoder.py:27-83).
  * ResNetAutoEncoder — ResNet-50 encoder + ReverseResNet decoder
    (AutoEncoderResNet, :134-154) or + small decoder from the 2048 latent
    (AutoEncoderResNetSmallDecoder, :111-131).
  * TransformerAutoEncoder — frozen transformer encoder + ResNetDecoder
    (default) or SmallDecoder; decodes from the pooled/cls latent and also
    returns the patch embedding (reference
    src/classes/transformer/TransformerAutoEncoder.py:152-194).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.cnn import VanillaCNNEncoder
from vit_ad_tpu.models.decoders import ResNetDecoder, SmallDecoder
from vit_ad_tpu.models.outputs import AutoEncoderOutput
from vit_ad_tpu.models.resnet import ResNetEncoder
from vit_ad_tpu.models.reverse_resnet import ReverseResNet

Array = jax.Array


class VanillaAutoEncoder(nn.Module):
    img_size: int = 224
    dtypes: DtypePolicy = DtypePolicy()

    def setup(self) -> None:
        self.encoder = VanillaCNNEncoder(img_size=self.img_size, dtypes=self.dtypes)
        self.decoder = SmallDecoder(img_size=self.img_size, z_space=0, dtypes=self.dtypes)

    def __call__(self, x: Array, train: bool = False) -> AutoEncoderOutput:
        out = self.encoder(x, train=train)
        b = x.shape[0]
        side = self.img_size // 32
        z = out.patch_embedding.reshape(b, side, side, -1)  # [B, s, s, 768]
        recon = self.decoder(z, train=train)
        return AutoEncoderOutput(
            latent=z.reshape(b, -1), reconstruction=recon
        )


class ResNetAutoEncoder(nn.Module):
    """small_decoder=False → ReverseResNet from the stage-4 map's pooled
    latent; small_decoder=True → SmallDecoder from the 2048 latent."""

    img_size: int = 224
    small_decoder: bool = False
    dtypes: DtypePolicy = DtypePolicy()

    def setup(self) -> None:
        self.encoder = ResNetEncoder(img_size=self.img_size, dtypes=self.dtypes)
        if self.small_decoder:
            self.decoder = SmallDecoder(
                img_size=self.img_size, z_space=2048, dtypes=self.dtypes
            )
        else:
            self.decoder = ReverseResNet(img_size=self.img_size, dtypes=self.dtypes)

    def __call__(self, x: Array, train: bool = False) -> AutoEncoderOutput:
        out = self.encoder(x, train=False)  # frozen encoder: eval-mode BN
        z = out.latent  # [B, 2048]
        recon = self.decoder(z, train=train)
        return AutoEncoderOutput(latent=z, reconstruction=recon)


class TransformerAutoEncoder(nn.Module):
    """Frozen transformer encoder + trainable conv decoder."""

    encoder: nn.Module
    decoder_kind: str = "resnet"  # "resnet" | "cnn"
    img_size: int = 224
    dtypes: DtypePolicy = DtypePolicy()

    def setup(self) -> None:
        embed_dim = self.encoder.embed_dim
        if self.decoder_kind == "resnet":
            self.decoder = ResNetDecoder(
                embedding_size=embed_dim, img_size=self.img_size, dtypes=self.dtypes
            )
        elif self.decoder_kind == "cnn":
            self.decoder = SmallDecoder(
                img_size=self.img_size, z_space=embed_dim, dtypes=self.dtypes
            )
        else:
            raise ValueError(f"Unknown decoder_kind {self.decoder_kind!r}")

    def __call__(
        self, x: Array, block_index: int = 0, train: bool = False
    ) -> AutoEncoderOutput:
        out = self.encoder(x, block_index=block_index)
        recon = self.decoder(out.latent, train=train)
        return AutoEncoderOutput(
            latent=out.latent,
            reconstruction=recon,
            patch_embedding=out.patch_embedding,
        )
