"""Model zoo: backbones, decoders, auto-encoders, and anomaly heads."""

from vit_ad_tpu.models.outputs import (  # noqa: F401
    AutoEncoderOutput,
    EncoderOutput,
    FlowOutput,
    MdnOutput,
)
