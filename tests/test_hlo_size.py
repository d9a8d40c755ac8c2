"""HLO-size regression guard.

The axon remote-compile endpoint rejects oversized programs (HTTP 413); the
scan-stacked ViT/flow designs keep the lowered StableHLO small regardless of
depth. This locks that property so an accidental unroll (e.g. replacing
lax.scan with a Python loop) fails fast in CI instead of on the TPU."""

import jax
import jax.numpy as jnp

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.flow import NormalizingFlow, patch_tokens_to_map
from vit_ad_tpu.models.vit import deit_base_distilled_patch16

MAX_HLO_MB = 1.5


def _hlo_mb(fn, *args):
    return len(jax.jit(fn).lower(*args).as_text()) / 1e6


def test_flagship_hlo_stays_small():
    enc = deit_base_distilled_patch16(224, DtypePolicy())
    flow = NormalizingFlow(
        num_channels=768, img_size=224, num_patches=196,
        hidden_ratio=0.16, flow_steps=20, dtypes=DtypePolicy(),
    )
    ep = jax.eval_shape(
        lambda k: enc.init(k, jnp.zeros((1, 224, 224, 3))), jax.random.key(0)
    )
    fp = jax.eval_shape(
        lambda k: flow.init(k, jnp.zeros((1, 14, 14, 768))), jax.random.key(1)
    )
    im = jax.ShapeDtypeStruct((64, 224, 224, 3), jnp.uint8)

    def fused(e, f, x):
        feats = enc.apply(e, x.astype(jnp.bfloat16) / 255.0).patch_embedding
        am = flow.apply(f, patch_tokens_to_map(feats)).anomaly_score_map
        return jnp.max(am.reshape(am.shape[0], -1), axis=1)

    size = _hlo_mb(fused, ep, fp, im)
    assert size < MAX_HLO_MB, f"flagship HLO grew to {size:.2f} MB"


def test_deep_flow_hlo_constant_in_depth():
    sizes = []
    for steps in (4, 40):
        flow = NormalizingFlow(
            num_channels=768, img_size=224, num_patches=196,
            hidden_ratio=0.16, flow_steps=steps, dtypes=DtypePolicy(),
        )
        fp = jax.eval_shape(
            lambda k: flow.init(k, jnp.zeros((1, 14, 14, 768))),
            jax.random.key(0),
        )
        x = jax.ShapeDtypeStruct((8, 14, 14, 768), jnp.float32)
        sizes.append(_hlo_mb(lambda p, xx: flow.apply(p, xx).loss, fp, x))
    # a 40-step flow stays well under 1 MB with the scan design; an
    # accidental unroll would put the coupling body in the HLO 40x (multi-MB)
    assert sizes[1] < 1.0, sizes
