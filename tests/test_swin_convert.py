"""EsViT Swin checkpoint conversion: vendored-module key naming, module.
prefix surgery, relative-position-table interpolation
(reference TransformerEncoder.py:242-263, 276-350)."""

import numpy as np
import pytest
import torch

from tests.test_swin import TSwin
from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.swin import SwinTransformer
from vit_ad_tpu.utils.torch_convert import (
    convert_swin,
    interpolate_rel_pos_table,
    merge_variables,
    state_dict_to_numpy,
)

import jax
import jax.numpy as jnp

F32 = DtypePolicy.f32()


def _rename_to_esvit_layout(sd, depths=(2, 2)):
    """Map the mini torch swin's names to the vendored module layout
    (patch_embed.proj, layers.{i}.blocks.{j}, layers.{i}.downsample)."""
    out = {}
    block = 0
    mapping = {}
    for si, depth in enumerate(depths):
        for bj in range(depth):
            mapping[f"blocks.{block}"] = f"layers.{si}.blocks.{bj}"
            block += 1
        if si < len(depths) - 1:
            mapping[f"merges.{si}"] = f"layers.{si}.downsample"
    for k, v in sd.items():
        nk = k
        if k.startswith("patch_embed."):
            nk = k.replace("patch_embed.", "patch_embed.proj.")
        elif k.startswith("patch_norm."):
            nk = k.replace("patch_norm.", "patch_embed.norm.")
        else:
            for old, new in mapping.items():
                if k.startswith(old + "."):
                    nk = new + k[len(old):].replace(".fc1", ".mlp.fc1").replace(
                        ".fc2", ".mlp.fc2"
                    )
                    break
        out["module." + nk] = v  # DataParallel prefix, stripped by converter
    out["module.head.weight"] = np.zeros((3, 16), np.float32)  # dropped
    return out


def test_convert_swin_forward_parity(rng):
    torch.manual_seed(13)
    tm = TSwin(img=16, patch=2, dim=8, depths=(2, 2), heads=(2, 4), ws=4).eval()
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want_latent, want_region = tm(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        )

    sd = _rename_to_esvit_layout(
        state_dict_to_numpy(tm.state_dict()), depths=(2, 2)
    )
    converted = convert_swin(sd, img_size=16, patch_size=2, depths=(2, 2),
                             window=4)

    model = SwinTransformer(
        img_size=16, patch_size=2, embed_dim=8, depths=(2, 2),
        num_heads=(2, 4), window=4, dtypes=F32,
    )
    # wrap under the EsViTEncoder-style 'esvit' scope the converter emits
    base = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    variables = merge_variables(base, {"params": converted["params"]["esvit"]})
    out = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out.patch_embedding), want_region.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.latent), want_latent.numpy(), rtol=1e-4, atol=1e-5
    )


def test_rel_pos_table_interpolation():
    table = np.random.default_rng(0).normal(size=((2 * 14 - 1) ** 2, 3)).astype(
        np.float32
    )
    out = interpolate_rel_pos_table(table, 14, 7)
    assert out.shape == ((2 * 7 - 1) ** 2, 3)
    # identity when window unchanged
    same = interpolate_rel_pos_table(table, 14, 14)
    np.testing.assert_array_equal(same, table)
    # smooth table should interpolate to similar value range
    assert abs(out.mean() - table.mean()) < 0.2
