"""PyTorch → JAX weight conversion for the pretrained encoders.

The reference loads timm/torchvision/torch-hub checkpoints
(reference src/classes/transformer/TransformerEncoder.py:57,92,134,193,242-263;
src/classes/CnnEncoder.py:141-145); this module maps those state dicts onto
our flax param trees. Input is a plain `{name: np.ndarray}` dict — call
`state_dict_to_numpy` (needs torch) or pass arrays directly, so the core
converters are torch-free.

Layout conversions:
  * Linear  [out, in]        → kernel [in, out]        (transpose)
  * Conv2d  [out, in, kh, kw] → kernel [kh, kw, in, out]
  * LayerNorm/BatchNorm weight → scale; running stats → batch_stats
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def state_dict_to_numpy(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Detach a torch state dict to numpy (caller must have torch)."""
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in state_dict.items()}


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth checkpoint into numpy arrays (map_location=cpu, parity with
    reference ValidatorRecon.py:55-58)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    # unwrap common checkpoint containers BEFORE tensor conversion — EsViT
    # checkpoints are {'student': OrderedDict, 'teacher': ..., 'epoch': ...}
    # (reference TransformerEncoder.py:248 reads checkpoint['student'])
    for key in ("student", "state_dict", "model"):
        if isinstance(sd, dict) and isinstance(sd.get(key), dict):
            sd = sd[key]
            break
    return state_dict_to_numpy(sd)


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str = "module.") -> Dict[str, np.ndarray]:
    """Remove a DataParallel-style key prefix (reference EsViT surgery,
    TransformerEncoder.py:242-256)."""
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v for k, v in sd.items()
    }


def _linear(sd, name) -> Tuple[np.ndarray, np.ndarray]:
    return sd[f"{name}.weight"].T, sd[f"{name}.bias"]


def _conv(sd, name, bias=True):
    w = np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))  # OIHW → HWIO
    if bias and f"{name}.bias" in sd:
        return w, sd[f"{name}.bias"]
    return w, None


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def convert_vit(
    sd: Dict[str, np.ndarray], depth: int = 12, num_prefix_tokens: int = 2
) -> Dict[str, Any]:
    """timm ViT/DeiT state dict → ViTEncoder params.

    Handles both `dist_token` (deit distilled) and plain cls-token models.
    Returns the {'params': ...} variables dict."""
    params: Dict[str, Any] = {}

    kw, kb = _conv(sd, "patch_embed.proj")
    params["patch_embed"] = {"proj": {"kernel": kw, "bias": kb}}

    prefix = [sd["cls_token"]]
    if num_prefix_tokens == 2:
        key = "dist_token" if "dist_token" in sd else "distillation_token"
        prefix.append(sd[key])
    params["prefix_tokens"] = np.concatenate(prefix, axis=1)  # [1, n, D]
    params["pos_embed"] = sd["pos_embed"]

    # Stacked-block layout: ViTEncoder runs its depth-identical blocks with
    # lax.scan over a [depth, ...] leading axis (models/vit.py), so per-layer
    # torch weights stack along axis 0.
    stack = lambda fn: np.stack([fn(f"blocks.{i}") for i in range(depth)])
    params.update({
        "norm1_scale": stack(lambda b: sd[f"{b}.norm1.weight"]),
        "norm1_bias": stack(lambda b: sd[f"{b}.norm1.bias"]),
        "qkv_kernel": stack(lambda b: sd[f"{b}.attn.qkv.weight"].T),
        "qkv_bias": stack(lambda b: sd[f"{b}.attn.qkv.bias"]),
        "proj_kernel": stack(lambda b: sd[f"{b}.attn.proj.weight"].T),
        "proj_bias": stack(lambda b: sd[f"{b}.attn.proj.bias"]),
        "norm2_scale": stack(lambda b: sd[f"{b}.norm2.weight"]),
        "norm2_bias": stack(lambda b: sd[f"{b}.norm2.bias"]),
        "fc1_kernel": stack(lambda b: sd[f"{b}.mlp.fc1.weight"].T),
        "fc1_bias": stack(lambda b: sd[f"{b}.mlp.fc1.bias"]),
        "fc2_kernel": stack(lambda b: sd[f"{b}.mlp.fc2.weight"].T),
        "fc2_bias": stack(lambda b: sd[f"{b}.mlp.fc2.bias"]),
    })
    params["norm_scale"] = sd["norm.weight"]
    params["norm_bias"] = sd["norm.bias"]
    return {"params": params}


def convert_resnet50(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision ResNet-50 state dict → ResNetEncoder trunk variables
    ({'params', 'batch_stats'}). Stage LayerNorms stay at their fresh init
    (they are trainable additions, reference CnnEncoder.py:150-158)."""
    layers = (3, 4, 6, 3)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(src: str):
        return (
            {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]},
            {"mean": sd[f"{src}.running_mean"], "var": sd[f"{src}.running_var"]},
        )

    w, _ = _conv(sd, "conv1", bias=False)
    params["conv1"] = {"kernel": w}
    params["bn1"], stats["bn1"] = bn("bn1")

    for li, blocks in enumerate(layers):
        for bi in range(blocks):
            src = f"layer{li + 1}.{bi}"
            dst = f"layer{li + 1}_{bi}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                cw, _ = _conv(sd, f"{src}.conv{ci}", bias=False)
                p[f"conv{ci}"] = {"kernel": cw}
                p[f"bn{ci}"], s[f"bn{ci}"] = bn(f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                dw, _ = _conv(sd, f"{src}.downsample.0", bias=False)
                p["downsample_conv"] = {"kernel": dw}
                p["downsample_bn"], s["downsample_bn"] = bn(f"{src}.downsample.1")
            params[dst] = p
            stats[dst] = s

    return {"params": {"trunk": params}, "batch_stats": {"trunk": stats}}


def merge_variables(base: Dict[str, Any], loaded: Dict[str, Any]) -> Dict[str, Any]:
    """Overlay converted weights onto freshly-initialized variables (keeps
    params the converter does not cover, e.g. trainable stage norms), with
    shape checking."""
    import jax

    def overlay(b, l, path=""):
        if isinstance(b, dict):
            out = dict(b)
            for k, v in (l or {}).items():
                if k in out:
                    out[k] = overlay(out[k], v, f"{path}/{k}")
                else:
                    raise KeyError(f"converted key {path}/{k} not in model")
            return out
        arr = np.asarray(l)
        if tuple(arr.shape) != tuple(np.shape(b)):
            raise ValueError(
                f"shape mismatch at {path}: model {np.shape(b)} vs loaded {arr.shape}"
            )
        return jax.numpy.asarray(arr, dtype=b.dtype)

    return overlay(base, loaded)


def interpolate_rel_pos_table(
    table: np.ndarray, src_window: int, dst_window: int
) -> np.ndarray:
    """Bicubic-resize a relative-position bias table [(2Ws-1)^2, nH] to a new
    window size (reference interpolate_position_encoding,
    TransformerEncoder.py:276-350 — bicubic on the 2-D table grid)."""
    if src_window == dst_window:
        return table
    import scipy.ndimage

    s, d = 2 * src_window - 1, 2 * dst_window - 1
    n_heads = table.shape[1]
    grid = table.reshape(s, s, n_heads)
    zoom = (d / s, d / s, 1.0)
    out = scipy.ndimage.zoom(grid, zoom, order=3)
    assert out.shape == (d, d, n_heads)
    return out.reshape(d * d, n_heads).astype(table.dtype)


def convert_swin(
    sd: Dict[str, np.ndarray],
    img_size: int = 224,
    patch_size: int = 4,
    depths=(2, 2, 6, 2),
    window: int = 14,
) -> Dict[str, Any]:
    """EsViT Swin-T state dict (vendored-module naming: patch_embed.proj,
    layers.{i}.blocks.{j}.*, layers.{i}.downsample.*, norm — reference
    SwinTransformerModule.py:689-852) → our SwinTransformer params.

    Strips the `module.` prefix and `head.*` keys first if present (reference
    EsViT surgery, TransformerEncoder.py:242-256) and interpolates
    relative-position bias tables for stages whose resolution clamps the
    window (reference :258-263)."""
    sd = strip_prefix(sd, "module.")
    sd = {k: v for k, v in sd.items() if not k.startswith("head")}

    def ln(p):
        return {"LayerNorm_0": _ln(sd, p)}

    kw, kb = _conv(sd, "patch_embed.proj")
    params: Dict[str, Any] = {
        "patch_embed": {"kernel": kw, "bias": kb},
        "patch_norm": ln("patch_embed.norm"),
        "norm": ln("norm"),
    }

    res = img_size // patch_size
    for si, depth in enumerate(depths):
        eff_window = min(res, window)

        def block_leaves(bj):
            pfx = f"layers.{si}.blocks.{bj}"
            table = sd[f"{pfx}.attn.relative_position_bias_table"]
            src_window = int(round((table.shape[0] ** 0.5 + 1) / 2))
            return {
                "norm1_scale": sd[f"{pfx}.norm1.weight"],
                "norm1_bias": sd[f"{pfx}.norm1.bias"],
                "qkv_kernel": sd[f"{pfx}.attn.qkv.weight"].T,
                "qkv_bias": sd[f"{pfx}.attn.qkv.bias"],
                "bias_table": interpolate_rel_pos_table(
                    table, src_window, eff_window
                ),
                "proj_kernel": sd[f"{pfx}.attn.proj.weight"].T,
                "proj_bias": sd[f"{pfx}.attn.proj.bias"],
                "norm2_scale": sd[f"{pfx}.norm2.weight"],
                "norm2_bias": sd[f"{pfx}.norm2.bias"],
                "fc1_kernel": sd[f"{pfx}.mlp.fc1.weight"].T,
                "fc1_bias": sd[f"{pfx}.mlp.fc1.bias"],
                "fc2_kernel": sd[f"{pfx}.mlp.fc2.weight"].T,
                "fc2_bias": sd[f"{pfx}.mlp.fc2.bias"],
            }

        # scan-stacked (unshifted, shifted) pairs: 'a' = even blocks,
        # 'b' = odd blocks, stacked along a leading n_pairs axis
        stage: Dict[str, Any] = {}
        for tag, parity in (("a", 0), ("b", 1)):
            leaves = [block_leaves(2 * j + parity) for j in range(depth // 2)]
            for key in leaves[0]:
                stage[f"{tag}_{key}"] = np.stack([lv[key] for lv in leaves])
        params[f"layer{si}"] = stage

        if si < len(depths) - 1:
            dp = f"layers.{si}.downsample"
            params[f"layer{si}_downsample"] = {
                "norm": ln(f"{dp}.norm"),
                "reduction": {"kernel": sd[f"{dp}.reduction.weight"].T},
            }
            res //= 2
    return {"params": {"esvit": params}}
