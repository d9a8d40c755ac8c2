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

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import numpy as np


class StrictStateDict:
    """Wraps a source state dict and tracks key consumption.

    Every converter must account for EVERY source key — either by reading it
    or by explicitly dropping it (`drop`) — so a layout drift in the upstream
    checkpoint fails loudly instead of silently leaving weights at random
    init (VERDICT round-1 item 2). `finish()` raises on unconsumed keys."""

    def __init__(self, sd: Mapping[str, np.ndarray]) -> None:
        self._sd = dict(sd)
        self._consumed: set = set()

    def __getitem__(self, key: str) -> np.ndarray:
        if key not in self._sd:
            raise KeyError(
                f"source checkpoint is missing expected key {key!r}"
            )
        self._consumed.add(key)
        return self._sd[key]

    def __contains__(self, key: str) -> bool:
        return key in self._sd

    def keys(self):
        return self._sd.keys()

    def drop(self, *prefixes: str, suffix: str = "") -> None:
        """Explicitly discard keys by prefix (e.g. classifier heads) or
        suffix (e.g. '.num_batches_tracked' buffers)."""
        for k in self._sd:
            if (prefixes and any(k.startswith(p) for p in prefixes)) or (
                suffix and k.endswith(suffix)
            ):
                self._consumed.add(k)

    def finish(self) -> None:
        left = sorted(set(self._sd) - self._consumed)
        if left:
            preview = ", ".join(left[:12])
            raise ValueError(
                f"{len(left)} source keys were not consumed by the converter "
                f"(layout drift?): {preview}"
                + ("..." if len(left) > 12 else "")
            )


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
    Returns the {'params': ...} variables dict. Strict: every source key must
    be consumed or explicitly dropped (classifier heads)."""
    sd = StrictStateDict(sd)
    sd.drop("head.", "head_dist.", "pre_logits.", suffix="num_batches_tracked")
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
    sd.finish()
    return {"params": params}


def convert_resnet50(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision ResNet-50 state dict → ResNetEncoder trunk variables
    ({'params', 'batch_stats'}). Stage LayerNorms stay at their fresh init
    (they are trainable additions, reference CnnEncoder.py:150-158)."""
    sd = StrictStateDict(sd)
    sd.drop("fc.", suffix="num_batches_tracked")
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

    sd.finish()
    return {"params": {"trunk": params}, "batch_stats": {"trunk": stats}}


def convert_nest(
    sd: Dict[str, np.ndarray], depths=(2, 2, 8), num_heads=(3, 6, 12)
) -> Dict[str, Any]:
    """timm `jx_nest_tiny` state dict → NesT params (reference loads it
    pretrained, src/classes/transformer/TransformerEncoder.py:57).

    timm layout (timm/models/nest.py): `patch_embed.proj` conv,
    `levels.{i}.pos_embed` [1, blocks, seq, D],
    `levels.{i}.pool.{conv,norm}` (levels 1..; the pool runs at the START of
    a timm level — our ConvPool `pool{i-1}` at the END of the previous level
    is the same weight), `levels.{i}.transformer_encoder.{j}.*` pre-LN blocks
    with fused qkv, root `norm`. Strict: every key consumed or dropped.

    timm quirk handled here: nest's Attention merges heads as (head_dim,
    heads) — `(attn @ v).permute(0, 2, 3, 4, 1).reshape(...)` — i.e. the
    proj input channel layout is transposed vs the standard ViT (heads,
    head_dim). Our NestBlock uses the standard order, so the proj kernel's
    input rows are permuted accordingly."""
    sd = StrictStateDict(sd)
    sd.drop("head.", suffix="num_batches_tracked")

    def ln(p):
        # our LayerNorm wrapper nests flax's nn.LayerNorm as LayerNorm_0
        return {"LayerNorm_0": _ln(sd, p)}

    kw, kb = _conv(sd, "patch_embed.proj")
    params: Dict[str, Any] = {"patch_embed": {"kernel": kw, "bias": kb}}

    for li, depth in enumerate(depths):
        params[f"pos_embed_{li}"] = sd[f"levels.{li}.pos_embed"]
        if li > 0:
            pool = f"levels.{li}.pool"
            pw, pb = _conv(sd, f"{pool}.conv")
            params[f"pool{li - 1}"] = {
                "conv": {"kernel": pw, "bias": pb},
                "norm": ln(f"{pool}.norm"),
            }
        for bj in range(depth):
            b = f"levels.{li}.transformer_encoder.{bj}"
            proj_k = sd[f"{b}.attn.proj.weight"].T  # [C_in, C_out]
            c = proj_k.shape[0]
            heads = num_heads[li]
            hd = c // heads
            # torch rows are (hd, heads)-ordered; ours are (heads, hd)
            proj_k = proj_k.reshape(hd, heads, c).transpose(1, 0, 2).reshape(c, c)
            params[f"level{li}_block{bj}"] = {
                "norm1": ln(f"{b}.norm1"),
                "qkv": {"kernel": sd[f"{b}.attn.qkv.weight"].T,
                        "bias": sd[f"{b}.attn.qkv.bias"]},
                "proj": {"kernel": proj_k,
                         "bias": sd[f"{b}.attn.proj.bias"]},
                "norm2": ln(f"{b}.norm2"),
                "mlp": {
                    "fc1": {"kernel": sd[f"{b}.mlp.fc1.weight"].T,
                            "bias": sd[f"{b}.mlp.fc1.bias"]},
                    "fc2": {"kernel": sd[f"{b}.mlp.fc2.weight"].T,
                            "bias": sd[f"{b}.mlp.fc2.bias"]},
                },
            }
    params["norm"] = ln("norm")
    sd.finish()
    return {"params": params}


def _bn(sd, name):
    """torch BatchNorm → (params, batch_stats)."""
    return (
        {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]},
        {"mean": sd[f"{name}.running_mean"], "var": sd[f"{name}.running_var"]},
    )


def convert_efficientformer(
    sd: Dict[str, np.ndarray], depths=(4, 4, 12, 6), vit_num: int = 4
) -> Dict[str, Any]:
    """timm `efficientformer_l3` state dict → EfficientFormer variables
    (reference loads it pretrained,
    src/classes/transformer/TransformerEncoder.py:92).

    timm layout (timm/models/efficientformer.py): `stem.conv1/norm1/conv2/
    norm2`, `stages.{i}.downsample.{conv,norm}` (i>=1), blocks are
    MetaBlock2d (pool mixer + ConvMlpWithNorm fc1/norm1/fc2/norm2) until the
    last `vit_num` of the final stage, where a parameter-less `Flat` module
    occupies one Sequential slot and MetaBlock1d (norm1 / token_mixer
    Attention / norm2 / mlp) follow — so torch block indices shift by one
    after the Flat. attention_bias_idxs buffers are recomputed, heads are
    dropped. Strict: every key consumed or dropped."""
    sd = StrictStateDict(sd)
    sd.drop("head.", "head_dist.", "dist_head.",
            suffix="num_batches_tracked")
    sd.drop(suffix="attention_bias_idxs")

    def ln(p):
        return {"LayerNorm_0": _ln(sd, p)}

    def conv_bn(dst_p, dst_s, src_conv, src_bn):
        w, b = _conv(sd, src_conv)
        conv = {"kernel": w}
        if b is not None:
            conv["bias"] = b
        p, s = _bn(sd, src_bn)
        dst_p["conv"] = conv
        dst_p["bn"] = p
        dst_s["bn"] = s

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, (dst, cs, bs) in enumerate(
        [("stem1", "stem.conv1", "stem.norm1"),
         ("stem2", "stem.conv2", "stem.norm2")]
    ):
        params[dst], stats[dst] = {}, {}
        conv_bn(params[dst], stats[dst], cs, bs)

    for si, depth in enumerate(depths):
        if si > 0:
            dst = f"downsample{si}"
            params[dst], stats[dst] = {}, {}
            conv_bn(params[dst], stats[dst],
                    f"stages.{si}.downsample.conv",
                    f"stages.{si}.downsample.norm")
        n_3d = vit_num if si == len(depths) - 1 else 0
        for bj in range(depth):
            # Flat occupies one torch Sequential slot before the 1d blocks
            tj = bj if bj < depth - n_3d else bj + 1
            src = f"stages.{si}.blocks.{tj}"
            dst = f"stage{si}_block{bj}"
            p: Dict[str, Any] = {
                "layer_scale_1": sd[f"{src}.layer_scale_1"],
                "layer_scale_2": sd[f"{src}.layer_scale_2"],
            }
            if bj < depth - n_3d:  # MetaBlock2d
                s: Dict[str, Any] = {"mlp_fc1": {}, "mlp_fc2": {}}
                p["mlp_fc1"], p["mlp_fc2"] = {}, {}
                conv_bn(p["mlp_fc1"], s["mlp_fc1"],
                        f"{src}.mlp.fc1", f"{src}.mlp.norm1")
                conv_bn(p["mlp_fc2"], s["mlp_fc2"],
                        f"{src}.mlp.fc2", f"{src}.mlp.norm2")
                stats[dst] = s
            else:  # MetaBlock1d
                p.update({
                    "norm1": ln(f"{src}.norm1"),
                    "qkv": {
                        "kernel": sd[f"{src}.token_mixer.qkv.weight"].T,
                        "bias": sd[f"{src}.token_mixer.qkv.bias"],
                    },
                    "attention_biases": sd[f"{src}.token_mixer.attention_biases"],
                    "proj": {
                        "kernel": sd[f"{src}.token_mixer.proj.weight"].T,
                        "bias": sd[f"{src}.token_mixer.proj.bias"],
                    },
                    "norm2": ln(f"{src}.norm2"),
                    "mlp": {
                        "fc1": {"kernel": sd[f"{src}.mlp.fc1.weight"].T,
                                "bias": sd[f"{src}.mlp.fc1.bias"]},
                        "fc2": {"kernel": sd[f"{src}.mlp.fc2.weight"].T,
                                "bias": sd[f"{src}.mlp.fc2.bias"]},
                    },
                })
            params[dst] = p
    params["norm"] = ln("norm")
    sd.finish()
    return {"params": params, "batch_stats": stats}


def convert_efficientnet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """NVIDIA `nvidia_efficientnet_widese_b4` state dict → EfficientNetEncoder
    variables (reference loads it from torch.hub,
    src/classes/CnnEncoder.py:106-126).

    NVIDIA layout (DeepLearningExamples ConvNets efficientnet.py):
    `stem.{conv,bn}`, `layer{L}.block{j}.{expand,depsep,proj}.{conv,bn}` with
    `se.{squeeze,expand}` Linear pairs (widese: squeeze width from the
    expanded channels), `features.{conv,bn}` head, `classifier.fc` (dropped —
    the reference only calls extract_features). SE Linears become 1x1 convs.
    Strict: every key consumed or dropped."""
    from vit_ad_tpu.models.efficientnet import _B0_BLOCKS, _round_repeats

    sd = StrictStateDict(sd)
    sd.drop("classifier.", suffix="num_batches_tracked")

    def conv_bn(src):
        w, _ = _conv(sd, f"{src}.conv", bias=False)
        p, s = _bn(sd, f"{src}.bn")
        return {"conv": {"kernel": w}, "bn": p}, {"bn": s}

    def se_linear_to_conv(src):
        w = sd[f"{src}.weight"]  # [out, in]
        return {
            "kernel": w.T.reshape(1, 1, w.shape[1], w.shape[0]),
            "bias": sd[f"{src}.bias"],
        }

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["stem"], stats["stem"] = conv_bn("stem")

    bi = 0
    for li, (expand, _ch, reps, _stride, _k) in enumerate(_B0_BLOCKS):
        for r in range(_round_repeats(reps)):
            src = f"layer{li + 1}.block{r}"
            dst = f"block{bi}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            if expand != 1:
                p["expand"], s["expand"] = conv_bn(f"{src}.expand")
            p["depthwise"], s["depthwise"] = conv_bn(f"{src}.depsep")
            p["se_reduce"] = se_linear_to_conv(f"{src}.se.squeeze")
            p["se_expand"] = se_linear_to_conv(f"{src}.se.expand")
            p["project"], s["project"] = conv_bn(f"{src}.proj")
            params[dst], stats[dst] = p, s
            bi += 1

    params["head"], stats["head"] = conv_bn("features")
    sd.finish()
    return {"params": params, "batch_stats": stats}


def convert_mdn_head(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference GaussianMixtureDensityNetwork state dict → GaussianMDN params
    (reference src/classes/MixtureDensityNetwork.py:117-171: pi D→K,
    sigma/mu D→D*K Linears whose outputs reshape to (..., D, K) row-major —
    so weight.T.reshape(D, D, K) lands each (feature e, gaussian k) column in
    our [D_in, D_out, K] layout exactly)."""
    sd = StrictStateDict(sd)
    w_sigma = sd["sigma.weight"].T  # [D, D*K]
    d = w_sigma.shape[0]
    k = w_sigma.shape[1] // d
    params = {
        "w_pi": sd["pi.weight"].T,
        "b_pi": sd["pi.bias"],
        "w_sigma": w_sigma.reshape(d, d, k),
        "b_sigma": sd["sigma.bias"].reshape(d, k),
        "w_mu": sd["mu.weight"].T.reshape(d, d, k),
        "b_mu": sd["mu.bias"].reshape(d, k),
    }
    sd.finish()
    return {"params": params}


def convert_nf_head(
    sd: Dict[str, np.ndarray], flow_steps: int
) -> Tuple[Dict[str, Any], Tuple[Tuple[int, ...], ...]]:
    """Reference NormalizingFlow (FrEIA SequenceINN of AllInOneBlocks) state
    dict → our scan-stacked NormalizingFlow params + the fixed channel
    permutations baked into the checkpoint.

    FrEIA AllInOneBlock layout (reference src/classes/NormalizingFlow.py:84-116
    builds them with permute_soft=False): per block
    `fast_flow_decoder.module_list.{i}.` (the SequenceINN attribute name,
    reference NormalizingFlow.py:51) holds `subnet.{0,2}.{weight,bias}`
    (conv-ReLU-conv), `global_scale` / `global_offset` [1,C,1,1], and
    non-trainable `w_perm` / `w_perm_inv` [C,C,1,1] permutation matrices.
    The unused `layer_norm` member (reference :43-45) is dropped. Our
    forward permutes out[i] = y[perm[i]], matching FrEIA's w_perm @ y with
    perm[i] = argmax_j w_perm[i, j]. Also accepts a bare SequenceINN save
    (`module_list.` root) and the legacy `nf.` alias.

    Returns (variables, perms) — construct NormalizingFlow(perms=perms)."""
    for prefix in ("fast_flow_decoder.", "nf."):
        if any(k.startswith(prefix) for k in sd):
            sd = strip_prefix(sd, prefix)
            break
    sd = StrictStateDict(sd)
    sd.drop("layer_norm.", suffix="num_batches_tracked")
    sd.drop(suffix="w_perm_inv")

    def block(i):
        p = f"module_list.{i}"
        k1, b1 = _conv(sd, f"{p}.subnet.0")
        k2, b2 = _conv(sd, f"{p}.subnet.2")
        wp = sd[f"{p}.w_perm"]
        w_perm = wp.reshape(wp.shape[0], wp.shape[1])  # [C,C,1,1] → [C,C]
        perm = tuple(int(j) for j in np.argmax(w_perm, axis=1))
        return {
            "conv1_kernel": k1, "conv1_bias": b1,
            "conv2_kernel": k2, "conv2_bias": b2,
            "global_scale": sd[f"{p}.global_scale"].reshape(-1),
            "global_offset": sd[f"{p}.global_offset"].reshape(-1),
        }, perm

    blocks, perms = zip(*(block(i) for i in range(flow_steps)))
    n_pairs = flow_steps // 2
    params: Dict[str, Any] = {}
    for tag, parity in (("a", 0), ("b", 1)):
        if n_pairs:
            for leaf in blocks[0]:
                params[f"{tag}_{leaf}"] = np.stack(
                    [blocks[2 * j + parity][leaf] for j in range(n_pairs)]
                )
    if flow_steps % 2 == 1:
        for leaf, v in blocks[-1].items():
            params[f"t_{leaf}"] = v
    sd.finish()
    return {"params": params}, tuple(perms)


def export_mdn_head(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of `convert_mdn_head`: GaussianMDN params → the reference
    GaussianMixtureDensityNetwork state-dict layout (pi/sigma/mu Linears,
    reference src/classes/MixtureDensityNetwork.py:129-141), so TPU-trained
    heads `load_state_dict(strict=True)` into the reference for evaluation
    with its own tooling."""
    p = variables["params"]
    w_sigma = np.asarray(p["w_sigma"], np.float32)  # [D, D, K]
    d, _, k = w_sigma.shape
    return {
        "pi.weight": np.ascontiguousarray(np.asarray(p["w_pi"], np.float32).T),
        "pi.bias": np.asarray(p["b_pi"], np.float32),
        "sigma.weight": np.ascontiguousarray(w_sigma.reshape(d, d * k).T),
        "sigma.bias": np.asarray(p["b_sigma"], np.float32).reshape(d * k),
        "mu.weight": np.ascontiguousarray(
            np.asarray(p["w_mu"], np.float32).reshape(d, d * k).T
        ),
        "mu.bias": np.asarray(p["b_mu"], np.float32).reshape(d * k),
    }


def export_nf_head(
    variables: Dict[str, Any],
    num_patches: int,
    perms: Optional[Sequence[Sequence[int]]] = None,
) -> Dict[str, np.ndarray]:
    """Inverse of `convert_nf_head`: scan-stacked NormalizingFlow params →
    the reference NormalizingFlow state-dict layout
    (`fast_flow_decoder.module_list.{i}.*` FrEIA AllInOneBlocks with
    permute_soft=False + the unused `layer_norm` member at its default
    init, reference src/classes/NormalizingFlow.py:43-51), strict-loadable
    by the reference. `perms` defaults to the model's deterministic
    per-step permutations (models/flow.py default_perms) — pass the
    checkpoint-baked ones when the flow was built with explicit perms."""
    from vit_ad_tpu.models.flow import default_perms

    p = variables["params"]
    n_pairs = p["a_conv1_kernel"].shape[0] if "a_conv1_kernel" in p else 0
    tail = "t_conv1_kernel" in p
    steps = 2 * n_pairs + (1 if tail else 0)
    gs = p["a_global_scale"] if n_pairs else p["t_global_scale"]
    c = gs.shape[-1]
    if perms is None:
        perms = default_perms(steps, c)
    assert len(perms) == steps, f"{len(perms)} perms for {steps} steps"

    sd: Dict[str, np.ndarray] = {}
    for i in range(steps):
        if tail and i == steps - 1:
            leaf = lambda name: np.asarray(p[f"t_{name}"], np.float32)
        else:
            tag, j = ("a", i // 2) if i % 2 == 0 else ("b", i // 2)
            leaf = lambda name: np.asarray(p[f"{tag}_{name}"][j], np.float32)
        pre = f"fast_flow_decoder.module_list.{i}"
        for slot, src in (("0", "conv1"), ("2", "conv2")):
            sd[f"{pre}.subnet.{slot}.weight"] = np.ascontiguousarray(
                np.transpose(leaf(f"{src}_kernel"), (3, 2, 0, 1))  # HWIO→OIHW
            )
            sd[f"{pre}.subnet.{slot}.bias"] = leaf(f"{src}_bias")
        sd[f"{pre}.global_scale"] = leaf("global_scale").reshape(1, c, 1, 1)
        sd[f"{pre}.global_offset"] = leaf("global_offset").reshape(1, c, 1, 1)
        w_perm = np.zeros((c, c), np.float32)
        w_perm[np.arange(c), np.asarray(perms[i], np.int64)] = 1.0
        sd[f"{pre}.w_perm"] = w_perm.reshape(c, c, 1, 1)
        sd[f"{pre}.w_perm_inv"] = np.ascontiguousarray(w_perm.T).reshape(
            c, c, 1, 1
        )
    side = int(round(np.sqrt(num_patches)))
    sd["layer_norm.weight"] = np.ones((c, side, side), np.float32)
    sd["layer_norm.bias"] = np.zeros((c, side, side), np.float32)
    return sd


def _inv_conv(kernel) -> np.ndarray:
    """flax Conv kernel HWIO → torch OIHW (inverse of `_conv`)."""
    return np.ascontiguousarray(
        np.transpose(np.asarray(kernel, np.float32), (3, 2, 0, 1))
    )


def _inv_convt(kernel) -> np.ndarray:
    """flax ConvTranspose kernel [kh, kw, in, out] (spatially flipped by the
    import) → torch ConvTranspose2d weight [in, out, kh, kw] (inverse of
    `_convt`). `.copy()` (not ascontiguousarray) because NumPy deems size-1
    spatial dims contiguous even with the flip's negative strides, which
    torch.from_numpy rejects."""
    k = np.asarray(kernel, np.float32)[::-1, ::-1]
    return np.transpose(k, (2, 3, 0, 1)).copy()


def _inv_linear(leaf: Mapping[str, Any], out: Dict[str, np.ndarray],
                name: str) -> None:
    out[f"{name}.weight"] = np.ascontiguousarray(
        np.asarray(leaf["kernel"], np.float32).T
    )
    out[f"{name}.bias"] = np.asarray(leaf["bias"], np.float32)


def _inv_bn(p: Mapping[str, Any], s: Mapping[str, Any],
            out: Dict[str, np.ndarray], name: str) -> None:
    """(params, batch_stats) → the five torch BatchNorm state entries.
    num_batches_tracked is emitted as 0 — torch strict loads require the
    key, and eval-mode BN never reads it."""
    out[f"{name}.weight"] = np.asarray(p["scale"], np.float32)
    out[f"{name}.bias"] = np.asarray(p["bias"], np.float32)
    out[f"{name}.running_mean"] = np.asarray(s["mean"], np.float32)
    out[f"{name}.running_var"] = np.asarray(s["var"], np.float32)
    out[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_vit(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of `convert_vit`: scan-stacked ViTEncoder params → the timm
    ViT/DeiT state-dict layout (per-block `blocks.{i}.*` keys unstacked from
    the [depth, ...] leading axis). Emits `dist_token` for distilled models
    (timm 0.6.13 naming, what the reference checkpoints use); the prefix
    count comes from the stored `prefix_tokens` [1, n, D]."""
    f32 = lambda a: np.ascontiguousarray(np.asarray(a, np.float32))
    sd: Dict[str, np.ndarray] = {}
    pe = params["patch_embed"]["proj"]
    sd["patch_embed.proj.weight"] = _inv_conv(pe["kernel"])
    sd["patch_embed.proj.bias"] = f32(pe["bias"])
    prefix = np.asarray(params["prefix_tokens"], np.float32)  # [1, n, D]
    sd["cls_token"] = f32(prefix[:, :1])
    if prefix.shape[1] == 2:
        sd["dist_token"] = f32(prefix[:, 1:2])
    sd["pos_embed"] = f32(params["pos_embed"])
    depth = int(params["norm1_scale"].shape[0])
    per_block = {
        "norm1.weight": ("norm1_scale", False),
        "norm1.bias": ("norm1_bias", False),
        "attn.qkv.weight": ("qkv_kernel", True),
        "attn.qkv.bias": ("qkv_bias", False),
        "attn.proj.weight": ("proj_kernel", True),
        "attn.proj.bias": ("proj_bias", False),
        "norm2.weight": ("norm2_scale", False),
        "norm2.bias": ("norm2_bias", False),
        "mlp.fc1.weight": ("fc1_kernel", True),
        "mlp.fc1.bias": ("fc1_bias", False),
        "mlp.fc2.weight": ("fc2_kernel", True),
        "mlp.fc2.bias": ("fc2_bias", False),
    }
    for i in range(depth):
        for tkey, (ours, transpose) in per_block.items():
            leaf = np.asarray(params[ours][i], np.float32)
            sd[f"blocks.{i}.{tkey}"] = np.ascontiguousarray(
                leaf.T if transpose else leaf
            )
    sd["norm.weight"] = f32(params["norm_scale"])
    sd["norm.bias"] = f32(params["norm_bias"])
    return sd


def _inv_ln(leaf: Mapping[str, Any], out: Dict[str, np.ndarray],
            name: str) -> None:
    """Our LayerNorm wrapper ({"LayerNorm_0": {scale, bias}}) → torch
    `{name}.weight/bias` (inverse of the converters' `ln()` helper)."""
    inner = leaf["LayerNorm_0"]
    out[f"{name}.weight"] = np.ascontiguousarray(
        np.asarray(inner["scale"], np.float32)
    )
    out[f"{name}.bias"] = np.ascontiguousarray(
        np.asarray(inner["bias"], np.float32)
    )


def export_nest(
    params: Mapping[str, Any],
    num_heads=(3, 6, 12),
    num_classes: int = 1000,
) -> Dict[str, np.ndarray]:
    """Inverse of `convert_nest`: NesT params → the timm `jx_nest_tiny`
    state-dict layout (the model the reference wraps frozen at
    `encoder.nest`, reference TransformerEncoder.py:57). Levels/depths are
    derived from the param keys; `num_heads` must match the model (it sets
    the attn-proj head-merge re-permutation — timm merges heads as
    (head_dim, heads), ours as (heads, head_dim), see convert_nest). The
    classifier `head` the frozen timm model carries is emitted ZEROED
    (unused by forward_features but present in reference state dicts)."""
    f32 = lambda a: np.ascontiguousarray(np.asarray(a, np.float32))
    sd: Dict[str, np.ndarray] = {}
    pe = params["patch_embed"]
    sd["patch_embed.proj.weight"] = _inv_conv(pe["kernel"])
    sd["patch_embed.proj.bias"] = f32(pe["bias"])
    li = 0
    while f"pos_embed_{li}" in params:
        sd[f"levels.{li}.pos_embed"] = f32(params[f"pos_embed_{li}"])
        if li > 0:
            pool = params[f"pool{li - 1}"]
            sd[f"levels.{li}.pool.conv.weight"] = _inv_conv(pool["conv"]["kernel"])
            sd[f"levels.{li}.pool.conv.bias"] = f32(pool["conv"]["bias"])
            _inv_ln(pool["norm"], sd, f"levels.{li}.pool.norm")
        bj = 0
        while f"level{li}_block{bj}" in params:
            bp = params[f"level{li}_block{bj}"]
            t = f"levels.{li}.transformer_encoder.{bj}"
            _inv_ln(bp["norm1"], sd, f"{t}.norm1")
            _inv_linear(bp["qkv"], sd, f"{t}.attn.qkv")
            pk = np.asarray(bp["proj"]["kernel"], np.float32)  # [C_in, C_out]
            c = pk.shape[0]
            heads = num_heads[li]
            pk = pk.reshape(heads, c // heads, c).transpose(1, 0, 2).reshape(c, c)
            sd[f"{t}.attn.proj.weight"] = np.ascontiguousarray(pk.T)
            sd[f"{t}.attn.proj.bias"] = f32(bp["proj"]["bias"])
            _inv_ln(bp["norm2"], sd, f"{t}.norm2")
            _inv_linear(bp["mlp"]["fc1"], sd, f"{t}.mlp.fc1")
            _inv_linear(bp["mlp"]["fc2"], sd, f"{t}.mlp.fc2")
            bj += 1
        li += 1
    _inv_ln(params["norm"], sd, "norm")
    d = int(np.asarray(params["norm"]["LayerNorm_0"]["scale"]).shape[0])
    sd["head.weight"] = np.zeros((num_classes, d), np.float32)
    sd["head.bias"] = np.zeros(num_classes, np.float32)
    return sd


def export_efficientformer(
    variables: Mapping[str, Any], num_classes: int = 1000
) -> Dict[str, np.ndarray]:
    """Inverse of `convert_efficientformer`: EfficientFormer variables → the
    timm `efficientformer_l3` state-dict layout (frozen at
    `encoder.efficientformer` in the reference, TransformerEncoder.py:92).
    Stage depths and the 2d/1d block split are derived from the param keys
    (timm's parameter-less `Flat` module shifts torch block indices by one
    before the 1d blocks); `attention_bias_idxs` buffers are recomputed in
    timm's |dy|*res + |dx| indexing; the timm classifier `head`/`head_dist`
    pair is emitted ZEROED (distilled model, unused by forward_features)."""
    import re

    p, s = variables["params"], variables.get("batch_stats", {})
    f32 = lambda a: np.ascontiguousarray(np.asarray(a, np.float32))
    sd: Dict[str, np.ndarray] = {}

    def inv_conv_bn(src_p, src_s, conv_name, bn_name):
        sd[f"{conv_name}.weight"] = _inv_conv(src_p["conv"]["kernel"])
        if "bias" in src_p["conv"]:
            sd[f"{conv_name}.bias"] = f32(src_p["conv"]["bias"])
        _inv_bn(src_p["bn"], src_s["bn"], sd, bn_name)

    inv_conv_bn(p["stem1"], s["stem1"], "stem.conv1", "stem.norm1")
    inv_conv_bn(p["stem2"], s["stem2"], "stem.conv2", "stem.norm2")

    blocks: Dict[int, int] = {}
    for k in p:
        m = re.fullmatch(r"stage(\d+)_block(\d+)", k)
        if m:
            si, bj = int(m.group(1)), int(m.group(2))
            blocks[si] = max(blocks.get(si, 0), bj + 1)
    for si in range(max(blocks) + 1):
        if si > 0:
            inv_conv_bn(
                p[f"downsample{si}"], s[f"downsample{si}"],
                f"stages.{si}.downsample.conv", f"stages.{si}.downsample.norm",
            )
        depth = blocks[si]
        n_3d = sum(
            1 for bj in range(depth) if "qkv" in p[f"stage{si}_block{bj}"]
        )
        for bj in range(depth):
            bp = p[f"stage{si}_block{bj}"]
            tj = bj if bj < depth - n_3d else bj + 1  # Flat slot shift
            src = f"stages.{si}.blocks.{tj}"
            sd[f"{src}.layer_scale_1"] = f32(bp["layer_scale_1"])
            sd[f"{src}.layer_scale_2"] = f32(bp["layer_scale_2"])
            if "qkv" in bp:  # MetaBlock1d
                _inv_ln(bp["norm1"], sd, f"{src}.norm1")
                _inv_linear(bp["qkv"], sd, f"{src}.token_mixer.qkv")
                ab = f32(bp["attention_biases"])  # [heads, res*res]
                sd[f"{src}.token_mixer.attention_biases"] = ab
                res = int(round(np.sqrt(ab.shape[1])))
                yy, xx = np.divmod(np.arange(res * res), res)
                sd[f"{src}.token_mixer.attention_bias_idxs"] = (
                    np.abs(yy[:, None] - yy[None, :]) * res
                    + np.abs(xx[:, None] - xx[None, :])
                ).astype(np.int64)
                _inv_linear(bp["proj"], sd, f"{src}.token_mixer.proj")
                _inv_ln(bp["norm2"], sd, f"{src}.norm2")
                _inv_linear(bp["mlp"]["fc1"], sd, f"{src}.mlp.fc1")
                _inv_linear(bp["mlp"]["fc2"], sd, f"{src}.mlp.fc2")
            else:  # MetaBlock2d
                ss = s[f"stage{si}_block{bj}"]
                inv_conv_bn(bp["mlp_fc1"], ss["mlp_fc1"],
                            f"{src}.mlp.fc1", f"{src}.mlp.norm1")
                inv_conv_bn(bp["mlp_fc2"], ss["mlp_fc2"],
                            f"{src}.mlp.fc2", f"{src}.mlp.norm2")
    _inv_ln(p["norm"], sd, "norm")
    d = int(np.asarray(p["norm"]["LayerNorm_0"]["scale"]).shape[0])
    for h in ("head", "head_dist"):
        sd[f"{h}.weight"] = np.zeros((num_classes, d), np.float32)
        sd[f"{h}.bias"] = np.zeros(num_classes, np.float32)
    return sd


def _swin_rel_pos_index(window: int) -> np.ndarray:
    """Pair-wise relative-position index for a square window — the exact
    vendored-module formula (reference SwinTransformerModule.py:120-134)."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    )
    cf = coords.reshape(2, -1)
    rel = (cf[:, :, None] - cf[:, None, :]).transpose(1, 2, 0).copy()
    rel[..., 0] += window - 1
    rel[..., 1] += window - 1
    rel[..., 0] *= 2 * window - 1
    return rel.sum(-1).astype(np.int64)


def export_swin(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of `convert_swin`: SwinTransformer params (the inner tree
    convert_swin nests under 'esvit') → the vendored EsViT module's
    state-dict layout (reference SwinTransformerModule.py:689-852). The
    scan-stacked (unshifted, shifted) pairs unstack to per-block
    `layers.{si}.blocks.{bj}` keys; `relative_position_index` buffers are
    recomputed per block (persistent in the vendored module, :134) while
    `attn_mask` is NOT emitted (a lazy cache, never in reference state
    dicts, :292-314) and no head keys exist (the reference delattrs the
    head before loading, TransformerEncoder.py:256). Bias tables export at
    the model's effective (resolution-clamped) window — no interpolation,
    matching what the reference saves after its own surgery."""
    f32 = lambda a: np.ascontiguousarray(np.asarray(a, np.float32))
    sd: Dict[str, np.ndarray] = {}
    pe = params["patch_embed"]
    sd["patch_embed.proj.weight"] = _inv_conv(pe["kernel"])
    sd["patch_embed.proj.bias"] = f32(pe["bias"])
    _inv_ln(params["patch_norm"], sd, "patch_embed.norm")
    _inv_ln(params["norm"], sd, "norm")
    si = 0
    while f"layer{si}" in params:
        stage = params[f"layer{si}"]
        n_pairs = int(np.asarray(stage["a_norm1_scale"]).shape[0])
        for tag, parity in (("a", 0), ("b", 1)):
            for j in range(n_pairs):
                t = f"layers.{si}.blocks.{2 * j + parity}"
                g = lambda leaf: np.asarray(stage[f"{tag}_{leaf}"][j], np.float32)
                sd[f"{t}.norm1.weight"] = f32(g("norm1_scale"))
                sd[f"{t}.norm1.bias"] = f32(g("norm1_bias"))
                sd[f"{t}.attn.qkv.weight"] = f32(g("qkv_kernel").T)
                sd[f"{t}.attn.qkv.bias"] = f32(g("qkv_bias"))
                table = g("bias_table")
                sd[f"{t}.attn.relative_position_bias_table"] = f32(table)
                window = int(round((table.shape[0] ** 0.5 + 1) / 2))
                sd[f"{t}.attn.relative_position_index"] = _swin_rel_pos_index(
                    window
                )
                sd[f"{t}.attn.proj.weight"] = f32(g("proj_kernel").T)
                sd[f"{t}.attn.proj.bias"] = f32(g("proj_bias"))
                sd[f"{t}.norm2.weight"] = f32(g("norm2_scale"))
                sd[f"{t}.norm2.bias"] = f32(g("norm2_bias"))
                sd[f"{t}.mlp.fc1.weight"] = f32(g("fc1_kernel").T)
                sd[f"{t}.mlp.fc1.bias"] = f32(g("fc1_bias"))
                sd[f"{t}.mlp.fc2.weight"] = f32(g("fc2_kernel").T)
                sd[f"{t}.mlp.fc2.bias"] = f32(g("fc2_bias"))
        if f"layer{si}_downsample" in params:
            dp = params[f"layer{si}_downsample"]
            _inv_ln(dp["norm"], sd, f"layers.{si}.downsample.norm")
            sd[f"layers.{si}.downsample.reduction.weight"] = f32(
                np.asarray(dp["reduction"]["kernel"], np.float32).T
            )
        si += 1
    return sd


def export_small_decoder(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of `convert_small_decoder`: SmallDecoder variables → the
    reference DecoderVanillaCNN / DecoderCNNLinEnd layout — including the
    DUPLICATE conv entries the reference registers (each ConvTranspose
    appears both as `recon_convN.*` and `decoder_cnn.{3i}.*`, reference
    src/classes/CnnDecoder.py:47-117) and the channel-first re-permutation
    of the z-space MLP's second Linear."""
    p, s = variables["params"], variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    if "fc1" in p:
        _inv_linear(p["fc1"], sd, "decoder_lin.0")
        w = np.asarray(p["fc2"]["kernel"], np.float32)  # [in, s*s*768]
        side = int(round(np.sqrt(w.shape[1] // 768)))
        w = (
            w.reshape(w.shape[0], side, side, 768)
            .transpose(0, 3, 1, 2)
            .reshape(w.shape[0], -1)
        )
        sd["decoder_lin.2.weight"] = np.ascontiguousarray(w.T)
        sd["decoder_lin.2.bias"] = np.ascontiguousarray(
            np.asarray(p["fc2"]["bias"], np.float32)
            .reshape(side, side, 768).transpose(2, 0, 1).reshape(-1)
        )
    for i in range(5):
        w = _inv_convt(p[f"recon_conv{i + 1}"]["kernel"])
        b = np.asarray(p[f"recon_conv{i + 1}"]["bias"], np.float32)
        for name in (f"recon_conv{i + 1}", f"decoder_cnn.{3 * i}"):
            sd[f"{name}.weight"] = w
            sd[f"{name}.bias"] = b
        _inv_bn(p[f"bn{i + 1}"], s[f"bn{i + 1}"], sd, f"decoder_cnn.{3 * i + 1}")
    if "linear_end" in p:  # DecoderCNNLinEnd: the final conv is also dual
        w = _inv_conv(p["linear_end"]["kernel"])
        b = np.asarray(p["linear_end"]["bias"], np.float32)
        for name in ("linear_end", "decoder_cnn.14"):
            sd[f"{name}.weight"] = w
            sd[f"{name}.bias"] = b
    return sd


def _export_reverse_trunk(tp: Mapping[str, Any], ts: Mapping[str, Any],
                          sd: Dict[str, np.ndarray]) -> None:
    """Inverse of `_convert_reverse_trunk`: layer{lnum}_{i} leaves → the
    reference ReverseResNet layer{lnum}.{i}.* entries."""
    from vit_ad_tpu.models.reverse_resnet import LAYERS

    for lnum, blocks in ((4, LAYERS[3]), (3, LAYERS[2]), (2, LAYERS[1]),
                         (1, LAYERS[0])):
        for i in range(blocks):
            bp, bs = tp[f"layer{lnum}_{i}"], ts[f"layer{lnum}_{i}"]
            t = f"layer{lnum}.{i}"
            for c in ("conv1", "conv2", "conv3"):
                sd[f"{t}.{c}.weight"] = _inv_convt(bp[c]["kernel"])
            for bnn in ("bn1", "bn2", "bn3"):
                _inv_bn(bp[bnn], bs[bnn], sd, f"{t}.{bnn}")
            if "upsample_conv" in bp:
                sd[f"{t}.upsample.0.weight"] = _inv_convt(
                    bp["upsample_conv"]["kernel"]
                )
                _inv_bn(bp["upsample_bn"], bs["upsample_bn"], sd,
                        f"{t}.upsample.1")


def export_resnet_decoder(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of `convert_resnet_decoder`: ResNetDecoder variables → the
    reference DecoderResNetVariableEmbeddingSize layout (fc Sequentials,
    ReverseResNet trunk with per-layer upsample branches, de_conv1 + bn1)."""
    p, s = variables["params"], variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    _inv_linear(p["fc1"], sd, "fc1.0")
    _inv_linear(p["fc2"], sd, "fc2.0")
    _export_reverse_trunk(p["trunk"], s["trunk"], sd)
    sd["de_conv1.weight"] = _inv_convt(p["de_conv1"]["kernel"])
    _inv_bn(p["bn1"], s["bn1"], sd, "bn1")
    return sd


def export_reverse_resnet(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of `convert_reverse_resnet`: full ReverseResNet decoder
    variables (trunk layers at the root + de_conv1 + bn1) → the reference
    ReverseResNet layout."""
    p, s = variables["params"], variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    _export_reverse_trunk(p, s, sd)
    sd["de_conv1.weight"] = _inv_convt(p["de_conv1"]["kernel"])
    _inv_bn(p["bn1"], s["bn1"], sd, "bn1")
    return sd


def export_resnet50(params: Mapping[str, Any], stats: Mapping[str, Any],
                    with_fc: bool = True) -> Dict[str, np.ndarray]:
    """Inverse of `convert_resnet50`: trunk params/batch_stats → the
    torchvision ResNet-50 state-dict layout. The classifier `fc` is emitted
    ZEROED when `with_fc` (the import drops it and no reference forward ever
    reads it — the reference freezes the trunk and consumes stage maps only,
    reference src/classes/resnet/ResNetModel.py:138,186-212 — but the
    vendored module keeps the attribute, so strict loads need the keys)."""
    sd: Dict[str, np.ndarray] = {}
    sd["conv1.weight"] = _inv_conv(params["conv1"]["kernel"])
    _inv_bn(params["bn1"], stats["bn1"], sd, "bn1")
    for li, blocks in enumerate((3, 4, 6, 3)):
        for bi in range(blocks):
            src = f"layer{li + 1}_{bi}"
            dst = f"layer{li + 1}.{bi}"
            bp, bs = params[src], stats[src]
            for ci in (1, 2, 3):
                sd[f"{dst}.conv{ci}.weight"] = _inv_conv(bp[f"conv{ci}"]["kernel"])
                _inv_bn(bp[f"bn{ci}"], bs[f"bn{ci}"], sd, f"{dst}.bn{ci}")
            if "downsample_conv" in bp:
                sd[f"{dst}.downsample.0.weight"] = _inv_conv(
                    bp["downsample_conv"]["kernel"]
                )
                _inv_bn(bp["downsample_bn"], bs["downsample_bn"], sd,
                        f"{dst}.downsample.1")
    if with_fc:
        sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
        sd["fc.bias"] = np.zeros(1000, np.float32)
    return sd


def export_resnet_encoder(variables: Mapping[str, Any],
                          with_fc: bool = True) -> Dict[str, np.ndarray]:
    """Inverse of `convert_resnet_encoder`: our ResNetEncoder variables →
    the reference layout (trunk under `res_net.`, FastFlow stage LayerNorms
    under `norms.{i}` with torch [C, H, W] affine shapes)."""
    p, s = variables["params"], variables.get("batch_stats", {})
    sd = {
        f"res_net.{k}": v
        for k, v in export_resnet50(p["trunk"], s["trunk"], with_fc).items()
    }
    for i in range(4):
        sk = f"norm{i}_scale"
        if sk not in p:
            break
        sd[f"norms.{i}.weight"] = np.ascontiguousarray(
            np.transpose(np.asarray(p[sk], np.float32), (2, 0, 1))
        )
        sd[f"norms.{i}.bias"] = np.ascontiguousarray(
            np.transpose(np.asarray(p[f"norm{i}_bias"], np.float32), (2, 0, 1))
        )
    return sd


def export_resnet_ae(variables: Mapping[str, Any],
                     with_fc: bool = True) -> Dict[str, np.ndarray]:
    """ResNetAutoEncoder variables → the reference AutoEncoderResNet .pth
    layout (`encoder.res_net.*` + `encoder.norms.*` + `decoder.*`; decoder
    kind sniffed: `de_conv1` at the decoder root → ReverseResNet, else the
    small decoder). Inverse of the `convert_recon_ae` resnet branch."""
    p = variables["params"]
    bs = variables.get("batch_stats", {})
    enc = export_resnet_encoder(
        {"params": p["encoder"], "batch_stats": bs.get("encoder", {})},
        with_fc,
    )
    dec_vars = {"params": p["decoder"], "batch_stats": bs.get("decoder", {})}
    if "de_conv1" in p["decoder"]:
        dec = export_reverse_resnet(dec_vars)
    else:
        dec = export_small_decoder(dec_vars)
    sd = {f"encoder.{k}": v for k, v in enc.items()}
    sd.update({f"decoder.{k}": v for k, v in dec.items()})
    return sd


def export_transformer_ae(
    variables: Mapping[str, Any], nest_num_heads=(3, 6, 12)
) -> Dict[str, np.ndarray]:
    """Inverse of `convert_transformer_ae` for ALL five reference encoder
    families: full TransformerAutoEncoder variables → the reference
    AutoEncoder{Deit,ViT,Nest,EfficientFormer,EsVit} .pth layouts — the
    frozen encoder lives at the FAMILY-NAMED attribute (`encoder.deit.` /
    `encoder.vit.` / `encoder.nest.` / `encoder.efficientformer.` /
    `encoder.esvit.`, reference TransformerEncoder.py:57,92,134,193,267),
    with timm classifier head(s) emitted ZEROED where the frozen model
    carries them (EsViT has none — the reference delattrs it), decoder
    under `decoder.` — strict-loadable by the reference's torch AE classes.
    The family and decoder kind are sniffed from the param tree
    (`recon_conv1` → small decoder, else resnet decoder);
    `nest_num_heads` feeds export_nest's head-merge re-permutation
    (jx_nest_tiny default)."""
    p = variables["params"]
    dec_vars = {
        "params": p["decoder"],
        "batch_stats": variables.get("batch_stats", {}).get("decoder", {}),
    }
    if "recon_conv1" in p["decoder"]:
        dec = export_small_decoder(dec_vars)
    else:
        dec = export_resnet_decoder(dec_vars)
    enc_p = p["encoder"]
    if "esvit" in enc_p:
        attr = "esvit"
        enc = export_swin(enc_p["esvit"])
    elif "stem1" in enc_p:
        attr = "efficientformer"
        enc = export_efficientformer({
            "params": enc_p,
            "batch_stats": variables.get("batch_stats", {}).get("encoder", {}),
        })
    elif "pos_embed_0" in enc_p:
        attr = "nest"
        enc = export_nest(enc_p, num_heads=nest_num_heads)
    else:
        enc = export_vit(enc_p)
        d = int(np.asarray(enc_p["norm_scale"]).shape[-1])
        distilled = np.asarray(enc_p["prefix_tokens"]).shape[1] == 2
        heads = ("head", "head_dist") if distilled else ("head",)
        for h in heads:
            enc[f"{h}.weight"] = np.zeros((1000, d), np.float32)
            enc[f"{h}.bias"] = np.zeros(1000, np.float32)
        attr = "deit" if distilled else "vit"
    sd = {f"encoder.{attr}.{k}": v for k, v in enc.items()}
    sd.update({f"decoder.{k}": v for k, v in dec.items()})
    return sd


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
    window (reference :258-263). Strict: every source key must be consumed or
    explicitly dropped (head, index/mask buffers we recompute)."""
    sd = StrictStateDict(strip_prefix(sd, "module."))
    sd.drop("head", suffix="num_batches_tracked")
    sd.drop(suffix="relative_position_index")
    sd.drop(suffix="attn_mask")

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
    sd.finish()
    return {"params": {"esvit": params}}


def _convt(sd, name, bias=True):
    """torch ConvTranspose2d weight [in, out, kh, kw] → flax ConvTranspose
    kernel [kh, kw, in, out], spatially flipped. Together with padding
    ((p, p+output_padding),)*2 on the flax side this reproduces
    ConvTranspose2d(k, s, p, output_padding) to float tolerance (verified
    for k3/s2/p1/op1, k7/s2/p3/op1, k1, and the stride-1 cases)."""
    w = np.transpose(sd[f"{name}.weight"], (2, 3, 0, 1))[::-1, ::-1].copy()
    if bias and f"{name}.bias" in sd:
        return w, sd[f"{name}.bias"]
    return w, None


def convert_small_decoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference DecoderVanillaCNN / DecoderCNNLinEnd state dict →
    SmallDecoder variables (reference src/classes/CnnDecoder.py:16-155).

    The reference registers each ConvTranspose both as an attribute
    (`recon_convN`) and inside `decoder_cnn` (duplicate keys — dropped);
    BatchNorms exist only under `decoder_cnn.{1,4,7,10,13}`. The optional
    z-space MLP's second Linear feeds a channel-FIRST unflatten (768, s, s)
    while SmallDecoder reshapes channel-last — its columns are permuted."""
    sd = StrictStateDict(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    if "decoder_lin.0.weight" in sd:
        w, b = _linear(sd, "decoder_lin.0")
        params["fc1"] = {"kernel": w, "bias": b}
        w, b = _linear(sd, "decoder_lin.2")  # [z2, 768*s*s] transposed
        s = int(round(np.sqrt(w.shape[1] // 768)))
        w = (
            w.reshape(w.shape[0], 768, s, s)
            .transpose(0, 2, 3, 1)
            .reshape(w.shape[0], -1)
        )
        b = b.reshape(768, s, s).transpose(1, 2, 0).reshape(-1)
        params["fc2"] = {"kernel": w, "bias": b}
    for i in range(5):
        k, b = _convt(sd, f"recon_conv{i + 1}")
        params[f"recon_conv{i + 1}"] = {"kernel": k, "bias": b}
        bnp, bns = _bn(sd, f"decoder_cnn.{3 * i + 1}")
        params[f"bn{i + 1}"] = bnp
        stats[f"bn{i + 1}"] = bns
    if "linear_end.weight" in sd:  # DecoderCNNLinEnd (CnnDecoder.py:120-155)
        w, b = _conv(sd, "linear_end")
        params["linear_end"] = {"kernel": w, "bias": b}
        sd.drop("decoder_cnn.14.")
    sd.drop(
        "decoder_cnn.0.", "decoder_cnn.3.", "decoder_cnn.6.",
        "decoder_cnn.9.", "decoder_cnn.12.", suffix="num_batches_tracked",
    )
    sd.finish()
    return {"params": params, "batch_stats": stats}


def _convert_reverse_trunk(sd, params, stats) -> None:
    """Reference ReverseResNet layer1..4 bottlenecks → ReverseResNetTrunk
    leaves (reference src/classes/resnet/ReverseResNet.py:46-215; layer
    ordering layer4→1, last block of each Sequential carries the channel
    change + upsample identity)."""
    from vit_ad_tpu.models.reverse_resnet import LAYERS

    for lnum, blocks in ((4, LAYERS[3]), (3, LAYERS[2]), (2, LAYERS[1]),
                         (1, LAYERS[0])):
        for i in range(blocks):
            t = f"layer{lnum}.{i}"
            p: Dict[str, Any] = {}
            st: Dict[str, Any] = {}
            for c in ("conv1", "conv2", "conv3"):
                k, _ = _convt(sd, f"{t}.{c}", bias=False)
                p[c] = {"kernel": k}
            for bnn in ("bn1", "bn2", "bn3"):
                bp, bs = _bn(sd, f"{t}.{bnn}")
                p[bnn] = bp
                st[bnn] = bs
            if f"{t}.upsample.0.weight" in sd:
                k, _ = _convt(sd, f"{t}.upsample.0", bias=False)
                p["upsample_conv"] = {"kernel": k}
                bp, bs = _bn(sd, f"{t}.upsample.1")
                p["upsample_bn"] = bp
                st["upsample_bn"] = bs
            params[f"layer{lnum}_{i}"] = p
            stats[f"layer{lnum}_{i}"] = st


def convert_resnet_decoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference DecoderResNetVariableEmbeddingSize state dict →
    ResNetDecoder variables (reference src/classes/CnnDecoder.py:158-196:
    fc1/fc2 Sequentials, inherited ReverseResNet trunk + de_conv1 + bn1)."""
    sd = StrictStateDict(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    w, b = _linear(sd, "fc1.0")
    params["fc1"] = {"kernel": w, "bias": b}
    w, b = _linear(sd, "fc2.0")
    params["fc2"] = {"kernel": w, "bias": b}
    tp: Dict[str, Any] = {}
    ts: Dict[str, Any] = {}
    _convert_reverse_trunk(sd, tp, ts)
    params["trunk"] = tp
    stats["trunk"] = ts
    k, _ = _convt(sd, "de_conv1", bias=False)
    params["de_conv1"] = {"kernel": k}
    bp, bs = _bn(sd, "bn1")
    params["bn1"] = bp
    stats["bn1"] = bs
    sd.drop(suffix="num_batches_tracked")
    sd.finish()
    return {"params": params, "batch_stats": stats}


# reference AE encoder attribute names: each AutoEncoder<X> registers
# `self.encoder = Encoder<X>()`, and the Encoder wrapper holds the timm /
# vendored model at a FAMILY-NAMED attribute (reference
# src/classes/transformer/TransformerEncoder.py:57,92,134,193,267) — so the
# .pth keys are `encoder.deit.*`, `encoder.vit.*`, `encoder.nest.*`,
# `encoder.efficientformer.*`, `encoder.esvit.*`. 'model' is kept as a
# legacy alias for .pth files this framework exported before round 3.
_AE_ENCODER_ATTRS = ("deit", "vit", "nest", "efficientformer", "esvit",
                     "model")


def convert_transformer_ae(
    sd: Dict[str, np.ndarray], img_size: int = 224
) -> Dict[str, Any]:
    """Full reference TransformerAutoEncoder state dict → our
    TransformerAutoEncoder variables, for ALL five reference encoder
    families (the encoder attribute name selects the converter; classifier
    heads the frozen timm models carry are dropped by each converter).
    Decoder kind is sniffed from the keys (fc1.0 → resnet decoder,
    recon_conv1 → small decoder). `img_size` feeds the EsViT
    relative-position interpolation (convert_swin)."""
    attr = next(
        (a for a in _AE_ENCODER_ATTRS
         if any(k.startswith(f"encoder.{a}.") for k in sd)),
        None,
    )
    if attr is None:
        enc_keys = sorted(k for k in sd if k.startswith("encoder."))
        raise ValueError(
            f"no known encoder attribute in AE state dict; encoder keys "
            f"start with: {enc_keys[:4]}"
        )
    prefix = f"encoder.{attr}."
    enc_sd = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix)}
    dec_sd = {
        k[len("decoder."):]: v
        for k, v in sd.items()
        if k.startswith("decoder.")
    }
    leftover = [
        k for k in sd
        if not (k.startswith(prefix) or k.startswith("decoder."))
    ]
    if leftover:
        raise ValueError(f"unexpected AE keys: {leftover[:8]}")
    if attr in ("deit", "vit", "model"):
        depth = 1 + max(
            int(k.split(".")[1]) for k in enc_sd if k.startswith("blocks.")
        )
        n_prefix = (
            2 if ("dist_token" in enc_sd or "distillation_token" in enc_sd)
            else 1
        )
        enc = convert_vit(enc_sd, depth=depth, num_prefix_tokens=n_prefix)
    elif attr == "nest":
        enc = convert_nest(enc_sd)
    elif attr == "efficientformer":
        enc = convert_efficientformer(enc_sd)  # carries encoder batch_stats
    else:  # esvit: vendored SwinTransformer, head delattr'd by the reference
        enc = convert_swin(enc_sd, img_size=img_size)
    if "fc1.0.weight" in dec_sd:
        dec = convert_resnet_decoder(dec_sd)
    else:
        dec = convert_small_decoder(dec_sd)
    stats: Dict[str, Any] = {"decoder": dec.get("batch_stats", {})}
    if enc.get("batch_stats"):
        stats["encoder"] = enc["batch_stats"]
    return {
        "params": {"encoder": enc["params"], "decoder": dec["params"]},
        "batch_stats": stats,
    }


def convert_resnet_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ResNetEncoder state dict → our ResNetEncoder variables:
    torchvision-layout trunk under `res_net.`, trainable FastFlow stage
    LayerNorms under `norms.{i}` with torch [C, H, W] affine shapes
    (reference src/classes/CnnEncoder.py:128-158) → our NHWC [H, W, C]."""
    trunk_sd = {
        k[len("res_net."):]: v for k, v in sd.items()
        if k.startswith("res_net.")
    }
    enc = convert_resnet50(trunk_sd)
    params, stats = enc["params"], enc["batch_stats"]
    consumed = {k for k in sd if k.startswith("res_net.")}
    for i in range(4):
        wk, bk = f"norms.{i}.weight", f"norms.{i}.bias"
        if wk not in sd:
            break
        params[f"norm{i}_scale"] = np.transpose(sd[wk], (1, 2, 0))
        params[f"norm{i}_bias"] = np.transpose(sd[bk], (1, 2, 0))
        consumed |= {wk, bk}
    left = sorted(set(sd) - consumed)
    if left:
        raise ValueError(f"unexpected ResNetEncoder keys: {left[:8]}")
    return {"params": params, "batch_stats": stats}


def convert_vanilla_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference EncoderVanillaCNN state dict → VanillaCNNEncoder variables
    (reference src/classes/CnnEncoder.py:16-103). Like the small decoder,
    the reference registers each conv both as an attribute (`convN`) and
    inside the `encoder` Sequential (index 4i — duplicates, dropped);
    BatchNorms exist only under `encoder.{4i+1}`."""
    sd = StrictStateDict(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(5):
        k, b = _conv(sd, f"conv{i + 1}")
        params[f"conv{i + 1}"] = {"kernel": k, "bias": b}
        bnp, bns = _bn(sd, f"encoder.{4 * i + 1}")
        params[f"bn{i + 1}"] = bnp
        stats[f"bn{i + 1}"] = bns
        sd.drop(f"encoder.{4 * i}.")
    sd.drop(suffix="num_batches_tracked")
    sd.finish()
    return {"params": params, "batch_stats": stats}


def export_vanilla_encoder(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of `convert_vanilla_encoder` (incl. the duplicate Sequential
    conv entries the reference registers)."""
    p, s = variables["params"], variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    for i in range(5):
        w = _inv_conv(p[f"conv{i + 1}"]["kernel"])
        b = np.asarray(p[f"conv{i + 1}"]["bias"], np.float32)
        for name in (f"conv{i + 1}", f"encoder.{4 * i}"):
            sd[f"{name}.weight"] = w
            sd[f"{name}.bias"] = b
        _inv_bn(p[f"bn{i + 1}"], s[f"bn{i + 1}"], sd, f"encoder.{4 * i + 1}")
    return sd


def export_vanilla_ae(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """VanillaAutoEncoder variables → the reference VanillaAutoEncoder .pth
    layout (`encoder.*` EncoderVanillaCNN + `decoder.*` DecoderVanillaCNN,
    both with their duplicate Sequential registrations). Inverse of the
    `convert_recon_ae` vanilla branch."""
    p = variables["params"]
    bs = variables.get("batch_stats", {})
    enc = export_vanilla_encoder(
        {"params": p["encoder"], "batch_stats": bs.get("encoder", {})}
    )
    dec = export_small_decoder(
        {"params": p["decoder"], "batch_stats": bs.get("decoder", {})}
    )
    sd = {f"encoder.{k}": v for k, v in enc.items()}
    sd.update({f"decoder.{k}": v for k, v in dec.items()})
    return sd


def convert_reverse_resnet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ReverseResNet state dict → our ReverseResNet variables
    (full decoder: trunk layers + de_conv1 + bn1)."""
    sd = StrictStateDict(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    _convert_reverse_trunk(sd, params, stats)
    k, _ = _convt(sd, "de_conv1", bias=False)
    params["de_conv1"] = {"kernel": k}
    bp, bs = _bn(sd, "bn1")
    params["bn1"] = bp
    stats["bn1"] = bs
    sd.drop(suffix="num_batches_tracked")
    sd.finish()
    return {"params": params, "batch_stats": stats}


def convert_recon_ae(
    sd: Dict[str, np.ndarray], img_size: int = 224
) -> Dict[str, Any]:
    """Any reference recon AutoEncoder state dict → matching AE variables.

    Dispatches on the encoder keys: `encoder.{deit,vit,nest,efficientformer,
    esvit}.` (the transformer AEs' family-named timm attributes, reference
    TransformerEncoder.py:57,92,134,193,267), `encoder.res_net.`
    (AutoEncoderResNet[SmallDecoder], reference CnnAutoEncoder.py:111-154),
    or `encoder.conv1.` (VanillaAutoEncoder, CnnAutoEncoder.py:25-86); the
    decoder kind is sniffed from the decoder keys. The reference base AE
    registers torchmetrics SSIM and MSELoss modules (`ssim.`, `mse.`) whose
    state, when present, carries no weights — dropped."""
    sd = {
        k: v for k, v in sd.items()
        if not (k.startswith("ssim.") or k.startswith("mse."))
    }
    if any(
        k.startswith(f"encoder.{a}.")
        for a in _AE_ENCODER_ATTRS for k in sd
    ):
        return convert_transformer_ae(sd, img_size=img_size)
    enc_sd = {
        k[len("encoder."):]: v for k, v in sd.items()
        if k.startswith("encoder.")
    }
    dec_sd = {
        k[len("decoder."):]: v for k, v in sd.items()
        if k.startswith("decoder.")
    }
    leftover = [
        k for k in sd
        if not (k.startswith("encoder.") or k.startswith("decoder."))
    ]
    if leftover:
        raise ValueError(f"unexpected AE keys: {leftover[:8]}")
    if "conv1.bias" in enc_sd:  # vanilla CNN AE (the resnet conv1 is biasless)
        enc = convert_vanilla_encoder(enc_sd)
        dec = convert_small_decoder(dec_sd)
        return {
            "params": {"encoder": enc["params"], "decoder": dec["params"]},
            "batch_stats": {
                "encoder": enc["batch_stats"],
                "decoder": dec.get("batch_stats", {}),
            },
        }
    enc = convert_resnet_encoder(enc_sd)
    if "de_conv1.weight" in dec_sd:
        dec = convert_reverse_resnet(dec_sd)
    else:
        dec = convert_small_decoder(dec_sd)
    return {
        "params": {"encoder": enc["params"], "decoder": dec["params"]},
        "batch_stats": {
            "encoder": enc["batch_stats"],
            "decoder": dec.get("batch_stats", {}),
        },
    }
