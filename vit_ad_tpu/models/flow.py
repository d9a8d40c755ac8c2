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
from typing import Any, Optional, Sequence, Tuple

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


def default_perms(n_steps: int, num_channels: int) -> np.ndarray:
    """Deterministic per-step channel permutations (rng seed = step index) —
    the model default when no checkpoint-baked perms are supplied. Exposed
    module-level so the .pth exporter (utils/torch_convert.export_nf_head)
    emits the same permutation matrices a run trained with."""
    return np.stack(
        [np.random.default_rng(i).permutation(num_channels)
         for i in range(n_steps)]
    ).astype(np.int32)


def _soft_clamp(a: Array, clamp: float) -> Array:
    """FrEIA's default ATAN clamp: clamp * 0.636 * atan(u) ∈ (-clamp, clamp)."""
    return clamp * 0.636 * jnp.arctan(a)


def _conv_same(x: Array, kernel: Array, bias: Array, mmdt=jnp.float32) -> Array:
    """SAME conv; with mmdt=bf16 the MXU runs the contraction at full rate
    with f32 accumulation (inputs rounded to bf16 — inference-safe)."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    return (
        jax.lax.conv_general_dilated(
            x.astype(mmdt), kernel.astype(mmdt), (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
        + bias
    )


def _permute_channels(y, perm_int, inverse=False, mmdt=jnp.float32):
    """Channel permutation as a one-hot matmul: a gather along the minor
    (lane) dimension is pathological for the TPU compiler/runtime, while a
    [C, C] matmul rides the MXU. The one-hot matrix is built on device from
    the tiny int32 index vector (embedding it as an f32 constant would blow
    the remote-compile payload limit). forward: out[..., i] = y[..., perm[i]];
    inverse uses the transposed matrix."""
    onehot = jax.nn.one_hot(perm_int, y.shape[-1], dtype=mmdt)  # [C, C]
    eq = "...i,ic->...c" if inverse else "...c,ic->...i"
    return jnp.einsum(
        eq, y.astype(mmdt), onehot, preferred_element_type=jnp.float32
    )


def _step_apply(x, p, perm_int, clamp, split1, split2, mmdt=jnp.float32):
    """Functional AllInOneBlock step forward; p holds unstacked leaves."""
    h, w = x.shape[1], x.shape[2]
    x1 = x[..., :split1]
    x2 = x[..., split1:]
    a = _conv_same(x1, p["conv1_kernel"], p["conv1_bias"], mmdt)
    a = _conv_same(jax.nn.relu(a), p["conv2_kernel"], p["conv2_bias"], mmdt) * 0.1
    s = _soft_clamp(a[..., :split2], clamp)
    t = a[..., split2:]
    x2 = x2 * jnp.exp(s) + t
    logdet = jnp.sum(s, axis=(1, 2, 3))
    y = jnp.concatenate([x1, x2], axis=-1)
    scale = 0.2 * jnp.logaddexp(0.0, 0.5 * p["global_scale"])
    y = y * scale + p["global_offset"]
    logdet = logdet + h * w * jnp.sum(jnp.log(scale))
    return _permute_channels(y, perm_int, mmdt=mmdt), logdet


def _fold_before_indices(perms: np.ndarray) -> np.ndarray:
    """Static per-step cumulative channel maps for permutation folding.

    Stock step i computes s = P_i(G_i(C_i(s_prev))) with
    (P_i y)[c] = y[perm_i[c]]. Keeping the state in ORIGINAL channel order
    (f = Q_i^{-1} s with Q_i = P_i∘…∘P_1), the coupling/affine of step i act
    on channels idx_i = Q_{i-1} applied to arange(C): stock channel j of the
    step input is f[idx_i[j]]. Returns [n_steps, C] int32 idx arrays."""
    n, c = perms.shape
    idx = np.arange(c)
    before = []
    for i in range(n):
        before.append(idx.copy())
        idx = idx[perms[i]]
    return np.stack(before).astype(np.int32)


def _fold_step_params(p, idx, split1, split2, c, stacked=False):
    """Conjugate step params by the cumulative channel map idx ([C], or
    [P, C] with stacked=True for a whole scan stack at once): conv1 reads
    the full C channels (rows scattered from the stock x1 block), conv2
    emits full-C s/t planes (columns scattered to the stock x2 positions;
    zero elsewhere → exp(0)=1, +0 = identity on x1), and the global affine
    vectors are permuted. One-hot matmuls (built on device from the small
    int arrays — f32 constants would bloat the compile payload) because
    lane gathers are pathological on TPU."""
    oh_x1 = jax.nn.one_hot(idx[..., :split1], c, dtype=jnp.float32)
    oh_x2 = jax.nn.one_hot(idx[..., split1:], c, dtype=jnp.float32)
    oh_all = jax.nn.one_hot(idx, c, dtype=jnp.float32)
    k2 = p["conv2_kernel"]
    k2s, k2t = k2[..., :split2], k2[..., split2:]
    b2 = p["conv2_bias"]
    b2s, b2t = b2[..., :split2], b2[..., split2:]
    pre = "p" if stacked else ""
    e_k1 = f"{pre}xyjh,{pre}jc->{pre}xych"
    e_k2 = f"{pre}xyhm,{pre}mc->{pre}xyhc"
    e_b = f"{pre}m,{pre}mc->{pre}c"
    return {
        "conv1_kernel": jnp.einsum(e_k1, p["conv1_kernel"], oh_x1),
        "conv1_bias": p["conv1_bias"],
        "conv2_kernel": jnp.concatenate(
            [
                jnp.einsum(e_k2, k2s, oh_x2),
                jnp.einsum(e_k2, k2t, oh_x2),
            ],
            axis=-1,
        ),
        "conv2_bias": jnp.concatenate(
            [
                jnp.einsum(e_b, b2s, oh_x2),
                jnp.einsum(e_b, b2t, oh_x2),
            ],
            axis=-1,
        ),
        "global_scale": jnp.einsum(e_b, p["global_scale"], oh_all),
        "global_offset": jnp.einsum(e_b, p["global_offset"], oh_all),
    }


def _step_apply_folded(x, p, clamp, mmdt=jnp.float32):
    """Folded step: no permutation matmul; s/t arrive as full-C planes."""
    h, w, c = x.shape[1], x.shape[2], x.shape[3]
    a = _conv_same(x, p["conv1_kernel"], p["conv1_bias"], mmdt)
    a = _conv_same(jax.nn.relu(a), p["conv2_kernel"], p["conv2_bias"], mmdt) * 0.1
    s = _soft_clamp(a[..., :c], clamp)
    t = a[..., c:]
    x = x * jnp.exp(s) + t
    logdet = jnp.sum(s, axis=(1, 2, 3))
    scale = 0.2 * jnp.logaddexp(0.0, 0.5 * p["global_scale"])
    x = x * scale + p["global_offset"]
    logdet = logdet + h * w * jnp.sum(jnp.log(scale))
    return x, logdet


def _step_inverse(y, p, perm_int, clamp, split1, split2, mmdt=jnp.float32):
    h, w = y.shape[1], y.shape[2]
    y = _permute_channels(y, perm_int, inverse=True, mmdt=mmdt)
    scale = 0.2 * jnp.logaddexp(0.0, 0.5 * p["global_scale"])
    y = (y - p["global_offset"]) / scale
    x1 = y[..., :split1]
    x2 = y[..., split1:]
    a = _conv_same(x1, p["conv1_kernel"], p["conv1_bias"], mmdt)
    a = _conv_same(jax.nn.relu(a), p["conv2_kernel"], p["conv2_bias"], mmdt) * 0.1
    s = _soft_clamp(a[..., :split2], clamp)
    t = a[..., split2:]
    x2 = (x2 - t) * jnp.exp(-s)
    return jnp.concatenate([x1, x2], axis=-1)


def _pair_fwd(zz, p, pa, pb, clamp, split1, split2, mmdt):
    """One stacked (3x3, 1x1) coupling pair; p holds a_*/b_* leaves."""
    a_p = {k[2:]: v for k, v in p.items() if k.startswith("a_")}
    b_p = {k[2:]: v for k, v in p.items() if k.startswith("b_")}
    zz, l1 = _step_apply(zz, a_p, pa, clamp, split1, split2, mmdt)
    zz, l2 = _step_apply(zz, b_p, pb, clamp, split1, split2, mmdt)
    return zz, l1 + l2


def use_reversible_flow() -> bool:
    """Reversible (O(1)-activation) backward for the coupling-pair scan.
    Opt-in (VITAD_NF_REVERSIBLE=1) pending the hardware A/B: the NF-resnet
    traced epoch spends 34% of device time writing/reading the scan's
    per-pair activation stash ([n_pairs, B, 56, 56, 256] f32
    dynamic-update-slices, tools/probe_resnet_q13.log trace), which the
    reversible backward replaces with one inverse recompute per pair."""
    import os

    return os.environ.get("VITAD_NF_REVERSIBLE") == "1"


def _reversible_pair_scan(pp, z0, perm_a, perm_b, clamp, split1, split2,
                          mmdt):
    """The stacked coupling-pair scan with a memory-free custom backward.

    The flow is exactly invertible (training runs matmul_dtype=f32, the
    module default), so the backward does not need the per-pair activation
    stash jax.lax.scan's autodiff saves ([n_pairs, B, H, W, C] f32 — the
    dominant HBM traffic of big-map stage-1 flows): it reconstructs each
    pair's input from its output via _step_inverse while scanning the
    cotangent in reverse, recomputing each pair's VJP locally. Classic
    reversible-network backprop (RevNets; FrEIA offers the same idea as
    memory-efficient mode) expressed as a jax.custom_vjp over the scan.

    Primal math is IDENTICAL to the stock scan (same body ops, same
    order); gradients differ from autodiff only by the f32 roundoff of
    inverse-reconstruction (x1 passes through a coupling unchanged, so
    s/t recompute from the same bits; the only drift is the global-affine
    divide and the f32 perm matmul round-trip) — tolerance-locked in
    tests/test_flow_reversible.py."""

    @jax.custom_vjp
    def chain(pp, z0):
        def body(carry, xs):
            zz, ld = carry
            p, pa_i, pb_i = xs
            zz, l = _pair_fwd(zz, p, pa_i, pb_i, clamp, split1, split2,
                              mmdt)
            return (zz, ld + l), None

        init = (z0, jnp.zeros(z0.shape[0], dtype=jnp.float32))
        (z, logdet), _ = jax.lax.scan(body, init, (pp, perm_a, perm_b))
        return z, logdet

    def fwd(pp, z0):
        z, logdet = chain(pp, z0)
        return (z, logdet), (pp, z)  # residuals: params + OUTPUT only

    def bwd(res, cts):
        pp_r, z_final = res
        g_z, g_ld = cts  # [B,H,W,C], [B]; every pair's logdet term sees
        # the same additive cotangent g_ld

        def body(carry, xs):
            z_out, gz = carry
            p, pa_i, pb_i = xs
            a_p = {k[2:]: v for k, v in p.items() if k.startswith("a_")}
            b_p = {k[2:]: v for k, v in p.items() if k.startswith("b_")}
            z_in = _step_inverse(z_out, b_p, pb_i, clamp, split1, split2,
                                 mmdt)
            z_in = _step_inverse(z_in, a_p, pa_i, clamp, split1, split2,
                                 mmdt)
            z_in = jax.lax.stop_gradient(z_in)
            _, vjp = jax.vjp(
                lambda zz, pt: _pair_fwd(zz, pt, pa_i, pb_i, clamp,
                                         split1, split2, mmdt),
                z_in, p,
            )
            gz_in, gp = vjp((gz, g_ld))
            return (z_in, gz_in), gp

        (_, g_z0), g_pp = jax.lax.scan(
            body, (z_final, g_z), (pp_r, perm_a, perm_b), reverse=True
        )
        return (g_pp, g_z0)

    chain.defvjp(fwd, bwd)
    return chain(pp, z0)


class NormalizingFlow(nn.Module):
    """Stack of AllInOneBlock-equivalent steps, kernels alternating 3x3
    (even i) / 1x1 (odd i) (reference NormalizingFlow.fast_flow_steps,
    :84-116).

    TPU-native structure: consecutive (3x3, 1x1) step pairs share an
    identical program, so their parameters are STACKED ([n_pairs, ...]) and
    the stack runs under jax.lax.scan — the HLO holds one pair body instead
    of flow_steps unrolled blocks (the axon remote-compile endpoint rejects
    oversized programs, and compile time stays flat in depth). An odd final
    3x3 step, when flow_steps is odd, is applied unscanned."""

    num_channels: int
    img_size: int
    num_patches: int
    hidden_ratio: float = 1.0
    flow_steps: int = 8
    clamp: float = 2.0
    # explicit per-step channel permutations (tuple of C-int tuples), e.g.
    # the ones baked into a converted FrEIA checkpoint
    # (utils/torch_convert.convert_nf_head); None → deterministic per-step
    # NumPy-seeded permutations
    perms: Optional[Tuple[Tuple[int, ...], ...]] = None
    dtypes: DtypePolicy = DtypePolicy()
    # dtype the coupling convs and permutation matmuls feed the MXU with.
    # f32 (default) keeps the flow exactly invertible for training/tests;
    # bfloat16 (inference) runs them at full MXU rate with f32 accumulation
    # — scores are rank-consumed (AUROC), so the rounding is benign.
    matmul_dtype: Any = jnp.float32

    @property
    def feature_side(self) -> int:
        return int(math.isqrt(self.num_patches))

    @property
    def _splits(self) -> Tuple[int, int, int]:
        c = self.num_channels
        split1 = c - c // 2
        return split1, c // 2, int(split1 * self.hidden_ratio)

    def _pair_params(self, n_pairs: int):
        split1, split2, hidden = self._splits
        c = self.num_channels
        pdt = jnp.float32  # flow math runs in f32 (small head, stability)
        he = nn.initializers.he_uniform()

        def stacked(init, shape):
            def f(key, s, dtype):
                keys = jax.random.split(key, n_pairs)
                return jnp.stack([init(k, s[1:], dtype) for k in keys])
            return f

        def conv_params(tag, k):
            return {
                f"{tag}_conv1_kernel": self.param(
                    f"{tag}_conv1_kernel", stacked(he, (n_pairs, k, k, split1, hidden)),
                    (n_pairs, k, k, split1, hidden), pdt),
                f"{tag}_conv1_bias": self.param(
                    f"{tag}_conv1_bias", nn.initializers.zeros,
                    (n_pairs, hidden), pdt),
                f"{tag}_conv2_kernel": self.param(
                    f"{tag}_conv2_kernel", stacked(he, (n_pairs, k, k, hidden, 2 * split2)),
                    (n_pairs, k, k, hidden, 2 * split2), pdt),
                f"{tag}_conv2_bias": self.param(
                    f"{tag}_conv2_bias", nn.initializers.zeros,
                    (n_pairs, 2 * split2), pdt),
                f"{tag}_global_scale": self.param(
                    f"{tag}_global_scale",
                    nn.initializers.constant(_GLOBAL_SCALE_INIT),
                    (n_pairs, c), pdt),
                f"{tag}_global_offset": self.param(
                    f"{tag}_global_offset", nn.initializers.zeros,
                    (n_pairs, c), pdt),
            }

        return {**conv_params("a", 3), **conv_params("b", 1)}

    def _perms(self, n_steps: int) -> np.ndarray:
        if self.perms is not None:
            assert len(self.perms) == n_steps, (
                f"perms has {len(self.perms)} entries, need {n_steps}"
            )
            return np.asarray(self.perms, dtype=np.int32)
        return default_perms(n_steps, self.num_channels)

    @nn.compact
    def _scan_transform(
        self, x: Array, inverse: bool = False, folded: bool = False
    ) -> Tuple[Array, Array]:
        split1, split2, _ = self._splits
        n_pairs = self.flow_steps // 2
        tail = self.flow_steps % 2 == 1
        perms = self._perms(self.flow_steps)
        clamp = self.clamp
        mmdt = self.matmul_dtype

        pp = self._pair_params(n_pairs) if n_pairs else None
        if tail:
            tail_p = {
                k.split("_", 1)[1]: v
                for k, v in self._pair_params_tail().items()
            }

        z = x.astype(jnp.float32)
        logdet = jnp.zeros(x.shape[0], dtype=jnp.float32)
        if folded and not inverse:
            # permutation-folded scoring path: z stays in ORIGINAL channel
            # order; each step's convs/affine are conjugated by the static
            # cumulative channel map and the 20 [C,C] permutation matmuls
            # (0.59 TFLOP/batch-128) disappear. Scores are unchanged — the
            # loss and anomaly map only consume channel-wise sums of z²,
            # which are permutation-invariant; the fold itself is a few
            # one-time einsums over the (tiny) kernels per call.
            before = _fold_before_indices(perms)
            c = z.shape[-1]
            if n_pairs:
                # fold the whole stacked pair params ONCE, outside the scan
                fa = _fold_step_params(
                    {k[2:]: v for k, v in pp.items() if k.startswith("a_")},
                    jnp.asarray(before[0 : 2 * n_pairs : 2]),
                    split1, split2, c, stacked=True,
                )
                fb = _fold_step_params(
                    {k[2:]: v for k, v in pp.items() if k.startswith("b_")},
                    jnp.asarray(before[1 : 2 * n_pairs : 2]),
                    split1, split2, c, stacked=True,
                )

                def body_folded(carry, xs):
                    zz, ld = carry
                    pa, pb = xs
                    zz, l1 = _step_apply_folded(zz, pa, clamp, mmdt)
                    zz, l2 = _step_apply_folded(zz, pb, clamp, mmdt)
                    return (zz, ld + l1 + l2), None

                (z, logdet), _ = jax.lax.scan(
                    body_folded, (z, logdet), (fa, fb)
                )
            if tail:
                ft = _fold_step_params(
                    tail_p, jnp.asarray(before[-1]), split1, split2, c,
                )
                z, lt = _step_apply_folded(z, ft, clamp, mmdt)
                logdet = logdet + lt
            return z, logdet
        if not inverse:
            if n_pairs:
                perm_a = jnp.asarray(perms[0 : 2 * n_pairs : 2])
                perm_b = jnp.asarray(perms[1 : 2 * n_pairs : 2])

                if use_reversible_flow():
                    z, ld_pairs = _reversible_pair_scan(
                        pp, z, perm_a, perm_b, clamp, split1, split2, mmdt
                    )
                    logdet = logdet + ld_pairs
                else:
                    def body(carry, xs):
                        zz, ld = carry
                        p, pa, pb = xs
                        zz, l = _pair_fwd(
                            zz, p, pa, pb, clamp, split1, split2, mmdt
                        )
                        return (zz, ld + l), None

                    (z, logdet), _ = jax.lax.scan(
                        body, (z, logdet), (pp, perm_a, perm_b)
                    )
            if tail:
                z, lt = _step_apply(
                    z, tail_p, jnp.asarray(perms[-1]), clamp, split1, split2,
                    mmdt,
                )
                logdet = logdet + lt
            return z, logdet

        # inverse
        if tail:
            z = _step_inverse(
                z, tail_p, jnp.asarray(perms[-1]), clamp, split1, split2, mmdt
            )
        if n_pairs:
            inv_a = jnp.asarray(perms[0 : 2 * n_pairs : 2])
            inv_b = jnp.asarray(perms[1 : 2 * n_pairs : 2])

            def body_inv(carry, xs):
                zz = carry
                p, ia, ib = xs
                a_p = {k[2:]: v for k, v in p.items() if k.startswith("a_")}
                b_p = {k[2:]: v for k, v in p.items() if k.startswith("b_")}
                zz = _step_inverse(zz, b_p, ib, clamp, split1, split2, mmdt)
                zz = _step_inverse(zz, a_p, ia, clamp, split1, split2, mmdt)
                return zz, None

            z, _ = jax.lax.scan(
                body_inv, z, (pp, inv_a, inv_b), reverse=True
            )
        return z, logdet

    def _pair_params_tail(self):
        split1, split2, hidden = self._splits
        c = self.num_channels
        pdt = jnp.float32
        he = nn.initializers.he_uniform()
        mk = lambda name, init, shape: self.param(name, init, shape, pdt)
        return {
            "t_conv1_kernel": mk("t_conv1_kernel", he, (3, 3, split1, hidden)),
            "t_conv1_bias": mk("t_conv1_bias", nn.initializers.zeros, (hidden,)),
            "t_conv2_kernel": mk("t_conv2_kernel", he, (3, 3, hidden, 2 * split2)),
            "t_conv2_bias": mk("t_conv2_bias", nn.initializers.zeros, (2 * split2,)),
            "t_global_scale": mk(
                "t_global_scale", nn.initializers.constant(_GLOBAL_SCALE_INIT), (c,)
            ),
            "t_global_offset": mk("t_global_offset", nn.initializers.zeros, (c,)),
        }

    def transform(self, x: Array) -> Tuple[Array, Array]:
        """[B,H,W,C] → (z, logdet [B])."""
        return self._scan_transform(x, inverse=False)

    def transform_folded(self, x: Array) -> Tuple[Array, Array]:
        """Permutation-folded forward: z comes back in ORIGINAL channel
        order (NOT invertible against `inverse`); channel-wise sums of z²
        and logdet are identical to `transform` — sufficient for the loss
        and anomaly scores."""
        return self._scan_transform(x, inverse=False, folded=True)

    def inverse(self, z: Array) -> Array:
        x, _ = self._scan_transform(z, inverse=True)
        return x

    @staticmethod
    def _fold_scoring() -> bool:
        """OPT-IN (VITAD_FOLD_FLOW_PERMS=1). Measured on v5e (flagship,
        batch 128): folding LOSES — 2807 vs 3019 img/s. The [C,C]
        permutation matmuls it deletes are already almost free in-graph
        (XLA overlaps them with the coupling convs; deleting them saves
        0.2 ms), while the folded convs read/emit full-C zero-padded
        planes, doubling the coupling conv FLOPs at the same poor
        small-conv occupancy. Kept because the fold is score-exact and
        wins wherever matmul FLOPs are the binding constraint instead."""
        import os

        return os.environ.get("VITAD_FOLD_FLOW_PERMS") == "1"

    def __call__(self, x: Array) -> FlowOutput:
        """Loss + anomaly map (reference NormalizingFlow.forward, :118-145).
        x: [B, H', W', C] feature map (NHWC). VITAD_FOLD_FLOW_PERMS=1
        routes scoring through the permutation-folded forward (identical
        scores; see _fold_scoring for why it is not the default)."""
        if self._fold_scoring():
            z, logdet = self.transform_folded(x)
        else:
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
