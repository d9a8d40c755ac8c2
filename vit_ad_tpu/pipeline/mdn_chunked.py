"""K-chunked MDN-ResNet training: the single-chip capacity path for big K.

The reference's headline GMM config is K=100 mixture components over ResNet
stages 2-3 (reference startTraining_mdn.py:26-38 accepts up to ~150;
csv_results_gmm/gmm_mvtec_100_gaussians.csv is its published result table).
The joint train step holds params + Adam moments + gradients of BOTH
[D, D, K] mu/sigma stage heads simultaneously — measured 16.83 GB at K=100
vs the v5e's 15.75 GB HBM (PERF.md "single-chip capacity edge"), so K=50
was the proven single-chip ceiling.

This module removes the full-size gradient tensors from the step entirely:

  * the loss decomposes exactly per K-chunk. For ll = logsumexp_k(z_k),
    d ll/dθ_c = exp(ll_c - ll) * d ll_c/dθ_c where ll_c is the logsumexp
    over just chunk c's components — so chunk gradients need only the
    chunk's parameter slices plus the (cheap, [B,P,D]) total ll;
  * the Adam update is FUSED into the chunk loop: each `lax.scan` step
    computes one chunk's gradients (via the Pallas custom-VJP kernel on
    TPU) and immediately applies the torch-Adam update to that chunk's
    parameter/moment slices in place (donated buffers). A full-size
    gradient never exists; peak extra memory is one [D, D, kc] slice pair.

Peak HBM at K=100 drops from params+m+v+grads = 4x state (16.8 GB) to
3x state + one chunk (~13 GB) — the reference's headline config trains on
one chip. Per-leaf update math is exactly `pipeline.optimizers.torch_adam`
(optax scale_by_adam + scale(-lr), L2-coupled weight decay), and each leaf
still gets exactly one update per batch, so the path is
gradient-equivalent to the joint step (locked by tests/test_mdn_chunked.py
against the real `train_mdn_resnet` at tiny sizes).

Activated automatically by `train_mdn_resnet` when the estimated joint
state exceeds the accelerator budget (no mesh requested);
`VITAD_MDN_KCHUNK` = 0 (off) / auto / <int chunk size> overrides.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vit_ad_tpu.ops import gmm

Array = jax.Array

_B1, _B2, _EPS = 0.9, 0.999, 1e-8  # torch.optim.Adam defaults (optimizers.py)

# Chunked leaves of a GaussianMDN head: (param name, K axis). w_pi/b_pi are
# tiny and coupled across K by the softmax — updated whole after the loop.
_CHUNKED = (("w_sigma", 2), ("b_sigma", 1), ("w_mu", 2), ("b_mu", 1))


def torch_adam_leaf(p: Array, m: Array, v: Array, g: Array, t: Array,
                    lr: float, wd: float,
                    mask: Optional[Array] = None) -> Tuple[Array, Array, Array]:
    """One torch-Adam update on one leaf — exactly optax
    `add_decayed_weights(wd) >> scale_by_adam(b1,b2,eps) >> scale(-lr)`
    (pipeline/optimizers.torch_adam), applied to an arbitrary slice so the
    chunk loop can update parameter windows in place. `t` is the
    POST-increment step count (optax's count_inc).

    `mask` (broadcastable over the leaf's trailing K axis, 1 real / 0 pad)
    zeroes the DECAYED gradient, making sublane-pad inertness structural:
    masked components keep g = m = v = 0 and the update is exactly 0.
    Masking before the wd-coupling would leave g = wd*p on pad slices —
    with b_pi's -1e30 sentinel that stayed inert only via f32 saturation
    (wd²·p² overflowing v to inf), which is fragile across dtype/eps
    changes. The kill must be a `where`, NOT a multiply: under jit XLA's
    algebraic simplifier reassociates square((g + wd·p)·mask) so the pad
    lane's wd·p = -1e25 squares to inf BEFORE the mask and inf·0 = NaN
    (reproduced on the CPU backend; eager mode was fine)."""
    if wd:
        g = g + wd * p
    if mask is not None:
        g = jnp.where(mask > 0, g, 0.0)
    m = _B1 * m + (1.0 - _B1) * g
    v = _B2 * v + (1.0 - _B2) * jnp.square(g)
    c1 = 1.0 - jnp.power(jnp.float32(_B1), t)
    c2 = 1.0 - jnp.power(jnp.float32(_B2), t)
    p = p - lr * (m / c1) / (jnp.sqrt(v / c2) + _EPS)
    return p, m, v


def make_chunk_ll_fn(d: int):
    """ll_fn(xf, log_pi_c, w_sigma_c, b_sigma_c, w_mu_c, b_mu_c) -> [B,P,D]
    log-likelihood of the UNNORMALIZED sub-mixture restricted to one
    K-chunk (log_pi_c carries the global log-weights, NOT renormalized).
    Dispatches to the Pallas custom-VJP kernel on TPU targets (same gate as
    GaussianMDN.log_likelihood); dense XLA formulation otherwise — chunk
    temps are [B,P,D,kc], small by construction."""
    from vit_ad_tpu.ops.pallas.gmm_train import use_pallas_gmm_train

    if use_pallas_gmm_train(d):
        from vit_ad_tpu.ops.pallas.gmm_train import gmm_log_likelihood_train
        from vit_ad_tpu.ops.pallas.window_attention import _target_platform

        on_tpu = _target_platform() == "tpu"

        def ll_fn(xf, lp, ws, bs, wm, bm):
            return gmm_log_likelihood_train(
                xf, lp, ws, bs, wm, bm,
                interpret=not on_tpu,
                matmul_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            )

        return ll_fn

    def ll_fn(xf, lp, ws, bs, wm, bm):
        sigma = jax.nn.elu(jnp.einsum("bpd,dek->bpek", xf, ws) + bs) + 1.0 + 1e-15
        mu = jnp.einsum("bpd,dek->bpek", xf, wm) + bm
        dens = gmm.log_gaussian_density(sigma, mu, xf[..., None])
        return jax.nn.logsumexp(lp[:, :, None, :] + dens, axis=-1)

    return ll_fn


def make_chunk_bwd_fn(d: int):
    """bwd_fn(xf, log_pi_c, w_sigma_c, b_sigma_c, w_mu_c, b_mu_c, ll_total,
    ct) -> (dx, dlp, dws, dbs, dwm, dbm): the ct-weighted gradient of the
    TOTAL log-likelihood restricted to one chunk's parameters, WITHOUT
    re-running the chunk forward.

    Exactness: for ll = logsumexp_k(a_k), d ll/dθ_c = Σ_{k∈c}
    exp(a_k - ll)·da_k/dθ_c. The two-step phase B this replaces computed
    it as exp(ll_c - ll)·[exp(a_k - ll_c)·da_k] — the ll_c factors cancel,
    so feeding the Pallas backward kernels ll_total directly as their `ll`
    residual (their softmax weights become exp(a_k + lp - ll_total) ≤ 1,
    still stable) yields the identical gradient with NO forward recompute:
    the kernels rebuild mu/sigma/density in VMEM from the inputs and only
    consume ll as the normalizer (ops/pallas/gmm_train._component_terms).
    Phase A's online logsumexp already produced ll_total, so the chunk
    forward that `jax.vjp` would re-run is pure waste — the VERDICT-r4
    "2.8x chunk overhead" item. Dispatch mirrors make_chunk_ll_fn."""
    from vit_ad_tpu.ops.pallas.gmm_train import use_pallas_gmm_train

    if use_pallas_gmm_train(d):
        from vit_ad_tpu.ops.pallas import gmm_train as GT
        from vit_ad_tpu.ops.pallas.window_attention import _target_platform

        on_tpu = _target_platform() == "tpu"
        md = jnp.bfloat16 if on_tpu else jnp.float32

        def bwd_fn(xf, lp, ws, bs, wm, bm, ll_total, ct):
            ws_k = jnp.moveaxis(ws, -1, 0)
            bs_k = jnp.moveaxis(bs, -1, 0)
            wm_k = jnp.moveaxis(wm, -1, 0)
            bm_k = jnp.moveaxis(bm, -1, 0)
            dlp, dws, dbs, dwm, dbm = GT._gmm_bwd_params(
                xf, lp, ws_k, bs_k, wm_k, bm_k, ll_total, ct,
                interpret=not on_tpu, matmul_dtype=md,
            )
            dx = GT._gmm_bwd_x(
                xf, lp, ws_k, bs_k, wm_k, bm_k, ll_total, ct,
                interpret=not on_tpu, matmul_dtype=md,
            )
            return (dx, dlp, jnp.moveaxis(dws, 0, -1), dbs.T,
                    jnp.moveaxis(dwm, 0, -1), dbm.T)

        return bwd_fn

    def bwd_fn(xf, lp, ws, bs, wm, bm, ll_total, ct):
        # dense form: Σ_{k∈c} exp(a_k - ll_total) has the chunk gradient of
        # the total ll by the identity above; ll_total is a constant here
        def h(xf_, lp_, ws_, bs_, wm_, bm_):
            sigma = (jax.nn.elu(jnp.einsum("bpd,dek->bpek", xf_, ws_) + bs_)
                     + 1.0 + 1e-15)
            mu = jnp.einsum("bpd,dek->bpek", xf_, wm_) + bm_
            dens = gmm.log_gaussian_density(sigma, mu, xf_[..., None])
            p = jnp.exp(lp_[:, :, None, :] + dens - ll_total[..., None])
            return jnp.sum(ct * jnp.sum(p, axis=-1))

        return jax.grad(h, argnums=(0, 1, 2, 3, 4, 5))(
            xf, lp, ws, bs, wm, bm
        )

    return bwd_fn


def pick_k_chunk(k: int, cap: int = 16) -> int:
    """Largest divisor of K that is <= cap (chunks must tile K exactly so
    parameter slices are static-shaped)."""
    for c in range(min(cap, k), 0, -1):
        if k % c == 0:
            return c
    return 1


_K_AXES = {"w_pi": 1, "b_pi": 0, "w_sigma": 2, "b_sigma": 1,
           "w_mu": 2, "b_mu": 1}
_NEG_BIG = -1e30  # matches ops/gmm's finite -inf sentinel


def padded_plan(k: int):
    """(k_pad, k_chunk, mask) for the sublane-aligned chunking plan.

    The Pallas GMM kernels pad their K dimension to a sublane multiple (8)
    per call, so kc=10 chunks run 16 components' worth of K-work — ~37%
    waste. Padding the HEAD PARAMS once to a multiple of 8 and chunking at
    8 removes it. mask is a [k_pad] f32 (1 real / 0 pad) the update
    multiplies into every head gradient: Adam normalizes update magnitude
    by |g|, so even ~1e-15 drift gradients on pad components would random-
    walk at full learning-rate scale and could eventually push a pad
    sigma toward 0 (dens → +34, un-suppressing the component) — masking
    must be exact, not approximate. Returns mask=None when k is already
    aligned."""
    k_pad = -(-k // 8) * 8
    if k_pad == k:
        return k, pick_k_chunk(k), None
    mask = np.zeros((k_pad,), np.float32)
    mask[:k] = 1.0
    return k_pad, 8, jnp.asarray(mask)


def pad_head_k(head, k_pad: int):
    """Pad every K-axis leaf of a GaussianMDN param dict to k_pad.

    w/b pads are zeros; b_pi pads are -1e30, so pad components get mixture
    logits ~-1e30 → softmax weight exactly 0 → log_pi = log(0+1e-15). With
    sigma frozen at elu(0)+1=1 (mask!) their density term is bounded and
    each contributes ~e^-30 of a real component's likelihood — below f32
    epsilon, so the log-likelihood matches to float rounding (1 ulp from
    the softmax denominator's extra zero terms; tests/test_mdn_chunked.py)."""
    out = {}
    for name, v in head.items():
        axis = _K_AXES[name]
        extra = k_pad - v.shape[axis]
        pw = [(0, 0)] * v.ndim
        pw[axis] = (0, extra)
        cv = _NEG_BIG if name == "b_pi" else 0.0
        out[name] = jnp.pad(v, pw, constant_values=cv)
    return out


def unpad_head_k(head, k: int):
    """Slice a padded head back to its real K (snapshot/checkpoint form).
    Works on device arrays AND the host-numpy trees the early-stopping
    host path returns — and must only be applied POST-training: an eager
    device-side unpad inside the per-epoch snapshot materialized a 4.2 GB
    transient copy next to the standing state and OOM'd K=100 on chip."""
    out = {}
    for name, v in head.items():
        axis = _K_AXES[name]
        idx = (slice(None),) * axis + (slice(0, k),)
        out[name] = v[idx]
    return out


def _accel_hbm_budget() -> Optional[float]:
    """Usable accelerator HBM bytes, or None on CPU backends (no budget).

    VITAD_MDN_KCHUNK_BUDGET_GB overrides everything (including the CPU
    no-budget rule, so the routing/guard logic is unit-testable on the CPU
    backend). Without it: the device's reported bytes_limit, else a
    hardcoded v5e default — logged by chunked_heads_mode so an unknown
    accelerator's silent mis-route (engaging the slower chunked path on a
    big-HBM chip, or OOMing a small one) is visible and overridable."""
    env = os.environ.get("VITAD_MDN_KCHUNK_BUDGET_GB")
    if env:
        return float(env) * 1e9
    try:
        dev = jax.devices()[0]
    except Exception:
        return None
    if dev.platform == "cpu":
        return None
    try:
        stats = dev.memory_stats()
        if stats and "bytes_limit" in stats:
            return float(stats["bytes_limit"])
    except Exception:
        pass
    return 15.0e9  # v5e: 16 GB HBM, ~15.75 usable — leave headroom


def chunked_heads_mode(hp, stages, mc) -> Optional[int]:
    """None = joint step; int = chunk size for the K-chunked capacity path.

    Policy: explicit VITAD_MDN_KCHUNK wins (0 / auto / chunk size); auto
    engages only single-device (a mesh shards the K axis instead —
    parallel/sharding.py) and only when the joint step's estimated state
    (params + m + v + grads of the [D,D,K] stage heads, x4 the param
    bytes — matches the measured 16.83 GB at K=100) exceeds the
    accelerator budget.

    Fail-fast: when auto engages the chunked path but even ITS floor
    (3x standing state + one chunk's slice set — measured ~13 GB at the
    K=100/kc=10 reference config) exceeds the budget, raise instead of
    OOMing mid-epoch: past K≈115 single-chip is out of capacity and the
    mixture-sharded mesh path (`--mesh`, tools/k100_mesh_proof.py) is the
    supported route."""
    env = os.environ.get("VITAD_MDN_KCHUNK", "auto").strip()
    if env == "0":
        return None
    if env == "force":  # tests/CI: engage regardless of backend budget
        return pick_k_chunk(hp.num_gaussians)
    if env and env not in ("auto", "pad"):  # "pad" = auto engage + padding
        kc = int(env)
        return kc if hp.num_gaussians % kc == 0 else pick_k_chunk(hp.num_gaussians, kc)
    if mc is not None:
        return None
    budget = _accel_hbm_budget()
    if budget is None:
        return None
    from vit_ad_tpu.models.resnet import STAGE_CHANNELS

    k = hp.num_gaussians
    param_bytes = sum(2 * STAGE_CHANNELS[i] ** 2 * k * 4 for i in stages)
    if 4 * param_bytes <= budget:
        return None
    kc = pick_k_chunk(k)
    # chunked floor: params+m+v standing (3x) + the chunk loop's live slice
    # set. The slice factor 1.5 is calibrated to the MEASURED 13 GB peak at
    # the K=100/kc=10 reference config (PERF.md; donation keeps the in-place
    # chunk updates from doubling the slices) — the guard then raises at
    # K>=115 on the 15 GB v5e budget, exactly where the runtime OOM starts.
    chunked_floor = param_bytes * (3.0 + 1.5 * kc / k)
    import logging

    log = logging.getLogger(__name__)
    if chunked_floor > budget:
        raise ValueError(
            f"MDN-ResNet K={k} exceeds single-chip capacity even K-chunked: "
            f"estimated floor {chunked_floor / 1e9:.1f} GB (3x head state + "
            f"one kc={kc} chunk) vs accelerator budget {budget / 1e9:.1f} GB. "
            f"Use --mesh to shard the mixture axis across devices "
            f"(parallel/sharding.py; proof: tools/k100_mesh_proof.py), "
            f"reduce -n, or override VITAD_MDN_KCHUNK / "
            f"VITAD_MDN_KCHUNK_BUDGET_GB if this budget estimate is wrong."
        )
    log.info(
        "MDN K-chunked capacity path engaged: K=%d kc=%d — joint state "
        "%.1f GB > budget %.1f GB; chunked floor %.1f GB "
        "(VITAD_MDN_KCHUNK/VITAD_MDN_KCHUNK_BUDGET_GB override)",
        k, kc, 4 * param_bytes / 1e9, budget / 1e9, chunked_floor / 1e9,
    )
    return kc


def init_head_opt(head_params: Any) -> Dict[str, Any]:
    """Hand-rolled Adam moment trees for one head's inner param dict."""
    zeros = jax.tree.map(jnp.zeros_like, head_params)
    return {"m": zeros, "v": jax.tree.map(jnp.zeros_like, head_params)}


def chunked_head_update(
    x: Array,
    rng: Optional[Array],
    head: Dict[str, Array],
    m: Dict[str, Array],
    v: Dict[str, Array],
    t: Array,
    ct: Array,
    lr: float,
    wd: float,
    k_chunk: int,
    ll_fn,
    tau: float = 1.0,
    mask: Optional[Array] = None,
    k_real: Optional[int] = None,
    bwd_fn=None,
) -> Tuple[Dict[str, Array], Dict[str, Array], Dict[str, Array], Array, Array]:
    """One fused backward+Adam pass over one GaussianMDN head, K-chunked.

    x:   [B,P,D] features (differentiable — dx is returned for the trunk's
         trainable stage norms)
    ct:  [B,P,D] cotangent of the total log-likelihood (the loss's d/d ll)
    t:   post-increment Adam step count
    `mask` ([K] f32, 1 real / 0 pad): zeroes every head gradient of
    sublane-padding components so they stay exactly at their inert init
    (see `padded_plan` — Adam would otherwise amplify ~1e-15 drift
    gradients to full-lr random walks). `k_real` (with mask): the mixture
    softmax/gumbel runs on the REAL logits slice — the identical random
    stream and rounding as the unpadded path — and pad components take the
    log(1e-15) floor `mixture_log_weights` already applies to underflowed
    real components.

    `bwd_fn` (from `make_chunk_bwd_fn`): direct chunk backward consuming
    phase A's ll_total — phase B then runs NO forward at all (the
    `jax.vjp` fallback re-runs each chunk's forward just to rebuild the
    ll_c normalizer the total already subsumes). None = vjp fallback.

    Returns (new_head, new_m, new_v, dx, ll_total). Gradients are evaluated
    at the pre-step parameters (each chunk's slices are untouched until its
    own loop iteration), so the result is exactly one optimizer step."""
    xf = x.astype(jnp.float32)
    k = head["w_pi"].shape[-1]
    assert k % k_chunk == 0, (k, k_chunk)
    n_chunks = k // k_chunk

    def pi_head(w_pi, b_pi, xf_):
        logits = jnp.einsum("bpd,dk->bpk", xf_, w_pi.astype(jnp.float32)) + b_pi
        if k_real is not None and k_real != logits.shape[-1]:
            lp_real = gmm.mixture_log_weights(logits[..., :k_real], rng, tau)
            pad = jnp.full(
                logits.shape[:-1] + (logits.shape[-1] - k_real,),
                jnp.float32(np.log(1e-15)), lp_real.dtype,
            )
            return jnp.concatenate([lp_real, pad], axis=-1)
        return gmm.mixture_log_weights(logits, rng, tau)

    log_pi, pi_vjp = jax.vjp(pi_head, head["w_pi"], head["b_pi"], xf)
    sg = lax.stop_gradient

    def chunk_slices(src: Dict[str, Array], i):
        start = i * k_chunk
        out = {
            name: lax.dynamic_slice_in_dim(src[name], start, k_chunk, axis)
            for name, axis in _CHUNKED
        }
        out["log_pi"] = lax.dynamic_slice_in_dim(log_pi, start, k_chunk, 2)
        return out

    # Phase A: total log-likelihood (forward only) as an ONLINE logsumexp
    # over chunk lls — a stacked [n_chunks,B,P,D] intermediate cost 1.3 GB
    # at the K=100 stage-2 shapes and OOM'd the padded plan; the carry is
    # two [B,P,D] buffers regardless of chunk count
    def fwd_body(carry, i):
        m_run, s_run = carry
        s = chunk_slices(head, i)
        ll_c = ll_fn(sg(xf), sg(s["log_pi"]), sg(s["w_sigma"]),
                     sg(s["b_sigma"]), sg(s["w_mu"]), sg(s["b_mu"]))
        new_m = jnp.maximum(m_run, ll_c)
        s_run = s_run * jnp.exp(m_run - new_m) + jnp.exp(ll_c - new_m)
        return (new_m, s_run), None

    init_a = (jnp.full(xf.shape, _NEG_BIG, jnp.float32),
              jnp.zeros(xf.shape, jnp.float32))
    (m_run, s_run), _ = lax.scan(fwd_body, init_a, jnp.arange(n_chunks))
    ll_total = m_run + jnp.log(s_run)

    # Phase B: per chunk — gradients via VJP (Pallas backward on TPU),
    # Adam update of the chunk's parameter/moment slices in place
    def bwd_body(carry, i):
        head_c, m_c, v_c, dx, dlp = carry
        start = i * k_chunk
        s = chunk_slices(head_c, i)
        if bwd_fn is not None:
            # direct backward: ll_total IS the normalizer the kernels need —
            # no chunk forward runs in phase B (see make_chunk_bwd_fn)
            dxc, dlp_c, dws, dbs, dwm, dbm = bwd_fn(
                xf, s["log_pi"], s["w_sigma"], s["b_sigma"],
                s["w_mu"], s["b_mu"], ll_total, ct,
            )
        else:
            ll_c, vjp = jax.vjp(
                ll_fn, xf, s["log_pi"], s["w_sigma"], s["b_sigma"],
                s["w_mu"], s["b_mu"],
            )
            # d ll/dθ_c = exp(ll_c - ll) * d ll_c/dθ_c
            ct_c = ct * jnp.exp(ll_c - ll_total)
            dxc, dlp_c, dws, dbs, dwm, dbm = vjp(ct_c)
        dx = dx + dxc
        dlp = lax.dynamic_update_slice_in_dim(dlp, dlp_c, start, 2)
        grads = {"w_sigma": dws, "b_sigma": dbs, "w_mu": dwm, "b_mu": dbm}
        ms = (lax.dynamic_slice_in_dim(mask, start, k_chunk, 0)
              if mask is not None else None)  # K is the last leaf axis
        head_c, m_c, v_c = dict(head_c), dict(m_c), dict(v_c)
        for name, axis in _CHUNKED:
            p_s = lax.dynamic_slice_in_dim(head_c[name], start, k_chunk, axis)
            m_s = lax.dynamic_slice_in_dim(m_c[name], start, k_chunk, axis)
            v_s = lax.dynamic_slice_in_dim(v_c[name], start, k_chunk, axis)
            p_n, m_n, v_n = torch_adam_leaf(p_s, m_s, v_s, grads[name], t, lr,
                                            wd, mask=ms)
            head_c[name] = lax.dynamic_update_slice_in_dim(head_c[name], p_n, start, axis)
            m_c[name] = lax.dynamic_update_slice_in_dim(m_c[name], m_n, start, axis)
            v_c[name] = lax.dynamic_update_slice_in_dim(v_c[name], v_n, start, axis)
        return (head_c, m_c, v_c, dx, dlp), None

    init = (dict(head), dict(m), dict(v), jnp.zeros_like(xf),
            jnp.zeros_like(log_pi))
    (head, m, v, dx, dlp), _ = lax.scan(bwd_body, init, jnp.arange(n_chunks))

    # pi head: gradients flow through the (coupled-across-K) softmax once
    dwpi, dbpi, dx_pi = pi_vjp(dlp)
    head, m, v = dict(head), dict(m), dict(v)
    for name, g in (("w_pi", dwpi), ("b_pi", dbpi)):
        head[name], m[name], v[name] = torch_adam_leaf(
            head[name], m[name], v[name], g, t, lr, wd, mask=mask
        )
    return head, m, v, dx + dx_pi, ll_total
