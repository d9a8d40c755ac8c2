"""K-chunked MDN capacity path (pipeline/mdn_chunked.py): the fused
chunked-backward + in-place torch-Adam update must be gradient- and
update-equivalent to the joint step, end to end — this is the path that
makes the reference's headline K=100 GMM config (reference
startTraining_mdn.py:26-38, csv_results_gmm) trainable on one v5e chip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ad_tpu.config import DtypePolicy, HyperParams
from vit_ad_tpu.models.mdn import GaussianMDN
from vit_ad_tpu.pipeline import mdn_chunked as MC
from vit_ad_tpu.pipeline.optimizers import torch_adam


def _head(d=6, k=4, seed=0):
    mdn = GaussianMDN(features=d, num_gaussians=k, dtypes=DtypePolicy.f32())
    params = mdn.init(jax.random.key(seed), jnp.zeros((1, 1, d)))
    return mdn, dict(params["params"])


@pytest.mark.parametrize("wd", [0.0, 1e-3])
@pytest.mark.parametrize("use_rng", [False, True])
def test_chunked_update_matches_joint_adam_step(wd, use_rng):
    d, k, kc = 6, 4, 2
    lr = 1e-3
    mdn, head = _head(d, k)
    rng = jax.random.key(7) if use_rng else None
    x = jax.random.normal(jax.random.key(1), (2, 3, d), jnp.float32)
    ct = jax.random.normal(jax.random.key(2), (2, 3, d), jnp.float32)

    def joint_loss(h, x_):
        ll = mdn.apply({"params": h}, x_, rng=rng,
                       method=GaussianMDN.log_likelihood)
        return jnp.sum(ct * ll)

    grads, gx = jax.grad(joint_loss, argnums=(0, 1))(head, x)
    tx = torch_adam(lr, wd)
    state = tx.init(head)
    upd, _ = tx.update(grads, state, head)
    expected = jax.tree.map(lambda p, u: p + u, head, upd)

    opt = MC.init_head_opt(head)
    ll_fn = MC.make_chunk_ll_fn(d)
    new_head, m, v, dx, ll_tot = MC.chunked_head_update(
        x, rng, head, opt["m"], opt["v"], jnp.int32(1), ct, lr, wd, kc, ll_fn
    )

    ll_ref = mdn.apply({"params": head}, x, rng=rng,
                       method=GaussianMDN.log_likelihood)
    np.testing.assert_allclose(ll_tot, ll_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dx, gx, rtol=1e-4, atol=1e-5)
    for name in head:
        np.testing.assert_allclose(
            new_head[name], expected[name], rtol=1e-5, atol=1e-7,
            err_msg=name,
        )


def test_chunked_update_multiple_steps_track_optax():
    """Two consecutive chunked steps (count 1 then 2) track the optax chain
    including bias-correction evolution and moment carry."""
    d, k, kc = 4, 6, 3
    lr, wd = 3e-3, 1e-4
    mdn, head = _head(d, k, seed=3)
    x = jax.random.normal(jax.random.key(5), (2, 2, d), jnp.float32)
    ct = jnp.full((2, 2, d), -1.0 / (2 * 2 * d), jnp.float32)

    tx = torch_adam(lr, wd)
    state = tx.init(head)
    ref = dict(head)
    opt = MC.init_head_opt(head)
    m, v = opt["m"], opt["v"]
    cur = dict(head)
    ll_fn = MC.make_chunk_ll_fn(d)
    for t in (1, 2):
        def joint_loss(h):
            ll = mdn.apply({"params": h}, x, rng=None,
                           method=GaussianMDN.log_likelihood)
            return jnp.sum(ct * ll)

        grads = jax.grad(joint_loss)(ref)
        upd, state = tx.update(grads, state, ref)
        ref = jax.tree.map(lambda p, u: p + u, ref, upd)
        cur, m, v, _, _ = MC.chunked_head_update(
            x, None, cur, m, v, jnp.int32(t), ct, lr, wd, kc, ll_fn
        )
    for name in ref:
        np.testing.assert_allclose(cur[name], ref[name], rtol=1e-5,
                                   atol=1e-7, err_msg=name)


def test_pick_k_chunk():
    assert MC.pick_k_chunk(100) == 10
    assert MC.pick_k_chunk(150) == 15
    assert MC.pick_k_chunk(8) == 8
    assert MC.pick_k_chunk(7) == 7
    assert MC.pick_k_chunk(13, cap=4) == 1


def test_chunk_mode_policy(monkeypatch):
    hp = HyperParams(num_gaussians=100)
    # explicit off
    monkeypatch.setenv("VITAD_MDN_KCHUNK", "0")
    assert MC.chunked_heads_mode(hp, (2, 3), None) is None
    # explicit chunk size
    monkeypatch.setenv("VITAD_MDN_KCHUNK", "10")
    assert MC.chunked_heads_mode(hp, (2, 3), None) == 10
    # explicit non-divisor falls back to a divisor <= it
    monkeypatch.setenv("VITAD_MDN_KCHUNK", "8")
    assert MC.chunked_heads_mode(hp, (2, 3), None) == 5
    # auto on the CPU backend: no HBM budget, stays joint
    monkeypatch.setenv("VITAD_MDN_KCHUNK", "auto")
    assert MC.chunked_heads_mode(hp, (2, 3), None) is None
    # auto never engages under a mesh (the mesh shards K instead)
    monkeypatch.delenv("VITAD_MDN_KCHUNK", raising=False)
    assert MC.chunked_heads_mode(hp, (2, 3), object()) is None


@pytest.mark.slow
def test_train_mdn_resnet_chunked_matches_joint(tmp_path):
    """The REAL trainer through both paths: VITAD_MDN_KCHUNK=<kc> must
    reproduce the joint step's loss history and eval metrics (chunked
    logsumexp/accumulation order differs → tolerance, not bit-equality)."""
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.data.synthetic import make_mvtec_category
    from vit_ad_tpu.pipeline.train import train_mdn_resnet

    root = tmp_path / "data"
    make_mvtec_category(str(root), "cat", img_size=32, n_train=12,
                        n_test_good=3, n_test_defect=3)

    def run(kchunk_env):
        os.environ["VITAD_MDN_KCHUNK"] = kchunk_env
        try:
            hp = HyperParams(
                model_name="enc_res_net", architecture="mdn", epochs=2,
                patience=2, learning_rate=1e-3, weight_decay=1e-5,
                batch_size=6, img_size=32, num_gaussians=4, seed=24,
                dtypes=DtypePolicy.f32(),
            )
            data = DataPipeline(batch_size=6, base_path=str(root),
                                data_path="train/good", img_size=32)
            test = DataPipeline(batch_size=6, base_path=f"{root}/cat",
                                data_path="test", img_size=32,
                                validation_mode=True)
            return train_mdn_resnet(hp, data, test)
        finally:
            os.environ.pop("VITAD_MDN_KCHUNK", None)

    joint = run("0")
    chunked = run("2")
    np.testing.assert_allclose(
        chunked.history["train_loss"], joint.history["train_loss"],
        rtol=2e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        chunked.history["valid_loss"], joint.history["valid_loss"],
        rtol=2e-3, atol=1e-4,
    )
    a0 = joint.metrics["image_auroc_score"]
    a1 = chunked.metrics["image_auroc_score"]
    assert abs(a0 - a1) < 0.05, (a0, a1)


def test_chunked_update_pallas_interpret_path(monkeypatch):
    """The TPU dispatch (Pallas custom-VJP kernels inside the chunk scan)
    traced via interpret mode on CPU: same update as the dense joint step.
    D must be lane-aligned for the kernel gate."""
    monkeypatch.setenv("VITAD_PALLAS_GMM_TRAIN", "1")
    d, k, kc = 128, 4, 2
    lr, wd = 1e-3, 1e-4
    mdn, head = _head(d, k, seed=11)
    x = jax.random.normal(jax.random.key(4), (2, 2, d), jnp.float32)
    ct = jax.random.normal(jax.random.key(6), (2, 2, d), jnp.float32) * 0.1

    ll_fn = MC.make_chunk_ll_fn(d)

    # joint reference on the DENSE path
    monkeypatch.setenv("VITAD_PALLAS_GMM_TRAIN", "0")
    def joint_loss(h, x_):
        ll = mdn.apply({"params": h}, x_, rng=None,
                       method=GaussianMDN.log_likelihood)
        return jnp.sum(ct * ll)

    grads, gx = jax.grad(joint_loss, argnums=(0, 1))(head, x)
    tx = torch_adam(lr, wd)
    upd, _ = tx.update(grads, tx.init(head), head)
    expected = jax.tree.map(lambda p, u: p + u, head, upd)

    opt = MC.init_head_opt(head)
    new_head, _, _, dx, _ = MC.chunked_head_update(
        x, None, head, opt["m"], opt["v"], jnp.int32(1), ct, lr, wd, kc, ll_fn
    )
    np.testing.assert_allclose(dx, gx, rtol=5e-3, atol=1e-4)
    for name in head:
        np.testing.assert_allclose(
            new_head[name], expected[name], rtol=1e-4, atol=1e-6,
            err_msg=name,
        )


def test_chunked_trainer_bf16_policy_smoke(tmp_path, monkeypatch):
    """Default DtypePolicy (bf16 compute): the chunked step's f32 head math
    must hand the trunk VJP a compute-dtype cotangent — the exact crash the
    first K=100 hardware run hit (f32 dx vs bf16 stage features)."""
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.data.synthetic import make_mvtec_category
    from vit_ad_tpu.pipeline.train import train_mdn_resnet

    monkeypatch.setenv("VITAD_MDN_KCHUNK", "2")
    root = tmp_path / "data"
    make_mvtec_category(str(root), "cat", img_size=32, n_train=10,
                        n_test_good=2, n_test_defect=2)
    hp = HyperParams(
        model_name="enc_res_net", architecture="mdn", epochs=1, patience=1,
        learning_rate=1e-3, batch_size=4, img_size=32, num_gaussians=4,
        seed=24,  # default DtypePolicy: params f32, compute bf16
    )
    data = DataPipeline(batch_size=4, base_path=str(root),
                        data_path="train/good", img_size=32)
    result = train_mdn_resnet(hp, data, None)
    assert np.isfinite(result.history["train_loss"][-1])


def test_padded_plan_and_ll_bit_identity():
    """Sublane padding (K→multiple of 8, inert components): the padded
    head's log-likelihood matches to float rounding — pad contributions
    are ~e^-30 of a real component's (below f32 epsilon); the residual
    1-ulp difference is the softmax denominator summing 8 vs 6 terms."""
    d, k = 6, 6
    mdn, head = _head(d, k, seed=2)
    k_pad, kc, mask = MC.padded_plan(k)
    assert (k_pad, kc) == (8, 8)
    assert mask is not None and mask.sum() == k
    padded = MC.pad_head_k(head, k_pad)
    mdn_pad = GaussianMDN(features=d, num_gaussians=k_pad,
                          dtypes=DtypePolicy.f32())
    x = jax.random.normal(jax.random.key(9), (2, 3, d), jnp.float32)
    ll = mdn.apply({"params": head}, x, rng=None,
                   method=GaussianMDN.log_likelihood)
    ll_pad = mdn_pad.apply({"params": padded}, x, rng=None,
                           method=GaussianMDN.log_likelihood)
    np.testing.assert_allclose(np.asarray(ll_pad), np.asarray(ll),
                               rtol=3e-7, atol=3e-7)
    # aligned K: no padding
    assert MC.padded_plan(16) == (16, 16, None)
    assert MC.padded_plan(100)[:2] == (104, 8)


def test_chunked_update_with_padding_matches_joint():
    """pad → masked chunked update → unpad must equal the joint optax step
    on the real-K head, and pad components must stay exactly at init."""
    d, k = 6, 6
    lr, wd = 1e-3, 1e-4
    mdn, head = _head(d, k, seed=5)
    x = jax.random.normal(jax.random.key(2), (2, 3, d), jnp.float32)
    ct = jax.random.normal(jax.random.key(3), (2, 3, d), jnp.float32) * 0.1

    def joint_loss(h):
        ll = mdn.apply({"params": h}, x, rng=None,
                       method=GaussianMDN.log_likelihood)
        return jnp.sum(ct * ll)

    grads = jax.grad(joint_loss)(head)
    tx = torch_adam(lr, wd)
    upd, _ = tx.update(grads, tx.init(head), head)
    expected = jax.tree.map(lambda p, u: p + u, head, upd)

    k_pad, kc, mask = MC.padded_plan(k)
    padded = MC.pad_head_k(head, k_pad)
    opt = MC.init_head_opt(padded)
    ll_fn = MC.make_chunk_ll_fn(d)
    new_pad, m_pad, v_pad, _, _ = MC.chunked_head_update(
        x, None, padded, opt["m"], opt["v"], jnp.int32(1), ct, lr, wd, kc,
        ll_fn, mask=mask,
    )
    got = MC.unpad_head_k(new_pad, k)
    for name in head:
        np.testing.assert_allclose(got[name], expected[name], rtol=1e-5,
                                   atol=1e-7, err_msg=name)
    # pad components exactly untouched (the mask must be exact: Adam
    # amplifies any drift gradient to full-lr steps)
    for name, axis in MC._K_AXES.items():
        pad_vals = np.take(np.asarray(new_pad[name]),
                           range(k, k_pad), axis=axis)
        init_vals = np.take(np.asarray(padded[name]),
                            range(k, k_pad), axis=axis)
        np.testing.assert_array_equal(pad_vals, init_vals, err_msg=name)


@pytest.mark.slow
def test_train_mdn_resnet_chunked_padded_matches_joint(tmp_path):
    """The REAL trainer through the padded chunked path (K=6 → pad 8 via
    VITAD_MDN_KCHUNK=force) vs the joint step; snapshots/eval must carry
    the real K only."""
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.data.synthetic import make_mvtec_category
    from vit_ad_tpu.pipeline.train import train_mdn_resnet

    root = tmp_path / "data"
    make_mvtec_category(str(root), "cat", img_size=32, n_train=12,
                        n_test_good=3, n_test_defect=3)

    def run(kchunk_env):
        os.environ["VITAD_MDN_KCHUNK"] = kchunk_env
        try:
            hp = HyperParams(
                model_name="enc_res_net", architecture="mdn", epochs=2,
                patience=2, learning_rate=1e-3, weight_decay=1e-5,
                batch_size=6, img_size=32, num_gaussians=6, seed=24,
                dtypes=DtypePolicy.f32(),
            )
            data = DataPipeline(batch_size=6, base_path=str(root),
                                data_path="train/good", img_size=32)
            test = DataPipeline(batch_size=6, base_path=f"{root}/cat",
                                data_path="test", img_size=32,
                                validation_mode=True)
            return train_mdn_resnet(hp, data, test)
        finally:
            os.environ.pop("VITAD_MDN_KCHUNK", None)

    joint = run("0")
    padded = run("force")
    for h in padded.head_params["heads"]:
        assert h["params"]["w_mu"].shape[-1] == 6  # real K in snapshots
    np.testing.assert_allclose(
        padded.history["train_loss"], joint.history["train_loss"],
        rtol=2e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        padded.history["valid_loss"], joint.history["valid_loss"],
        rtol=2e-3, atol=1e-4,
    )
    assert abs(padded.metrics["image_auroc_score"]
               - joint.metrics["image_auroc_score"]) < 0.05


@pytest.mark.parametrize("wd", [0.0, 1e-3])
@pytest.mark.parametrize("use_rng", [False, True])
def test_chunked_update_direct_bwd_matches_joint(wd, use_rng):
    """Direct chunk backward (bwd_fn: phase B consumes phase A's ll_total,
    no forward recompute) must match the joint Adam step exactly like the
    vjp fallback does — the r5 perf lever is gradient-identical."""
    d, k, kc = 6, 4, 2
    lr = 1e-3
    mdn, head = _head(d, k)
    rng = jax.random.key(7) if use_rng else None
    x = jax.random.normal(jax.random.key(1), (2, 3, d), jnp.float32)
    ct = jax.random.normal(jax.random.key(2), (2, 3, d), jnp.float32)

    def joint_loss(h, x_):
        ll = mdn.apply({"params": h}, x_, rng=rng,
                       method=GaussianMDN.log_likelihood)
        return jnp.sum(ct * ll)

    grads, gx = jax.grad(joint_loss, argnums=(0, 1))(head, x)
    tx = torch_adam(lr, wd)
    upd, _ = tx.update(grads, tx.init(head), head)
    expected = jax.tree.map(lambda p, u: p + u, head, upd)

    opt = MC.init_head_opt(head)
    new_head, m, v, dx, ll_tot = MC.chunked_head_update(
        x, rng, head, opt["m"], opt["v"], jnp.int32(1), ct, lr, wd, kc,
        MC.make_chunk_ll_fn(d), bwd_fn=MC.make_chunk_bwd_fn(d),
    )
    ll_ref = mdn.apply({"params": head}, x, rng=rng,
                       method=GaussianMDN.log_likelihood)
    np.testing.assert_allclose(ll_tot, ll_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dx, gx, rtol=1e-4, atol=1e-5)
    for name in head:
        np.testing.assert_allclose(
            new_head[name], expected[name], rtol=1e-5, atol=1e-7,
            err_msg=name,
        )


def test_chunked_update_direct_bwd_pallas_interpret(monkeypatch):
    """Direct backward through the Pallas kernels (interpret mode on CPU):
    the kernels take ll_total as their normalizer residual — same update
    as the dense joint step."""
    monkeypatch.setenv("VITAD_PALLAS_GMM_TRAIN", "1")
    d, k, kc = 128, 4, 2
    lr, wd = 1e-3, 1e-4
    mdn, head = _head(d, k, seed=11)
    x = jax.random.normal(jax.random.key(4), (2, 2, d), jnp.float32)
    ct = jax.random.normal(jax.random.key(6), (2, 2, d), jnp.float32) * 0.1

    ll_fn = MC.make_chunk_ll_fn(d)
    bwd_fn = MC.make_chunk_bwd_fn(d)

    monkeypatch.setenv("VITAD_PALLAS_GMM_TRAIN", "0")

    def joint_loss(h, x_):
        ll = mdn.apply({"params": h}, x_, rng=None,
                       method=GaussianMDN.log_likelihood)
        return jnp.sum(ct * ll)

    grads, gx = jax.grad(joint_loss, argnums=(0, 1))(head, x)
    tx = torch_adam(lr, wd)
    upd, _ = tx.update(grads, tx.init(head), head)
    expected = jax.tree.map(lambda p, u: p + u, head, upd)

    opt = MC.init_head_opt(head)
    new_head, _, _, dx, _ = MC.chunked_head_update(
        x, None, head, opt["m"], opt["v"], jnp.int32(1), ct, lr, wd, kc,
        ll_fn, bwd_fn=bwd_fn,
    )
    np.testing.assert_allclose(dx, gx, rtol=5e-3, atol=1e-4)
    for name in head:
        np.testing.assert_allclose(
            new_head[name], expected[name], rtol=1e-4, atol=1e-6,
            err_msg=name,
        )


def test_chunked_update_direct_bwd_with_padding_matches_joint():
    """Direct backward + sublane padding: pad inertness is now structural
    (torch_adam_leaf masks the DECAYED gradient), so pads stay exactly at
    init and real components match the joint step."""
    d, k = 6, 6
    lr, wd = 1e-3, 1e-4
    mdn, head = _head(d, k, seed=5)
    x = jax.random.normal(jax.random.key(2), (2, 3, d), jnp.float32)
    ct = jax.random.normal(jax.random.key(3), (2, 3, d), jnp.float32) * 0.1

    def joint_loss(h):
        ll = mdn.apply({"params": h}, x, rng=None,
                       method=GaussianMDN.log_likelihood)
        return jnp.sum(ct * ll)

    grads = jax.grad(joint_loss)(head)
    tx = torch_adam(lr, wd)
    upd, _ = tx.update(grads, tx.init(head), head)
    expected = jax.tree.map(lambda p, u: p + u, head, upd)

    k_pad, kc, mask = MC.padded_plan(k)
    padded = MC.pad_head_k(head, k_pad)
    opt = MC.init_head_opt(padded)
    # under JIT: XLA's algebraic simplifier once squared the decayed pad
    # gradient (wd*(-1e30))^2 -> inf BEFORE the mask multiply, NaN'ing the
    # pad slices — eager runs never showed it (torch_adam_leaf where-fix)
    step = jax.jit(
        lambda h, m, v: MC.chunked_head_update(
            x, None, h, m, v, jnp.int32(1), ct, lr, wd, kc,
            MC.make_chunk_ll_fn(d), mask=mask, k_real=k,
            bwd_fn=MC.make_chunk_bwd_fn(d),
        )
    )
    new_pad, m_pad, v_pad, _, _ = step(padded, opt["m"], opt["v"])
    got = MC.unpad_head_k(new_pad, k)
    for name in head:
        np.testing.assert_allclose(got[name], expected[name], rtol=1e-5,
                                   atol=1e-7, err_msg=name)
    # structural inertness: pad params AND pad moments exactly zero-change
    for name, axis in MC._K_AXES.items():
        for tree, ref in ((new_pad, padded),
                          (m_pad, None), (v_pad, None)):
            pad_vals = np.take(np.asarray(tree[name]), range(k, k_pad),
                               axis=axis)
            if ref is None:
                np.testing.assert_array_equal(
                    pad_vals, np.zeros_like(pad_vals), err_msg=name)
            else:
                init_vals = np.take(np.asarray(ref[name]), range(k, k_pad),
                                    axis=axis)
                np.testing.assert_array_equal(pad_vals, init_vals,
                                              err_msg=name)


def test_chunk_mode_capacity_guard(monkeypatch):
    """Auto mode must fail fast (pointing at --mesh) when even the chunked
    floor (3x head state + one chunk) exceeds the budget, instead of
    engaging and OOMing mid-epoch; the budget env override makes this
    testable on the CPU backend."""
    monkeypatch.setenv("VITAD_MDN_KCHUNK", "auto")
    # K=100 stages (2,3): joint ~16.8 GB, chunked floor ~13.2 GB
    hp = HyperParams(num_gaussians=100)
    monkeypatch.setenv("VITAD_MDN_KCHUNK_BUDGET_GB", "15")
    assert MC.chunked_heads_mode(hp, (2, 3), None) == 10  # engages
    monkeypatch.setenv("VITAD_MDN_KCHUNK_BUDGET_GB", "20")
    assert MC.chunked_heads_mode(hp, (2, 3), None) is None  # joint fits
    monkeypatch.setenv("VITAD_MDN_KCHUNK_BUDGET_GB", "10")
    with pytest.raises(ValueError, match="--mesh"):
        MC.chunked_heads_mode(hp, (2, 3), None)
    # K=120 on the v5e budget: the measured-calibrated floor says no
    hp120 = HyperParams(num_gaussians=120)
    monkeypatch.setenv("VITAD_MDN_KCHUNK_BUDGET_GB", "15")
    with pytest.raises(ValueError, match="--mesh"):
        MC.chunked_heads_mode(hp120, (2, 3), None)
