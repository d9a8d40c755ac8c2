"""Normalizing flow: invertibility, logdet-vs-autodiff, loss semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.flow import (
    _GLOBAL_SCALE_INIT,
    NormalizingFlow,
    patch_tokens_to_map,
)


def _flow(c=8, img=32, patches=16, steps=4, ratio=0.5):
    return NormalizingFlow(
        num_channels=c,
        img_size=img,
        num_patches=patches,
        hidden_ratio=ratio,
        flow_steps=steps,
        dtypes=DtypePolicy.f32(),
    )


def test_global_scale_init_is_one():
    # 0.2 * log(1 + exp(0.5 * p0)) must equal exactly 1.0
    assert 0.2 * np.log1p(np.exp(0.5 * _GLOBAL_SCALE_INIT)) == pytest.approx(1.0)


def test_invertibility(rng):
    flow = _flow()
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    params = flow.init(jax.random.key(0), x)
    z, logdet = flow.apply(params, x, method=NormalizingFlow.transform)
    x_rec = flow.apply(params, z, method=NormalizingFlow.inverse)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4, atol=1e-5)
    assert z.shape == x.shape and logdet.shape == (2,)


def test_logdet_matches_autodiff_jacobian(rng):
    """The analytic log|det J| must equal the autodiff Jacobian's
    slogdet — the strongest correctness check for a flow."""
    c, h, w = 4, 2, 2
    flow = _flow(c=c, img=8, patches=h * w, steps=3, ratio=1.0)
    x = jnp.asarray(rng.normal(size=(1, h, w, c)).astype(np.float32))
    params = flow.init(jax.random.key(1), x)

    z, logdet = flow.apply(params, x, method=NormalizingFlow.transform)

    flat_fn = lambda xf: flow.apply(
        params, xf.reshape(1, h, w, c), method=NormalizingFlow.transform
    )[0].ravel()
    J = jax.jacfwd(flat_fn)(x.ravel())
    sign, want = np.linalg.slogdet(np.asarray(J, dtype=np.float64))
    assert float(logdet[0]) == pytest.approx(float(want), rel=1e-4)


def test_loss_and_anomaly_map_semantics(rng):
    flow = _flow(c=8, img=32, patches=16, steps=2)
    x = jnp.asarray(rng.normal(size=(3, 4, 4, 8)).astype(np.float32))
    params = flow.init(jax.random.key(2), x)
    out = flow.apply(params, x)
    z, logdet = flow.apply(params, x, method=NormalizingFlow.transform)
    want_loss = np.mean(
        0.5 * np.sum(np.asarray(z) ** 2, axis=(1, 2, 3)) - np.asarray(logdet)
    )
    assert float(out.loss) == pytest.approx(float(want_loss), rel=1e-5)
    assert out.anomaly_score_map.shape == (3, 32, 32)
    am = np.asarray(out.anomaly_score_map)
    assert am.min() >= -1e-5 and am.max() <= 1.0 + 1e-5


def test_flow_odd_channels(rng):
    """C odd → split1 = C - C//2 > split2; the production scan path (plus the
    unscanned tail step, steps=3) must still invert exactly."""
    flow = _flow(c=5, img=8, patches=9, steps=3, ratio=1.0)
    x = jnp.asarray(rng.normal(size=(2, 3, 3, 5)).astype(np.float32))
    params = flow.init(jax.random.key(3), x)
    z, ld = flow.apply(params, x, method=NormalizingFlow.transform)
    x_rec = flow.apply(params, z, method=NormalizingFlow.inverse)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4, atol=1e-5)
    assert ld.shape == (2,)


def test_patch_tokens_to_map():
    x = jnp.arange(2 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 3)
    m = patch_tokens_to_map(x)
    assert m.shape == (2, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(m[0, 0, 1]), np.asarray(x[0, 1]))


def test_training_reduces_nll(rng):
    """A few gradient steps on fixed data must reduce the NLL."""
    import optax

    flow = _flow(c=6, img=16, patches=16, steps=4, ratio=1.0)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 6)).astype(np.float32) * 2 + 1)
    params = flow.init(jax.random.key(4), x)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(lambda pp: flow.apply(pp, x).loss)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    losses = []
    for _ in range(30):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 1.0


def test_folded_forward_matches_stock_scores(rng):
    """Permutation folding: z comes back channel-permuted, but z*z channel
    sums and logdet — everything scoring consumes — must match `transform`
    exactly. Covers even (pairs only) and odd (tail step) depths."""
    for steps in (4, 5):
        flow = _flow(steps=steps)
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
        params = flow.init(jax.random.key(0), x)
        z, ld = flow.apply(params, x, method=NormalizingFlow.transform)
        zf, ldf = flow.apply(
            params, x, method=NormalizingFlow.transform_folded
        )
        np.testing.assert_allclose(np.asarray(ldf), np.asarray(ld),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(zf * zf, axis=-1)),
            np.asarray(jnp.sum(z * z, axis=-1)),
            rtol=1e-4, atol=1e-5,
        )
        # z is a per-position channel permutation of stock z
        np.testing.assert_allclose(
            np.sort(np.asarray(zf), axis=-1), np.sort(np.asarray(z), axis=-1),
            rtol=1e-4, atol=1e-5,
        )


def test_call_uses_folded_path_and_matches(rng, monkeypatch):
    """__call__ (scoring) output must be identical with folding on or off."""
    flow = _flow()
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    params = flow.init(jax.random.key(0), x)
    monkeypatch.delenv("VITAD_FOLD_FLOW_PERMS", raising=False)
    stock = flow.apply(params, x)
    monkeypatch.setenv("VITAD_FOLD_FLOW_PERMS", "1")
    folded = flow.apply(params, x)
    np.testing.assert_allclose(np.asarray(folded.loss), np.asarray(stock.loss),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(folded.anomaly_score_map),
        np.asarray(stock.anomaly_score_map), rtol=1e-4, atol=1e-5,
    )
