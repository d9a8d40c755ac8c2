"""torch_adam ≡ torch.optim.Adam trajectory parity.

The reference trains every head with torch.optim.Adam(lr, weight_decay)
(reference src/pipeline/LearnerRecon.py:415, LearnerMDN.py:130,
LearnerNF.py:119); torch's weight decay is COUPLED L2 (added to the
gradient before the Adam moments), unlike optax.adamw. This locks the
update rule itself: identical gradient sequences must produce matching
parameter trajectories (both sides f32; tolerance covers op-order
rounding only)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vit_ad_tpu.pipeline.optimizers import torch_adam


def _run_both(p0, grads, lr, wd):
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([tp], lr=lr, weight_decay=wd, eps=1e-8)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = torch_adam(lr, wd)
    params = jnp.asarray(p0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = params + updates
    return np.asarray(params), tp.detach().numpy()


@pytest.mark.parametrize(
    "lr,wd,tol",
    [(1e-3, 0.0, 2e-6), (7e-4, 7e-4, 2e-6),
     # stress lr: 25 steps × 0.37-sized f32 updates accumulate op-order
     # rounding; the trajectories stay equal to ~1e-4 rel
     (0.37, 1e-2, 2e-4)],
)
def test_torch_adam_matches_torch_trajectory(lr, wd, tol):
    rng = np.random.default_rng(5)
    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(25)]
    ours, theirs = _run_both(p0, grads, lr, wd)
    np.testing.assert_allclose(ours, theirs, rtol=tol, atol=tol)


def test_torch_adam_weight_decay_is_coupled():
    """With zero gradients, coupled L2 still moves the params (the decay
    term feeds the moments); decoupled adamw shrinks along a different
    trajectory — guard the distinction the reference's runs depend on."""
    p0 = np.full((3,), 2.0, np.float32)
    grads = [np.zeros(3, np.float32) for _ in range(10)]
    ours, theirs = _run_both(p0, grads, lr=1e-2, wd=0.1)
    np.testing.assert_allclose(ours, theirs, rtol=2e-6, atol=2e-6)
    assert np.all(ours < p0)  # decay actually acted
