"""FusedBatchNorm ≡ nn.BatchNorm parity.

The conv trunks' BatchNorm eval path was flax nn.BatchNorm with
dtype=accum (f32), which promotes the whole map to f32 and materializes
stage-map-sized f32 fusions XLA cannot fold into the producing conv's
epilogue (tools/trace_eff_former.txt: ~1.6 ms of f32 [128,56,56,64] BN
fusions). FusedBatchNorm keeps flax's exact layout and training math but
applies the inference affine in the compute dtype. These tests lock:

- f32 policy: bit-identical outputs AND batch_stats trajectories in both
  modes (the torch golden tests all run under DtypePolicy.f32()).
- bf16 policy: eval output close to the f32-normalize reference (the
  per-channel constants are still derived in f32; only the map-sized
  multiply/add run in bf16, same rounding class as every conv epilogue).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.layers import FusedBatchNorm


def _flax_bn(use_running_average, dtypes):
    return nn.BatchNorm(
        use_running_average=use_running_average, momentum=0.9, epsilon=1e-5,
        dtype=dtypes.accum_dtype, param_dtype=dtypes.param_dtype,
    )


def _rand_state(c):
    k = jax.random.PRNGKey(3)
    ks = jax.random.split(k, 4)
    return {
        "params": {
            "scale": jax.random.normal(ks[0], (c,)) * 0.2 + 1.0,
            "bias": jax.random.normal(ks[1], (c,)) * 0.1,
        },
        "batch_stats": {
            "mean": jax.random.normal(ks[2], (c,)) * 0.5,
            "var": jax.nn.softplus(jax.random.normal(ks[3], (c,))) + 0.3,
        },
    }


@pytest.mark.parametrize("train", [False, True])
def test_fused_bn_bit_identical_f32(train):
    dt = DtypePolicy.f32()
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 6, 5), jnp.float32)
    state = _rand_state(5)
    ref = _flax_bn(not train, dt)
    new = FusedBatchNorm(use_running_average=not train, dtypes=dt)
    if train:
        y_ref, m_ref = ref.apply(state, x, mutable=["batch_stats"])
        y_new, m_new = new.apply(state, x, mutable=["batch_stats"])
        for key in ("mean", "var"):
            np.testing.assert_array_equal(
                np.asarray(m_ref["batch_stats"][key]),
                np.asarray(m_new["batch_stats"][key]),
            )
    else:
        y_ref = ref.apply(state, x)
        y_new = new.apply(state, x)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))


def test_fused_bn_eval_bf16_close_and_bf16_typed():
    dt = DtypePolicy()  # bf16 compute
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 6, 5), jnp.bfloat16)
    state = _rand_state(5)
    y = FusedBatchNorm(use_running_average=True, dtypes=dt).apply(state, x)
    assert y.dtype == jnp.bfloat16  # stays fusable into bf16 epilogues
    y_ref = _flax_bn(True, dt).apply(state, x)  # f32-normalize reference
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=0.02, atol=0.02,
    )


def test_fused_bn_init_matches_flax_structure():
    dt = DtypePolicy.f32()
    x = jnp.zeros((2, 4, 4, 3))
    v_ref = _flax_bn(False, dt).init(jax.random.PRNGKey(0), x)
    v_new = FusedBatchNorm(use_running_average=False, dtypes=dt).init(
        jax.random.PRNGKey(0), x
    )
    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(
        v_new
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(v_ref), jax.tree_util.tree_leaves(v_new)
    ):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # init must NOT have updated running stats (flax skips the momentum
    # blend while initializing): the freshly-inited mean is still zeros
    np.testing.assert_array_equal(
        np.asarray(v_new["batch_stats"]["mean"]), np.zeros(3)
    )
    # ...while a post-init mutable apply DOES update them
    _, mut = FusedBatchNorm(use_running_average=False, dtypes=dt).apply(
        v_new, jnp.ones((2, 4, 4, 3)), mutable=["batch_stats"]
    )
    assert float(np.asarray(mut["batch_stats"]["mean"]).sum()) != 0.0
