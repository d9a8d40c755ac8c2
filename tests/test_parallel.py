"""Mesh + sharding rules on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.vit import ViTEncoder
from vit_ad_tpu.parallel.mesh import batch_sharding, create_mesh
from vit_ad_tpu.parallel.sharding import param_shardings, shard_variables


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return create_mesh(data=4, model=2)


def test_mesh_shape(mesh):
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_vit_param_sharding_rules(mesh):
    enc = ViTEncoder(img_size=32, patch_size=8, embed_dim=64, depth=2,
                     num_heads=4, num_prefix_tokens=2, dtypes=DtypePolicy.f32())
    params = enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    sh = param_shardings(params, mesh)
    p = sh["params"]
    # column-parallel: qkv/fc1 stacked kernels shard the output dim
    assert p["qkv_kernel"].spec == P(None, None, "model")
    assert p["fc1_kernel"].spec == P(None, None, "model")
    # row-parallel: proj/fc2 shard the input dim
    assert p["proj_kernel"].spec == P(None, "model", None)
    assert p["fc2_kernel"].spec == P(None, "model", None)
    # everything else replicated
    assert p["pos_embed"].spec == P()
    assert p["norm_scale"].spec == P()

    # placement actually works and computation still matches single-device
    sharded = shard_variables(params, mesh)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 32, 32, 3)),
                    jnp.float32)
    with mesh:
        xs = jax.device_put(x, batch_sharding(mesh))
        out_sharded = jax.jit(lambda pp, xx: enc.apply(pp, xx).latent)(sharded, xs)
    out_single = enc.apply(params, x).latent
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_single), rtol=2e-4, atol=2e-5
    )


def test_mdn_mixture_sharding(mesh):
    from vit_ad_tpu.models.mdn import GaussianMDN

    mdn = GaussianMDN(features=16, num_gaussians=8)
    params = mdn.init(jax.random.key(0), jnp.zeros((1, 1, 16)))
    sh = param_shardings(params, mesh)
    assert sh["params"]["w_mu"].spec == P(None, None, "model")
    assert sh["params"]["w_pi"].spec == P(None, "model")


def test_swin_param_sharding_rules(mesh):
    from vit_ad_tpu.models.swin import SwinTransformer

    m = SwinTransformer(img_size=16, patch_size=2, embed_dim=8, depths=(2, 2),
                        num_heads=(2, 4), window=4, dtypes=DtypePolicy.f32())
    params = m.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    sh = param_shardings(params, mesh)
    l0 = sh["params"]["layer0"]
    assert l0["a_qkv_kernel"].spec == P(None, None, "model")
    assert l0["b_fc2_kernel"].spec == P(None, "model", None)
    assert l0["a_bias_table"].spec == P()


def test_dryrun_multichip_bootstraps_from_hostile_env():
    """The driver calls dryrun_multichip() in a process whose JAX backend is
    already initialized on ONE device (round-1 red check, VERDICT item 1).
    It must self-bootstrap an n-device virtual CPU backend in a subprocess."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("_VITAD_DRYRUN_CHILD", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         # config.update AFTER import: the axon sitecustomize tramples
         # JAX_PLATFORMS at interpreter startup, and without this the
         # "hostile parent" would initialize the REAL TPU backend (a
         # 25-minute hang when the tunnel is down) instead of one CPU
         # device — the hostility this test models is "backend already
         # initialized on one device", not "backend is remote"
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "assert len(jax.devices()) == 1;"
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "mesh=(4x2)" in proc.stdout
    assert "devices=8" in proc.stdout
