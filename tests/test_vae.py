"""VAE: shapes, KL math, end-to-end training (the reference's VAE is dead
code — reference src/classes/VariationalAutoEncoder.py, unreachable per
SURVEY.md §2.3; functional here)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ad_tpu.config import DtypePolicy, HyperParams
from vit_ad_tpu.data.loader import DataPipeline
from vit_ad_tpu.data.synthetic import make_mvtec_category
from vit_ad_tpu.models.vae import VariationalAutoEncoder
from vit_ad_tpu.pipeline.train import train_vae

F32 = DtypePolicy.f32()


def test_vae_shapes_and_kl(rng):
    vae = VariationalAutoEncoder(img_size=32, latent_dim=16, dtypes=F32)
    x = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    v = vae.init(jax.random.key(0), x, jax.random.key(1), train=True)
    out = vae.apply(v, x, jax.random.key(2), train=False)
    assert out.reconstruction.shape == (2, 32, 32, 3)
    assert out.latent.shape == (2, 16)
    mu, log_var = vae.apply(v, x, train=False,
                            method=VariationalAutoEncoder.encode)
    assert float(jnp.min(log_var)) > 0  # ELU+1+eps positivity
    # KL of a standard normal posterior is 0
    zero_kl = VariationalAutoEncoder.kl_loss(
        jnp.zeros((2, 16)), jnp.zeros((2, 16))
    )
    assert float(zero_kl) == pytest.approx(0.0, abs=1e-6)
    assert float(VariationalAutoEncoder.kl_loss(mu, log_var)) > 0


def test_vae_end_to_end(tmp_path):
    root = str(tmp_path)
    make_mvtec_category(root, "cat", img_size=32, n_train=12,
                        n_test_good=3, n_test_defect=3)
    hp = HyperParams(epochs=3, patience=3, learning_rate=1e-3, batch_size=6,
                     img_size=32, dtypes=F32)
    data = DataPipeline(batch_size=6, base_path=root, data_path="train/good",
                        img_size=32)
    test = DataPipeline(batch_size=6, base_path=f"{root}/cat",
                        data_path="test", img_size=32, validation_mode=True)
    model = VariationalAutoEncoder(img_size=32, latent_dim=16, dtypes=F32)
    r = train_vae(hp, data, test, model=model)
    assert np.isfinite(r.history["train_loss"][-1])
    assert np.isfinite(r.metrics["image_auroc_score"])
