"""1-D VAE structural tests: shapes, downsample rate, posterior semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from maa3_tpu.models.vae1d import (
    VAEConfig, vae_init, vae_encode_moments, vae_decode, gaussian_sample,
    gaussian_kl,
)

# small config, same topology as the released VAE (3 levels, down at 0)
CFG = VAEConfig(in_channels=80, out_ch=80, ch=32, ch_mult=(1, 2, 4),
                num_res_blocks=2, down_layers=(0,), kernel_size=5,
                z_channels=20, embed_dim=20)


def test_vae_shapes_roundtrip():
    key = jax.random.PRNGKey(0)
    params = vae_init(key, CFG)
    x = jax.random.normal(key, (2, 80, 64))
    moments = vae_encode_moments(params, CFG, x)
    assert moments.shape == (2, 40, 32)  # T/2, 2*embed_dim
    z = gaussian_sample(moments, key)
    assert z.shape == (2, 20, 32)
    rec = vae_decode(params, CFG, z)
    assert rec.shape == (2, 80, 64)
    assert np.isfinite(np.asarray(rec)).all()


def test_gaussian_mode_and_kl():
    mean = jnp.ones((1, 20, 8))
    logvar = jnp.zeros((1, 20, 8))
    moments = jnp.concatenate([mean, logvar], axis=1)
    mode = gaussian_sample(moments, sample=False)
    np.testing.assert_allclose(np.asarray(mode), 1.0)
    # KL(N(1,1) || N(0,1)) = 0.5 per dim
    kl = gaussian_kl(moments)
    np.testing.assert_allclose(np.asarray(kl), 0.5 * 20 * 8, rtol=1e-5)


def test_vae_odd_length():
    """Downsample = pad(0,1) + valid stride-2 conv(k=3): T=63 -> 31
    (floor((63+1-3)/2)+1), matching torch Downsample1D semantics."""
    key = jax.random.PRNGKey(1)
    params = vae_init(key, CFG)
    x = jax.random.normal(key, (1, 80, 63))
    moments = vae_encode_moments(params, CFG, x)
    assert moments.shape[-1] == 31
