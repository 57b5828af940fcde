"""Legacy-family tests: 2-D VAE (KL + VQ), DDPM loss, LPAPS, multi-window disc."""

import numpy as np
import jax
import jax.numpy as jnp

from maa3_tpu.models.vae2d import (VAE2DConfig, vae2d_init,
                                   vae2d_encode_moments, vae2d_decode,
                                   vq_quantize)
from maa3_tpu.models.vae1d import gaussian_sample
from maa3_tpu.diffusion.schedules import DDPMSchedule
from maa3_tpu.diffusion.ddpm_loss import ddpm_loss, film_pool, concat_condition
from maa3_tpu.models.melclf import MelClfConfig, melclf_init
from maa3_tpu.eval.lpaps import lpaps_distance
from maa3_tpu.models.discriminators import (multi_window_disc_init,
                                            multi_window_disc_apply)

CFG2D = VAE2DConfig(in_channels=1, out_ch=1, ch=32, ch_mult=(1, 2),
                    num_res_blocks=1, z_channels=4, embed_dim=4, resolution=16)


def test_vae2d_kl_roundtrip():
    params = vae2d_init(jax.random.PRNGKey(0), CFG2D)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16, 24))
    moments = vae2d_encode_moments(params, CFG2D, x)
    assert moments.shape == (2, 8, 8, 12)  # H/2, W/2, 2*embed
    z = gaussian_sample(moments, jax.random.PRNGKey(2))
    rec = vae2d_decode(params, CFG2D, z)
    assert rec.shape == x.shape
    assert np.isfinite(np.asarray(rec)).all()


def test_vq_quantize():
    cfg = VAE2DConfig(in_channels=1, out_ch=1, ch=32, ch_mult=(1, 2),
                      num_res_blocks=1, z_channels=4, embed_dim=4,
                      resolution=16, n_embed=8)
    params = vae2d_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 6))
    zq, idx, loss = vq_quantize(params["codebook"], z)
    assert zq.shape == z.shape and idx.shape == (2, 4, 6)
    assert (np.asarray(idx) < 8).all()
    assert float(loss) > 0
    # straight-through: every zq vector is exactly a codebook row
    flat = np.asarray(zq).transpose(0, 2, 3, 1).reshape(-1, 4)
    cb = np.asarray(params["codebook"])
    d = np.abs(flat[:, None, :] - cb[None]).sum(-1).min(1)
    np.testing.assert_allclose(d, 0, atol=1e-6)


def test_ddpm_loss_eps_and_x0():
    s = DDPMSchedule.create(1000, "linear", 0.00085, 0.012)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 8))

    def zero_model(x_noisy, t, ctx):
        return jnp.zeros_like(x_noisy)

    loss, aux = ddpm_loss(zero_model, s, x, jax.random.PRNGKey(1))
    # eps target has unit variance -> loss ~ 1
    assert 0.5 < float(loss) < 2.0
    loss0, _ = ddpm_loss(zero_model, s, x, jax.random.PRNGKey(1),
                         parameterization="x0")
    assert np.isfinite(float(loss0))
    loss_vlb, aux2 = ddpm_loss(zero_model, s, x, jax.random.PRNGKey(1),
                               original_elbo_weight=0.1)
    assert "loss_vlb" in aux2


def test_film_and_concat_conditioning():
    ctx = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 16))
    pooled = film_pool(ctx)
    assert pooled.shape == (2, 16)
    x = jnp.ones((2, 3, 8))
    cc = concat_condition(x, jnp.zeros((2, 2, 8)))
    assert cc.shape == (2, 5, 8)


def test_lpaps_distance():
    cfg = MelClfConfig(conv_layers=(8, "MP", 16), num_classes=4)
    params = melclf_init(jax.random.PRNGKey(0), cfg)
    a = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 32))
    d_self = lpaps_distance(params, cfg, a, a)
    np.testing.assert_allclose(np.asarray(d_self), 0.0, atol=1e-10)
    b = a + 0.5 * jax.random.normal(jax.random.PRNGKey(2), a.shape)
    d_ab = lpaps_distance(params, cfg, a, b)
    assert (np.asarray(d_ab) > 0).all()


def test_multi_window_disc():
    params = multi_window_disc_init(jax.random.PRNGKey(0),
                                    time_lengths=(16, 32), freq_length=80,
                                    hidden=16)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 80))
    v = multi_window_disc_apply(params, mel, starts=(0, 8),
                                time_lengths=(16, 32))
    assert v.shape == (2, 1)
    assert np.isfinite(np.asarray(v)).all()
