"""GAN training tests: discriminators, losses, two-optimizer VAE-GAN steps."""

import numpy as np
import jax
import jax.numpy as jnp

from maa3_tpu.models.discriminators import (
    nlayer_disc_init, nlayer_disc_apply, hinge_d_loss, vanilla_d_loss,
    mse_d_loss, mse_g_loss, feature_matching_loss, adopt_weight,
    mpd_init, mpd_apply, mrd_init, mrd_apply)
from maa3_tpu.models.vae1d import VAEConfig, vae_init
from maa3_tpu.train.vae_gan import (create_vae_gan_state, make_vae_gan_steps,
                                    make_vae_optimizers)

VAE_CFG = VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2),
                    num_res_blocks=1, down_layers=(0,), kernel_size=5,
                    z_channels=4, embed_dim=4)


def test_nlayer_disc_patch_output():
    params = nlayer_disc_init(jax.random.PRNGKey(0), input_nc=1, ndf=16,
                              n_layers=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 80, 64))
    out = nlayer_disc_apply(params, x)
    assert out.shape[0] == 2 and out.shape[1] == 1
    # 3 stride-2 layers: 80 -> 40 -> 20 -> 10, then two stride-1 k4 p1: -1 each
    assert out.shape[2] == 8 and np.isfinite(np.asarray(out)).all()


def test_gan_losses():
    real = jnp.ones((2, 4)) * 2.0
    fake = -jnp.ones((2, 4)) * 2.0
    assert float(hinge_d_loss(real, fake)) == 0.0  # perfectly separated
    assert float(hinge_d_loss(fake, real)) > 2.0
    assert float(vanilla_d_loss(real, fake)) < float(vanilla_d_loss(fake, real))
    assert float(mse_d_loss([jnp.ones(4)], [jnp.zeros(4)])) == 0.0
    assert float(mse_g_loss([jnp.ones(4)])) == 0.0
    fm = feature_matching_loss([[jnp.ones(4)]], [[jnp.zeros(4)]])
    np.testing.assert_allclose(float(fm), 2.0)
    assert float(adopt_weight(1.0, 5, threshold=10)) == 0.0
    assert float(adopt_weight(1.0, 15, threshold=10)) == 1.0


def test_mpd_mrd_shapes():
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 4000)) * 0.1
    mpd = mpd_init(jax.random.PRNGKey(1), periods=(2, 3), d_mult=1)
    logits, fmaps = mpd_apply(mpd, wav)
    assert len(logits) == 2 and len(fmaps[0]) == 6
    mrd = mrd_init(jax.random.PRNGKey(2), resolutions=((512, 50, 240),))
    logits_r, fmaps_r = mrd_apply(mrd, wav)
    assert len(logits_r) == 1 and len(fmaps_r[0]) == 6
    assert np.isfinite(np.asarray(logits_r[0])).all()


def test_vae_gan_two_optimizer_training():
    key = jax.random.PRNGKey(0)
    vae_params = vae_init(key, VAE_CFG)
    vae_tx, disc_tx = make_vae_optimizers(lr=1e-4, lr_multiplier=1.0)
    # 8-band test mels: 1 stride-2 layer (3 would collapse H to zero patches)
    state = create_vae_gan_state(key, vae_params, vae_tx, disc_tx, disc_ndf=16,
                                 disc_layers=1)
    ae_step, disc_step = make_vae_gan_steps(VAE_CFG, vae_tx, disc_tx,
                                            disc_start=0, r1_weight=0.1)
    ae_step = jax.jit(ae_step)
    disc_step = jax.jit(disc_step)

    mel = jax.random.normal(key, (2, 8, 32))
    m0 = None
    k = jax.random.PRNGKey(7)  # fixed posterior noise -> deterministic rec
    for i in range(12):
        state, m_ae = ae_step(state, mel, k)
        state, m_d = disc_step(state, mel, k)
        if m0 is None:
            m0 = m_ae
    assert np.isfinite(float(m_ae["aeloss"]))
    assert np.isfinite(float(m_d["discloss"]))
    assert float(m_ae["rec_loss"]) < float(m0["rec_loss"])  # rec improves
    assert float(m_ae["d_weight"]) >= 0
