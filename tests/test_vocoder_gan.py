"""Vocoder GAN training smoke: one gen + one disc step on tiny config."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from maa3_tpu.models.bigvgan import BigVGANConfig
from maa3_tpu.ops.stft import MelConfig
from maa3_tpu.train.vocoder_gan import (create_vocoder_gan_state,
                                        make_vocoder_gan_steps)


def test_vocoder_gan_steps():
    cfg = BigVGANConfig(num_mels=8, upsample_rates=(4, 2),
                        upsample_kernel_sizes=(8, 4),
                        upsample_initial_channel=16,
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 3, 5),))
    mel_cfg = MelConfig(sample_rate=1600, n_fft=64, win_size=64, hop_size=8,
                        num_mels=8, fmin=0, fmax=800)
    tx_g = optax.adam(1e-4)
    tx_d = optax.adam(1e-4)
    state = create_vocoder_gan_state(jax.random.PRNGKey(0), cfg, tx_g, tx_d)
    gen_step, disc_step = make_vocoder_gan_steps(cfg, mel_cfg, tx_g, tx_d)
    gen_step = jax.jit(gen_step)
    disc_step = jax.jit(disc_step)

    key = jax.random.PRNGKey(1)
    batch = {
        "mel": jax.random.normal(key, (2, 8, 40)),
        "wav": jnp.clip(jax.random.normal(key, (2, 40 * 8)) * 0.1, -1, 1),
    }
    state, mg = gen_step(state, batch)
    state, md = disc_step(state, batch)
    assert np.isfinite(float(mg["gen_loss"]))
    assert np.isfinite(float(mg["mel_l1"]))
    assert np.isfinite(float(md["disc_loss"]))
    assert int(state.step) == 1
