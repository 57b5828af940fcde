"""BigVGAN vocoder GAN training (MPD + MRD, mse GAN + feature matching + mel L1).

Capability parity with the BigVGAN training recipe shipped in the reference's
vocoder module (vocoder/bigvgan/models.py:255-391: MultiPeriodDiscriminator,
MultiResolutionDiscriminator, feature_loss x2, mse generator_loss /
discriminator_loss) and the standard BigVGAN objective:

  L_G = L_mse(MPD) + L_mse(MRD) + FM(MPD) + FM(MRD) + 45 * |mel(y) - mel(y_hat)|
  L_D = mse_d(MPD) + mse_d(MRD)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from maa3_tpu.models.bigvgan import BigVGANConfig, bigvgan_apply, bigvgan_init
from maa3_tpu.models.discriminators import (feature_matching_loss, mpd_apply,
                                            mpd_init, mrd_apply, mrd_init)
from maa3_tpu.ops.stft import MelConfig, mel_spectrogram

Array = jax.Array


class VocoderGanState(NamedTuple):
    step: Array
    gen_params: dict
    mpd_params: dict
    mrd_params: dict
    gen_opt: optax.OptState
    disc_opt: optax.OptState


def create_vocoder_gan_state(key: Array, cfg: BigVGANConfig, gen_optimizer,
                             disc_optimizer) -> VocoderGanState:
    k1, k2, k3 = jax.random.split(key, 3)
    gen = bigvgan_init(k1, cfg)
    mpd = mpd_init(k2)
    mrd = mrd_init(k3)
    return VocoderGanState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen, mpd_params=mpd, mrd_params=mrd,
        gen_opt=gen_optimizer.init(gen),
        disc_opt=disc_optimizer.init({"mpd": mpd, "mrd": mrd}),
    )


def _mse_g(fakes):
    return sum(jnp.mean((1 - f) ** 2) for f in fakes)


def _mse_d(reals, fakes):
    loss = 0.0
    for dr, dg in zip(reals, fakes):
        loss += jnp.mean((1 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def make_vocoder_gan_steps(cfg: BigVGANConfig, mel_cfg: MelConfig,
                           gen_optimizer, disc_optimizer,
                           mel_weight: float = 45.0):
    """Returns (gen_step, disc_step): (state, batch) -> (state, metrics).
    batch: {"mel": (B, M, T) log-mel input, "wav": (B, T*hop) target}."""

    def gen_step(state: VocoderGanState, batch):
        def loss_fn(gen_params):
            y_hat = bigvgan_apply(gen_params, cfg, batch["mel"], pallas_aa=False)
            mel_hat = mel_spectrogram(y_hat, mel_cfg)
            mel_ref = mel_spectrogram(batch["wav"], mel_cfg)
            mel_l1 = jnp.mean(jnp.abs(mel_hat - mel_ref))

            mpd_r, mpd_fr = mpd_apply(state.mpd_params, batch["wav"])
            mpd_f, mpd_ff = mpd_apply(state.mpd_params, y_hat)
            mrd_r, mrd_fr = mrd_apply(state.mrd_params, batch["wav"])
            mrd_f, mrd_ff = mrd_apply(state.mrd_params, y_hat)

            g = _mse_g(mpd_f) + _mse_g(mrd_f)
            fm = (feature_matching_loss(mpd_fr, mpd_ff)
                  + feature_matching_loss(mrd_fr, mrd_ff))
            loss = g + fm + mel_weight * mel_l1
            return loss, {"gen_adv": g, "fm": fm, "mel_l1": mel_l1}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.gen_params)
        updates, gen_opt = gen_optimizer.update(grads, state.gen_opt,
                                                state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, updates)
        return state._replace(step=state.step + 1, gen_params=gen_params,
                              gen_opt=gen_opt), {"gen_loss": loss, **aux}

    def disc_step(state: VocoderGanState, batch):
        y_hat = jax.lax.stop_gradient(
            bigvgan_apply(state.gen_params, cfg, batch["mel"], pallas_aa=False))

        def loss_fn(disc):
            mpd_r, _ = mpd_apply(disc["mpd"], batch["wav"])
            mpd_f, _ = mpd_apply(disc["mpd"], y_hat)
            mrd_r, _ = mrd_apply(disc["mrd"], batch["wav"])
            mrd_f, _ = mrd_apply(disc["mrd"], y_hat)
            return _mse_d(mpd_r, mpd_f) + _mse_d(mrd_r, mrd_f)

        disc = {"mpd": state.mpd_params, "mrd": state.mrd_params}
        loss, grads = jax.value_and_grad(loss_fn)(disc)
        updates, disc_opt = disc_optimizer.update(grads, state.disc_opt, disc)
        disc = optax.apply_updates(disc, updates)
        return state._replace(mpd_params=disc["mpd"], mrd_params=disc["mrd"],
                              disc_opt=disc_opt), {"disc_loss": loss}

    return gen_step, disc_step
