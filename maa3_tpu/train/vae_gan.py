"""VAE GAN training (stage 1): two-optimizer hinge-GAN KL-autoencoder.

Capability parity with AutoencoderKL.training_step + LPAPSWithDiscriminator
(ldm/models/autoencoder1d.py:79-150, ldm/modules/losses_audio/
contperceptual.py:22-150):

  opt 0 (ae):  L = nll(|x - x_hat| / exp(logvar) + logvar)
               + kl_weight * KL(q)
               + d_weight * adopt_weight * (-mean D(x_hat))      [hinge G]
    with adaptive d_weight = ||grad_last nll|| / (||grad_last g|| + 1e-4)
  opt 1 (disc): hinge(D(x), D(x_hat.detach)) * adopt_weight (+ R1 penalty)

(The configs in use set perceptual_weight=0 — the class raises if >0 — so
LPAPS is intentionally inert; contperceptual.py:32-33.)

TPU-native: both phases are jitted pure functions over one combined state;
the adaptive weight takes two extra vjps w.r.t. the decoder's final conv.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from maa3_tpu.models.vae1d import (VAEConfig, decoder_apply, encoder_apply,
                                   gaussian_kl, gaussian_sample, vae_decode,
                                   vae_encode_moments)
from maa3_tpu.models.discriminators import (adopt_weight, hinge_d_loss,
                                            nlayer_disc_apply, nlayer_disc_init)

Array = jax.Array


class VAEGanState(NamedTuple):
    step: Array
    vae_params: dict
    disc_params: dict
    logvar: Array
    vae_opt: optax.OptState
    disc_opt: optax.OptState


def create_vae_gan_state(key: Array, vae_params: dict, vae_optimizer,
                         disc_optimizer, disc_ndf: int = 64,
                         disc_layers: int = 3) -> VAEGanState:
    disc_params = nlayer_disc_init(key, input_nc=1, ndf=disc_ndf,
                                   n_layers=disc_layers)
    logvar = jnp.zeros(())
    return VAEGanState(
        step=jnp.zeros((), jnp.int32),
        vae_params=vae_params,
        disc_params=disc_params,
        logvar=logvar,
        vae_opt=vae_optimizer.init({"vae": vae_params, "logvar": logvar}),
        disc_opt=disc_optimizer.init(disc_params),
    )


def ae_loss_terms(disc_params: dict, logvar: Array, mel: Array, rec: Array,
                  moments: Array):
    """Generator-pass loss pieces of LPAPSWithDiscriminator optimizer_idx==0
    (contperceptual.py:75-104): per-sample-summed L1 NLL with learned logvar,
    KL of the posterior, hinge-G loss through the patchGAN.
    Returns (nll_loss, kl, g_loss, mean_rec_l1)."""
    rec_l1 = jnp.abs(mel - rec)
    nll = rec_l1 / jnp.exp(logvar) + logvar
    nll_loss = jnp.sum(nll) / mel.shape[0]
    kl = jnp.sum(gaussian_kl(moments)) / mel.shape[0]
    logits_fake = nlayer_disc_apply(disc_params, rec[:, None])
    g_loss = -jnp.mean(logits_fake)
    return nll_loss, kl, g_loss, jnp.mean(rec_l1)


def adaptive_d_weight(nll_of_w, g_of_w, w_last: Array,
                      disc_weight: float) -> Array:
    """calculate_adaptive_weight (contperceptual.py:61-72): ratio of grad
    norms of the NLL and G losses w.r.t. the decoder's last-layer weight."""
    nll_g = jax.grad(nll_of_w)(w_last)
    g_g = jax.grad(g_of_w)(w_last)
    d_weight = jnp.clip(
        jnp.linalg.norm(nll_g.ravel()) / (jnp.linalg.norm(g_g.ravel()) + 1e-4),
        0.0, 1e4) * disc_weight
    return jax.lax.stop_gradient(d_weight)


def disc_loss_terms(disc_params: dict, mel: Array, rec: Array, factor,
                    r1_weight: float = 0.0):
    """Discriminator-pass loss of optimizer_idx==1 (contperceptual.py:125-
    150): adopt-weighted hinge loss + optional R1 gradient penalty on the
    real inputs. Returns (d_loss, mean_logits_real, mean_logits_fake)."""
    logits_real = nlayer_disc_apply(disc_params, mel[:, None])
    logits_fake = nlayer_disc_apply(disc_params, rec[:, None])
    d = factor * hinge_d_loss(logits_real, logits_fake)
    if r1_weight > 0:
        def real_sum(m):
            return jnp.sum(nlayer_disc_apply(disc_params, m[:, None]))
        r1 = jnp.mean(jnp.square(jax.grad(real_sum)(mel)))
        d = d + r1_weight * r1
    return d, jnp.mean(logits_real), jnp.mean(logits_fake)


def make_vae_gan_steps(cfg: VAEConfig, vae_optimizer, disc_optimizer,
                       kl_weight: float = 1e-6, disc_weight: float = 0.5,
                       disc_factor: float = 1.0, disc_start: int = 50001,
                       r1_weight: float = 0.0):
    """Returns (ae_step, disc_step): each (state, mel_batch, key) -> (state, metrics)."""

    def reconstruct(vae_params, mel, key):
        moments = vae_encode_moments(vae_params, cfg, mel)
        z = gaussian_sample(moments, key)
        rec = vae_decode(vae_params, cfg, z)
        return rec, moments

    def ae_step(state: VAEGanState, mel: Array, key: Array):
        def losses(trainable):
            vae_params, logvar = trainable["vae"], trainable["logvar"]
            rec, moments = reconstruct(vae_params, mel, key)
            return ae_loss_terms(state.disc_params, logvar, mel, rec, moments)

        trainable = {"vae": state.vae_params, "logvar": state.logvar}

        # adaptive d_weight via grads of nll/g w.r.t. the decoder's conv_out
        def nll_of_last(w):
            t = {"vae": _set_last(trainable["vae"], w), "logvar": trainable["logvar"]}
            return losses(t)[0]

        def g_of_last(w):
            t = {"vae": _set_last(trainable["vae"], w), "logvar": trainable["logvar"]}
            return losses(t)[2]

        w_last = trainable["vae"]["decoder"]["conv_out"]["w"]
        d_weight = adaptive_d_weight(nll_of_last, g_of_last, w_last,
                                     disc_weight)
        factor = adopt_weight(disc_factor, state.step, disc_start)

        def total_loss(t):
            nll_loss, kl, g_loss, rec = losses(t)
            return (nll_loss + kl_weight * kl + d_weight * factor * g_loss,
                    {"nll_loss": nll_loss, "kl_loss": kl, "g_loss": g_loss,
                     "rec_loss": rec, "d_weight": d_weight})

        (loss, aux), grads = jax.value_and_grad(total_loss, has_aux=True)(trainable)
        updates, vae_opt = vae_optimizer.update(grads, state.vae_opt, trainable)
        new_t = optax.apply_updates(trainable, updates)
        metrics = {"aeloss": loss, **aux}
        return state._replace(step=state.step + 1, vae_params=new_t["vae"],
                              logvar=new_t["logvar"], vae_opt=vae_opt), metrics

    def disc_step(state: VAEGanState, mel: Array, key: Array):
        rec, _ = reconstruct(state.vae_params, mel, key)
        rec = jax.lax.stop_gradient(rec)
        factor = adopt_weight(disc_factor, state.step, disc_start)

        def loss_fn(disc_params):
            d, lr_mean, lf_mean = disc_loss_terms(disc_params, mel, rec,
                                                  factor, r1_weight)
            return d, {"logits_real": lr_mean, "logits_fake": lf_mean}

        (d_loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.disc_params)
        updates, disc_opt = disc_optimizer.update(grads, state.disc_opt,
                                                  state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, updates)
        return state._replace(disc_params=disc_params, disc_opt=disc_opt), {
            "discloss": d_loss, **aux}

    return ae_step, disc_step


def _set_last(vae_params: dict, w: Array) -> dict:
    out = jax.tree.map(lambda x: x, vae_params)  # shallow copy
    out["decoder"] = dict(out["decoder"])
    out["decoder"]["conv_out"] = dict(out["decoder"]["conv_out"])
    out["decoder"]["conv_out"]["w"] = w
    return out


def make_vae_optimizers(lr: float = 4.5e-6, lr_multiplier: float = 16.0):
    """Adam betas (0.5, 0.9) for both (autoencoder1d.py:141-150)."""
    tx = optax.adam(lr * lr_multiplier, b1=0.5, b2=0.9)
    return tx, optax.adam(lr * lr_multiplier, b1=0.5, b2=0.9)
