"""The jitted CFM training step (DDPM.training_step -> CFM.p_losses path).

Covers the reference hot loop (SURVEY §3.1): frozen VAE encode -> latent
rescale -> CFM interpolant -> DiT forward -> MSE -> AdamW, with gradients
reduced across the 'data' mesh axis by XLA (the NCCL all-reduce equivalent)
purely from sharding annotations.

Design: one `train_step(state, batch, key)` function closed over static
configs, jitted with NamedSharding in/out specs. EMA shadows live in the
state (LitEma equivalent).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from maa3_tpu.diffusion import cfm
from maa3_tpu.models.dit import DiTConfig, dit_apply
from maa3_tpu.models.vae1d import VAEConfig, vae_encode_moments, gaussian_sample
from maa3_tpu.train.optim import ema_update

Array = jax.Array


class TrainState(NamedTuple):
    step: Array
    params: dict            # trainable: DiT (+ cond stage later)
    opt_state: optax.OptState
    ema_params: Optional[dict]
    frozen: dict            # non-trainable: VAE encoder (+ text encoders)
    scale_factor: Array     # latent std rescale buffer (ddpm_audio.py:88-103)


def create_train_state(params: dict, frozen: dict, optimizer,
                       use_ema: bool = False, scale_factor: float = 1.0) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
        frozen=frozen,
        scale_factor=jnp.float32(scale_factor),
    )


def make_train_step(dit_cfg: DiTConfig, vae_cfg: VAEConfig, optimizer,
                    num_timesteps: int = 1000, ema_decay: float = 0.9999,
                    compute_dtype=jnp.bfloat16, conditioner=None,
                    apply_fn=None):
    """Returns train_step(state, batch, key) -> (state, metrics).

    batch: {"mel": (B, 80, T) log-mel} plus either a precomputed
    "context" (B, Ly, ctx_dim) or token arrays consumed by `conditioner`.

    conditioner(params, batch) -> context: runs the (trainable) cond stage
    INSIDE the loss so its gradients flow — the reference trains CLAP/T5
    jointly (cond_stage_trainable: true, configs/txt2audio-cfm-cfg.yaml:15).
    apply_fn overrides the backbone (e.g. moe_dit_apply for the video model).
    """
    backbone = apply_fn or (lambda p, x, t, c: dit_apply(
        p, dit_cfg, x, t, c, compute_dtype=compute_dtype, training=True))

    def loss_fn(params, frozen, scale_factor, batch, key):
        kvae, kcfm = jax.random.split(key)
        # cached-latent path: batches carrying precomputed VAE posterior
        # moments (scripts/encode_latents.py) skip the frozen encoder — the
        # posterior is still *sampled* per step, so training semantics are
        # unchanged (unlike caching sampled z)
        if "moments" in batch:
            moments = batch["moments"]
        else:
            moments = vae_encode_moments(frozen["vae"], vae_cfg, batch["mel"])
        z = gaussian_sample(moments, kvae)
        z = jax.lax.stop_gradient(z) * scale_factor

        context = (conditioner(params, batch) if conditioner is not None
                   else batch["context"])

        def velocity(x, t_int, c):
            return backbone(params["dit"], x, t_int, c)

        loss, aux = cfm.cfm_loss(velocity, z, context, kcfm,
                                 num_timesteps=num_timesteps)
        return loss, aux

    def train_step(state: TrainState, batch: dict, key: Array):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.frozen, state.scale_factor, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_params is not None:
            ema_params = ema_update(ema_params, params, ema_decay, state.step)
        metrics = {"loss": loss, **aux,
                   "grad_norm": optax.global_norm(grads)}
        return state._replace(step=state.step + 1, params=params,
                              opt_state=opt_state, ema_params=ema_params), metrics

    return train_step


def make_eval_step(dit_cfg: DiTConfig, vae_cfg: VAEConfig,
                   num_timesteps: int = 1000, compute_dtype=jnp.bfloat16,
                   conditioner=None, apply_fn=None):
    """Validation loss (the reference's val `loss_simple` logging,
    ddpm.py:360-367): same CFM objective, no gradient/update."""
    backbone = apply_fn or (lambda p, x, t, c: dit_apply(
        p, dit_cfg, x, t, c, compute_dtype=compute_dtype, training=True))

    def eval_step(state: TrainState, batch: dict, key: Array):
        kvae, kcfm = jax.random.split(key)
        if "moments" in batch:
            moments = batch["moments"]
        else:
            moments = vae_encode_moments(state.frozen["vae"], vae_cfg,
                                         batch["mel"])
        z = gaussian_sample(moments, kvae) * state.scale_factor
        context = (conditioner(state.params, batch) if conditioner is not None
                   else batch["context"])
        loss, _ = cfm.cfm_loss(
            lambda x, t, c: backbone(state.params["dit"], x, t, c),
            z, context, kcfm, num_timesteps=num_timesteps)
        return loss

    return eval_step
