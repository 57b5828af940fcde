"""Noisy-latent classifier + classifier guidance.

Capability parity with ldm/models/diffusion/classifier.py
(NoisyLatentImageClassifier, :28 — unused by the shipped configs): train a
classifier on q-sampled noisy latents with timestep conditioning, then steer
sampling with grad log p(y | x_t).

The trunk here is a compact t-conditioned conv net over (B, C, T) latents
(the reference reuses a UNet encoder trunk; any trunk satisfying
 logits = f(x_t, t) works for guidance).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from maa3_tpu.ops.basic import dense, dense_init, silu, timestep_embedding
from maa3_tpu.ops.conv import conv1d, conv1d_init
from maa3_tpu.diffusion.schedules import DDPMSchedule
from maa3_tpu.diffusion.ddim import q_sample

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class NoisyClfConfig:
    in_channels: int = 20
    hidden: int = 128
    num_blocks: int = 3
    num_classes: int = 10
    temb_dim: int = 128


def noisy_clf_init(key: Array, cfg: NoisyClfConfig) -> dict:
    ks = iter(jax.random.split(key, 4 + 3 * cfg.num_blocks))
    p: dict = {
        "temb1": dense_init(next(ks), cfg.temb_dim, cfg.hidden),
        "temb2": dense_init(next(ks), cfg.hidden, cfg.hidden),
        "conv_in": conv1d_init(next(ks), cfg.in_channels, cfg.hidden, 3),
        "blocks": [],
        "head": dense_init(next(ks), cfg.hidden, cfg.num_classes),
    }
    for _ in range(cfg.num_blocks):
        p["blocks"].append({
            "conv1": conv1d_init(next(ks), cfg.hidden, cfg.hidden, 3),
            "conv2": conv1d_init(next(ks), cfg.hidden, cfg.hidden, 3),
            "film": dense_init(next(ks), cfg.hidden, cfg.hidden),
        })
    return p


def noisy_clf_apply(params: dict, cfg: NoisyClfConfig, x_t: Array,
                    t: Array) -> Array:
    """(B, C, T) noisy latent + (B,) timestep -> (B, classes) logits."""
    temb = timestep_embedding(t, cfg.temb_dim)
    temb = dense(params["temb2"], silu(dense(params["temb1"], temb)))
    h = conv1d(params["conv_in"], x_t, padding=1)
    for bp in params["blocks"]:
        r = conv1d(bp["conv1"], silu(h), padding=1)
        r = r + dense(bp["film"], silu(temb))[:, :, None]
        r = conv1d(bp["conv2"], silu(r), padding=1)
        h = h + r
    pooled = jnp.mean(h, axis=-1)
    return dense(params["head"], pooled)


def noisy_clf_loss(params: dict, cfg: NoisyClfConfig, schedule: DDPMSchedule,
                   x_start: Array, labels: Array, key: Array):
    """Cross-entropy on q-sampled noisy latents (classifier.py training)."""
    b = x_start.shape[0]
    kt, kn = jax.random.split(key)
    t = jax.random.randint(kt, (b,), 0, len(schedule.betas))
    noise = jax.random.normal(kn, x_start.shape, x_start.dtype)
    x_t = q_sample(schedule, x_start, t, noise)
    logits = noisy_clf_apply(params, cfg, x_t, t)
    logp = jax.nn.log_softmax(logits)
    loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return loss, {"loss": loss, "acc": acc}


def classifier_grad(params: dict, cfg: NoisyClfConfig, x_t: Array, t: Array,
                    labels: Array) -> Array:
    """grad_x log p(y | x_t): the guidance direction added to eps/velocity."""

    def logp(x):
        logits = noisy_clf_apply(params, cfg, x, t)
        lp = jax.nn.log_softmax(logits)
        return jnp.sum(jnp.take_along_axis(lp, labels[:, None], axis=1))

    return jax.grad(logp)(x_t)


def guided_velocity(velocity_fn, params: dict, cfg: NoisyClfConfig,
                    labels: Array, guidance_scale: float = 1.0):
    """Wrap a CFM velocity with classifier guidance (pushes the flow toward
    latents the classifier assigns to `labels`)."""

    def vel(x, t_int, context):
        v = velocity_fn(x, t_int, context)
        g = classifier_grad(params, cfg, x, t_int, labels)
        return v + guidance_scale * g

    return vel
