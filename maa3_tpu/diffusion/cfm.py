"""Conditional flow matching: OT-path loss + fused Euler ODE sampling.

Parity target: CFM (ldm/models/diffusion/cfm1_audio.py:30-161):
- sigma_min = 1e-4
- loss: x_t = t*x1 + (1 - (1 - s)*t)*x0, target u_t = x1 - (1 - s)*x0,
  t ~ U{0..999}/1000, MSE (cfm1_audio.py:37-58)
- sampling: Euler over t_span = linspace(0, 1, steps) (25 default), model
  timestep = floor(t * 1000) (Wrapper, cfm1_audio.py:134-142)
- CFG: dual-batch [uc; c], e = e_uc + scale * (e_c - e_uc)
  (Wrapper_cfg, cfm1_audio.py:145-161)

TPU-native design: the reference drives 25 separate NeuralODE steps from
Python (25 kernel launches + host sync each). Here the whole trajectory is ONE
jitted `lax.scan` — the dual-batch CFG forward is fused inside the step, the
conditioning is a loop-invariant carried constant (uploaded once), and XLA
overlaps weight streaming across steps. This is the single biggest latency
lever on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array

SIGMA_MIN = 1e-4

# velocity_fn signature: (x, t_int, context) -> velocity, all batched.
VelocityFn = Callable[[Array, Array, Array], Array]


def cfm_interpolate(x1: Array, x0: Array, t01: Array,
                    sigma_min: float = SIGMA_MIN):
    """Returns (x_t, u_t) for t01 in [0, 1] broadcast over batch."""
    t = t01.reshape((-1,) + (1,) * (x1.ndim - 1)).astype(x1.dtype)
    xt = t * x1 + (1.0 - (1.0 - sigma_min) * t) * x0
    ut = x1 - (1.0 - sigma_min) * x0
    return xt, ut


def cfm_loss(velocity_fn: VelocityFn, x1: Array, context: Array, key: Array,
             num_timesteps: int = 1000, sigma_min: float = SIGMA_MIN):
    """CFM training loss. Returns (loss, aux dict).

    Parity: CFM.p_losses (cfm1_audio.py:37-58) — integer t in [0, 1000),
    model sees the integer step, the interpolant sees t/1000.
    """
    b = x1.shape[0]
    kt, kn = jax.random.split(key)
    t_int = jax.random.randint(kt, (b,), 0, num_timesteps)
    x0 = jax.random.normal(kn, x1.shape, x1.dtype)
    xt, ut = cfm_interpolate(x1, x0, t_int.astype(jnp.float32) / num_timesteps,
                             sigma_min)
    pred = velocity_fn(xt, t_int, context)
    per_sample = jnp.mean(jnp.square(pred - ut), axis=tuple(range(1, x1.ndim)))
    loss = jnp.mean(per_sample)
    return loss, {"loss_simple": loss}


def euler_t_grid(steps: int, t_start: Optional[int] = None) -> Array:
    """t_span = linspace(0, 1, steps)[t_start:] (cfm1_audio.py:75-77)."""
    grid = jnp.linspace(0.0, 1.0, steps)
    if t_start is not None:
        grid = grid[t_start:]
    return grid


def sample(velocity_fn: VelocityFn, x0: Array, context: Array,
           steps: int = 25, t_start: Optional[int] = None,
           num_timesteps: int = 1000) -> Array:
    """Unconditional-/conditional-only Euler ODE integration (CFM.sample)."""
    t_grid = euler_t_grid(steps, t_start)
    b = x0.shape[0]

    def step(x, t_pair):
        t, t_next = t_pair
        t_int = jnp.full((b,), jnp.floor(t * num_timesteps), jnp.int32)
        v = velocity_fn(x, t_int, context)
        return x + (t_next - t) * v, None

    pairs = (t_grid[:-1], t_grid[1:])
    x, _ = jax.lax.scan(step, x0, pairs)
    return x


def sample_cfg_planned(step_velocity_fn, x0: Array, per_step_xs,
                       guidance_scale: float, steps: int = 25,
                       t_start: Optional[int] = None) -> Array:
    """CFG Euler ODE where per-step, latent-independent tensors are
    precomputed (see models/dit.py::dit_sample_plan) and fed as scan inputs.

    step_velocity_fn(x_in, xs_slice) -> dual-batch velocity; per_step_xs is a
    pytree with leading axis == steps - 1 (one slice per Euler step).
    Numerics identical to sample_cfg — the per-step work is hoisted, not
    changed.
    """
    t_grid = euler_t_grid(steps, t_start)

    def step(x, inp):
        t_pair, xs = inp
        t, t_next = t_pair
        x_in = jnp.concatenate([x, x], axis=0)
        e = step_velocity_fn(x_in, xs)
        e_uc, e_c = jnp.split(e, 2, axis=0)
        v = e_uc + guidance_scale * (e_c - e_uc)
        return x + (t_next - t) * v, None

    x, _ = jax.lax.scan(step, x0, ((t_grid[:-1], t_grid[1:]), per_step_xs))
    return x


def planned_t_ints(steps: int, t_start: Optional[int] = None,
                   num_timesteps: int = 1000) -> Array:
    """Integer model timesteps for each Euler step of sample_cfg's grid."""
    t_grid = euler_t_grid(steps, t_start)
    return jnp.floor(t_grid[:-1] * num_timesteps).astype(jnp.int32)


def sample_cfg_inpaint(velocity_fn: VelocityFn, x0: Array, context: Array,
                       uncond_context: Array, guidance_scale: float,
                       known: Array, keep_mask: Array, steps: int = 25,
                       num_timesteps: int = 1000,
                       sigma_min: float = SIGMA_MIN) -> Array:
    """Mask-guided CFM inpainting (CFM_inpaint capability,
    cfm1_audio.py:164-312 / scripts/video2audio_flow_inpaint.py).

    The reference's hybrid conditioning plumbing is broken as shipped (a
    (video, spec) tuple is fed to a DiT that accepts only a tensor context);
    this is the mathematically sound latent-space equivalent: after every
    Euler step, positions with keep_mask=1 are overwritten with the analytic
    OT path x_t = t*known + (1-(1-s)t)*x0 toward the known latent, so only
    keep_mask=0 regions are synthesized.

    known: (B, C, T) target latent; keep_mask: broadcastable to x, 1 = keep.
    """
    t_grid = euler_t_grid(steps)
    b = x0.shape[0]
    ctx_in = jnp.concatenate([uncond_context, context], axis=0)
    keep = keep_mask.astype(x0.dtype)

    def step(x, t_pair):
        t, t_next = t_pair
        x_in = jnp.concatenate([x, x], axis=0)
        t_int = jnp.full((2 * b,), jnp.floor(t * num_timesteps), jnp.int32)
        e = velocity_fn(x_in, t_int, ctx_in)
        e_uc, e_c = jnp.split(e, 2, axis=0)
        v = e_uc + guidance_scale * (e_c - e_uc)
        x = x + (t_next - t) * v
        known_t = t_next * known + (1.0 - (1.0 - sigma_min) * t_next) * x0
        return keep * known_t + (1.0 - keep) * x, None

    x, _ = jax.lax.scan(step, x0, (t_grid[:-1], t_grid[1:]))
    return x


def sample_cfg(velocity_fn: VelocityFn, x0: Array, context: Array,
               uncond_context: Array, guidance_scale: float,
               steps: int = 25, t_start: Optional[int] = None,
               num_timesteps: int = 1000) -> Array:
    """Classifier-free-guided Euler ODE integration in one `lax.scan`.

    Dual-batch ordering matches Wrapper_cfg (cfm1_audio.py:154-161):
    context rows are [uncond; cond] so chunk 0 is e_uncond.
    """
    t_grid = euler_t_grid(steps, t_start)
    b = x0.shape[0]
    ctx_in = jnp.concatenate([uncond_context, context], axis=0)

    def step(x, t_pair):
        t, t_next = t_pair
        x_in = jnp.concatenate([x, x], axis=0)
        t_int = jnp.full((2 * b,), jnp.floor(t * num_timesteps), jnp.int32)
        e = velocity_fn(x_in, t_int, ctx_in)
        e_uc, e_c = jnp.split(e, 2, axis=0)
        v = e_uc + guidance_scale * (e_c - e_uc)
        return x + (t_next - t) * v, None

    pairs = (t_grid[:-1], t_grid[1:])
    x, _ = jax.lax.scan(step, x0, pairs)
    return x
