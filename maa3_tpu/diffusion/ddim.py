"""Legacy DDIM / PLMS samplers with CFG (older checkpoints).

Parity targets: DDIMSampler (ldm/models/diffusion/ddim.py:12-234) and
PLMSSampler (plms.py:11-236): eps-prediction models over the DDPM schedule,
uniform timestep subset, eta-sigmas, dual-batch CFG.

TPU-native: the whole reverse trajectory is one `lax.scan` over the selected
timesteps; per-step coefficients are gathered from precomputed tables.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from maa3_tpu.diffusion.schedules import (DDPMSchedule, make_ddim_timesteps,
                                          make_ddim_sampling_parameters)

Array = jax.Array
EpsFn = Callable[[Array, Array, Array], Array]  # (x, t_int, context) -> eps


def _cfg_eps(eps_fn: EpsFn, x: Array, t_int: Array, cond: Array,
             uncond: Optional[Array], scale: float) -> Array:
    if uncond is None or scale == 1.0:
        return eps_fn(x, t_int, cond)
    x_in = jnp.concatenate([x, x], axis=0)
    t_in = jnp.concatenate([t_int, t_int], axis=0)
    c_in = jnp.concatenate([uncond, cond], axis=0)
    e_uc, e_c = jnp.split(eps_fn(x_in, t_in, c_in), 2, axis=0)
    return e_uc + scale * (e_c - e_uc)


def ddim_sample(eps_fn: EpsFn, x0_noise: Array, cond: Array,
                schedule: DDPMSchedule, steps: int = 50, eta: float = 0.0,
                uncond: Optional[Array] = None, guidance_scale: float = 1.0,
                key: Optional[Array] = None) -> Array:
    """DDIM reverse process (ddim.py:120-201), x starts from pure noise."""
    n_ddpm = len(schedule.betas)
    ts = make_ddim_timesteps(steps, n_ddpm)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        schedule.alphas_cumprod, ts, eta)

    ts_r = jnp.asarray(ts[::-1].copy())
    alphas_r = jnp.asarray(alphas[::-1].copy(), jnp.float32)
    alphas_prev_r = jnp.asarray(alphas_prev[::-1].copy(), jnp.float32)
    sigmas_r = jnp.asarray(sigmas[::-1].copy(), jnp.float32)

    b = x0_noise.shape[0]
    key = key if key is not None else jax.random.PRNGKey(0)
    noise_keys = jax.random.split(key, len(ts))

    def step(x, inp):
        t, a_t, a_prev, sigma, nkey = inp
        t_int = jnp.full((b,), t, jnp.int32)
        e_t = _cfg_eps(eps_fn, x, t_int, cond, uncond, guidance_scale)
        pred_x0 = (x - jnp.sqrt(1.0 - a_t) * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(1.0 - a_prev - sigma ** 2) * e_t
        noise = sigma * jax.random.normal(nkey, x.shape, x.dtype)
        return jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise, None

    x, _ = jax.lax.scan(step, x0_noise,
                        (ts_r, alphas_r, alphas_prev_r, sigmas_r, noise_keys))
    return x


def plms_sample(eps_fn: EpsFn, x0_noise: Array, cond: Array,
                schedule: DDPMSchedule, steps: int = 50,
                uncond: Optional[Array] = None,
                guidance_scale: float = 1.0) -> Array:
    """PLMS (pseudo linear multistep, plms.py:171-236): Adams-Bashforth over
    eps with the first steps bootstrapped Runge-Kutta-style."""
    n_ddpm = len(schedule.betas)
    ts = make_ddim_timesteps(steps, n_ddpm)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        schedule.alphas_cumprod, ts, 0.0)
    ts_r = ts[::-1].copy()
    alphas_r = alphas[::-1].copy()
    alphas_prev_r = alphas_prev[::-1].copy()
    ts_next_r = np.append(ts_r[1:], 0)

    b = x0_noise.shape[0]

    def x_prev_from_eps(x, e_t, a_t, a_prev):
        pred_x0 = (x - jnp.sqrt(1.0 - a_t) * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(1.0 - a_prev) * e_t
        return jnp.sqrt(a_prev) * pred_x0 + dir_xt

    def eps_at(x, t, ):
        t_int = jnp.full((b,), t, jnp.int32)
        return _cfg_eps(eps_fn, x, t_int, cond, uncond, guidance_scale)

    # carry: (x, eps history buffer (4, ...), count)
    def step(carry, inp):
        x, hist, count = carry
        t, t_next, a_t, a_prev = inp
        e_t = eps_at(x, t)

        def order1(_):
            # 2nd-order bootstrap: eps avg with eps at x_prev (plms.py:214-216)
            x_prev = x_prev_from_eps(x, e_t, a_t, a_prev)
            e_t_next = _cfg_eps(eps_fn, x_prev,
                                jnp.full((b,), t_next, jnp.int32), cond,
                                uncond, guidance_scale)
            return (e_t + e_t_next) / 2

        def order2(_):
            return (3 * e_t - hist[0]) / 2

        def order3(_):
            return (23 * e_t - 16 * hist[0] + 5 * hist[1]) / 12

        def order4(_):
            return (55 * e_t - 59 * hist[0] + 37 * hist[1] - 9 * hist[2]) / 24

        e_prime = jax.lax.switch(jnp.minimum(count, 3),
                                 [order1, order2, order3, order4], None)
        x_new = x_prev_from_eps(x, e_prime, a_t, a_prev)
        hist = jnp.roll(hist, 1, axis=0).at[0].set(e_t)
        return (x_new, hist, count + 1), None

    hist0 = jnp.zeros((4,) + x0_noise.shape, x0_noise.dtype)
    (x, _, _), _ = jax.lax.scan(
        step, (x0_noise, hist0, jnp.int32(0)),
        (jnp.asarray(ts_r), jnp.asarray(ts_next_r),
         jnp.asarray(alphas_r, jnp.float32),
         jnp.asarray(alphas_prev_r, jnp.float32)))
    return x


def q_sample(schedule: DDPMSchedule, x_start: Array, t: Array,
             noise: Array) -> Array:
    """Forward diffusion q(x_t | x_0) (ddpm.py DDPM.q_sample)."""
    sa = jnp.asarray(schedule.sqrt_alphas_cumprod, jnp.float32)[t]
    so = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod, jnp.float32)[t]
    shape = (-1,) + (1,) * (x_start.ndim - 1)
    return sa.reshape(shape) * x_start + so.reshape(shape) * noise
