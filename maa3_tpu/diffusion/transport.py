"""SiT-style transport library: interpolant paths + ODE/SDE samplers.

Capability parity with ldm/models/diffusion/transport/ (transport.py:43,
path.py:18-186, integrators.py:8-112) — the standalone Lumina flow/diffusion
framework (Linear / GVP / VP interpolants; velocity, score or noise model
parameterizations; Euler & Heun ODE; Euler-Maruyama SDE), shipped by the
reference but not wired to configs. Re-designed functionally: every sampler
is a single `lax.scan`.

Interpolants x_t = alpha(t) x1 + sigma(t) x0 (x0 ~ N(0, I), t: 0 -> 1 noise
-> data in our convention, matching the CFM elsewhere in this repo):
  linear: alpha = t,              sigma = 1 - t
  gvp:    alpha = sin(pi t / 2),  sigma = cos(pi t / 2)
  vp:     alpha/sigma from the VP log-SNR schedule
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Path:
    name: str

    def alpha_sigma(self, t: Array) -> Tuple[Array, Array, Array, Array]:
        """Returns (alpha, d_alpha, sigma, d_sigma) at t."""
        if self.name == "linear":
            return t, jnp.ones_like(t), 1.0 - t, -jnp.ones_like(t)
        if self.name == "gvp":
            a = jnp.sin(math.pi / 2 * t)
            da = math.pi / 2 * jnp.cos(math.pi / 2 * t)
            s = jnp.cos(math.pi / 2 * t)
            ds = -math.pi / 2 * jnp.sin(math.pi / 2 * t)
            return a, da, s, ds
        if self.name == "vp":
            # beta(u) = beta_min + u*(beta_max-beta_min), u = 1 - t
            bmin, bmax = 0.1, 20.0
            u = 1.0 - t
            log_a = -0.25 * u ** 2 * (bmax - bmin) - 0.5 * u * bmin
            a = jnp.exp(log_a)
            beta_u = bmin + u * (bmax - bmin)
            da = 0.5 * beta_u * a
            s = jnp.sqrt(jnp.maximum(1.0 - a ** 2, 1e-12))
            ds = -a * da / s
            return a, da, s, ds
        raise ValueError(self.name)

    def interpolate(self, x1: Array, x0: Array, t: Array):
        a, da, s, ds = self.alpha_sigma(t)
        bshape = (-1,) + (1,) * (x1.ndim - 1)
        a, da, s, ds = (v.reshape(bshape) for v in (a, da, s, ds))
        xt = a * x1 + s * x0
        vt = da * x1 + ds * x0  # target velocity dx_t/dt
        return xt, vt


def training_losses(model_fn, path: Path, x1: Array, context: Array,
                    key: Array, model_type: str = "velocity") -> Array:
    """Transport.training_losses (transport.py:43-...): MSE on the chosen
    parameterization. t ~ U(0,1)."""
    kt, kn = jax.random.split(key)
    b = x1.shape[0]
    t = jax.random.uniform(kt, (b,), minval=1e-5, maxval=1.0 - 1e-5)
    x0 = jax.random.normal(kn, x1.shape, x1.dtype)
    xt, vt = path.interpolate(x1, x0, t)
    pred = model_fn(xt, t, context)
    if model_type == "velocity":
        target = vt
    elif model_type == "noise":
        target = x0
    elif model_type == "score":
        _, _, s, _ = path.alpha_sigma(t)
        target = -x0 / jnp.maximum(s.reshape((-1,) + (1,) * (x1.ndim - 1)), 1e-5)
    else:
        raise ValueError(model_type)
    return jnp.mean(jnp.square(pred - target))


def velocity_from(model_fn, path: Path, model_type: str):
    """Convert score/noise parameterizations to a velocity field."""
    if model_type == "velocity":
        return model_fn

    def vel(x, t, c):
        a, da, s, ds = path.alpha_sigma(t)
        bshape = (-1,) + (1,) * (x.ndim - 1)
        a, da, s, ds = (v.reshape(bshape) for v in (a, da, s, ds))
        pred = model_fn(x, t, c)
        if model_type == "noise":
            x0 = pred
        else:  # score: x0 = -score * sigma
            x0 = -pred * s
        x1 = (x - s * x0) / jnp.maximum(a, 1e-5)
        return da * x1 + ds * x0

    return vel


def ode_sample(velocity_fn, x0: Array, context: Array, steps: int = 25,
               method: str = "euler") -> Array:
    """Deterministic ODE integration t: 0 -> 1 (integrators.py ode)."""
    t_grid = jnp.linspace(0.0, 1.0, steps)
    b = x0.shape[0]

    def euler_step(x, t_pair):
        t, t_next = t_pair
        v = velocity_fn(x, jnp.full((b,), t), context)
        return x + (t_next - t) * v, None

    def heun_step(x, t_pair):
        t, t_next = t_pair
        dt = t_next - t
        v1 = velocity_fn(x, jnp.full((b,), t), context)
        x_pred = x + dt * v1
        v2 = velocity_fn(x_pred, jnp.full((b,), t_next), context)
        return x + dt * 0.5 * (v1 + v2), None

    step = euler_step if method == "euler" else heun_step
    x, _ = jax.lax.scan(step, x0, (t_grid[:-1], t_grid[1:]))
    return x


def sde_sample(velocity_fn, score_fn, x0: Array, context: Array, key: Array,
               steps: int = 25, diffusion: float = 1.0) -> Array:
    """Euler-Maruyama SDE: dx = [v + 0.5 w(t) score] dt + sqrt(w(t)) dW
    (integrators.py sde). Last step is deterministic (mean step)."""
    t_grid = jnp.linspace(1e-3, 1.0, steps)
    b = x0.shape[0]
    keys = jax.random.split(key, steps - 1)

    def step(x, inp):
        t, t_next, nkey = inp
        dt = t_next - t
        tb = jnp.full((b,), t)
        w = diffusion * (1.0 - t)  # anneal noise to zero at t=1
        drift = velocity_fn(x, tb, context) + 0.5 * w * score_fn(x, tb, context)
        noise = jax.random.normal(nkey, x.shape, x.dtype)
        x = x + drift * dt + jnp.sqrt(jnp.maximum(w * dt, 0.0)) * noise
        return x, None

    x, _ = jax.lax.scan(step, x0, (t_grid[:-1], t_grid[1:], keys))
    return x
