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


def shift_time_grid(t_grid: Array, factor: float) -> Array:
    """Lumina time-shifted grid t/(t + s - s*t) (integrators.py:96-98):
    concentrates steps near t=0 (noise end) for s > 1."""
    return t_grid / (t_grid + factor - factor * t_grid)


def ode_sample(velocity_fn, x0: Array, context: Array, steps: int = 25,
               method: str = "euler",
               time_shifting_factor: float | None = None) -> Array:
    """Deterministic ODE integration t: 0 -> 1 (integrators.py ode)."""
    t_grid = jnp.linspace(0.0, 1.0, steps)
    if time_shifting_factor:
        t_grid = shift_time_grid(t_grid, time_shifting_factor)
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


# Dormand-Prince 5(4) tableau (the reference's default solver: torchdiffeq
# odeint(method="dopri5"), transport.py:357,404). Stage weights as fp32
# constants; the 4th-order embedded row provides the error estimate.
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40)


def dopri5_sample(velocity_fn, x0: Array, context: Array,
                  t0: float = 0.0, t1: float = 1.0,
                  rtol: float = 1e-4, atol: float = 1e-4,
                  max_steps: int = 1000) -> Tuple[Array, dict]:
    """Adaptive Dormand-Prince RK45 — capability parity with the reference's
    torchdiffeq dopri5 default, TPU-native: one `lax.while_loop` with static
    shapes (no host round-trips per step; torchdiffeq drives every stage from
    Python). Standard controller: accept when the scaled RMS error <= 1,
    dt *= clip(0.9 * err^(-1/5), 0.2, 5.0).

    Returns (x(t1), stats) with stats = {n_accepted, n_rejected, n_evals}.

    Integration is fp32, so the achievable tolerance floors at ~1e-6
    relative: below that the embedded error estimate is roundoff and every
    step rejects until the max_steps bound triggers (torchdiffeq under
    float32 hits the same wall by raising; here you get x at the last
    accepted t plus stats showing n_rejected saturated).
    """
    b = x0.shape[0]
    x0 = x0.astype(jnp.float32)

    def f(x, t):
        return velocity_fn(x, jnp.full((b,), t, jnp.float32),
                           context).astype(jnp.float32)

    def rk_step(x, t, dt):
        ks = []
        for i in range(7):
            xi = x
            for aij, kj in zip(_DP_A[i], ks):
                xi = xi + dt * aij * kj
            ks.append(f(xi, t + _DP_C[i] * dt))
        x5 = x
        x4 = x
        for b5, b4, k in zip(_DP_B5, _DP_B4, ks):
            x5 = x5 + dt * b5 * k
            x4 = x4 + dt * b4 * k
        return x5, x5 - x4

    def err_norm(x, x_new, err):
        scale = atol + rtol * jnp.maximum(jnp.abs(x), jnp.abs(x_new))
        return jnp.sqrt(jnp.mean(jnp.square(err / scale)))

    def cond(carry):
        x, t, dt, n_acc, n_rej, it = carry
        return (t < t1 - 1e-9) & (it < max_steps)

    def step(carry):
        x, t, dt, n_acc, n_rej, it = carry
        dt = jnp.minimum(dt, t1 - t)
        x_new, err = rk_step(x, t, dt)
        e = err_norm(x, x_new, err)
        accept = e <= 1.0
        fac = jnp.clip(0.9 * jnp.power(jnp.maximum(e, 1e-10), -0.2), 0.2, 5.0)
        dt_next = jnp.clip(dt * fac, 1e-6, t1 - t0)
        return (jnp.where(accept, x_new, x),
                jnp.where(accept, t + dt, t),
                dt_next,
                n_acc + accept.astype(jnp.int32),
                n_rej + (~accept).astype(jnp.int32),
                it + 1)

    init = (x0, jnp.float32(t0), jnp.float32((t1 - t0) / 25.0),
            jnp.int32(0), jnp.int32(0), jnp.int32(0))
    x, t, dt, n_acc, n_rej, it = jax.lax.while_loop(cond, step, init)
    return x, {"n_accepted": n_acc, "n_rejected": n_rej, "n_evals": it * 7}


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
