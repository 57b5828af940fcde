"""DDPM eps/x0-prediction training losses + FiLM-conditioned variant hook.

Capability parity with DDPM.p_losses (ldm/models/diffusion/ddpm.py:295-322)
and the AudioLDM FiLM variant (ldm/models/diffusion/audioldm.py:20):
- parameterization "eps" (default) or "x0"
- l1 / l2 losses, l_simple + l_vlb weighting (elbo weights from the
  posterior variances), learned-logvar hook omitted (reference keeps it
  constant)
- conditioning routing equivalent to DiffusionWrapper (ddpm.py:1399-1437):
  'crossattn' passes context; 'film' pools it into a (B, D) vector added to
  the timestep embedding by the backbone; 'concat' stacks channels.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from maa3_tpu.diffusion.schedules import DDPMSchedule
from maa3_tpu.diffusion.ddim import q_sample

Array = jax.Array


def vlb_weights(schedule: DDPMSchedule) -> np.ndarray:
    """lvlb_weights (ddpm.py:160-170) for the eps parameterization."""
    betas = schedule.betas
    ac = schedule.alphas_cumprod
    with np.errstate(divide="ignore"):
        w = betas ** 2 / (2 * schedule.posterior_variance
                          * (1 - betas) * (1 - ac))
    w[0] = w[1]  # the t=0 term is infinite; reference overwrites it
    return w


def ddpm_loss(model_fn: Callable[[Array, Array, Optional[Array]], Array],
              schedule: DDPMSchedule, x_start: Array, key: Array,
              context: Optional[Array] = None,
              parameterization: str = "eps", loss_type: str = "l2",
              l_simple_weight: float = 1.0,
              original_elbo_weight: float = 0.0):
    """Sample t ~ U{0..T-1}, diffuse, regress eps (or x0). Returns
    (loss, dict)."""
    b = x_start.shape[0]
    kt, kn = jax.random.split(key)
    t = jax.random.randint(kt, (b,), 0, len(schedule.betas))
    noise = jax.random.normal(kn, x_start.shape, x_start.dtype)
    x_noisy = q_sample(schedule, x_start, t, noise)
    pred = model_fn(x_noisy, t, context)
    target = noise if parameterization == "eps" else x_start

    if loss_type == "l1":
        per_elem = jnp.abs(pred - target)
    else:
        per_elem = jnp.square(pred - target)
    per_sample = per_elem.reshape(b, -1).mean(-1)

    loss_simple = per_sample.mean()
    loss = l_simple_weight * loss_simple
    out = {"loss_simple": loss_simple}
    if original_elbo_weight > 0:
        w = jnp.asarray(vlb_weights(schedule), jnp.float32)[t]
        loss_vlb = (w * per_sample).mean()
        loss = loss + original_elbo_weight * loss_vlb
        out["loss_vlb"] = loss_vlb
    out["loss"] = loss
    return loss, out


def film_pool(context: Array) -> Array:
    """'film' conditioning: a single global token squeezed to (B, D)
    (DiffusionWrapper c_film branch, ddpm.py:1429-1431)."""
    if context.ndim == 3:
        return context.mean(axis=1)
    return context


def concat_condition(x: Array, cond: Array) -> Array:
    """'concat' conditioning: channel-stack (DiffusionWrapper c_concat)."""
    return jnp.concatenate([x, cond], axis=1)
