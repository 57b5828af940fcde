"""Optimizer + LR schedule, matching the reference training recipe.

Parity targets:
- AdamW (betas 0.9/0.999 torch defaults), base_lr scaled by
  accum * ngpu * batch_size (main.py:786-790)
- LambdaLinearScheduler: linear warmup from f_start to f_max over
  warm_up_steps, then linear decay toward f_min over cycle_length
  (ldm/lr_scheduler.py:41-77; configs use warmup 10k, f_start 1e-6,
  f_max 1.0, f_min 1.0 -> effectively constant after warmup)
- gradient_clip_val 1.0 (configs lightning.trainer)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def lambda_linear_schedule(base_lr: float, warm_up_steps: int = 10000,
                           f_start: float = 1e-6, f_max: float = 1.0,
                           f_min: float = 1.0,
                           cycle_length: float = 1e13) -> optax.Schedule:
    """ldm/lr_scheduler.py:41-77 LambdaLinearScheduler, single cycle."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = f_start + (f_max - f_start) * step / max(warm_up_steps, 1)
        decay = f_min + (f_max - f_min) * (cycle_length - (step - warm_up_steps)) / cycle_length
        f = jnp.where(step < warm_up_steps, warm, decay)
        return base_lr * f

    return schedule


def make_optimizer(base_lr: float = 3.0e-6, lr_multiplier: float = 16.0,
                   warm_up_steps: int = 10000, grad_clip: float = 1.0,
                   weight_decay: float = 1e-2,
                   schedule: Optional[optax.Schedule] = None,
                   mu_dtype=None,
                   factored: bool = False,
                   min_dim_size_to_factor: int = 128
                   ) -> optax.GradientTransformation:
    """AdamW + linear-warmup schedule + global-norm clip.

    lr_multiplier mirrors `accumulate_grad_batches * ngpu * bs` (main.py:786-790);
    the reference default recipe is 16 (1 * 1 * 16) per config batch_size.
    mu_dtype=jnp.bfloat16 stores the first moment in bf16 (params and the
    second moment stay fp32): frees ~1.5 GB HBM for the XL, which is what
    lets the no-recompute remat policy fit at batch 16+ on a 16 GB chip.
    factored=True swaps the per-element second moment for Adafactor's
    rank-1 row/column factorization (with Adam-style first moment kept):
    the XL's 3 GB fp32 `nu` becomes ~2 MB of factors, removing its 6 GB/step
    of HBM read+write traffic — the measured optimizer phase is the last
    ~13% of the train step once fwd+bwd sit at the remat-policy bound
    (scripts/probe_train_decompose.py). Opt-in: the reference recipe is
    exact AdamW; factored changes the update's denominator statistics.
    """
    if schedule is None:
        schedule = lambda_linear_schedule(base_lr * lr_multiplier, warm_up_steps)
    if factored:
        return optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adafactor(
                schedule, decay_rate=0.999, multiply_by_parameter_scale=False,
                clipping_threshold=None, momentum=0.9,
                dtype_momentum=mu_dtype or jnp.float32,
                weight_decay_rate=weight_decay, eps=1e-30,
                min_dim_size_to_factor=min_dim_size_to_factor,
                factored=True),
        )
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=weight_decay, mu_dtype=mu_dtype),
    )


def ema_update(ema_params, new_params, decay: float, step) -> dict:
    """LitEma warmup decay: min(decay, (1 + n) / (10 + n)) (ldm/modules/ema.py:16-35)."""
    step = jnp.asarray(step, jnp.float32)
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    return jax.tree.map(lambda e, p: e * d + (1.0 - d) * p, ema_params, new_params)
