"""SwiGLU feed-forward network (Lumina-Next / LLaMA style).

Parity: FeedForward (flag_large_dit_moe.py:438-489) — hidden = 2/3 * 4d,
rounded up to a multiple of `multiple_of` (256), gates with silu(w1 x) * w3 x.
The reference's `@torch.compile`d silu-gate fusion is free under XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from maa3_tpu.ops.basic import dense, dense_init, silu

Array = jax.Array


def swiglu_hidden_dim(dim: int, hidden_dim: Optional[int] = None,
                      multiple_of: int = 256,
                      ffn_dim_multiplier: Optional[float] = None) -> int:
    if hidden_dim is None:
        hidden_dim = 4 * dim
    hidden_dim = int(2 * hidden_dim / 3)
    if ffn_dim_multiplier is not None:
        hidden_dim = int(ffn_dim_multiplier * hidden_dim)
    return multiple_of * ((hidden_dim + multiple_of - 1) // multiple_of)


def feed_forward_init(key: Array, dim: int, hidden_dim: Optional[int] = None,
                      multiple_of: int = 256,
                      ffn_dim_multiplier: Optional[float] = None) -> dict:
    h = swiglu_hidden_dim(dim, hidden_dim, multiple_of, ffn_dim_multiplier)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w1": dense_init(k1, dim, h, bias=False),
        "w2": dense_init(k2, h, dim, bias=False),
        "w3": dense_init(k3, dim, h, bias=False),
    }


def feed_forward_apply(params: dict, x: Array, compute_dtype=None,
                       return_stats: bool = False):
    from jax.ad_checkpoint import checkpoint_name
    if "w13" in params:
        # serving-time fused gate+up projection (utils.nprand.fuse_dit_gemms)
        h = dense(params["w13"], x, compute_dtype)
        x1, x3 = jnp.split(h, 2, axis=-1)
    else:
        x1 = dense(params["w1"], x, compute_dtype)
        x3 = dense(params["w3"], x, compute_dtype)
    # names let the 'save_gemms' remat policy keep exactly the FLOP-heavy
    # projections while recomputing the cheap elementwise/attention-score
    # work (models/dit.py remat_policy)
    x1 = checkpoint_name(x1, "ffn_h1")
    x3 = checkpoint_name(x3, "ffn_h3")
    prod = silu(x1) * x3
    out = checkpoint_name(dense(params["w2"], prod, compute_dtype), "ffn_out")
    if return_stats:
        # per-channel amax of the w2 input (SwiGLU product) — SmoothQuant
        # calibration (ops/quant.py::smooth_migrate_dit)
        prod_amax = jnp.max(jnp.abs(prod.astype(jnp.float32)),
                            axis=tuple(range(prod.ndim - 1)))
        return out, prod_amax
    return out
