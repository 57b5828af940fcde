"""Core tensor ops shared by every model.

Functional (init/apply) building blocks. Parameters are plain pytrees of
jnp arrays; weights use JAX (in, out) layout for matmuls so `x @ w` hits the
MXU directly. The torch-checkpoint importer transposes on load.

Numerical-parity notes (vs /root/reference):
- RMSNorm upcasts to fp32 before normalizing, matching the vanilla fallback in
  ldm/modules/diffusionmodules/flag_large_dit_moe.py:34-77.
- `modulate` matches flag_large_dit_moe.py:80-81.
- `timestep_embedding` matches TimestepEmbedder.timestep_embedding
  (flag_large_dit_moe.py:109-128): cat([cos, sin]).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Dense / linear
# ---------------------------------------------------------------------------

def dense_init(key: Array, d_in: int, d_out: int, bias: bool = True,
               init: str = "xavier", scale: float = 0.02) -> dict:
    """Initialize a dense layer. `init` in {xavier, normal, zeros}.
    Draws on the host (numpy Philox seeded from the key) — see utils.nprand."""
    from maa3_tpu.utils import nprand
    if init == "xavier":
        limit = math.sqrt(6.0 / (d_in + d_out))
        w = jnp.asarray(nprand.uniform(key, (d_in, d_out), -limit, limit))
    elif init == "normal":
        w = jnp.asarray(nprand.normal(key, (d_in, d_out), scale))
    elif init == "zeros":
        w = jnp.zeros((d_in, d_out), jnp.float32)
    else:
        raise ValueError(f"unknown init {init!r}")
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def dense(params: dict, x: Array, compute_dtype=None) -> Array:
    """y = x @ w + b. Casts inputs/weights to compute_dtype for the MXU.

    A params dict holding {"w_q", "w_scale"} (ops/quant.py) dispatches to the
    int8 w8a8 path — call sites stay agnostic to the serving quant mode."""
    if "w_q" in params:
        from maa3_tpu.ops.quant import dense_w8a8
        return dense_w8a8(params, x, compute_dtype)
    w = params["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = x @ w
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------

def rms_norm_init(dim: int) -> dict:
    return {"weight": jnp.ones((dim,), jnp.float32)}


def rms_norm(params: dict, x: Array, eps: float = 1e-5) -> Array:
    """RMSNorm with fp32 statistics; output dtype == input dtype.

    Parity: flag_large_dit_moe.py:52-77 (fp32 upcast, then `.type_as(x)`,
    then scale by weight in the original dtype).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return normed.astype(orig_dtype) * params["weight"].astype(orig_dtype)


def layer_norm(x: Array, weight: Optional[Array] = None,
               bias: Optional[Array] = None, eps: float = 1e-6) -> Array:
    """LayerNorm over the last axis with fp32 statistics."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def group_norm(x: Array, weight: Array, bias: Array, num_groups: int = 32,
               eps: float = 1e-6) -> Array:
    """GroupNorm for (B, C, T) tensors, normalizing over (C//G, T) per group.

    Parity: torch.nn.GroupNorm as used by the 1-D VAE
    (ldm/models/autoencoder1d.py:169-170) and BigVGAN-adjacent code.
    """
    b, c, t = x.shape
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(b, num_groups, c // num_groups, t)
    mean = jnp.mean(xf, axis=(2, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(2, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, c, t)
    y = y * weight.astype(jnp.float32)[None, :, None] + bias.astype(jnp.float32)[None, :, None]
    return y.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Misc
# ---------------------------------------------------------------------------

def silu(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


def modulate(x: Array, shift: Array, scale: Array) -> Array:
    """adaLN modulation: x * (1 + scale) + shift with (B, D) shift/scale
    broadcast over the sequence axis. Parity: flag_large_dit_moe.py:80-81."""
    return x * (1.0 + scale[:, None, :].astype(x.dtype)) + shift[:, None, :].astype(x.dtype)


# ---------------------------------------------------------------------------
# Timestep embedding
# ---------------------------------------------------------------------------

def timestep_embedding(t: Array, dim: int, max_period: int = 10000) -> Array:
    """Sinusoidal timestep embedding, fp32.

    Parity: flag_large_dit_moe.py:109-128 — freqs = exp(-ln(P) * [0..half)/half),
    embedding = cat([cos(t*f), sin(t*f)], -1).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def timestep_embedder_init(key: Array, hidden_size: int,
                           freq_dim: int = 256) -> dict:
    """MLP(freq_dim -> hidden -> hidden) with N(0, 0.02) init.

    Parity: TimestepEmbedder (flag_large_dit_moe.py:96-133) + the normal init
    from TxtFlagLargeImprovedDiTV2.initialize_weights (flag_large_dit.py:284-286).
    """
    k1, k2 = jax.random.split(key)
    return {
        "mlp0": dense_init(k1, freq_dim, hidden_size, init="normal"),
        "mlp2": dense_init(k2, hidden_size, hidden_size, init="normal"),
    }


def timestep_embedder_apply(params: dict, t: Array, compute_dtype=None,
                            freq_dim: int = 256) -> Array:
    emb = timestep_embedding(t, freq_dim)
    h = dense(params["mlp0"], emb, compute_dtype)
    h = silu(h)
    return dense(params["mlp2"], h, compute_dtype)
