"""Rotary position embeddings (RoPE) in the Lumina-Next complex-pair form.

The reference precomputes complex64 `freqs_cis` and rotates (q, k) via complex
multiplication under an fp32 autocast island
(ldm/modules/diffusionmodules/flag_large_dit.py:212-251,
 ldm/modules/diffusionmodules/flag_large_dit_moe.py:239-271).

TPU-native formulation: precompute (cos, sin) tables and rotate adjacent real
pairs (x[2i], x[2i+1]) in fp32 — bitwise the same rotation as the complex
product, with no complex dtype (XLA lowers pure-real code better on TPU).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def precompute_rope(head_dim: int, max_len: int, theta: float = 10000.0,
                    rope_scaling_factor: float = 1.0,
                    ntk_factor: float = 1.0) -> Tuple[Array, Array]:
    """Return (cos, sin), each (max_len, head_dim // 2), fp32.

    Parity: TxtFlagLargeDiT.precompute_freqs_cis (flag_large_dit.py:212-251):
    theta *= ntk_factor; freqs = 1/theta^(2i/d); positions t /= rope_scaling.
    """
    theta = theta * ntk_factor
    half = head_dim // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32) / rope_scaling_factor
    angles = jnp.outer(t, freqs)  # (max_len, half)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(xq: Array, xk: Array, cos: Array, sin: Array) -> Tuple[Array, Array]:
    """Rotate q/k (B, L, H, D) with (L, D//2) cos/sin tables, fp32 internally.

    Pair convention matches torch.view_as_complex on a (..., D//2, 2) reshape:
    pairs are (x[..., 2i], x[..., 2i+1]).
    """
    def rot(x: Array) -> Array:
        orig_dtype = x.dtype
        b, l, h, d = x.shape
        xf = x.astype(jnp.float32).reshape(b, l, h, d // 2, 2)
        xr, xi = xf[..., 0], xf[..., 1]
        c = cos[:l][None, :, None, :]
        s = sin[:l][None, :, None, :]
        out_r = xr * c - xi * s
        out_i = xr * s + xi * c
        out = jnp.stack([out_r, out_i], axis=-1).reshape(b, l, h, d)
        return out.astype(orig_dtype)

    return rot(xq), rot(xk)
