"""Lumina-Next attention: RoPE self-attention + zero-init gated cross-attention.

Parity target: Attention (flag_large_dit_moe.py:165-408):
- separate bias-free wq/wk/wv; optional GQA via n_kv_heads; optional qk LayerNorm
- RoPE on q,k in fp32
- self-attn softmax scale 1/sqrt(head_dim)
- cross-attn over context y (wk_y / wv_y, ky_norm), per-head tanh(gate)
  (zero-init so cross-attn starts as identity), added to the self-attn output
- output projection wo (bias-free)

TPU-native design: the reference's flash-attn varlen unpad/re-pad dance exists
to skip padding on GPU. On TPU we keep static shapes and mask instead: a
padded-position additive mask fed to a fused XLA softmax-attention. Sequence
lengths here are short (<=1248 latent frames), so attention is MXU-bound and
XLA's fused attention is at speed-of-light; a Pallas flash kernel is provided
separately for long-context experiments (ops/flash_attention.py).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from maa3_tpu.ops.basic import dense, dense_init, layer_norm
from maa3_tpu.ops.rope import apply_rope

Array = jax.Array

NEG_INF = -1e9  # finite mask value: avoids NaN rows for all-masked queries


def attention_init(key: Array, dim: int, n_heads: int,
                   n_kv_heads: Optional[int] = None, qk_norm: bool = False,
                   y_dim: int = 0) -> dict:
    n_kv = n_heads if n_kv_heads is None else n_kv_heads
    head_dim = dim // n_heads
    ks = jax.random.split(key, 6)
    p = {
        "wq": dense_init(ks[0], dim, n_heads * head_dim, bias=False),
        "wk": dense_init(ks[1], dim, n_kv * head_dim, bias=False),
        "wv": dense_init(ks[2], dim, n_kv * head_dim, bias=False),
        "wo": dense_init(ks[3], n_heads * head_dim, dim, bias=False),
    }
    if y_dim > 0:
        p["wk_y"] = dense_init(ks[4], y_dim, n_kv * head_dim, bias=False)
        p["wv_y"] = dense_init(ks[5], y_dim, n_kv * head_dim, bias=False)
        p["gate"] = jnp.zeros((n_heads,), jnp.float32)
    if qk_norm:
        p["q_norm"] = {"weight": jnp.ones((n_heads * head_dim,)),
                       "bias": jnp.zeros((n_heads * head_dim,))}
        p["k_norm"] = {"weight": jnp.ones((n_kv * head_dim,)),
                       "bias": jnp.zeros((n_kv * head_dim,))}
        if y_dim > 0:
            p["ky_norm"] = {"weight": jnp.ones((n_kv * head_dim,)),
                            "bias": jnp.zeros((n_kv * head_dim,))}
    return p


def _sdpa(q: Array, k: Array, v: Array, scale: float,
          mask: Optional[Array], fp32_scores: bool = False) -> Array:
    """Fused softmax attention on (B, L, H, D) tensors with fp32 accumulation.

    mask: optional (B, Lk) boolean validity mask for keys.

    In bf16 mode the materialized (L, L) logits/probs are stored in bf16 —
    matching the reference's autocast SDPA (flag_large_dit_moe.py:382-388,
    which never sees fp32 score matrices) and halving the attention HBM
    traffic, the dominant non-GEMM cost of the batched ODE. The softmax
    statistics still accumulate in fp32 (XLA keeps the max/exp/sum pass in
    registers); fp32 mode stores everything fp32 for strict parity.
    fp32_scores=True keeps fp32 score storage even in bf16 mode (a serving
    drift lever for small batches, where HBM traffic is not binding).
    """
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k,
                        preferred_element_type=jnp.float32) * scale
    if q.dtype == jnp.bfloat16 and not fp32_scores:
        logits = logits.astype(jnp.bfloat16)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhlm,bmhd->blhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def attention_apply(params: dict, x: Array, cos: Array, sin: Array,
                    y: Optional[Array] = None,
                    x_mask: Optional[Array] = None,
                    y_mask: Optional[Array] = None,
                    n_heads: int = 8, n_kv_heads: Optional[int] = None,
                    compute_dtype=None, use_flash: bool = False,
                    y_kv: Optional[tuple] = None,
                    fp32_scores: bool = False) -> Array:
    """x: (B, L, D); y: (B, Ly, y_dim) context; cos/sin RoPE tables (>=L, hd/2).

    y_kv: optional precomputed (yk, yv) context projections, each
    (B, Ly, n_kv * head_dim) and already norm'd — the sampling fast path
    (context is constant across ODE steps, so wk_y/wv_y GEMMs hoist out of
    the time loop; see models/dit.py::dit_sample_plan)."""
    b, l, d = x.shape
    n_kv = n_heads if n_kv_heads is None else n_kv_heads
    head_dim = d // n_heads
    scale = 1.0 / math.sqrt(head_dim)

    from jax.ad_checkpoint import checkpoint_name
    if "wqkv" in params:
        # serving-time fused projection (utils.nprand.fuse_dit_gemms): one
        # (D, q+k+v) GEMM — per-element numerics identical to the 3 GEMMs
        qkv = dense(params["wqkv"], x, compute_dtype)
        xq, xk, xv = jnp.split(qkv, [n_heads * head_dim,
                                     (n_heads + n_kv) * head_dim], axis=-1)
    else:
        xq = dense(params["wq"], x, compute_dtype)
        xk = dense(params["wk"], x, compute_dtype)
        xv = dense(params["wv"], x, compute_dtype)
    # tags for the 'save_gemms' remat policy (models/dit.py)
    xq = checkpoint_name(xq, "attn_q")
    xk = checkpoint_name(xk, "attn_k")
    xv = checkpoint_name(xv, "attn_v")
    if "q_norm" in params:
        xq = layer_norm(xq, params["q_norm"]["weight"], params["q_norm"]["bias"], eps=1e-5)
        xk = layer_norm(xk, params["k_norm"]["weight"], params["k_norm"]["bias"], eps=1e-5)

    xq = xq.reshape(b, l, n_heads, head_dim)
    xk = xk.reshape(b, l, n_kv, head_dim)
    xv = xv.reshape(b, l, n_kv, head_dim)
    xq, xk = apply_rope(xq, xk, cos, sin)

    if n_kv != n_heads:  # GQA: repeat kv heads
        rep = n_heads // n_kv
        xk = jnp.repeat(xk, rep, axis=2)
        xv = jnp.repeat(xv, rep, axis=2)

    if use_flash:
        # Pallas O(L)-memory kernel — the long-context path (seq >> 1k)
        from maa3_tpu.ops.flash_attention import flash_attention
        out = flash_attention(xq.transpose(0, 2, 1, 3), xk.transpose(0, 2, 1, 3),
                              xv.transpose(0, 2, 1, 3), mask=x_mask,
                              scale=scale).transpose(0, 2, 1, 3)
    else:
        out = _sdpa(xq, xk, xv, scale, x_mask, fp32_scores)

    if "wk_y" in params and (y is not None or y_kv is not None):
        # gated cross-attention
        if y_kv is not None:
            yk, yv = y_kv
        else:
            yk = dense(params["wk_y"], y, compute_dtype)
            if "ky_norm" in params:
                yk = layer_norm(yk, params["ky_norm"]["weight"],
                                params["ky_norm"]["bias"], eps=1e-5)
            yv = dense(params["wv_y"], y, compute_dtype)
        ly = yk.shape[1]
        yk = yk.reshape(b, ly, n_kv, head_dim)
        yv = yv.reshape(b, ly, n_kv, head_dim)
        if n_kv != n_heads:
            rep = n_heads // n_kv
            yk = jnp.repeat(yk, rep, axis=2)
            yv = jnp.repeat(yv, rep, axis=2)
        out_y = _sdpa(xq, yk, yv, scale, y_mask, fp32_scores)
        gate = jnp.tanh(params["gate"].astype(jnp.float32)).astype(out_y.dtype)
        out = out + out_y * gate[None, None, :, None]

    out = out.reshape(b, l, n_heads * head_dim)
    return checkpoint_name(dense(params["wo"], out, compute_dtype),
                           "attn_out")
