"""Pallas flash-attention (forward) with key-padding masking.

The varlen flash-attn path of the reference (flag_large_dit_moe.py:355-381)
exists to skip padding on GPU; on TPU we keep static shapes and mask. At the
default sequence lengths (<=1248) XLA's fused attention is already at the MXU
roofline, so this kernel is the LONG-CONTEXT path (rope-scaled max_len
extrapolation, future context-parallel axis): O(L) memory via online softmax
instead of materializing the (L, L) score matrix.

Layout: q/k/v (B, H, L, D). D is padded to 128 lanes by the wrapper; L is
padded to the block size with masked tails. Grid (B*H, nq, nk) with the kv
loop innermost; running max/denominator in SMEM-friendly VMEM scratch.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e30


def _flash_fwd_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref,
                      acc_ref, m_ref, l_ref, *, scale: float, nk: int):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]                      # (bq, d)
    k = k_ref[0]                      # (bk, d)
    v = v_ref[0]                      # (bk, d)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    valid = mask_ref[0, 0] > 0        # (bk,) int32 -> bool
    s = jnp.where(valid[None, :], s, NEG_INF)

    m_prev = m_ref[...]               # (bq, 1)
    l_prev = l_ref[...]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)            # (bq, bk)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[...] = m_new
    l_ref[...] = l_new

    @pl.when(kb == nk - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)


def flash_attention(q: Array, k: Array, v: Array,
                    mask: Optional[Array] = None,
                    scale: Optional[float] = None,
                    block_q: int = 128, block_k: int = 128,
                    interpret: Optional[bool] = None) -> Array:
    """q (B, H, Lq, D), k/v (B, H, Lk, D), mask (B, Lk) True=valid.
    Returns (B, H, Lq, D).

    Differentiable: the forward runs the Pallas kernel; the backward
    (custom VJP below) differentiates the mathematically identical exact
    attention — so long-context training through the auto-routed flash path
    (DiTConfig.use_flash=None, seq>1024) works. The backward materializes
    the (Lq, Lk) score matrix; O(L) backward memory would need a flash
    backward kernel, which these models (trained at latent len 312) have
    not justified."""
    if interpret is None:
        # no TPU: run the kernel in interpreter mode so the flash path stays
        # testable (and functional) on CPU hosts
        interpret = jax.default_backend() == "cpu"
    scale = scale if scale is not None else 1.0 / math.sqrt(q.shape[3])
    if mask is None:
        mask = jnp.ones((q.shape[0], k.shape[2]), jnp.int32)
    return _flash_core(q, k, v, mask.astype(jnp.int32),
                       scale, block_q, block_k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_core(q, k, v, mask, scale, block_q, block_k, interpret):
    return _flash_pallas(q, k, v, mask, scale, block_q, block_k, interpret)


def _attention_oracle(q, k, v, mask, scale):
    """Exact-math attention the flash kernel computes (fp32 scores/softmax,
    probabilities cast to v.dtype for the value matmul — mirroring the
    kernel's dtypes so fwd and bwd agree)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = jnp.where(mask[:, None, None, :] > 0, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(q.dtype)


def _flash_core_fwd(q, k, v, mask, scale, block_q, block_k, interpret):
    out = _flash_pallas(q, k, v, mask, scale, block_q, block_k, interpret)
    return out, (q, k, v, mask)


def _flash_core_bwd(scale, block_q, block_k, interpret, res, g):
    import numpy as np
    q, k, v, mask = res
    _, vjp = jax.vjp(lambda a, b, c: _attention_oracle(a, b, c, mask, scale),
                     q, k, v)
    dq, dk, dv = vjp(g)
    # integer mask: cotangent must be float0 (no gradient flows to it)
    return dq, dk, dv, np.zeros(mask.shape, jax.dtypes.float0)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _flash_pallas(q: Array, k: Array, v: Array, mask: Array, scale: float,
                  block_q: int, block_k: int, interpret: bool) -> Array:
    b, h, lq, d = q.shape
    lk = k.shape[2]

    # pad lanes to 128 and sequence to block multiples
    d_pad = max(128, ((d + 127) // 128) * 128)
    lq_pad = ((lq + block_q - 1) // block_q) * block_q
    lk_pad = ((lk + block_k - 1) // block_k) * block_k

    def pad_to(x, l_target, d_target):
        return jnp.pad(x, ((0, 0), (0, 0), (0, l_target - x.shape[2]),
                           (0, d_target - x.shape[3])))

    qp = pad_to(q, lq_pad, d_pad).reshape(b * h, lq_pad, d_pad)
    kp = pad_to(k, lk_pad, d_pad).reshape(b * h, lk_pad, d_pad)
    vp = pad_to(v, lk_pad, d_pad).reshape(b * h, lk_pad, d_pad)

    maskp = jnp.pad(mask, ((0, 0), (0, lk_pad - lk)))
    maskp = jnp.broadcast_to(maskp[:, None, :], (b, h, lk_pad)).reshape(
        b * h, 1, lk_pad)  # (BH, 1, Lk): TPU block last-2 dims must tile

    nq = lq_pad // block_q
    nk = lk_pad // block_k

    kernel = functools.partial(_flash_fwd_kernel, scale=scale, nk=nk)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d_pad), q.dtype),
        grid=(b * h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda bh, i, j: (bh, 0, j)),  # mask
            pl.BlockSpec((1, block_q, d_pad), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bh, i, j: (bh, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, d_pad), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(maskp, qp, kp, vp)

    return out.reshape(b, h, lq_pad, d_pad)[:, :, :lq, :d]
