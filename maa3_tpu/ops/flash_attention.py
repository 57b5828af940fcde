"""Pallas flash-attention (fwd + bwd) with key-padding masking.

The varlen flash-attn path of the reference (flag_large_dit_moe.py:355-381)
exists to skip padding on GPU; on TPU we keep static shapes and mask. At the
default sequence lengths (<=1248) XLA's fused attention is already at the MXU
roofline, so this kernel is the LONG-CONTEXT path (rope-scaled max_len
extrapolation, future context-parallel axis): O(L) memory via online softmax
instead of materializing the (L, L) score matrix — in BOTH directions:
the custom VJP below recomputes probabilities blockwise from the saved
log-sum-exp, so training never materializes (Lq, Lk) either.

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


def _fwd_body(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
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
        if lse_ref is not None:
            # log-sum-exp per query row: the bwd kernels reconstruct
            # p = exp(s - lse) blockwise from this
            lse_ref[0, 0] = (m_ref[...] + jnp.log(denom))[:, 0]


def _flash_fwd_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref,
                      acc_ref, m_ref, l_ref, *, scale: float, nk: int):
    _fwd_body(mask_ref, q_ref, k_ref, v_ref, o_ref, None,
              acc_ref, m_ref, l_ref, scale=scale, nk=nk)


def _flash_fwd_lse_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                          acc_ref, m_ref, l_ref, *, scale: float, nk: int):
    _fwd_body(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
              acc_ref, m_ref, l_ref, scale=scale, nk=nk)


def _flash_bwd_dkv_kernel(mask_ref, lse_ref, delta_ref, q_ref, do_ref,
                          k_ref, v_ref, dk_ref, dv_ref,
                          dk_acc, dv_acc, *, scale: float, nq: int):
    """One (bh, kv-block) pair; the q loop is the innermost grid dim.
    dv = p^T do;  dk = (p * (do v^T - delta))^T q * scale."""
    ib = pl.program_id(2)

    @pl.when(ib == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32)      # (bq, d)
    do = do_ref[0].astype(jnp.float32)    # (bq, d)
    k = k_ref[0].astype(jnp.float32)      # (bk, d)
    v = v_ref[0].astype(jnp.float32)      # (bk, d)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    valid = mask_ref[0, 0] > 0
    s = jnp.where(valid[None, :], s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0][:, None])          # (bq, bk)

    # dv uses p quantized to v.dtype — exactly the p the forward's value
    # matmul consumed; the delta-trick term below keeps unquantized p (the
    # standard flash backward, same approximation as the CUDA flash-attn
    # kernels: O(bf16 eps) on ds, asserted within tolerance by the bf16
    # case of test_flash_gradients_match_dense)
    pq = p.astype(v_ref.dtype).astype(jnp.float32)
    dv_acc[...] += jax.lax.dot_general(               # pq^T do -> (bk, d)
        pq, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(                         # do v^T -> (bq, bk)
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0][:, None])
    dk_acc[...] += jax.lax.dot_general(               # ds^T q -> (bk, d)
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(ib == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(mask_ref, lse_ref, delta_ref, q_ref, do_ref,
                         k_ref, v_ref, dq_ref, dq_acc,
                         *, scale: float, nk: int):
    """One (bh, q-block) pair; the kv loop is the innermost grid dim.
    dq = (p * (do v^T - delta)) k * scale."""
    jb = pl.program_id(2)

    @pl.when(jb == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    valid = mask_ref[0, 0] > 0
    s = jnp.where(valid[None, :], s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0][:, None])
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0][:, None])
    dq_acc[...] += jax.lax.dot_general(               # ds k -> (bq, d)
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(jb == nk - 1)
    def _finalize():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def flash_attention(q: Array, k: Array, v: Array,
                    mask: Optional[Array] = None,
                    scale: Optional[float] = None,
                    block_q: int = 128, block_k: int = 128,
                    interpret: Optional[bool] = None) -> Array:
    """q (B, H, Lq, D), k/v (B, H, Lk, D), mask (B, Lk) True=valid.
    Returns (B, H, Lq, D).

    Differentiable: the custom VJP saves only O(L) residuals (output +
    per-row log-sum-exp) and recomputes probabilities blockwise in two
    Pallas backward kernels (dk/dv with the q loop inner, dq with the kv
    loop inner) — long-context training through the auto-routed flash path
    (DiTConfig.use_flash=None, seq>4096 — the threshold is memory-motivated,
    see DiTConfig) runs at flash memory cost in both directions."""
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
    out, _ = _flash_pallas(q, k, v, mask, scale, block_q, block_k, interpret,
                           with_lse=False)
    return out


def _flash_core_fwd(q, k, v, mask, scale, block_q, block_k, interpret):
    out, lse = _flash_pallas(q, k, v, mask, scale, block_q, block_k,
                             interpret, with_lse=True)
    return out, (q, k, v, mask, out, lse)


def _flash_core_bwd(scale, block_q, block_k, interpret, res, g):
    import numpy as np
    q, k, v, mask, o, lse = res
    dq, dk, dv = _flash_pallas_bwd(q, k, v, mask, o, lse, g, scale,
                                   block_q, block_k, interpret)
    # integer mask: cotangent must be float0 (no gradient flows to it)
    return dq, dk, dv, np.zeros(mask.shape, jax.dtypes.float0)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _pad_dims(q, k, block_q, block_k):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    d_pad = max(128, ((d + 127) // 128) * 128)
    lq_pad = ((lq + block_q - 1) // block_q) * block_q
    lk_pad = ((lk + block_k - 1) // block_k) * block_k
    return b, h, lq, lk, d, d_pad, lq_pad, lk_pad


def _pad_to(x, l_target, d_target):
    return jnp.pad(x, ((0, 0), (0, 0), (0, l_target - x.shape[2]),
                       (0, d_target - x.shape[3])))


def _pad_mask(mask, b, h, lk_pad):
    lk = mask.shape[1]
    maskp = jnp.pad(mask, ((0, 0), (0, lk_pad - lk)))
    return jnp.broadcast_to(maskp[:, None, :], (b, h, lk_pad)).reshape(
        b * h, 1, lk_pad)  # (BH, 1, Lk): TPU block last-2 dims must tile


def _flash_pallas(q: Array, k: Array, v: Array, mask: Array, scale: float,
                  block_q: int, block_k: int, interpret: bool,
                  with_lse: bool):
    b, h, lq, lk, d, d_pad, lq_pad, lk_pad = _pad_dims(q, k, block_q, block_k)

    qp = _pad_to(q, lq_pad, d_pad).reshape(b * h, lq_pad, d_pad)
    kp = _pad_to(k, lk_pad, d_pad).reshape(b * h, lk_pad, d_pad)
    vp = _pad_to(v, lk_pad, d_pad).reshape(b * h, lk_pad, d_pad)
    maskp = _pad_mask(mask, b, h, lk_pad)

    nq = lq_pad // block_q
    nk = lk_pad // block_k

    out_shape = [jax.ShapeDtypeStruct((b * h, lq_pad, d_pad), q.dtype)]
    out_specs = [pl.BlockSpec((1, block_q, d_pad), lambda bh, i, j: (bh, i, 0))]
    if with_lse:
        kernel = functools.partial(_flash_fwd_lse_kernel, scale=scale, nk=nk)
        out_shape.append(
            jax.ShapeDtypeStruct((b * h, 1, lq_pad), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 1, block_q), lambda bh, i, j: (bh, 0, i)))
    else:
        kernel = functools.partial(_flash_fwd_kernel, scale=scale, nk=nk)

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(b * h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda bh, i, j: (bh, 0, j)),  # mask
            pl.BlockSpec((1, block_q, d_pad), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, d_pad), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(maskp, qp, kp, vp)

    out = outs[0].reshape(b, h, lq_pad, d_pad)[:, :, :lq, :d]
    lse = outs[1] if with_lse else None  # (BH, 1, lq_pad) padded — bwd-only
    return out, lse


def _flash_pallas_bwd(q, k, v, mask, o, lse, g, scale: float,
                      block_q: int, block_k: int, interpret: bool):
    b, h, lq, lk, d, d_pad, lq_pad, lk_pad = _pad_dims(q, k, block_q, block_k)

    qp = _pad_to(q, lq_pad, d_pad).reshape(b * h, lq_pad, d_pad)
    kp = _pad_to(k, lk_pad, d_pad).reshape(b * h, lk_pad, d_pad)
    vp = _pad_to(v, lk_pad, d_pad).reshape(b * h, lk_pad, d_pad)
    dop = _pad_to(g, lq_pad, d_pad).reshape(b * h, lq_pad, d_pad)
    maskp = _pad_mask(mask, b, h, lk_pad)

    # delta_i = rowsum(do_i * o_i) — the softmax-Jacobian mean term; cheap
    # elementwise XLA, padded rows contribute 0 (do is zero-padded)
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, lq_pad - lq))).reshape(
        b * h, 1, lq_pad)

    nq = lq_pad // block_q
    nk = lk_pad // block_k

    row_specs = [  # mask, lse, delta, q, do
        pl.BlockSpec((1, 1, block_k), lambda bh, j, i: (bh, 0, j)),
        pl.BlockSpec((1, 1, block_q), lambda bh, j, i: (bh, 0, i)),
        pl.BlockSpec((1, 1, block_q), lambda bh, j, i: (bh, 0, i)),
        pl.BlockSpec((1, block_q, d_pad), lambda bh, j, i: (bh, i, 0)),
        pl.BlockSpec((1, block_q, d_pad), lambda bh, j, i: (bh, i, 0)),
        pl.BlockSpec((1, block_k, d_pad), lambda bh, j, i: (bh, j, 0)),
        pl.BlockSpec((1, block_k, d_pad), lambda bh, j, i: (bh, j, 0)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, nq=nq),
        out_shape=[jax.ShapeDtypeStruct((b * h, lk_pad, d_pad), k.dtype),
                   jax.ShapeDtypeStruct((b * h, lk_pad, d_pad), v.dtype)],
        grid=(b * h, nk, nq),
        in_specs=row_specs,
        out_specs=[
            pl.BlockSpec((1, block_k, d_pad), lambda bh, j, i: (bh, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, j, i: (bh, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d_pad), jnp.float32),
            pltpu.VMEM((block_k, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(maskp, lse, delta, qp, dop, kp, vp)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, nk=nk),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d_pad), q.dtype),
        grid=(b * h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda bh, i, j: (bh, 0, j)),
            pl.BlockSpec((1, 1, block_q), lambda bh, i, j: (bh, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda bh, i, j: (bh, 0, i)),
            pl.BlockSpec((1, block_q, d_pad), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_q, d_pad), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad),
                               lambda bh, i, j: (bh, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(maskp, lse, delta, qp, dop, kp, vp)

    dq = dq.reshape(b, h, lq_pad, d_pad)[:, :, :lq, :d]
    dk = dk.reshape(b, h, lk_pad, d_pad)[:, :, :lk, :d]
    dv = dv.reshape(b, h, lk_pad, d_pad)[:, :, :lk, :d]
    return dq, dk, dv
