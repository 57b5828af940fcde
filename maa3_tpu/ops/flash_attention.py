"""Pallas flash-attention (fwd + bwd) with key-padding masking.

The varlen flash-attn path of the reference (flag_large_dit_moe.py:355-381)
exists to skip padding on GPU; on TPU we keep static shapes and mask. The
kernel computes softmax-attention at O(L) memory via online softmax instead
of materializing the (L, L) score matrix — in BOTH directions: the custom
VJP below recomputes probabilities blockwise from the saved log-sum-exp, so
training never materializes (Lq, Lk) either. Eliminating the score HBM
round-trips is also the batched-serving lever: XLA dense attention writes
O(B·H·L²) score/prob buffers, which is what makes serving throughput fall
with batch (PARITY.md) — the kernel keeps all of it in VMEM.

Performance notes (round 3 rewrite):
- head_dim stays NATIVE (e.g. 72) in HBM: blocks are (block, d) and Mosaic
  pads lanes internally. The previous revision zero-padded d to 128 at the
  XLA level, costing +78% q/k/v/o HBM traffic at d=72.
- every matmul takes the inputs' dtype (bf16 in training/serving) with fp32
  accumulation. The previous backward cast q/k/v/do to fp32 *before* the
  dots, running the MXU at the fp32 rate (~8x slower than bf16).
- short sequences (one kv block) use a direct-softmax kernel: no online
  rescaling, no scratch accumulator round-trips, grid (B*H, nq).

Layout: q/k/v (B, H, L, D). L is padded to the block size with masked tails.
Grid (B*H, nq, nk) with the kv loop innermost; running max/denominator in
VMEM scratch.
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
# VMEM-safe caps; lq/lk smaller than the cap collapse to a single block
_BLOCK_Q_CAP = 512
_BLOCK_K_CAP = 512
_BLOCK_Q_BWD_CAP = 256
_BLOCK_K_BWD_CAP = 256
# forward-only (no lse) direct-softmax path: whole kv range in VMEM up to
# this many keys (k+v at d<=128 is <=0.8 MB/pair)
_FAST_LK_CAP = 1536


def _fwd_single_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref,
                       *, scale: float, g: int):
    """Whole kv range in one block: direct (not online) softmax. Processes
    `g` (b, h) pairs per grid step (statically unrolled) — each pair's dots
    are sub-microsecond MXU work at short seq, so per-step overhead would
    dominate a one-pair-per-step grid."""
    for gi in range(g):
        q = q_ref[gi]                     # (bq, d)
        k = k_ref[gi]                     # (lk, d)
        v = v_ref[gi]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        valid = mask_ref[gi, 0] > 0       # (lk,)
        s = jnp.where(valid[None, :], s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
        acc = jax.lax.dot_general(p.astype(v.dtype), v,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[gi] = (acc / l).astype(o_ref.dtype)


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
    dv = p^T do;  dk = (p * (do v^T - delta))^T q * scale.
    All dots run in the inputs' dtype (bf16 in training) with fp32 accum."""
    ib = pl.program_id(2)

    @pl.when(ib == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]                          # (bq, d)
    do = do_ref[0]                        # (bq, d)
    k = k_ref[0]                          # (bk, d)
    v = v_ref[0]                          # (bk, d)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    valid = mask_ref[0, 0] > 0
    p = jnp.exp(s - lse_ref[0, 0][:, None])          # (bq, bk)
    # explicit zeroing: for a fully-masked query row lse underflows to
    # ~NEG_INF and exp(s - lse) would be 1 at every masked key — the
    # forward's rescaling hides this, the backward must mask explicitly
    p = jnp.where(valid[None, :], p, 0.0)

    # dv uses p quantized to v.dtype — exactly the p the forward's value
    # matmul consumed; the delta-trick term below keeps unquantized p (the
    # standard flash backward, same approximation as the CUDA flash-attn
    # kernels: O(bf16 eps) on ds, asserted within tolerance by the bf16
    # case of test_flash_gradients_match_dense)
    pq = p.astype(v_ref.dtype)
    dv_acc[...] += jax.lax.dot_general(               # pq^T do -> (bk, d)
        pq, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(                         # do v^T -> (bq, bk)
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = (p * (dp - delta_ref[0, 0][:, None])).astype(q_ref.dtype)
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

    q = q_ref[0]
    do = do_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    valid = mask_ref[0, 0] > 0
    p = jnp.exp(s - lse_ref[0, 0][:, None])
    p = jnp.where(valid[None, :], p, 0.0)   # see dkv kernel comment
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = (p * (dp - delta_ref[0, 0][:, None])).astype(q_ref.dtype)
    dq_acc[...] += jax.lax.dot_general(               # ds k -> (bq, d)
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(jb == nk - 1)
    def _finalize():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def flash_attention(q: Array, k: Array, v: Array,
                    mask: Optional[Array] = None,
                    scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    interpret: Optional[bool] = None) -> Array:
    """q (B, H, Lq, D), k/v (B, H, Lk, D), mask (B, Lk) True=valid.
    Returns (B, H, Lq, D).

    block_q/block_k default to adaptive sizes (whole sequence up to a
    VMEM-safe cap). Differentiable: the custom VJP saves only O(L) residuals
    (output + per-row log-sum-exp) and recomputes probabilities blockwise in
    two Pallas backward kernels (dk/dv with the q loop inner, dq with the kv
    loop inner)."""
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(l: int, cap: int) -> int:
    """Largest 16-aligned block <= cap whose padding of l is minimal.

    A naive min(cap, l) forces round_up(l, cap) padding — e.g. seq 624 with
    cap 512 would pad to 1024 (+64% wasted FLOPs); this picks 208 (0 pad)."""
    l16 = _round_up(l, 16)
    if l16 <= cap:
        return l16
    best_b, best_pad = cap, _round_up(l, cap)
    for b in range(cap, 63, -16):
        pad = _round_up(l, b)
        if pad < best_pad:
            best_b, best_pad = b, pad
    return best_b


def _resolve_blocks(lq: int, lk: int, block_q: Optional[int],
                    block_k: Optional[int], cap_q: int, cap_k: int):
    """Pick block sizes (sublane-aligned, capped) and the padded lengths."""
    bq = block_q if block_q else _pick_block(lq, cap_q)
    bk = block_k if block_k else _pick_block(lk, cap_k)
    return bq, bk, _round_up(lq, bq), _round_up(lk, bk)


def _pick_group(bh: int, lk_pad: int, d: int, budget_bytes: int = 4 << 20):
    """(b, h) pairs per grid step for the short-seq fast path: amortizes the
    per-grid-step overhead, which dominates when each step's dots are tiny
    (e.g. seq 312: one (320,72)x(72,320) matmul is ~0.2 us of MXU time).
    Largest power of two dividing bh whose q/k/v/o blocks fit the budget."""
    per = 4 * lk_pad * d * 2  # q+k+v+o one pair, bf16
    g = 1
    while (g * 2 <= 16 and bh % (g * 2) == 0
           and per * g * 2 <= budget_bytes):
        g *= 2
    return g


def _pad_l(x, l_target):
    if x.shape[2] == l_target:
        b, h = x.shape[:2]
        return x.reshape(b * h, l_target, x.shape[3])
    return jnp.pad(x, ((0, 0), (0, 0), (0, l_target - x.shape[2]),
                       (0, 0))).reshape(x.shape[0] * x.shape[1], l_target,
                                        x.shape[3])


def _pad_mask(mask, b, h, lk_pad):
    lk = mask.shape[1]
    maskp = jnp.pad(mask, ((0, 0), (0, lk_pad - lk)))
    return jnp.broadcast_to(maskp[:, None, :], (b, h, lk_pad)).reshape(
        b * h, 1, lk_pad)  # (BH, 1, Lk): TPU block last-2 dims must tile


def _flash_pallas(q: Array, k: Array, v: Array, mask: Array, scale: float,
                  block_q: Optional[int], block_k: Optional[int],
                  interpret: bool, with_lse: bool):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if (block_k is None and not with_lse
            and _round_up(lk, 16) <= _FAST_LK_CAP):
        block_k = _round_up(lk, 16)   # force nk == 1 -> direct-softmax path
    block_q, block_k, lq_pad, lk_pad = _resolve_blocks(
        lq, lk, block_q, block_k, _BLOCK_Q_CAP, _BLOCK_K_CAP)

    qp = _pad_l(q, lq_pad)
    kp = _pad_l(k, lk_pad)
    vp = _pad_l(v, lk_pad)
    maskp = _pad_mask(mask, b, h, lk_pad)

    nq = lq_pad // block_q
    nk = lk_pad // block_k

    if nk == 1 and not with_lse:
        # short-seq fast path: direct softmax, no scratch, grouped 2-D grid
        grp = _pick_group(b * h, lk_pad, d)
        out = pl.pallas_call(
            functools.partial(_fwd_single_kernel, scale=scale, g=grp),
            out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype),
            grid=(b * h // grp, nq),
            in_specs=[
                pl.BlockSpec((grp, 1, lk_pad), lambda g, i: (g, 0, 0)),
                pl.BlockSpec((grp, block_q, d), lambda g, i: (g, i, 0)),
                pl.BlockSpec((grp, lk_pad, d), lambda g, i: (g, 0, 0)),
                pl.BlockSpec((grp, lk_pad, d), lambda g, i: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((grp, block_q, d), lambda g, i: (g, i, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(maskp, qp, kp, vp)
        return out.reshape(b, h, lq_pad, d)[:, :, :lq, :], None

    out_shape = [jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0))]
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
            pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(maskp, qp, kp, vp)

    out = outs[0].reshape(b, h, lq_pad, d)[:, :, :lq, :]
    lse = outs[1] if with_lse else None  # (BH, 1, lq_pad) padded — bwd-only
    return out, lse


def _flash_pallas_bwd(q, k, v, mask, o, lse, g, scale: float,
                      block_q: Optional[int], block_k: Optional[int],
                      interpret: bool):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    block_q, block_k, lq_pad, lk_pad = _resolve_blocks(
        lq, lk, block_q, block_k, _BLOCK_Q_BWD_CAP, _BLOCK_K_BWD_CAP)
    # lse was produced with the FWD block size — it is dense (BH, 1, lq_fwd);
    # re-pad to this pass's lq_pad if they differ
    lq_fwd = lse.shape[2]
    if lq_fwd < lq_pad:
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, lq_pad - lq_fwd)))
    elif lq_fwd > lq_pad:
        lse = lse[:, :, :lq_pad]

    qp = _pad_l(q, lq_pad)
    kp = _pad_l(k, lk_pad)
    vp = _pad_l(v, lk_pad)
    dop = _pad_l(g, lq_pad)
    maskp = _pad_mask(mask, b, h, lk_pad)

    # delta_i = rowsum(do_i * o_i) — the softmax-Jacobian mean term; cheap
    # elementwise XLA, padded rows contribute 0 (do is zero-padded)
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, lq_pad - lq))).reshape(
        b * h, 1, lq_pad)

    nq = lq_pad // block_q
    nk = lk_pad // block_k

    row_specs = [  # mask, lse, delta, q, do, k, v
        pl.BlockSpec((1, 1, block_k), lambda bh, j, i: (bh, 0, j)),
        pl.BlockSpec((1, 1, block_q), lambda bh, j, i: (bh, 0, i)),
        pl.BlockSpec((1, 1, block_q), lambda bh, j, i: (bh, 0, i)),
        pl.BlockSpec((1, block_q, d), lambda bh, j, i: (bh, i, 0)),
        pl.BlockSpec((1, block_q, d), lambda bh, j, i: (bh, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, nq=nq),
        out_shape=[jax.ShapeDtypeStruct((b * h, lk_pad, d), k.dtype),
                   jax.ShapeDtypeStruct((b * h, lk_pad, d), v.dtype)],
        grid=(b * h, nk, nq),
        in_specs=row_specs,
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, j, i: (bh, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(maskp, lse, delta, qp, dop, kp, vp)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, nk=nk),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype),
        grid=(b * h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda bh, i, j: (bh, 0, j)),
            pl.BlockSpec((1, 1, block_q), lambda bh, i, j: (bh, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda bh, i, j: (bh, 0, i)),
            pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda bh, i, j: (bh, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(maskp, lse, delta, qp, dop, kp, vp)

    dq = dq.reshape(b, h, lq_pad, d)[:, :, :lq, :]
    dk = dk.reshape(b, h, lk_pad, d)[:, :, :lk, :]
    dv = dv.reshape(b, h, lk_pad, d)[:, :, :lk, :]
    return dq, dk, dv
