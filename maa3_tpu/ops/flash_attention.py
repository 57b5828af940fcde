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

Performance notes (round 3 rewrite). At production shapes (seq 312-1248,
head_dim 72) attention is softmax-VPU- and HBM-bound, not MXU-bound, so:
- head_dim stays NATIVE in HBM (72, not zero-padded 128: -44% q/k/v/o bytes)
- every matmul takes the inputs' dtype (bf16 in training) with fp32 accum —
  the earlier backward cast inputs to fp32 first, running the MXU ~8x slower
- the softmax scale is folded into q and exponentials run as exp2 (the VPU's
  native base): zero per-element multiplies on the (Lq, Lk) tile
- a forward-only direct-softmax path holds the whole kv range in VMEM (up to
  1536 keys), processes several (b, h) pairs per grid step via fori_loop
  (per-step overhead would dominate one-pair steps), and — when the caller
  passes no mask — corrects for the zero-padded tail keys analytically on
  the row sums (O(Lq)) instead of an elementwise where (O(Lq·Lk))
- block sizes adapt with divisor-friendly picks (seq 624 pads to 624, not
  to 2x512)

Layout: q/k/v (B, H, L, D). L is padded to the block size; padded keys are
masked (or sum-corrected). Grid (B*H, nq, nk) with the kv loop innermost.
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
_LOG2E = 1.4426950408889634   # log2(e): exp(x) == exp2(x * _LOG2E)
_LN2 = 0.6931471805599453
# VMEM-safe caps; lq/lk smaller than the cap collapse to a single block
_BLOCK_Q_CAP = 512
_BLOCK_K_CAP = 512
_BLOCK_Q_BWD_CAP = 256
_BLOCK_K_BWD_CAP = 256
# forward-only (no lse) direct-softmax path: whole kv range in VMEM up to
# this many keys
_FAST_LK_CAP = 1536
import os as _os
_FAST_VMEM_BUDGET = int(_os.environ.get("MAA3_FLASH_VMEM_BUDGET",
                                        10 << 20))


def _scale_q(q, scale):
    # fold softmax scale AND the exp->exp2 base change into q: the (l, d)
    # multiply replaces two (Lq, Lk) per-element passes downstream
    return (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)


def _fwd_single_kernel(*refs, scale: float, g: int, masked: bool,
                       n_pad: int):
    """Whole kv range in one block: direct (not online) softmax over `g`
    (b, h) pairs per grid step via fori_loop (buffer-reusing, small code).

    masked=False requires zero-padded tail keys only (no user mask): their
    scores are exactly 0 (k rows are zeros), so m >= 0 and each contributes
    exp2(-m) to the row sum — subtracted analytically, O(Lq) not O(Lq*Lk)."""
    if masked:
        mask_ref, q_ref, k_ref, v_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs

    def body(gi, _):
        q = _scale_q(q_ref[gi], scale)        # (bq, d)
        k = k_ref[gi]                         # (lk, d)
        v = v_ref[gi]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if masked:
            valid = mask_ref[gi] > 0          # (1, lk), broadcasts over rows
            s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        if not masked and n_pad:
            l = l - n_pad * jnp.exp2(-m)
        l = jnp.maximum(l, 1e-30)
        acc = jax.lax.dot_general(p.astype(v.dtype), v,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[gi] = (acc / l).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, g, body, 0, unroll=(g <= 2))


def _fwd_body(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
              acc_ref, m_ref, l_ref, *, scale: float, nk: int):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = _scale_q(q_ref[0], scale)     # (bq, d)
    k = k_ref[0]                      # (bk, d)
    v = v_ref[0]                      # (bk, d)
    # base-2 domain throughout; lse converts to natural log at finalize
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    valid = mask_ref[0, 0] > 0        # (bk,) int32 -> bool
    s = jnp.where(valid[None, :], s, NEG_INF)

    m_prev = m_ref[...]               # (bq, 1)
    l_prev = l_ref[...]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)           # (bq, bk)
    alpha = jnp.exp2(m_prev - m_new)
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
            # natural-log log-sum-exp per query row: the bwd kernels
            # reconstruct p = exp2((s2 - lse*log2e)) blockwise from this
            lse_ref[0, 0] = ((m_ref[...] + jnp.log2(denom)) * _LN2)[:, 0]


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

    qs = _scale_q(q_ref[0], scale)        # (bq, d), scaled by scale*log2e
    do = do_ref[0]                        # (bq, d)
    k = k_ref[0]                          # (bk, d)
    v = v_ref[0]                          # (bk, d)
    s2 = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    valid = mask_ref[0, 0] > 0
    p = jnp.exp2(s2 - (lse_ref[0, 0] * _LOG2E)[:, None])   # (bq, bk)
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
    # ds^T qs accumulates ds^T q * (scale*log2e); * ln2 restores ds^T q * scale
    dk_acc[...] += jax.lax.dot_general(               # ds^T q -> (bk, d)
        ds, qs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * _LN2

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

    qs = _scale_q(q_ref[0], scale)
    do = do_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s2 = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    valid = mask_ref[0, 0] > 0
    p = jnp.exp2(s2 - (lse_ref[0, 0] * _LOG2E)[:, None])
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
        # the no-mask fast path corrects padded tails analytically; the
        # bwd/multi-block paths still need the explicit all-ones mask
        return _flash_core(q, k, v, None, scale, block_q, block_k, interpret)
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
    if mask is None:
        mask = jnp.ones((q.shape[0], k.shape[2]), jnp.int32)
        dmask = None
    else:
        # integer mask: cotangent must be float0 (no gradient flows to it)
        dmask = np.zeros(mask.shape, jax.dtypes.float0)
    dq, dk, dv = _flash_pallas_bwd(q, k, v, mask, o, lse, g, scale,
                                   block_q, block_k, interpret)
    return dq, dk, dv, dmask


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


def _pick_group(bh: int, lk_pad: int, block_q: int, d: int) -> int:
    """(b, h) pairs per grid step for the short-seq fast path: amortizes the
    per-grid-step overhead, which dominates when each step's dots are tiny
    (e.g. seq 312: one (320,72)x(72,320) matmul is ~0.2 us of MXU time).
    Largest power of two (<=8) dividing bh that fits the VMEM budget:
    double-buffered lane-padded q/k/v/o blocks + one set of fori-local
    (block_q, lk_pad) fp32 temps."""
    d_lanes = _round_up(d, 128)
    per_pair = 2 * (2 * lk_pad + 2 * block_q) * d_lanes * 2  # dbl-buf, bf16
    temps = 3 * block_q * lk_pad * 4
    g = 1
    while (g * 2 <= 8 and bh % (g * 2) == 0
           and per_pair * g * 2 + temps <= _FAST_VMEM_BUDGET):
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


def _flash_pallas(q: Array, k: Array, v: Array, mask: Optional[Array],
                  scale: float, block_q: Optional[int],
                  block_k: Optional[int], interpret: bool, with_lse: bool):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if (block_k is None and not with_lse
            and _round_up(lk, 16) <= _FAST_LK_CAP):
        block_k = _round_up(lk, 16)   # force nk == 1 -> direct-softmax path
    cap_q = _BLOCK_Q_CAP if _round_up(lk, 16) <= 768 else 256
    block_q, block_k, lq_pad, lk_pad = _resolve_blocks(
        lq, lk, block_q, block_k, cap_q, _BLOCK_K_CAP)

    qp = _pad_l(q, lq_pad)
    kp = _pad_l(k, lk_pad)
    vp = _pad_l(v, lk_pad)

    nq = lq_pad // block_q
    nk = lk_pad // block_k

    if nk == 1 and not with_lse:
        # short-seq fast path: direct softmax, no scratch, grouped 2-D grid
        grp = _pick_group(b * h, lk_pad, block_q, d)
        masked = mask is not None
        kernel = functools.partial(_fwd_single_kernel, scale=scale, g=grp,
                                   masked=masked, n_pad=lk_pad - lk)
        in_specs = [
            pl.BlockSpec((grp, block_q, d), lambda g, i: (g, i, 0)),
            pl.BlockSpec((grp, lk_pad, d), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((grp, lk_pad, d), lambda g, i: (g, 0, 0)),
        ]
        operands = [qp, kp, vp]
        if masked:
            in_specs.insert(0, pl.BlockSpec((grp, 1, lk_pad),
                                            lambda g, i: (g, 0, 0)))
            operands.insert(0, _pad_mask(mask, b, h, lk_pad))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype),
            grid=(b * h // grp, nq),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((grp, block_q, d), lambda g, i: (g, i, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(*operands)
        return out.reshape(b, h, lq_pad, d)[:, :, :lq, :], None

    if mask is None:
        mask = jnp.ones((b, lk), jnp.int32)
    maskp = _pad_mask(mask, b, h, lk_pad)

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
    # re-pad to this pass's lq_pad if they differ (padded rows have zero do,
    # so they contribute nothing to dk/dv and their dq rows are sliced away)
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
