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

Performance notes (round 3). At production shapes (seq 312-2048, head_dim
64/72) one (block_q, d)x(d, block_k) dot is well under a microsecond of MXU
time, so a grid that gives each (b, h) pair its own step is per-step-
overhead-bound (measured 8% MFU at seq 2048 before the rewrite). Every
kernel therefore processes a GROUP of g (b, h) pairs per grid step via an
in-kernel fori_loop, sized to a VMEM budget. Further:
- head_dim stays NATIVE in HBM (72, not zero-padded 128: -44% q/k/v/o bytes)
- every matmul takes the inputs' dtype (bf16 in training) with fp32 accum
- the softmax scale is folded into q and exponentials run as exp2 (the VPU's
  native base): zero per-element multiplies on the (Lq, Lk) tile
- a direct-softmax path holds the whole kv range in VMEM (up to 1536 keys):
  one pass, no online rescaling; it also serves the TRAINING forward by
  emitting the per-row log-sum-exp. When the caller passes no mask it
  corrects for the zero-padded tail keys analytically on the row sums
  (O(Lq)) instead of an elementwise where (O(Lq·Lk))
- the backward is a FUSED single pass by default: one score + do·v^T
  computation feeds dv, dk and dq (the split two-kernel form recomputes
  both and streams q/do/k/v twice), with dq accumulated in a full-length
  fp32 output block; splits only when that block would blow VMEM
- block sizes adapt with divisor-friendly picks (seq 624 pads to 624, not
  to 2x512); lse/delta ride in (BH, L, 1) layout so their blocks are always
  Mosaic-legal at any 16-aligned block_q

Layout: q/k/v (B, H, L, D). L is padded to the block size; padded keys are
masked (or sum-corrected). Grids put the contraction loop innermost.
"""

from __future__ import annotations

import functools
import math
import os as _os
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
# (env overrides exist for the block-size tuning probes only)
_BLOCK_Q_CAP = int(_os.environ.get("MAA3_FLASH_BQ_CAP", 512))
_BLOCK_K_CAP = int(_os.environ.get("MAA3_FLASH_BK_CAP", 512))
_BLOCK_Q_BWD_CAP = int(_os.environ.get("MAA3_FLASH_BQ_BWD_CAP", 256))
_BLOCK_K_BWD_CAP = int(_os.environ.get("MAA3_FLASH_BK_BWD_CAP", 512))
# direct-softmax path: whole kv range in VMEM up to this many keys
_FAST_LK_CAP = 1536
_VMEM_BUDGET = int(_os.environ.get("MAA3_FLASH_VMEM_BUDGET", 10 << 20))


def _scale_q(q, scale):
    # fold softmax scale AND the exp->exp2 base change into q: the (l, d)
    # multiply replaces two (Lq, Lk) per-element passes downstream
    return (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)


# ---------------------------------------------------------------------------
# Forward kernels
# ---------------------------------------------------------------------------

def _fwd_single_kernel(*refs, scale: float, g: int, masked: bool,
                       n_pad: int, with_lse: bool):
    """Whole kv range in one block: direct (not online) softmax over `g`
    (b, h) pairs per grid step via fori_loop (buffer-reusing, small code).

    masked=False requires zero-padded tail keys only (no user mask): their
    scores are exactly 0 (k rows are zeros), so m >= 0 and each contributes
    exp2(-m) to the row sum — subtracted analytically, O(Lq) not O(Lq*Lk)."""
    refs = list(refs)
    mask_ref = refs.pop(0) if masked else None
    q_ref, k_ref, v_ref, o_ref = refs[:4]
    lse_ref = refs[4] if with_lse else None

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
        if with_lse:
            # natural-log log-sum-exp per query row, (bq, 1)
            lse_ref[gi] = (m + jnp.log2(l)) * _LN2
        return 0

    jax.lax.fori_loop(0, g, body, 0, unroll=(g <= 2))


def _fwd_online_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                       acc_ref, m_ref, l_ref, *, scale: float, nk: int,
                       g: int, with_lse: bool):
    """Online-softmax forward for kv ranges too long for the direct path.
    Grid (BH/g, nq, nk), kv innermost; state scratch is (g, bq, ...)."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    def body(gi, _):
        q = _scale_q(q_ref[gi], scale)    # (bq, d)
        k = k_ref[gi]                     # (bk, d)
        v = v_ref[gi]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        valid = mask_ref[gi] > 0          # (1, bk)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[gi]                # (bq, 1)
        l_prev = l_ref[gi]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)           # (bq, bk)
        alpha = jnp.exp2(m_prev - m_new)
        l_ref[gi] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[gi] = acc_ref[gi] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[gi] = m_new
        return 0

    jax.lax.fori_loop(0, g, body, 0, unroll=(g <= 2))

    @pl.when(kb == nk - 1)
    def _finalize():
        def fin(gi, _):
            denom = jnp.maximum(l_ref[gi], 1e-30)
            o_ref[gi] = (acc_ref[gi] / denom).astype(o_ref.dtype)
            if with_lse:
                lse_ref[gi] = (m_ref[gi] + jnp.log2(denom)) * _LN2
            return 0
        jax.lax.fori_loop(0, g, fin, 0, unroll=(g <= 2))


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(mask_ref, lse_ref, delta_ref, q_ref, do_ref,
                    k_ref, v_ref, dk_ref, dv_ref,
                    dk_acc, dv_acc, *, scale: float, nq: int, g: int):
    """Grid (BH/g, nk, nq); the q loop is the innermost grid dim.
    dv = p^T do;  dk = (p * (do v^T - delta))^T q * scale.
    All dots run in the inputs' dtype (bf16 in training) with fp32 accum."""
    ib = pl.program_id(2)

    @pl.when(ib == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def body(gi, _):
        qs = _scale_q(q_ref[gi], scale)   # (bq, d), scaled by scale*log2e
        do = do_ref[gi]                   # (bq, d)
        k = k_ref[gi]                     # (bk, d)
        v = v_ref[gi]
        s2 = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        valid = mask_ref[gi] > 0          # (1, bk)
        p = jnp.exp2(s2 - lse_ref[gi] * _LOG2E)   # lse (bq, 1) broadcasts
        # explicit zeroing: for a fully-masked query row lse underflows to
        # ~NEG_INF and exp(s - lse) would be 1 at every masked key — the
        # forward's rescaling hides this, the backward must mask explicitly
        p = jnp.where(valid, p, 0.0)

        # dv uses p quantized to v.dtype — exactly the p the forward's value
        # matmul consumed; the delta-trick term below keeps unquantized p
        # (the standard flash backward, same approximation as the CUDA
        # flash-attn kernels: O(bf16 eps) on ds, asserted within tolerance
        # by the bf16 case of test_flash_gradients_match_dense)
        pq = p.astype(v_ref.dtype)
        dv_acc[gi] += jax.lax.dot_general(            # pq^T do -> (bk, d)
            pq, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(                     # do v^T -> (bq, bk)
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - delta_ref[gi])).astype(q_ref.dtype)
        # ds^T qs gives ds^T q * (scale*log2e); * ln2 restores ds^T q * scale
        dk_acc[gi] += jax.lax.dot_general(            # ds^T q -> (bk, d)
            ds, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * _LN2
        return 0

    jax.lax.fori_loop(0, g, body, 0, unroll=(g <= 2))

    @pl.when(ib == nq - 1)
    def _finalize():
        dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_fused_kernel(*refs, scale: float, nq: int, g: int, block_q: int,
                      masked: bool):
    """Single-pass backward: grid (BH/g, nk, nq), q innermost. ONE
    score + dp computation feeds dv, dk AND dq — the split kernels above
    each recompute both (7 (bq,bk)-sized matmuls per block pair vs 5 here)
    and stream q/do/k/v from HBM twice. Accumulation strategy:
    - dk/dv: fp32 OUTPUT blocks indexed by j only — for a fixed (gb, j)
      all i-steps are contiguous in grid order, so the block stays resident
      in VMEM across the accumulation and is flushed once
    - dq: a full-length fp32 output block whose index map is constant per
      gb (every step of the group maps to it); each (j, i) step adds its
      ds·k contribution at the dynamic row offset i*block_q
    Outputs are fp32 and cast to the input dtypes outside (XLA fuses).

    masked=False (the TRAINING shape: callers pass no key mask) drops the
    mask operand + per-tile where entirely — correct with zero-padded k/v:
    padded keys see s=0 so p=exp2(-lse)>0, but their dq term is ds @ k_pad
    = 0 (k rows are zeros) and their dk/dv rows are sliced away by the
    wrapper; padded QUERY rows carry do=0 so they add nothing to dk/dv.
    This also frees block_k from the mask-row 128-multiple constraint
    (seq 1248: bk 208x6 exact instead of 256x5 padded to 1280)."""
    refs = list(refs)
    mask_ref = refs.pop(0) if masked else None
    (lse_ref, delta_ref, q_ref, do_ref, k_ref, v_ref,
     dq_ref, dk_ref, dv_ref) = refs
    jb = pl.program_id(1)
    ib = pl.program_id(2)

    @pl.when((jb == 0) & (ib == 0))
    def _init_dq():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    @pl.when(ib == 0)
    def _init_dkv():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    def body(gi, _):
        qs = _scale_q(q_ref[gi], scale)   # (bq, d), scaled by scale*log2e
        do = do_ref[gi]                   # (bq, d)
        k = k_ref[gi]                     # (bk, d)
        v = v_ref[gi]
        s2 = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if masked:
            p = jnp.exp2(s2 - lse_ref[gi] * _LOG2E)
            valid = mask_ref[gi] > 0      # (1, bk)
            p = jnp.where(valid, p, 0.0)  # see dkv kernel comment
        else:
            # padded keys see s2=0, so their exponent is -lse*log2e; if every
            # valid score in a row were < ~-88 nats, lse < -88 and p would
            # overflow to inf, making dq = inf*0 = NaN (the masked path zeroes
            # those keys instead). Clamp the exponent: valid entries sit at
            # <= ~0, so 120 only caps the pathological pad-key case.
            p = jnp.exp2(jnp.minimum(s2 - lse_ref[gi] * _LOG2E, 120.0))
        pq = p.astype(v_ref.dtype)
        dv_ref[gi] += jax.lax.dot_general(            # pq^T do -> (bk, d)
            pq, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(                     # do v^T -> (bq, bk)
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - delta_ref[gi])).astype(q_ref.dtype)
        dk_ref[gi] += jax.lax.dot_general(            # ds^T q -> (bk, d)
            ds, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * _LN2
        row = pl.ds(ib * block_q, block_q)
        dq_ref[gi, row, :] += jax.lax.dot_general(    # ds k -> (bq, d)
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        return 0

    jax.lax.fori_loop(0, g, body, 0, unroll=(g <= 2))


def _bwd_dq_kernel(mask_ref, lse_ref, delta_ref, q_ref, do_ref,
                   k_ref, v_ref, dq_ref, dq_acc,
                   *, scale: float, nk: int, g: int):
    """Grid (BH/g, nq, nk); the kv loop is the innermost grid dim.
    dq = (p * (do v^T - delta)) k * scale."""
    jb = pl.program_id(2)

    @pl.when(jb == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    def body(gi, _):
        qs = _scale_q(q_ref[gi], scale)
        do = do_ref[gi]
        k = k_ref[gi]
        v = v_ref[gi]
        s2 = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        valid = mask_ref[gi] > 0
        p = jnp.exp2(s2 - lse_ref[gi] * _LOG2E)
        p = jnp.where(valid, p, 0.0)      # see dkv kernel comment
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - delta_ref[gi])).astype(q_ref.dtype)
        dq_acc[gi] += jax.lax.dot_general(            # ds k -> (bq, d)
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        return 0

    jax.lax.fori_loop(0, g, body, 0, unroll=(g <= 2))

    @pl.when(jb == nk - 1)
    def _finalize():
        dq_ref[...] = dq_acc[...].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# Public entry + custom VJP
# ---------------------------------------------------------------------------

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
    (output + per-row log-sum-exp) and recomputes probabilities blockwise —
    by default in ONE fused Pallas backward kernel feeding dq/dk/dv from a
    single score computation (split two-pass form kept as the long-Lq
    fallback and via MAA3_FLASH_BWD=split)."""
    if interpret is None:
        # no TPU: run the kernel in interpreter mode so the flash path stays
        # testable (and functional) on CPU hosts
        interpret = jax.default_backend() == "cpu"
    scale = scale if scale is not None else 1.0 / math.sqrt(q.shape[3])
    if mask is None:
        # the no-mask fast path corrects padded tails analytically; the
        # bwd/online paths still need the explicit all-ones mask
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
    # integer mask: cotangent must be float0 (no gradient flows to it);
    # mask=None stays None — the backward kernels have maskless variants
    # (correct with zero-padded k/v, and free of the 128-multiple mask-row
    # block constraint: the TRAINING fast path)
    dmask = (None if mask is None
             else np.zeros(mask.shape, jax.dtypes.float0))
    dq, dk, dv = _flash_pallas_bwd(q, k, v, mask, o, lse, g, scale,
                                   block_q, block_k, interpret)
    return dq, dk, dv, dmask


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ---------------------------------------------------------------------------
# Block / group sizing and padding helpers
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(l: int, cap: int, row: bool = False) -> int:
    """Block size <= cap with minimal padding of l (larger block on ties).

    A naive min(cap, l) forces round_up(l, cap) padding — e.g. seq 624 with
    cap 512 would pad to 1024 (+64% wasted FLOPs); this picks 208 (0 pad).

    row=True: the block also indexes a (1, 1, L) row operand (the key mask)
    whose BlockSpec last dim Mosaic only accepts as a multiple of 128 — or
    as the WHOLE padded length (single block). So: whole-sequence block if
    it fits the cap, else multiples of 128 only. (q-side blocks never carry
    row operands — lse/delta ride as (bq, 1) columns — so they keep the full
    16-grain freedom.)"""
    l16 = _round_up(l, 16)
    if l16 <= cap:
        return l16
    step = 128 if row else 16
    lo = 128 if row else 64
    best_b, best_pad = None, None
    for b in range(cap - cap % step, lo - 1, -step):
        pad = _round_up(l, b)
        if best_pad is None or pad < best_pad:
            best_b, best_pad = b, pad
    return best_b


def _resolve_blocks(lq: int, lk: int, block_q: Optional[int],
                    block_k: Optional[int], cap_q: int, cap_k: int,
                    row_k: bool = False):
    """Pick block sizes (sublane-aligned, capped) and the padded lengths."""
    bq = block_q if block_q else _pick_block(lq, cap_q)
    bk = block_k if block_k else _pick_block(lk, cap_k, row_k)
    return bq, bk, _round_up(lq, bq), _round_up(lk, bk)


def _pick_group(bh: int, block_q: int, block_k: int, d: int,
                n_bq_bufs: int, n_bk_bufs: int, n_temps: int,
                n_acc_bk: int = 0, n_acc_bq: int = 0) -> int:
    """(b, h) pairs per grid step: amortizes the per-grid-step overhead,
    which dominates when each step's dots are tiny (e.g. seq 312: one
    (320,72)x(72,320) matmul is ~0.2 us of MXU time; measured 8% MFU at
    seq 2048 with one pair per step). Largest power of two (<=16) dividing
    bh that fits the VMEM budget: double-buffered lane-padded in/out blocks
    plus fp32 accumulator scratch and fori-local (block_q, block_k) temps."""
    d_lanes = _round_up(d, 128)
    per_pair = 2 * (n_bq_bufs * block_q + n_bk_bufs * block_k) * d_lanes * 2
    per_pair += 4 * d_lanes * (n_acc_bk * block_k + n_acc_bq * block_q)
    temps = n_temps * block_q * block_k * 4
    g = 1
    while (g * 2 <= 16 and bh % (g * 2) == 0
           and (per_pair * g * 2 + temps) <= _VMEM_BUDGET):
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


# ---------------------------------------------------------------------------
# Pallas drivers
# ---------------------------------------------------------------------------

def _flash_pallas(q: Array, k: Array, v: Array, mask: Optional[Array],
                  scale: float, block_q: Optional[int],
                  block_k: Optional[int], interpret: bool, with_lse: bool):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    fast = block_k is None and _round_up(lk, 16) <= _FAST_LK_CAP
    if fast:
        block_k = _round_up(lk, 16)   # force nk == 1 -> direct-softmax path
    cap_q = _BLOCK_Q_CAP if _round_up(lk, 16) <= 768 else 256
    # outside the fast path the kernels carry a (1, 1, L) mask row operand,
    # whose blocks Mosaic only accepts at 128-multiples
    block_q, block_k, lq_pad, lk_pad = _resolve_blocks(
        lq, lk, block_q, block_k, cap_q, _BLOCK_K_CAP, row_k=not fast)

    qp = _pad_l(q, lq_pad)
    kp = _pad_l(k, lk_pad)
    vp = _pad_l(v, lk_pad)

    nq = lq_pad // block_q
    nk = lk_pad // block_k

    if nk == 1 and fast:
        # direct-softmax path: whole kv range per step, no online rescaling
        masked = mask is not None
        grp = _pick_group(b * h, block_q, lk_pad, d,
                          n_bq_bufs=2 + int(with_lse), n_bk_bufs=2,
                          n_temps=3)
        kernel = functools.partial(_fwd_single_kernel, scale=scale, g=grp,
                                   masked=masked, n_pad=lk_pad - lk,
                                   with_lse=with_lse)
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
        out_shape = [jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype)]
        out_specs = [pl.BlockSpec((grp, block_q, d), lambda g, i: (g, i, 0))]
        if with_lse:
            out_shape.append(
                jax.ShapeDtypeStruct((b * h, lq_pad, 1), jnp.float32))
            out_specs.append(
                pl.BlockSpec((grp, block_q, 1), lambda g, i: (g, i, 0)))
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(b * h // grp, nq),
            in_specs=in_specs,
            out_specs=out_specs,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(*operands)
        out = outs[0].reshape(b, h, lq_pad, d)[:, :, :lq, :]
        return out, (outs[1] if with_lse else None)

    if mask is None:
        mask = jnp.ones((b, lk), jnp.int32)
    maskp = _pad_mask(mask, b, h, lk_pad)

    grp = _pick_group(b * h, block_q, block_k, d,
                      n_bq_bufs=2 + int(with_lse), n_bk_bufs=2, n_temps=2,
                      n_acc_bq=1)
    kernel = functools.partial(_fwd_online_kernel, scale=scale, nk=nk,
                               g=grp, with_lse=with_lse)
    out_shape = [jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype)]
    out_specs = [pl.BlockSpec((grp, block_q, d), lambda gb, i, j: (gb, i, 0))]
    if with_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((b * h, lq_pad, 1), jnp.float32))
        out_specs.append(
            pl.BlockSpec((grp, block_q, 1), lambda gb, i, j: (gb, i, 0)))
    else:
        out_shape.append(
            jax.ShapeDtypeStruct((1, 1, 1), jnp.float32))  # placeholder
        out_specs.append(
            pl.BlockSpec((1, 1, 1), lambda gb, i, j: (0, 0, 0)))

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(b * h // grp, nq, nk),
        in_specs=[
            pl.BlockSpec((grp, 1, block_k), lambda gb, i, j: (gb, 0, j)),
            pl.BlockSpec((grp, block_q, d), lambda gb, i, j: (gb, i, 0)),
            pl.BlockSpec((grp, block_k, d), lambda gb, i, j: (gb, j, 0)),
            pl.BlockSpec((grp, block_k, d), lambda gb, i, j: (gb, j, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((grp, block_q, d), jnp.float32),
            pltpu.VMEM((grp, block_q, 1), jnp.float32),
            pltpu.VMEM((grp, block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(maskp, qp, kp, vp)

    out = outs[0].reshape(b, h, lq_pad, d)[:, :, :lq, :]
    lse = outs[1] if with_lse else None  # (BH, lq_pad, 1) — bwd-only
    return out, lse


def _flash_pallas_bwd(q, k, v, mask, o, lse, g, scale: float,
                      block_q: Optional[int], block_k: Optional[int],
                      interpret: bool):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    masked = mask is not None
    block_q, block_k, lq_pad, lk_pad = _resolve_blocks(
        lq, lk, block_q, block_k, _BLOCK_Q_BWD_CAP, _BLOCK_K_BWD_CAP,
        row_k=masked)
    # lse was produced with the FWD block size — it is dense (BH, lq_fwd, 1);
    # re-pad to this pass's lq_pad if they differ (padded rows have zero do,
    # so they contribute nothing to dk/dv and their dq rows are sliced away)
    lq_fwd = lse.shape[1]
    if lq_fwd < lq_pad:
        lse = jnp.pad(lse, ((0, 0), (0, lq_pad - lq_fwd), (0, 0)))
    elif lq_fwd > lq_pad:
        lse = lse[:, :lq_pad, :]

    qp = _pad_l(q, lq_pad)
    kp = _pad_l(k, lk_pad)
    vp = _pad_l(v, lk_pad)
    dop = _pad_l(g, lq_pad)
    maskp = _pad_mask(mask, b, h, lk_pad) if masked else None

    # delta_i = rowsum(do_i * o_i) — the softmax-Jacobian mean term; cheap
    # elementwise XLA, padded rows contribute 0 (do is zero-padded)
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, lq_pad - lq))).reshape(
        b * h, lq_pad, 1)

    nq = lq_pad // block_q
    nk = lk_pad // block_k

    # fused single-pass backward (default): one score/dp computation feeds
    # dq, dk and dv. Falls back to the split two-pass kernels only when the
    # full-length fp32 dq block would blow the VMEM budget (very long Lq),
    # or when forced via MAA3_FLASH_BWD=split (A/B probes).
    mode = _os.environ.get("MAA3_FLASH_BWD", "auto")
    grp_f = 0
    if mode != "split":
        d_lanes = _round_up(d, 128)
        isz = jnp.dtype(q.dtype).itemsize
        temps = 4 * 3 * block_q * block_k          # s2/p, dp, ds (fp32-ish)
        per_pair = (2 * isz * (2 * block_q + 2 * block_k) * d_lanes  # q,do,k,v
                    + 2 * 4 * 2 * block_k * d_lanes   # dk, dv fp32 out blocks
                    + 4 * lq_pad * d_lanes            # full-length fp32 dq
                    + 3 * 4 * 2 * block_q)            # lse/delta columns
        if per_pair + temps <= _VMEM_BUDGET or mode == "fused":
            grp_f = 1
            while (grp_f * 2 <= 16 and (b * h) % (grp_f * 2) == 0
                   and per_pair * grp_f * 2 + temps <= _VMEM_BUDGET):
                grp_f *= 2
    if grp_f:
        in_specs = [  # [mask,] lse, delta, q, do, k, v
            pl.BlockSpec((grp_f, block_q, 1), lambda gb, j, i: (gb, i, 0)),
            pl.BlockSpec((grp_f, block_q, 1), lambda gb, j, i: (gb, i, 0)),
            pl.BlockSpec((grp_f, block_q, d), lambda gb, j, i: (gb, i, 0)),
            pl.BlockSpec((grp_f, block_q, d), lambda gb, j, i: (gb, i, 0)),
            pl.BlockSpec((grp_f, block_k, d), lambda gb, j, i: (gb, j, 0)),
            pl.BlockSpec((grp_f, block_k, d), lambda gb, j, i: (gb, j, 0)),
        ]
        operands = [lse, delta, qp, dop, kp, vp]
        if masked:
            in_specs.insert(0, pl.BlockSpec((grp_f, 1, block_k),
                                            lambda gb, j, i: (gb, 0, j)))
            operands.insert(0, maskp)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, scale=scale, nq=nq,
                              g=grp_f, block_q=block_q, masked=masked),
            out_shape=[jax.ShapeDtypeStruct((b * h, lq_pad, d), jnp.float32),
                       jax.ShapeDtypeStruct((b * h, lk_pad, d), jnp.float32),
                       jax.ShapeDtypeStruct((b * h, lk_pad, d), jnp.float32)],
            grid=(b * h // grp_f, nk, nq),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((grp_f, lq_pad, d), lambda gb, j, i: (gb, 0, 0)),
                pl.BlockSpec((grp_f, block_k, d), lambda gb, j, i: (gb, j, 0)),
                pl.BlockSpec((grp_f, block_k, d), lambda gb, j, i: (gb, j, 0)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
            interpret=interpret,
        )(*operands)
        dq = dq.reshape(b, h, lq_pad, d)[:, :, :lq, :].astype(q.dtype)
        dk = dk.reshape(b, h, lk_pad, d)[:, :, :lk, :].astype(k.dtype)
        dv = dv.reshape(b, h, lk_pad, d)[:, :, :lk, :].astype(v.dtype)
        return dq, dk, dv

    if not masked:
        # split fallback keeps the mask-carrying kernels (and their 128-
        # multiple key blocks): re-enter with an explicit all-ones mask
        return _flash_pallas_bwd(q, k, v, jnp.ones((b, lk), jnp.int32),
                                 o, lse, g, scale, block_q, block_k,
                                 interpret)

    grp = _pick_group(b * h, block_q, block_k, d,
                      n_bq_bufs=3, n_bk_bufs=4, n_temps=4, n_acc_bk=2)
    specs = {  # shared BlockSpec shapes; index maps differ per kernel
        "mask": (grp, 1, block_k), "col_q": (grp, block_q, 1),
        "bq": (grp, block_q, d), "bk": (grp, block_k, d)}

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, nq=nq, g=grp),
        out_shape=[jax.ShapeDtypeStruct((b * h, lk_pad, d), k.dtype),
                   jax.ShapeDtypeStruct((b * h, lk_pad, d), v.dtype)],
        grid=(b * h // grp, nk, nq),
        in_specs=[  # mask, lse, delta, q, do, k, v
            pl.BlockSpec(specs["mask"], lambda gb, j, i: (gb, 0, j)),
            pl.BlockSpec(specs["col_q"], lambda gb, j, i: (gb, i, 0)),
            pl.BlockSpec(specs["col_q"], lambda gb, j, i: (gb, i, 0)),
            pl.BlockSpec(specs["bq"], lambda gb, j, i: (gb, i, 0)),
            pl.BlockSpec(specs["bq"], lambda gb, j, i: (gb, i, 0)),
            pl.BlockSpec(specs["bk"], lambda gb, j, i: (gb, j, 0)),
            pl.BlockSpec(specs["bk"], lambda gb, j, i: (gb, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec(specs["bk"], lambda gb, j, i: (gb, j, 0)),
            pl.BlockSpec(specs["bk"], lambda gb, j, i: (gb, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((grp, block_k, d), jnp.float32),
            pltpu.VMEM((grp, block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(maskp, lse, delta, qp, dop, kp, vp)

    grp_q = _pick_group(b * h, block_q, block_k, d,
                        n_bq_bufs=4, n_bk_bufs=2, n_temps=4, n_acc_bq=1)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, nk=nk, g=grp_q),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype),
        grid=(b * h // grp_q, nq, nk),
        in_specs=[
            pl.BlockSpec((grp_q, 1, block_k), lambda gb, i, j: (gb, 0, j)),
            pl.BlockSpec((grp_q, block_q, 1), lambda gb, i, j: (gb, i, 0)),
            pl.BlockSpec((grp_q, block_q, 1), lambda gb, i, j: (gb, i, 0)),
            pl.BlockSpec((grp_q, block_q, d), lambda gb, i, j: (gb, i, 0)),
            pl.BlockSpec((grp_q, block_q, d), lambda gb, i, j: (gb, i, 0)),
            pl.BlockSpec((grp_q, block_k, d), lambda gb, i, j: (gb, j, 0)),
            pl.BlockSpec((grp_q, block_k, d), lambda gb, i, j: (gb, j, 0)),
        ],
        out_specs=pl.BlockSpec((grp_q, block_q, d),
                               lambda gb, i, j: (gb, i, 0)),
        scratch_shapes=[pltpu.VMEM((grp_q, block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(maskp, lse, delta, qp, dop, kp, vp)

    dq = dq.reshape(b, h, lq_pad, d)[:, :, :lq, :]
    dk = dk.reshape(b, h, lk_pad, d)[:, :, :lk, :]
    dv = dv.reshape(b, h, lk_pad, d)[:, :, :lk, :]
    return dq, dk, dv
