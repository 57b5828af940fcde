"""Pallas TPU kernel: fused [anti-aliased snake -> dilated Conv1d] for the
late BigVGAN stages.

Reference semantics: vocoder/bigvgan/models.py:60-75 — every AMPBlock conv is
preceded by an anti-aliased Snake activation (Activation1d), and the conv is
a zero-padded dilated C->C Conv1d. On the late stages (C <= 96, T up to 160k)
two separate problems cap throughput:

- the activation's shifted-FIR intermediates round-trip HBM (see
  ops/pallas_aa_snake.py), and
- XLA lowers the C x C conv to MXU GEMMs with M=N=C, so at C=24 the 128x128
  systolic array runs at ~2-3 % utilization.

This kernel does act+conv in ONE pass per (batch, time-tile) block:

    HBM read (x tile + halos)
      up2x -> snake -> down2x (VPU, fp32; exact FusedActivation1d numerics)
      im2col: k sublane-stacked shifted copies -> (C*k, tile) in VMEM
      GEMM: W (C_out, C*k) @ (C*k, tile) on the MXU (K = C*k raises the
      contraction depth ~k-fold vs XLA's per-tap GEMMs) + bias
    HBM write (C_out, tile)

Replicate-pad (activation) and zero-pad (conv) edge semantics are applied
in-kernel by the first/last tiles, so the wrapper adds no extra HBM passes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maa3_tpu.ops.pallas_aa_snake import (_F_UP, _F_DN,
                                          pick_tile, snake_coeffs)
from maa3_tpu.ops.resample import sin2_poly, use_fast_sin2

Array = jax.Array

_HB = 128  # halo block width (lane-aligned)


def _kernel(a_ref, ib_ref, w_ref, b_ref, x_ref, lh_ref, rh_ref, out_ref,
            xin, se, so, col, *, tile: int, c_in: int, c_out: int, k: int,
            dil: int, t_total: int, acc_dtype, fast_sin2: bool = False):
    """One (c_out, tile) output block for batch element b, time tile i.

    a_ref/ib_ref: (c_in, 1) fp32 snake coefficients.
    w_ref: (c_out, k * c_in) conv weight, taps-major; b_ref: (c_out, 1).
    x_ref: (1, c_in, tile) input tile; lh/rh: (1, c_in, 128) halo views.
    xin: VMEM (c_in, tile + 2E + 10) == xpad[i*tile - E : ...], where E is
        the conv halo (k*dil - dil)//2 and xpad has the activation's
        replicate pad of 5.
    se/so: VMEM (c_in, tile + 2E + 5) fp32 snake(up) phases.
    col: VMEM (k * c_in, tile) im2col buffer in the GEMM input dtype.
    """
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    E = (k * dil - dil) // 2
    q = t_total - (-(-t_total // tile) - 1) * tile  # valid cols in last tile
    W = tile + 2 * E  # activation output width needed by the conv

    xin[:, 0:E + 5] = lh_ref[0, :, _HB - E - 5:]
    xin[:, E + 5:E + 5 + tile] = x_ref[0]
    xin[:, E + 5 + tile:] = rh_ref[0, :, 0:E + 5]

    # replicate pad of x at the global edges (activation's F.pad 'replicate')
    @pl.when(i == 0)
    def _xleft():
        xin[:, 0:E + 5] = jnp.broadcast_to(xin[:, E + 5:E + 6], (c_in, E + 5))

    @pl.when(i == n_tiles - 1)
    def _xright():
        s = q + E + 5
        xin[:, s:] = jnp.broadcast_to(xin[:, s - 1:s], (c_in, W + 10 - s))

    def xs(off):  # fp32 view, width W + 5
        return xin[:, off:off + W + 5].astype(jnp.float32)

    # --- polyphase 2x upsample (6-tap FIRs per parity) + snake -------------
    up_e = sum(_F_UP[j] * xs((15 - j) // 2 - 2) for j in range(1, 12, 2))
    up_o = sum(_F_UP[j] * xs((16 - j) // 2 - 3) for j in range(0, 12, 2))
    a = a_ref[:, 0:1]
    ib = ib_ref[:, 0:1]
    _s2 = sin2_poly if fast_sin2 else (lambda z: jnp.square(jnp.sin(z)))
    se[:] = up_e + ib * _s2(a * up_e)
    so[:] = up_o + ib * _s2(a * up_o)

    # --- s-domain replicate clamp at the global edges ----------------------
    # (local act index m maps to global act output g = i*tile - E - 2 + m
    # for se, -3 for so; clamp at g == 0 and g == t_total - 1)
    @pl.when(i == 0)
    def _sleft():
        first = se[:, E + 2:E + 3]              # global s_even[0]
        se[:, 0:E + 2] = jnp.broadcast_to(first, (c_in, E + 2))
        so[:, 0:E + 3] = jnp.broadcast_to(first, (c_in, E + 3))

    @pl.when(i == n_tiles - 1)
    def _sright():
        last = so[:, q + E + 2:q + E + 3]       # global s_odd[T-1]
        se[:, q + E + 2:] = jnp.broadcast_to(last, (c_in, W + 3 - q - E))
        so[:, q + E + 3:] = jnp.broadcast_to(last, (c_in, W + 2 - q - E))

    # --- 2x decimation -> activation output y_ext (c_in, W) ----------------
    y = sum(_F_DN[j] * se[:, (j - 5) // 2 + 2:(j - 5) // 2 + 2 + W]
            for j in range(1, 12, 2))
    y += sum(_F_DN[j] * so[:, (j - 6) // 2 + 3:(j - 6) // 2 + 3 + W]
             for j in range(0, 12, 2))

    yd = y.astype(acc_dtype)

    # build im2col: col[j*c_in + c, t] = y_ext[c, t + j*dil]; conv zero-pad
    # semantics (y outside global [0, T) contributes zero) via the edge fixes
    for j in range(k):
        col[j * c_in:(j + 1) * c_in, :] = yd[:, j * dil:j * dil + tile]

    @pl.when(i == 0)
    def _cleft():
        for j in range(k):
            w0 = E - j * dil  # cols with global y index < 0
            if w0 > 0:
                col[j * c_in:(j + 1) * c_in, 0:w0] = jnp.zeros(
                    (c_in, w0), acc_dtype)

    @pl.when(i == n_tiles - 1)
    def _cright():
        for j in range(k):
            s = q + E - j * dil  # first col with global y index >= T
            if s < tile:
                s = max(s, 0)
                col[j * c_in:(j + 1) * c_in, s:] = jnp.zeros(
                    (c_in, tile - s), acc_dtype)

    out = jax.lax.dot_general(
        w_ref[:], col[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0] = (out + b_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def conv_snake_fused(x: Array, alpha: Array, beta: Optional[Array],
                     w: Array, b: Array, *, k: int, dilation: int = 1,
                     logscale: bool = True, has_beta: bool = True,
                     tile: Optional[int] = None,
                     interpret: Optional[bool] = None,
                     fast_sin2: Optional[bool] = None) -> Array:
    # env/dtype routing resolved OUTSIDE the jit (see aa_snake_fused)
    if fast_sin2 is None:
        fast_sin2 = use_fast_sin2(x.dtype)
    if tile is None:
        # per-program time cap: bigger tiles -> fewer grid programs; the
        # VMEM budget below still bounds the actual pick
        import os
        tile = int(os.environ.get("MAA3_AMP_TILE", "8192"))
    return _conv_snake_fused(x, alpha, beta, w, b, k=k, dilation=dilation,
                             logscale=logscale, has_beta=has_beta, tile=tile,
                             interpret=interpret, fast_sin2=fast_sin2)


@functools.partial(jax.jit, static_argnames=(
    "k", "dilation", "logscale", "has_beta", "tile", "interpret",
    "fast_sin2"))
def _conv_snake_fused(x: Array, alpha: Array, beta: Optional[Array],
                      w: Array, b: Array, *, k: int, dilation: int = 1,
                      logscale: bool = True, has_beta: bool = True,
                      tile: int = 8192, interpret: Optional[bool] = None,
                      fast_sin2: bool = False) -> Array:
    """Fused Conv1d(Activation1d(snake[_beta])(x)) over (B, C, T).

    w: (C_out, C_in, k) torch-layout conv weight; b: (C_out,).
    Equivalent to conv1d({'w': w, 'b': b}, FusedActivation1d(snake_beta)(x),
    padding=(k*dilation - dilation)//2, dilation=dilation) — the AMPBlock1
    act->conv site (vocoder/bigvgan/models.py:60-75).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, C, T = x.shape
    c_out = w.shape[0]
    E = (k * dilation - dilation) // 2
    af, inv_b = snake_coeffs(alpha, beta, logscale, has_beta)

    acc_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    # taps-major weight: (C_out, k*C_in), row-block j holds tap j
    w2 = w.transpose(0, 2, 1).reshape(c_out, k * C).astype(acc_dtype)

    # VMEM budget: the im2col buffer is (k*C, tile) and the FIR scratches are
    # O(C*tile) fp32 — keep C*tile bounded so C=96/k=11 stages fit alongside
    # Mosaic's double-buffered in/out blocks
    import os
    budget = int(os.environ.get("MAA3_AMP_TILE_BUDGET", "98304"))
    tile = min(tile, max(128, (budget // C) // 128 * 128))
    tile = pick_tile(T, tile, min(E + 5, _HB))  # halo uses E+5 next-block cols
    n_tiles = -(-T // tile)
    hblk = tile // _HB
    last_blk = (T - 1) // _HB

    kern = functools.partial(_kernel, tile=tile, c_in=C, c_out=c_out, k=k,
                             dil=dilation, t_total=T, acc_dtype=acc_dtype,
                             fast_sin2=fast_sin2)
    W_ = tile + 2 * E
    out = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((C, 1), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out, k * C), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out, 1), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, tile), lambda bb, i: (bb, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, _HB),
                         lambda bb, i, h=hblk: (bb, 0, jnp.maximum(i * h - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, _HB),
                         lambda bb, i, h=hblk, lb=last_blk:
                         (bb, 0, jnp.minimum((i + 1) * h, lb)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_out, tile), lambda bb, i: (bb, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, c_out, T), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((C, W_ + 10), x.dtype),
            pltpu.VMEM((C, W_ + 5), jnp.float32),
            pltpu.VMEM((C, W_ + 5), jnp.float32),
            pltpu.VMEM((k * C, tile), acc_dtype),
        ],
        interpret=interpret,
    )(af[:, None], inv_b[:, None], w2, b.astype(jnp.float32)[:, None],
      x, x, x)
    return out
