"""Pallas TPU kernel: fused anti-aliased Snake activation for BigVGAN.

One HBM pass for the whole `2x sinc upsample -> snake -> 2x sinc downsample`
pipeline (reference: vocoder/bigvgan/alias_free_torch/act.py + activations.py).
The XLA shift-add formulation (ops/resample.py::FusedActivation1d) is exact
but materializes shifted slices to HBM on the long-time/few-channel stages;
with 108 activations per clip this dominates vocoder latency. Here the
polyphase up-FIR, the fp32 snake, and the down-FIR all happen on one VMEM
tile:

    HBM read (tile + two 128-lane halo views of the same array)
      up_even/up_odd = 6-tap FIRs (static-shift multiply-adds)
      s_even/s_odd   = snake/snakebeta in fp32 (per-channel alpha/beta)
      y              = 12-tap polyphase decimating FIR
    HBM write (tile)

All inputs use standard blocked BlockSpecs (Mosaic double-buffers the fetches
against compute automatically), and there is NO host-side padding: replicate
padding of x and the s-domain clamp are applied in-kernel by the first/last
time tiles, so the wrapper adds zero extra HBM passes.

Numerics match FusedActivation1d exactly (same tap order, fp32 accumulation,
same replicate-clamp edge semantics as the torch original: any s-index < 0
clamps to s[0], any > 2T-1 clamps to s[2T-1], including cross-parity edges).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maa3_tpu.ops.resample import (kaiser_sinc_filter1d, sin2_poly,
                                   use_fast_sin2)

Array = jax.Array

# 12-tap 2x kaiser-sinc filters (compile-time Python float constants)
_F_UP = tuple((kaiser_sinc_filter1d(0.25, 0.3, 12) * 2.0).tolist())
_F_DN = tuple(kaiser_sinc_filter1d(0.25, 0.3, 12).tolist())
_HB = 128  # halo block width (lane-aligned); only 5 columns of each are used


def snake_coeffs(alpha, beta, logscale: bool, has_beta: bool):
    """Effective fp32 snake coefficients (activations.py:50-55, 106-114):
    returns (alpha_eff, 1/(beta_eff + 1e-9)); snake (no beta) divides by
    alpha itself."""
    af = alpha.astype(jnp.float32)
    if has_beta:
        bf = beta.astype(jnp.float32)
        if logscale:
            af, bf = jnp.exp(af), jnp.exp(bf)
        return af, 1.0 / (bf + 1e-9)
    if logscale:
        af = jnp.exp(af)
    return af, 1.0 / (af + 1e-9)


def pick_tile(T: int, tile: int, max_bad_tail: int) -> int:
    """Choose a 128-aligned time tile whose ragged tail is 0 or large enough
    that an overhanging right-halo block cannot leak garbage into valid
    outputs of the second-to-last tile (tails 1..max_bad_tail are bad).
    Falls back to one tile covering all of T."""
    tile = min(tile, max(128, -(-T // 128) * 128))
    while T % tile in range(1, max_bad_tail + 1) and tile > 128:
        tile -= 128
    if T % tile in range(1, max_bad_tail + 1):
        tile = max(128, -(-T // 128) * 128)
    return tile


def _kernel(a_ref, ib_ref, x_ref, lh_ref, rh_ref, out_ref, xin, se, so, *,
            tile: int, n_rows: int, t_total: int, fast_sin2: bool = False):
    """One (n_rows, tile) output block.

    a_ref/ib_ref: (n_rows, 1) fp32 — effective snake alpha and 1/(beta+eps).
    x_ref: (n_rows, tile) blocked view of x at tile i.
    lh_ref/rh_ref: (n_rows, 128) views ending at / starting at the tile edges.
    xin: VMEM scratch (n_rows, tile + 10) == xpad[i*tile : ...], where
        xpad[:, k] = x[:, clamp(k - 5)] (the reference's replicate pad).
    se/so: VMEM scratch (n_rows, tile + 5) fp32 — snake(up) even/odd phases.
    """
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    q = t_total - (-(-t_total // tile) - 1) * tile  # valid cols in last tile

    xin[:, 0:5] = lh_ref[:, _HB - 5:]
    xin[:, 5:5 + tile] = x_ref[:]
    xin[:, 5 + tile:] = rh_ref[:, 0:5]

    # replicate pad of x at the global edges (torch F.pad 'replicate')
    @pl.when(i == 0)
    def _xleft():
        xin[:, 0:5] = jnp.broadcast_to(xin[:, 5:6], (n_rows, 5))

    @pl.when(i == n_tiles - 1)
    def _xright():
        xin[:, q + 5:] = jnp.broadcast_to(xin[:, q + 4:q + 5],
                                          (n_rows, tile + 10 - q - 5))

    def xs(off):  # fp32 view of xpad[i*tile + off : ... + tile + 5]
        return xin[:, off:off + tile + 5].astype(jnp.float32)

    # --- polyphase 2x upsample: 6-tap FIRs per output parity ---------------
    # s_even[g] needs xpad[g + (15-j)/2] (j odd); phases are computed on the
    # extended range g in [i*tile - 2, i*tile + tile + 3) so the 12-tap
    # downsampler never leaves the tile.
    up_e = sum(_F_UP[j] * xs((15 - j) // 2 - 2) for j in range(1, 12, 2))
    up_o = sum(_F_UP[j] * xs((16 - j) // 2 - 3) for j in range(0, 12, 2))

    # --- snake (fp32): v + sin^2(alpha v) / (beta + eps) -------------------
    a = a_ref[:, 0:1]
    ib = ib_ref[:, 0:1]
    _s2 = sin2_poly if fast_sin2 else (lambda z: jnp.square(jnp.sin(z)))
    se[:] = up_e + ib * _s2(a * up_e)
    so[:] = up_o + ib * _s2(a * up_o)

    # --- replicate-clamp edge corrections (reference act.py semantics) -----
    # s-index n < 0 -> s[0] = s_even[0]; n > 2T-1 -> s[2T-1] = s_odd[T-1].
    @pl.when(i == 0)
    def _sleft():
        first = se[:, 2:3]                      # global s_even[0]
        se[:, 0:2] = jnp.broadcast_to(first, (n_rows, 2))
        so[:, 0:3] = jnp.broadcast_to(first, (n_rows, 3))

    @pl.when(i == n_tiles - 1)
    def _sright():
        last = so[:, q + 2:q + 3]               # global s_odd[T-1]
        se[:, q + 2:] = jnp.broadcast_to(last, (n_rows, tile + 3 - q))
        so[:, q + 3:] = jnp.broadcast_to(last, (n_rows, tile + 2 - q))

    # --- 2x anti-aliased decimation: y[t] = sum_j g[j] * s~[2t + j - 5] ----
    y = sum(_F_DN[j] * se[:, (j - 5) // 2 + 2:(j - 5) // 2 + 2 + tile]
            for j in range(1, 12, 2))
    y += sum(_F_DN[j] * so[:, (j - 6) // 2 + 3:(j - 6) // 2 + 3 + tile]
             for j in range(0, 12, 2))
    out_ref[:] = y.astype(out_ref.dtype)


def aa_snake_fused(x: Array, alpha: Array, beta: Optional[Array] = None, *,
                   logscale: bool = True, has_beta: bool = True,
                   tile: int = 8192, n_rows: Optional[int] = None,
                   interpret: Optional[bool] = None,
                   fast_sin2: Optional[bool] = None) -> Array:
    # env/dtype-dependent routing resolved OUTSIDE the jit so flipping
    # MAA3_FAST_SIN2 between calls hits a different static cache entry
    if fast_sin2 is None:
        fast_sin2 = use_fast_sin2(x.dtype)
    return _aa_snake_fused(x, alpha, beta, logscale=logscale,
                           has_beta=has_beta, tile=tile, n_rows=n_rows,
                           interpret=interpret, fast_sin2=fast_sin2)


@functools.partial(jax.jit, static_argnames=("logscale", "has_beta", "tile",
                                             "n_rows", "interpret",
                                             "fast_sin2"))
def _aa_snake_fused(x: Array, alpha: Array, beta: Optional[Array] = None, *,
                    logscale: bool = True, has_beta: bool = True,
                    tile: int = 8192, n_rows: Optional[int] = None,
                    interpret: Optional[bool] = None,
                    fast_sin2: bool = False) -> Array:
    """Fused Activation1d(snake[_beta]) over (B, C, T); returns (B, C, T).

    Drop-in fast path for FusedActivation1d(snake_beta/snake) with the 2x /
    12-tap configuration BigVGAN uses (vocoder/bigvgan/models.py:60-71).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, C, T = x.shape
    af, inv_b = snake_coeffs(alpha, beta, logscale, has_beta)

    if n_rows is None:
        n_rows = 16 if x.dtype == jnp.bfloat16 else 8
    tile = pick_tile(T, tile, 4)  # the halo uses 5 cols of the next block

    # VMEM budget guard: when every candidate tile leaves a bad ragged tail,
    # pick_tile collapses to ONE tile spanning all of T; for pathological
    # input lengths the fp32 se/so scratch then exceeds VMEM and Mosaic fails
    # to compile. Fall back to the numerically-identical XLA shift-add path
    # (same fp32 snake formulation) instead of emitting an uncompilable
    # kernel.
    itemsize = jnp.dtype(x.dtype).itemsize
    vmem_bytes = (
        2 * n_rows * (tile + 5) * 4            # se/so fp32 scratch
        + n_rows * (tile + 10) * itemsize      # xin scratch
        + 2 * 2 * n_rows * tile * itemsize     # x/out blocks, double-buffered
        + 4 * n_rows * _HB * itemsize)         # halo blocks, double-buffered
    if vmem_bytes > 100 * 1024 * 1024:
        from maa3_tpu.ops.resample import FusedActivation1d

        def _snake_fp32(v):  # v: (B, C, t)
            vf = v.astype(jnp.float32)
            u = af[None, :, None] * vf
            s2 = sin2_poly(u) if fast_sin2 else jnp.square(jnp.sin(u))
            out_ = vf + inv_b[None, :, None] * s2
            return out_.astype(v.dtype)

        return FusedActivation1d(_snake_fp32)(x)

    n_tiles = -(-T // tile)
    rows = B * C

    a_rows = jnp.tile(af, B)[:, None]
    ib_rows = jnp.tile(inv_b, B)[:, None]

    x2 = x.reshape(rows, T)
    hblk = tile // _HB
    last_blk = (T - 1) // _HB

    kern = functools.partial(_kernel, tile=tile, n_rows=n_rows, t_total=T,
                             fast_sin2=fast_sin2)
    out = pl.pallas_call(
        kern,
        grid=(-(-rows // n_rows), n_tiles),
        in_specs=[
            pl.BlockSpec((n_rows, 1), lambda r, i: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, 1), lambda r, i: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, tile), lambda r, i: (r, i),
                         memory_space=pltpu.VMEM),
            # left halo: the 128 cols ending at the tile start (tile 0 reads
            # block 0 and overwrites the 5 used cols with replicate pad)
            pl.BlockSpec((n_rows, _HB),
                         lambda r, i, h=hblk: (r, jnp.maximum(i * h - 1, 0)),
                         memory_space=pltpu.VMEM),
            # right halo: the 128 cols at the tile end (last tiles clamp to a
            # valid block; the used cols are overwritten by the edge fixes)
            pl.BlockSpec((n_rows, _HB),
                         lambda r, i, h=hblk, lb=last_blk:
                         (r, jnp.minimum((i + 1) * h, lb)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_rows, tile), lambda r, i: (r, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, T), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_rows, tile + 10), x.dtype),
            pltpu.VMEM((n_rows, tile + 5), jnp.float32),
            pltpu.VMEM((n_rows, tile + 5), jnp.float32),
        ],
        interpret=interpret,
    )(a_rows, ib_rows, x2, x2, x2)
    return out.reshape(B, C, T)
