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


def _kernel(*refs, tile: int, n_rows: int, t_total: int,
            fast_sin2: bool = False, folded: bool = False):
    """One (n_rows, tile) output block.

    a_ref/ib_ref: (n_rows, 1) fp32 — effective snake alpha and 1/(beta+eps).
    x_ref: (n_rows, tile) blocked view of x at tile i.
    lh_ref/rh_ref: (n_rows, 128) views ending at / starting at the tile edges.
    xin: VMEM scratch (n_rows, tile + 10) == xpad[i*tile : ...], where
        xpad[:, k] = x[:, clamp(k - 5)] (the reference's replicate pad).
    se/so: VMEM scratch (n_rows, tile + 5) fp32 — snake(up) even/odd phases.

    folded (time-folded rows, round 5): each row is one of `fold` contiguous
    time chunks of an original signal, so the row's global time edges are
    NOT signal edges. Four extra refs supply per-row cross-chunk halos and
    edge masks: lh5/rh5 (n_rows, 128; cols 0:5 = true previous-chunk tail /
    next-chunk head, replicate-padded on chunk 0 / fold-1 rows) and mf/ml
    (n_rows, 1; 1.0 where the row is the first / last chunk of its signal —
    only those rows get the reference's s-domain replicate clamp).
    """
    refs = list(refs)
    a_ref, ib_ref, x_ref, lh_ref, rh_ref = refs[:5]
    if folded:
        lh5_ref, rh5_ref, mf_ref, ml_ref = refs[5:9]
        out_ref, xin, se, so = refs[9:]
    else:
        out_ref, xin, se, so = refs[5:]
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    q = t_total - (-(-t_total // tile) - 1) * tile  # valid cols in last tile

    xin[:, 0:5] = lh_ref[:, _HB - 5:]
    xin[:, 5:5 + tile] = x_ref[:]
    xin[:, 5 + tile:] = rh_ref[:, 0:5]

    # replicate pad of x at the global edges (torch F.pad 'replicate');
    # folded rows instead read their true cross-chunk halos (already
    # replicate-padded on the outermost chunks by the wrapper)
    @pl.when(i == 0)
    def _xleft():
        if folded:
            xin[:, 0:5] = lh5_ref[:, 0:5]
        else:
            xin[:, 0:5] = jnp.broadcast_to(xin[:, 5:6], (n_rows, 5))

    @pl.when(i == n_tiles - 1)
    def _xright():
        if folded:
            xin[:, q + 5:q + 10] = rh5_ref[:, 0:5]
            if q + 10 < tile + 10:
                # overhang feeds only discarded phases; keep it finite
                xin[:, q + 10:] = jnp.zeros((n_rows, tile - q), xin.dtype)
        else:
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
    # Folded mode masks the clamp to first-/last-chunk rows; interior rows'
    # edge phases are already exact (computed from the true x halos).
    @pl.when(i == 0)
    def _sleft():
        first = se[:, 2:3]                      # global s_even[0]
        f2 = jnp.broadcast_to(first, (n_rows, 2))
        f3 = jnp.broadcast_to(first, (n_rows, 3))
        if folded:
            mf = mf_ref[:, 0:1] > 0
            se[:, 0:2] = jnp.where(mf, f2, se[:, 0:2])
            so[:, 0:3] = jnp.where(mf, f3, so[:, 0:3])
        else:
            se[:, 0:2] = f2
            so[:, 0:3] = f3

    @pl.when(i == n_tiles - 1)
    def _sright():
        last = so[:, q + 2:q + 3]               # global s_odd[T-1]
        le = jnp.broadcast_to(last, (n_rows, tile + 3 - q))
        lo = jnp.broadcast_to(last, (n_rows, tile + 2 - q))
        if folded:
            ml = ml_ref[:, 0:1] > 0
            se[:, q + 2:] = jnp.where(ml, le, se[:, q + 2:])
            so[:, q + 3:] = jnp.where(ml, lo, so[:, q + 3:])
        else:
            se[:, q + 2:] = le
            so[:, q + 3:] = lo

    # --- 2x anti-aliased decimation: y[t] = sum_j g[j] * s~[2t + j - 5] ----
    y = sum(_F_DN[j] * se[:, (j - 5) // 2 + 2:(j - 5) // 2 + 2 + tile]
            for j in range(1, 12, 2))
    y += sum(_F_DN[j] * so[:, (j - 6) // 2 + 3:(j - 6) // 2 + 3 + tile]
             for j in range(0, 12, 2))
    out_ref[:] = y.astype(out_ref.dtype)


def _kernel_mxu(*refs, tile: int, n_rows: int,
                t_total: int, fast_sin2: bool = False, folded: bool = False):
    """_kernel with the FIRs as banded-matrix MXU dots (round-4 rewrite).

    The shift-add FIRs cost ~100-120 ps/element on the VPU (24 lane-rotated
    tap reads; PROBE_VOC_DECOMP_R04) — the measured bound of the whole
    batched vocoder. Here each 128-column sub-tile does ONE slightly-offset
    window read (n_rows, 133) and one MXU dot against a banded matrix
    computing both polyphase outputs at once:

      up:   W = xin[:, s:s+133];  [up_e | up_o] = W @ bu   (133, 256)
      down: W = [se[:, s:s+133] | so[:, s:s+133]];  y = W @ bd  (266, 128)

    ~22x the MACs of the 6-tap form, all on the 128x128 systolic array with
    n_rows=128 rows — the VMEM-resident windows never touch HBM. Snake and
    the replicate-clamp edge fixes are unchanged (same numerics; only the
    FIR summation order differs). `folded` as in _kernel: four extra refs
    (lh5/rh5 halos, mf/ml edge masks) make each row an interior time chunk
    of a taller, shorter-time folded layout."""
    refs = list(refs)
    a_ref, ib_ref, bu_ref, bd_ref, x_ref, lh_ref, rh_ref = refs[:7]
    if folded:
        lh5_ref, rh5_ref, mf_ref, ml_ref = refs[7:11]
        out_ref, xin, se, so = refs[11:]
    else:
        out_ref, xin, se, so = refs[7:]
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    q = t_total - (-(-t_total // tile) - 1) * tile  # valid cols in last tile

    xin[:, 0:5] = lh_ref[:, _HB - 5:]
    xin[:, 5:5 + tile] = x_ref[:]
    xin[:, 5 + tile:10 + tile] = rh_ref[:, 0:5]  # scratch is wider (windows)
    # zero the window-overhang tail: it multiplies ZERO band coefficients,
    # but uninitialized VMEM could hold NaN/inf and 0*NaN would poison the
    # dot's valid columns
    xin[:, 10 + tile:] = jnp.zeros((n_rows, 123), xin.dtype)

    @pl.when(i == 0)
    def _xleft():
        if folded:
            xin[:, 0:5] = lh5_ref[:, 0:5]
        else:
            xin[:, 0:5] = jnp.broadcast_to(xin[:, 5:6], (n_rows, 5))

    @pl.when(i == n_tiles - 1)
    def _xright():
        if folded:
            xin[:, q + 5:q + 10] = rh5_ref[:, 0:5]
            if q + 10 < 10 + tile:
                xin[:, q + 10:10 + tile] = jnp.zeros(
                    (n_rows, tile - q), xin.dtype)
        else:
            xin[:, q + 5:10 + tile] = jnp.broadcast_to(
                xin[:, q + 4:q + 5], (n_rows, tile + 10 - q - 5))

    a = a_ref[:, 0:1]
    ib = ib_ref[:, 0:1]
    _s2 = sin2_poly if fast_sin2 else (lambda z: jnp.square(jnp.sin(z)))
    bu = bu_ref[:]                         # (133, 256) in x dtype
    n_up = (tile + 5 + 127) // 128         # sub-tiles covering tile+5 phases
    for j in range(n_up):
        # fixed 133-wide window (static dot shape); the last sub-tile's
        # columns beyond tile+10 are uninitialized scratch, but they only
        # feed output phases >= width, which are discarded below
        w = xin[:, j * 128:j * 128 + 133]
        uo = jax.lax.dot_general(w, bu, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        width = min(128, tile + 5 - j * 128)
        ue = uo[:, 0:width]
        uod = uo[:, 128:128 + width]
        sl = slice(j * 128, j * 128 + width)
        se[:, sl] = (ue + ib * _s2(a * ue)).astype(se.dtype)
        so[:, sl] = (uod + ib * _s2(a * uod)).astype(so.dtype)

    @pl.when(i == 0)
    def _sleft():
        first = se[:, 2:3]
        f2 = jnp.broadcast_to(first, (n_rows, 2))
        f3 = jnp.broadcast_to(first, (n_rows, 3))
        if folded:
            mf = mf_ref[:, 0:1] > 0
            se[:, 0:2] = jnp.where(mf, f2, se[:, 0:2])
            so[:, 0:3] = jnp.where(mf, f3, so[:, 0:3])
        else:
            se[:, 0:2] = f2
            so[:, 0:3] = f3

    @pl.when(i == n_tiles - 1)
    def _sright():
        last = so[:, q + 2:q + 3]
        le = jnp.broadcast_to(last, (n_rows, tile + 3 - q))
        lo = jnp.broadcast_to(last, (n_rows, tile + 2 - q))
        if folded:
            ml = ml_ref[:, 0:1] > 0
            se[:, q + 2:] = jnp.where(ml, le, se[:, q + 2:])
            so[:, q + 3:] = jnp.where(ml, lo, so[:, q + 3:])
        else:
            se[:, q + 2:] = le
            so[:, q + 3:] = lo

    bd = bd_ref[:]                         # (266, 128) fp32
    for j in range(tile // 128):
        w = jnp.concatenate([se[:, j * 128:j * 128 + 133],
                             so[:, j * 128:j * 128 + 133]], axis=1)
        y = jax.lax.dot_general(w, bd, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[:, j * 128:(j + 1) * 128] = y.astype(out_ref.dtype)


def _fir_bands():
    """Banded matrices for _kernel_mxu (numpy, compile-time constants).

    up_e[m] = sum_{o=0..5} F_UP[11-2o] xin[m+o]
    up_o[m] = sum_{o=0..5} F_UP[10-2o] xin[m+o]     -> bu (133, 256)
    y[t]    = sum_{m=0..5} F_DN[2(m-2)+5] se[t+m]
            + sum_{m=0..5} F_DN[2(m-3)+6] so[t+m]   -> bd (266, 128)
    """
    import numpy as np
    bu = np.zeros((133, 256), np.float32)
    bd = np.zeros((266, 128), np.float32)
    for o in range(6):
        for t in range(128):
            bu[t + o, t] = _F_UP[11 - 2 * o]
            bu[t + o, 128 + t] = _F_UP[10 - 2 * o]
    for m in range(6):
        for t in range(128):
            bd[t + m, t] = _F_DN[2 * (m - 2) + 5]
            bd[133 + t + m, t] = _F_DN[2 * (m - 3) + 6]
    return bu, bd


def _use_mxu_fir() -> bool:
    import os
    env = os.environ.get("MAA3_AA_SNAKE_MXU")
    if env is None:
        # round-4 probe F: the banded-matmul FIR kernel wins every b8 stage
        # with C >= 96 (res1 34.3 vs 64.1 ms, res3 27.5 vs 45.4); C <= 48
        # stages route to the conv_snake kernel anyway (bigvgan fused
        # cutoff), so ON is the correct default wherever this kernel runs
        return True
    return env.strip().lower() not in ("0", "false", "off", "no", "")


def aa_snake_fused(x: Array, alpha: Array, beta: Optional[Array] = None, *,
                   logscale: bool = True, has_beta: bool = True,
                   tile: int = 8192, n_rows: Optional[int] = None,
                   interpret: Optional[bool] = None,
                   fast_sin2: Optional[bool] = None,
                   fold: Optional[int] = None) -> Array:
    # env/dtype-dependent routing resolved OUTSIDE the jit so flipping
    # MAA3_FAST_SIN2 / MAA3_AA_SNAKE_MXU between calls hits a different
    # static cache entry
    if fast_sin2 is None:
        fast_sin2 = use_fast_sin2(x.dtype)
    if fold is None:
        fold = auto_fold(x.shape[0], x.shape[1], x.shape[2])
    return _aa_snake_fused(x, alpha, beta, logscale=logscale,
                           has_beta=has_beta, tile=tile, n_rows=n_rows,
                           interpret=interpret, fast_sin2=fast_sin2,
                           mxu_fir=_use_mxu_fir(), fold=fold)


def auto_fold(B: int, C: int, T: int, target_rows: int = 768,
              min_t: int = 4096) -> int:
    """Time-fold factor k: reshape (B, C, T) -> (B*C*k rows, T/k) —
    numerically exact (true cross-chunk halos, masked edge clamps).

    MEASURED NEGATIVE (round 5, /tmp/fold_probe.log 2026-08-20): folding
    res4 b8 to the exact res3-winning kernel shape (768 rows x 39936) ran
    48.5 ms vs 43.0 unfolded and 41.2 conv_snake; res5 80.4 vs 74.7/39.5.
    The banded-FIR kernel's narrow-stage deficit is therefore NOT
    row-underfill — identical grid/shape via folding does not reproduce
    res3's 27.5 ms. Default OFF; MAA3_AA_FOLD=<k> opts in (the exactness
    machinery and tests stay — the lever is cheap to re-probe on future
    kernel revisions). When enabled, k is clamped to divide T."""
    import os
    env = os.environ.get("MAA3_AA_FOLD")
    if env is None:
        return 1
    k = max(1, int(env))
    if k > 1:
        cap = 1
        while (B * C * cap < target_rows and T % (2 * cap) == 0
               and T // (2 * cap) >= min_t and cap < k):
            cap *= 2
        k = cap
    while T % k:
        k //= 2
    return max(k, 1)


@functools.partial(jax.jit, static_argnames=("logscale", "has_beta", "tile",
                                             "n_rows", "interpret",
                                             "fast_sin2", "mxu_fir", "fold"))
def _aa_snake_fused(x: Array, alpha: Array, beta: Optional[Array] = None, *,
                    logscale: bool = True, has_beta: bool = True,
                    tile: int = 8192, n_rows: Optional[int] = None,
                    interpret: Optional[bool] = None,
                    fast_sin2: bool = False, mxu_fir: bool = False,
                    fold: int = 1) -> Array:
    """Fused Activation1d(snake[_beta]) over (B, C, T); returns (B, C, T).

    Drop-in fast path for FusedActivation1d(snake_beta/snake) with the 2x /
    12-tap configuration BigVGAN uses (vocoder/bigvgan/models.py:60-71).
    fold > 1 runs the time-folded layout (see auto_fold): numerically
    identical, rows become B*C*fold time chunks of length T/fold with true
    cross-chunk halos.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, C, T = x.shape
    af, inv_b = snake_coeffs(alpha, beta, logscale, has_beta)
    if T % fold:
        raise ValueError(f"fold {fold} must divide T {T}")
    T_full, T = T, T // fold

    if n_rows is None:
        if mxu_fir:
            n_rows = 128  # the MXU dot's M dimension: feed full tiles
        else:
            n_rows = 16 if x.dtype == jnp.bfloat16 else 8
    if mxu_fir:
        tile = min(tile, 4096 if x.dtype == jnp.bfloat16 else 2048)
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
    rows = B * C * fold

    if fold > 1:
        a_rows = jnp.tile(jnp.repeat(af, fold), B)[:, None]
        ib_rows = jnp.tile(jnp.repeat(inv_b, fold), B)[:, None]
        xf = x.reshape(B, C, fold, T)
        # true cross-chunk halos; outermost chunks get the reference's
        # replicate pad (same values _xleft/_xright would have written)
        rep_l = jnp.broadcast_to(xf[:, :, :1, 0:1], (B, C, 1, 5))
        lh5 = jnp.concatenate([rep_l, xf[:, :, :-1, T - 5:]],
                              axis=2).reshape(rows, 5)
        rep_r = jnp.broadcast_to(xf[:, :, -1:, T - 1:T], (B, C, 1, 5))
        rh5 = jnp.concatenate([xf[:, :, 1:, 0:5], rep_r],
                              axis=2).reshape(rows, 5)
        jpos = jnp.arange(fold, dtype=jnp.float32)
        mf = jnp.tile((jpos == 0).astype(jnp.float32), B * C)[:, None]
        ml = jnp.tile((jpos == fold - 1).astype(jnp.float32), B * C)[:, None]
    else:
        a_rows = jnp.tile(af, B)[:, None]
        ib_rows = jnp.tile(inv_b, B)[:, None]

    x2 = x.reshape(rows, T)
    hblk = tile // _HB
    last_blk = (T - 1) // _HB

    in_specs = [
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
    ]
    operands = [a_rows, ib_rows, x2, x2, x2]
    if fold > 1:
        in_specs += [
            pl.BlockSpec((n_rows, 5), lambda r, i: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, 5), lambda r, i: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, 1), lambda r, i: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, 1), lambda r, i: (r, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [lh5, rh5, mf, ml]
    scratch_fp = jnp.float32
    if mxu_fir:
        # banded FIR matrices as VMEM-resident operands; bf16 mode stores
        # the snake phases bf16 so the down dot runs a single MXU pass
        scratch_fp = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
        bu_np, bd_np = _fir_bands()
        in_specs[2:2] = [
            pl.BlockSpec((133, 256), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((266, 128), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands[2:2] = [jnp.asarray(bu_np, x.dtype),
                         jnp.asarray(bd_np, scratch_fp)]
        kern = functools.partial(_kernel_mxu, tile=tile, n_rows=n_rows,
                                 t_total=T, fast_sin2=fast_sin2,
                                 folded=fold > 1)
    else:
        kern = functools.partial(_kernel, tile=tile, n_rows=n_rows,
                                 t_total=T, fast_sin2=fast_sin2,
                                 folded=fold > 1)
    out = pl.pallas_call(
        kern,
        grid=(-(-rows // n_rows), n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_rows, tile), lambda r, i: (r, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, T), x.dtype),
        scratch_shapes=[
            # the MXU variant's last up-window reads a fixed 133-wide slice
            # past tile+10 (discarded output phases) — allocate for it
            pltpu.VMEM((n_rows, tile + (133 if mxu_fir else 10)), x.dtype),
            pltpu.VMEM((n_rows, tile + 5), scratch_fp),
            pltpu.VMEM((n_rows, tile + 5), scratch_fp),
        ],
        interpret=interpret,
    )(*operands)
    return out.reshape(B, C, T_full)
