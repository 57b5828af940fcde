"""Alias-free 1-D resampling (kaiser-windowed sinc filters).

Parity target: vocoder/bigvgan/alias_free_torch/{filter,resample,act}.py —
the anti-aliased Snake activation pipeline: 2x sinc upsample -> pointwise
nonlinearity -> 2x sinc lowpass-downsample.

TPU-native notes: filters are tiny static fp32 arrays precomputed with numpy
at build time; the up/down paths are depthwise (grouped) convs which XLA fuses
with the surrounding elementwise work. The transposed upsample uses the same
lhs-dilated conv lowering as ops.conv.conv_transpose1d.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from maa3_tpu.ops.conv import pad_1d, _DN

Array = jax.Array


# cos(pi*s) on s in [-1, 1] as an even minimax (Chebyshev-fit) polynomial in
# s^2; fp64 fit, max abs err 4.0e-10 (scripts/probe_fast_sin.py).
_COS_PI_COEF = (0.9999999999193592, -4.934802189554387, 4.058711882136316,
                -1.3352607094461064, 0.23532212896929544,
                -0.02578785465436363, 0.0019059119561826655,
                -8.916972979202109e-05)


def sin2_poly(u: Array) -> Array:
    """sin^2(u) via (1 - cos(2u))/2 with round-based mod-2pi range reduction
    and the even cos polynomial — abs err ~1e-7*(1+|u|) vs fp64, ~3.6x faster
    than XLA's libm-grade sin on the VPU, a pure elementwise chain that XLA
    fuses into the AA shift-add FIRs (and that Mosaic lowers inside Pallas
    kernels). Differentiable: round is piecewise-constant, so the range
    reduction is identity-slope a.e."""
    v = u * jnp.float32(1.0 / math.pi)
    t = v - jnp.round(v)                      # cos(2u) = cos(pi * 2t)
    w = (2.0 * t) * (2.0 * t)
    c = jnp.float32(_COS_PI_COEF[-1])
    for k in range(len(_COS_PI_COEF) - 2, -1, -1):
        c = c * w + jnp.float32(_COS_PI_COEF[k])
    return 0.5 * (1.0 - c)


def use_fast_sin2(orig_dtype) -> bool:
    """Poly sin^2 applies to reduced-precision compute (bf16/fp16) where its
    ~1e-6 error is ~1000x below the bf16 noise floor; fp32 parity mode keeps
    the exact libm sin. MAA3_FAST_SIN2=0/1 overrides."""
    import os
    env = os.environ.get("MAA3_FAST_SIN2")
    if env is not None:
        env = env.strip().lower()
        if env in ("", "0", "false", "no", "off"):
            return False
        return True
    return orig_dtype in (jnp.bfloat16, jnp.float16)


def kaiser_sinc_filter1d(cutoff: float, half_width: float,
                         kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc low-pass filter, shape (kernel_size,), sum=1.

    Parity: alias_free_torch/filter.py:28-60 (beta from the standard Kaiser
    attenuation formula; even kernels use half-sample-offset time grid).
    """
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


def _depthwise_conv(x: Array, filt: Array, stride: int = 1,
                    lhs_dilation: int = 1, pad=(0, 0)) -> Array:
    """Depthwise conv of (B, C, T) with a shared (k,) filter."""
    c = x.shape[1]
    w = jnp.broadcast_to(filt[None, None, :], (c, 1, filt.shape[0]))
    return lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride,),
        padding=[pad],
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=_DN,
        feature_group_count=c,
    )


class UpSample1d:
    """ratio-x sinc interpolation upsampler (alias_free_torch/resample.py:9-31)."""

    def __init__(self, ratio: int = 2, kernel_size: Optional[int] = None):
        self.ratio = ratio
        self.kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
        self.stride = ratio
        self.pad = self.kernel_size // ratio - 1
        self.pad_left = self.pad * self.stride + (self.kernel_size - self.stride) // 2
        self.pad_right = self.pad * self.stride + (self.kernel_size - self.stride + 1) // 2
        self.filter = jnp.asarray(
            kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, self.kernel_size))

    def __call__(self, x: Array) -> Array:
        x = pad_1d(x, self.pad, self.pad, mode="replicate")
        # conv_transpose(filter, stride=ratio) == lhs-dilated conv w/ flipped
        # kernel; sinc filters are symmetric so no flip needed.
        k = self.kernel_size
        y = self.ratio * _depthwise_conv(x, self.filter, lhs_dilation=self.stride,
                                         pad=(k - 1, k - 1))
        return y[..., self.pad_left:y.shape[-1] - self.pad_right]


class DownSample1d:
    """ratio-x anti-aliased decimator (alias_free_torch/resample.py:34-46)."""

    def __init__(self, ratio: int = 2, kernel_size: Optional[int] = None):
        self.ratio = ratio
        self.kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
        even = self.kernel_size % 2 == 0
        self.pad_left = self.kernel_size // 2 - int(even)
        self.pad_right = self.kernel_size // 2
        self.stride = ratio
        self.filter = jnp.asarray(
            kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, self.kernel_size))

    def __call__(self, x: Array) -> Array:
        x = pad_1d(x, self.pad_left, self.pad_right, mode="replicate")
        return _depthwise_conv(x, self.filter, stride=self.stride)


class Activation1d:
    """up2x -> act -> down2x anti-aliased activation (alias_free_torch/act.py)."""

    def __init__(self, activation, up_ratio: int = 2, down_ratio: int = 2,
                 up_kernel_size: int = 12, down_kernel_size: int = 12):
        self.act = activation
        self.upsample = UpSample1d(up_ratio, up_kernel_size)
        self.downsample = DownSample1d(down_ratio, down_kernel_size)

    def __call__(self, x: Array) -> Array:
        return self.downsample(self.act(self.upsample(x)))


# ---------------------------------------------------------------------------
# Fused shift-add formulation (TPU fast path)
# ---------------------------------------------------------------------------
#
# The up/down sinc FIRs are only 12 taps. Expressing them as 12 shifted
# scalar multiply-adds (instead of depthwise convs) lets XLA fuse the entire
# up2x -> snake -> down2x pipeline into ONE elementwise pass over VMEM-sized
# tiles — no conv ops, no intermediate HBM round-trips. This is the hot path
# of BigVGAN (hundreds of anti-aliased activations per clip).

class FusedActivation1d:
    """Numerically identical to Activation1d (2x/12-tap case), one XLA fusion.

    Polyphase decomposition: with the 12-tap upsample filter f and replicate
    pad p=5, the 2x-upsampled signal splits by output parity into two 6-tap
    FIRs over x; snake is applied pointwise; the 12-tap downsample then
    contracts parity-split products back to stride-1 — every term is a
    shifted elementwise multiply-add, which XLA fuses end-to-end.
    """

    def __init__(self, activation, ratio: int = 2, kernel_size: int = 12):
        assert ratio == 2 and kernel_size == 12, "fast path covers 2x/12"
        self.act = activation
        self.up = UpSample1d(ratio, kernel_size)
        self.down = DownSample1d(ratio, kernel_size)

    def __call__(self, x: Array) -> Array:
        f_up = self.up.filter * 2.0       # (12,)
        f_dn = self.down.filter           # (12,)

        # ---- upsample via parity-split 6-tap FIRs --------------------------
        # conv_transpose(stride 2) output n = 2m + j; after the crop by
        # pad_left=15: up[t] = 2 sum_j f[j] xpad[(t + 15 - j) / 2] over j with
        # matching parity, xpad = replicate-pad(5) of x.
        xp = pad_1d(x, 5, 5, mode="replicate")  # xpad, length T + 10
        T = x.shape[-1]

        def xs(off):  # xpad[i + off] for i in [0, T)
            return jax.lax.dynamic_slice_in_dim(xp, off, T, axis=-1)

        # even outputs t=2i need j odd (offsets 2..7);
        # odd outputs t=2i+1 need j even (offsets 3..8)
        up_even = sum(f_up[j] * xs((15 - j) // 2) for j in range(1, 12, 2))
        up_odd = sum(f_up[j] * xs((16 - j) // 2) for j in range(0, 12, 2))

        s_even = self.act(up_even)   # s[2i]
        s_odd = self.act(up_odd)     # s[2i+1]

        # ---- downsample: y[i] = sum_j g[j] s~[2i + j], s~ = replicate-pad
        # (5 left, 6 right) of the interleaved s. Splitting n = 2i + j - 5 by
        # parity: even n -> s_even[n/2], odd n -> s_odd[(n-1)/2]; the replicate
        # clamp maps ANY n < 0 to s[0] = s_even[0] and ANY n > 2T-1 to
        # s[2T-1] = s_odd[T-1] (cross-parity at the edges — handled exactly).
        first = s_even[..., :1]
        last = s_odd[..., -1:]
        se_ext = jnp.concatenate(
            [jnp.repeat(first, 2, -1), s_even, jnp.repeat(last, 3, -1)], -1)
        so_ext = jnp.concatenate(
            [jnp.repeat(first, 3, -1), s_odd, jnp.repeat(last, 2, -1)], -1)

        y = jnp.zeros_like(x)
        for j in range(12):
            d = j - 5
            if d % 2 == 0:
                off = d // 2  # in [-2, 3]
                y = y + f_dn[j] * jax.lax.dynamic_slice_in_dim(
                    se_ext, off + 2, T, axis=-1)
            else:
                off = (d - 1) // 2  # in [-3, 2]
                y = y + f_dn[j] * jax.lax.dynamic_slice_in_dim(
                    so_ext, off + 3, T, axis=-1)
        return y


# ---------------------------------------------------------------------------
# MXU banded-matmul formulation (the batched-serving fast path)
# ---------------------------------------------------------------------------
#
# Round-4 finding (PROBE_VOC_DECOMP): at batch 8 the vocoder is ~85%
# anti-aliased-ACTIVATION time, not convs (res1: 7.8 ms convs vs 67 ms AA),
# and both the XLA shift-add form above and the Pallas one-pass kernels are
# VPU-bound: every shifted FIR tap is a full-width lane-rotate. The TPU's
# 128x128 MXU runs matmuls ~2 orders of magnitude faster than the VPU runs
# rotated adds — so express each 6-tap polyphase FIR as a BANDED-matrix
# GEMM over 128-sample tiles: windows (M, nT, 128+halo) @ band (128+halo,
# 128). ~45x more MACs than the shift-add form, all on the MXU; the snake
# stays elementwise between the two GEMMs. Batch and channels fold into the
# GEMM M dimension, so even 24-channel stages feed full 128-row MXU tiles.

def _band_matrix(coefs, lo: int, k: int, n: int = 128) -> np.ndarray:
    """B[i, t] = coefs[i - t - lo] (0 <= i-t-lo < len) — y = W @ B computes
    y[t] = sum_d coefs[d] * w[t + lo + d] for 128-wide tiles w."""
    b = np.zeros((k, n), np.float32)
    for d, c in enumerate(coefs):
        for t in range(n):
            b[t + lo + d, t] = c
    return b


def _windows(x2d: Array, n_tiles: int, k: int, tile: int = 128) -> Array:
    """(M, L) -> (M, n_tiles, k) overlapping windows W[n] = x2d[:, n*tile :
    n*tile + k]; requires L >= (n_tiles + 1) * tile."""
    m = x2d.shape[0]
    a = x2d[:, :n_tiles * tile].reshape(m, n_tiles, tile)
    h = x2d[:, tile:(n_tiles + 1) * tile].reshape(
        m, n_tiles, tile)[:, :, :k - tile]
    return jnp.concatenate([a, h], axis=-1)


class MXUActivation1d:
    """Numerically equivalent to FusedActivation1d (2x/12-tap case), with
    the polyphase FIRs lowered as banded-matrix GEMMs on the MXU.

    Same math: replicate-pad(5), parity-split 6-tap upsample FIRs, pointwise
    activation, parity-merged 12-tap downsample with exact edge clamps —
    only the summation ORDER differs (fp32-accumulated dot products), so
    fp32 outputs agree to association error and bf16 inputs to bf16 noise.
    """

    _BANDS = None  # class-level cache: one build per process, reused by
    #                every activation site's trace

    def __init__(self, activation, ratio: int = 2, kernel_size: int = 12):
        assert ratio == 2 and kernel_size == 12, "fast path covers 2x/12"
        self.act = activation
        if MXUActivation1d._BANDS is None:
            # pure-numpy filters (constructing via UpSample1d would stage
            # the jnp constants when this __init__ runs inside a jit trace)
            f_up = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio,
                                        kernel_size) * 2.0
            f_dn = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio,
                                        kernel_size)
            # up_e[t] = sum_{o=2..7} f_up[15-2o] xp[t+o]
            # up_o[t] = sum_{o=3..8} f_up[16-2o] xp[t+o]
            be = _band_matrix([f_up[15 - 2 * o] for o in range(2, 8)], 2, 136)
            bo = _band_matrix([f_up[16 - 2 * o] for o in range(3, 9)], 3, 136)
            # y[i] = sum_{m=0..5} f_dn[2(m-2)+5] se_ext[i+m]
            #      + sum_{m=0..5} f_dn[2(m-3)+6] so_ext[i+m]
            bse = _band_matrix([f_dn[2 * (m - 2) + 5] for m in range(6)],
                               0, 133)
            bso = _band_matrix([f_dn[2 * (m - 3) + 6] for m in range(6)],
                               0, 133)
            MXUActivation1d._BANDS = (
                np.concatenate([be, bo], axis=1),    # (136, 256)
                np.concatenate([bse, bso], axis=0))  # (266, 128)
        self._b_up = jnp.asarray(MXUActivation1d._BANDS[0])
        self._b_dn = jnp.asarray(MXUActivation1d._BANDS[1])

    def __call__(self, x: Array) -> Array:
        b, c, t = x.shape
        m = b * c
        cdt = x.dtype
        n_t = -(-t // 128)
        # bf16 mode stores the FIR outputs bf16 (halves the intermediate HBM
        # bytes; MXU accumulation is fp32 internally either way); fp32 mode
        # keeps fp32 storage
        acc_t = jnp.float32 if cdt == jnp.float32 else cdt
        xp = pad_1d(x, 5, 5, mode="replicate").reshape(m, t + 10)
        xp = jnp.pad(xp, ((0, 0), (0, (n_t + 1) * 128 - (t + 10))))
        w_up = _windows(xp, n_t, 136)
        up = jnp.einsum("mnk,kp->mnp", w_up.astype(cdt),
                        self._b_up.astype(cdt),
                        preferred_element_type=acc_t)         # (M, nT, 256)
        up_e = up[..., :128].reshape(m, n_t * 128)[:, :t].reshape(b, c, t)
        up_o = up[..., 128:].reshape(m, n_t * 128)[:, :t].reshape(b, c, t)

        s_even = self.act(up_e.astype(cdt))
        s_odd = self.act(up_o.astype(cdt))

        first = s_even[..., :1]
        last = s_odd[..., -1:]
        se_ext = jnp.concatenate(
            [jnp.repeat(first, 2, -1), s_even, jnp.repeat(last, 3, -1)],
            -1).reshape(m, t + 5)
        so_ext = jnp.concatenate(
            [jnp.repeat(first, 3, -1), s_odd, jnp.repeat(last, 2, -1)],
            -1).reshape(m, t + 5)
        pad_to = (n_t + 1) * 128 - (t + 5)
        se_ext = jnp.pad(se_ext, ((0, 0), (0, pad_to)))
        so_ext = jnp.pad(so_ext, ((0, 0), (0, pad_to)))
        w_dn = jnp.concatenate([_windows(se_ext, n_t, 133),
                                _windows(so_ext, n_t, 133)], axis=-1)
        y = jnp.einsum("mnk,kp->mnp", w_dn.astype(cdt),
                       self._b_dn.astype(cdt),
                       preferred_element_type=acc_t)          # (M, nT, 128)
        return y.reshape(m, n_t * 128)[:, :t].reshape(b, c, t).astype(cdt)
