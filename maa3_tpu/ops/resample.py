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
