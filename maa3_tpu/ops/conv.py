"""1-D convolution primitives in torch-compatible NCL layout.

Weights are stored torch-style (out_ch, in_ch, k) so checkpoint import is a
straight copy; XLA repacks layouts for the MXU internally. Used by the 1-D VAE
(ldm/models/autoencoder1d.py) and BigVGAN (vocoder/bigvgan/models.py).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_DN = lax.conv_dimension_numbers((1, 1, 1), (1, 1, 1), ("NCH", "OIH", "NCH"))


def conv1d_init(key: Array, in_ch: int, out_ch: int, kernel_size: int,
                groups: int = 1) -> dict:
    """Kaiming-uniform init matching torch.nn.Conv1d defaults (host-side RNG)."""
    from maa3_tpu.utils import nprand
    rng = nprand.np_rng(key)
    fan_in = (in_ch // groups) * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    w = jnp.asarray(rng.uniform(-bound, bound,
                                (out_ch, in_ch // groups, kernel_size)).astype("float32"))
    b = jnp.asarray(rng.uniform(-bound, bound, (out_ch,)).astype("float32"))
    return {"w": w, "b": b}


def conv1d(params: dict, x: Array, stride: int = 1, padding=0,
           dilation: int = 1, groups: int = 1, compute_dtype=None) -> Array:
    """x: (B, C, T). padding: int (symmetric) or (lo, hi) tuple."""
    w = params["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    if isinstance(padding, int):
        padding = (padding, padding)
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
    if "b" in params and params["b"] is not None:
        y = y + params["b"].astype(y.dtype)[None, :, None]
    return y


def conv1d_unfold(params: dict, x: Array, padding=0, dilation: int = 1,
                  compute_dtype=None) -> Array:
    """Stride-1 dilated conv lowered as explicit unfold + ONE GEMM.

    (C_out, C_in*k) @ (C_in*k, T) keeps T on the 128-lane minor axis. On the
    narrow-channel BigVGAN tail stages (C <= 192) the stock lax.conv lowering
    starves the MXU (C_in is the contraction axis, padded to 128 lanes per
    tap); this re-lowering measured 4-7x faster at batch 1 on v5e
    (C24/T160k: 0.517 -> 0.069 ms per k=11 conv, rel err ~2e-7). Pure jnp,
    so it is differentiable and backend-agnostic; numerically it is the same
    MXU fp32-accumulated contraction as lax.conv.
    """
    w, b = params["w"], params.get("b")
    c_out, c_in, k = w.shape
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    if isinstance(padding, int):
        padding = (padding, padding)
    t_out = x.shape[-1] + padding[0] + padding[1] - (k - 1) * dilation
    xp = jnp.pad(x, ((0, 0), (0, 0), padding))
    # tap-major unfold: block j holds channels of tap j, matching the
    # (o, k, c) -> (o, k*c) weight reshape below
    cols = jnp.concatenate(
        [lax.dynamic_slice_in_dim(xp, j * dilation, t_out, axis=2)
         for j in range(k)], axis=1)                      # (B, k*C_in, T)
    y = jnp.einsum("oc,bct->bot",
                   w.transpose(0, 2, 1).reshape(c_out, k * c_in), cols,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)[None, :, None]
    return y


def quantize_conv_int8(params: dict) -> dict:
    """Per-output-channel symmetric int8 quantization of a conv1d weight.

    Stores the weight pre-reshaped to the tap-major (C_out, k*C_in) GEMM
    layout of conv1d_unfold, so serving pays no transpose. Scales come from
    the fp32 weights (quantize before any bf16 cast). Returns
    {"w_q", "w_scale", "b", "k"} — the "w_q" marker is what routes a conv
    site to conv1d_unfold_w8a8."""
    w = params["w"].astype(jnp.float32)         # (o, i, k)
    o, i, k = w.shape
    w2 = w.transpose(0, 2, 1).reshape(o, k * i)
    amax = jnp.max(jnp.abs(w2), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w2 / scale), -127, 127).astype(jnp.int8)
    # no static leaves in the pytree (jit/optimizer contract): k is derived
    # from shapes at apply time (w_q.shape[1] // x.shape[1])
    out = {"w_q": w_q, "w_scale": scale[:, 0]}
    if params.get("b") is not None:
        out["b"] = params["b"]
    return out


def conv1d_unfold_w8a8(qparams: dict, x: Array, padding=0,
                       dilation: int = 1) -> Array:
    """int8 x int8 -> int32 MXU lowering of the stride-1 unfold-GEMM conv.

    Same contraction as conv1d_unfold, with the im2col buffer quantized to
    int8 per output column (one max-abs scale per (batch, t) window, so every
    tap inside a window shares its scale and the dequant stays a rank-1
    outer product: y = int32_acc * w_scale[o] * x_scale[b,t]). Halves the
    HBM traffic of the dominant (B, k*C, T) buffer AND doubles the MXU rate —
    the two measured bottlenecks of the wide batched BigVGAN stages
    (PROBE_VOC_B8_ROUTE). Serving-only: no VJP, vocoder-GAN training uses the
    float paths."""
    w_q = qparams["w_q"]
    c_in = x.shape[1]
    k = w_q.shape[1] // c_in
    assert k * c_in == w_q.shape[1], (x.shape, w_q.shape)
    if isinstance(padding, int):
        padding = (padding, padding)
    t_out = x.shape[-1] + padding[0] + padding[1] - (k - 1) * dilation
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), padding))
    cols = jnp.concatenate(
        [lax.dynamic_slice_in_dim(xp, j * dilation, t_out, axis=2)
         for j in range(k)], axis=1)                      # (B, k*C_in, T)
    amax = jnp.max(jnp.abs(cols), axis=1, keepdims=True)  # (B, 1, T)
    sx = jnp.maximum(amax, 1e-12) / 127.0
    cols_q = jnp.clip(jnp.round(cols / sx), -127, 127).astype(jnp.int8)
    acc = jnp.einsum("ok,bkt->bot", w_q, cols_q,
                     preferred_element_type=jnp.int32)
    y = (acc.astype(jnp.float32) * sx
         * qparams["w_scale"].astype(jnp.float32)[None, :, None])
    if qparams.get("b") is not None:
        y = y + qparams["b"].astype(jnp.float32)[None, :, None]
    return y.astype(x.dtype)


def conv1d_tapgemm_w8a8(qparams: dict, x: Array, padding=0,
                        dilation: int = 1) -> Array:
    """int8 conv as k shifted tap-GEMMs — the WIDE-channel w8a8 lowering.

    At C >= ~384 the unfold-GEMM's k-fold im2col duplication costs more
    than it saves (measured: res0 768ch b8 63 ms unfold-int8 vs 36 ms
    bf16 lax.conv); here x is quantized ONCE per (batch, timestep) column
    and each tap j contributes W_j_q @ x_q[:, t + j*d] as a standard int8
    MXU GEMM, dequantized per tap with its own shifted activation-scale
    slice (so granularity matches the per-window unfold scheme). No im2col
    buffer: the int8 x_q (B, C, T) is read k times from cache-resident HBM.
    Uses the same {"w_q" (C_out, k*C_in) tap-major, "w_scale", "b"} params
    as conv1d_unfold_w8a8 (quantize_conv_int8)."""
    w_q = qparams["w_q"]
    c_in = x.shape[1]
    k = w_q.shape[1] // c_in
    c_out = w_q.shape[0]
    if isinstance(padding, int):
        padding = (padding, padding)
    t_out = x.shape[-1] + padding[0] + padding[1] - (k - 1) * dilation
    xf = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), padding))
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)       # (B, 1, Tp)
    sx = jnp.maximum(amax, 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    w_taps = w_q.reshape(c_out, k, c_in)
    y = None
    for j in range(k):
        xs = lax.dynamic_slice_in_dim(x_q, j * dilation, t_out, axis=2)
        ss = lax.dynamic_slice_in_dim(sx, j * dilation, t_out, axis=2)
        acc = jnp.einsum("oc,bct->bot", w_taps[:, j], xs,
                         preferred_element_type=jnp.int32)
        contrib = acc.astype(jnp.float32) * ss
        y = contrib if y is None else y + contrib
    y = y * qparams["w_scale"].astype(jnp.float32)[None, :, None]
    if qparams.get("b") is not None:
        y = y + qparams["b"].astype(jnp.float32)[None, :, None]
    return y.astype(x.dtype)


def conv_transpose1d(params: dict, x: Array, stride: int, padding: int = 0,
                     groups: int = 1, compute_dtype=None) -> Array:
    """torch.nn.ConvTranspose1d semantics: out = (T-1)*stride - 2*pad + k.

    Implemented as an input-dilated convolution with the flipped, transposed
    kernel — the standard XLA lowering (lhs_dilation == fractional stride).
    Weight layout is torch's ConvTranspose1d (in_ch, out_ch//groups, k).
    """
    w = params["w"]  # (in, out//groups, k)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    k = w.shape[-1]
    if groups == 1:
        w_conv = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # (out, in, k)
    else:
        in_ch = w.shape[0]
        w_g = w.reshape(groups, in_ch // groups, w.shape[1], k)
        w_g = jnp.flip(w_g, axis=-1).transpose(0, 2, 1, 3)  # (g, out//g, in//g, k)
        w_conv = w_g.reshape(groups * w.shape[1], in_ch // groups, k)
    pad = k - 1 - padding
    y = lax.conv_general_dilated(
        x, w_conv,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
    if "b" in params and params["b"] is not None:
        y = y + params["b"].astype(y.dtype)[None, :, None]
    return y


def conv_transpose1d_polyphase(params: dict, x: Array, stride: int,
                               padding: int = 0, compute_dtype=None) -> Array:
    """ConvTranspose1d lowered as ONE dense polyphase conv + interleave.

    For k <= 3*stride (all BigVGAN stages use k = 2*stride), every output
    sample y[u*m + r] = sum_d x[m+d] * W[:, :, r + pad - u*d] with d in
    {-1, 0, 1}. That's a kernel-3 conv producing (u*out_ch) channels,
    reshaped to (out_ch, u*T) — a single dense MXU GEMM instead of the
    zero-stuffed lhs-dilated conv (which wastes (u-1)/u of its MACs on
    structural zeros). Exactly equal to torch ConvTranspose1d output.
    """
    w = params["w"]  # (in, out, k) torch ConvTranspose layout
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    cin, cout, k = w.shape
    u = stride
    # output length (T-1)*u - 2p + k must equal u*T (true for BigVGAN's
    # k = 2u, p = u/2 stages); wider kernels would need more polyphase taps
    assert k <= 3 * u and k - 2 * padding == u, (
        f"polyphase lowering needs k<=3u and k-2p==u, got k={k} u={u} p={padding}")
    b, _, t = x.shape

    # W3[(r, o), i, tau] = W[i, o, r + pad + u - u*tau], zero outside [0, k)
    kappa = (padding + u + jnp.arange(u)[:, None]
             - u * jnp.arange(3)[None, :])                  # (u, 3)
    valid = (kappa >= 0) & (kappa < k)
    w_ext = jnp.concatenate(
        [w, jnp.zeros((cin, cout, 1), w.dtype)], axis=-1)   # κ=k slot -> 0
    gath = w_ext[:, :, jnp.where(valid, kappa, k)]          # (in, out, u, 3)
    w3 = gath.transpose(2, 1, 0, 3).reshape(u * cout, cin, 3)

    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)))
    y = lax.conv_general_dilated(xp, w3, window_strides=(1,), padding=[(0, 0)],
                                 dimension_numbers=_DN)     # (B, u*out, T)
    y = y.reshape(b, u, cout, t).transpose(0, 2, 3, 1).reshape(b, cout, u * t)
    if "b" in params and params["b"] is not None:
        y = y + params["b"].astype(y.dtype)[None, :, None]
    return y


def pad_1d(x: Array, pad_left: int, pad_right: int, mode: str = "constant") -> Array:
    """Pad the trailing (time) axis of (B, C, T) or (B, T)."""
    cfg = [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)]
    if mode == "constant":
        return jnp.pad(x, cfg)
    if mode == "reflect":
        return jnp.pad(x, cfg, mode="reflect")
    if mode == "replicate":
        return jnp.pad(x, cfg, mode="edge")
    raise ValueError(f"unknown pad mode {mode!r}")
