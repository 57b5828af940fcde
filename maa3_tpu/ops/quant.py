"""int8 (w8a8) quantized GEMMs for the DiT serving fast path.

TPU v5e's MXU runs int8 x int8 -> int32 matmuls at 2x the bf16 rate
(393.7 vs 196.9 peak TOPS/TFLOPS), and the per-step DiT GEMMs at serving
shapes are compute-bound (measured: a 624x3456x3456 GEMM runs 81 us bf16 vs
48 us with dynamic int8 quantization — 1.7x; see TRAIN_r04/PROBES). This
module provides:

- per-output-channel symmetric weight quantization (offline, one-time),
- per-token symmetric dynamic activation quantization (fused by XLA into the
  surrounding elementwise work; measured nearly free at M >= 624),
- the int8 dense path that `ops.basic.dense` dispatches to when it sees a
  quantized parameter dict ({"w_q": int8, "w_scale": fp32}).

This is a *serving mode* (MAA3System.set_serving_quant / serve_quant="int8"),
applied to the fused per-ODE-step projections (wqkv, w13, w2) only: hoisted
one-time GEMMs (adaLN modulations, cross-attn K/V, embedders) and the tiny
wo / proj_in / final_layer stay bf16/fp32. The reference has no quantized
serving path at all; this is a TPU-native extension, structurally similar to
SmoothQuant-style W8A8 but without smoothing (per-token scales absorb
activation outliers at these shapes).

Numerics: weights round to 8 bits per channel (max-abs scaling), activations
to 8 bits per token. Quantize from the canonical fp32 weights (not the bf16
serving cast) — `MAA3System.serving_dit` orders fuse -> quantize -> cast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def quantize_weight_int8(w: Array) -> dict:
    """Per-output-channel symmetric int8 quantization of a (..., in, out)
    matmul weight (leading dims, e.g. the stacked-depth axis, are preserved;
    `lax.scan` slices them per block). Returns {"w_q", "w_scale"}."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)        # (..., 1, out)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "w_scale": jnp.squeeze(scale, axis=-2)}  # (..., out)


def dense_w8a8(params: dict, x: Array, compute_dtype=None) -> Array:
    """y = dequant(quant(x) @ w_q). x: (..., in); w_q: (in, out) int8.

    Activations are quantized per token (max-abs over the feature axis,
    symmetric) at trace time — no calibration pass. The int8 x int8 matmul
    accumulates in int32 on the MXU; the two rank-1 scale vectors are applied
    to the int32 result in fp32.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)          # (..., 1)
    sx = jnp.maximum(amax, 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, params["w_q"],
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * params["w_scale"].astype(jnp.float32)
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    return y


def quantize_dit_serving(dit_params: dict) -> dict:
    """Quantize the per-ODE-step fat GEMMs of a DiT param tree to int8:
    the qkv and SwiGLU projections plus w2 — in either layout (fused wqkv/
    w13 from utils.nprand.fuse_dit_gemms, or the canonical unfused names —
    the unfused form is what tensor-parallel serving shards, since the
    fused concat axis does not align with TP shard boundaries). Everything
    else (wo — measured slower under dynamic quant at its 1152x1152
    shape — plus all hoisted/one-time GEMMs, norms, gates) is left
    untouched. Works on the stacked-depth pytree; apply BEFORE
    cast_matmul_weights so scales come from fp32."""
    p = dict(dit_params)
    blocks = dict(p["blocks"])
    att = dict(blocks["attention"])
    for k in ("wqkv",) if "wqkv" in att else ("wq", "wk", "wv"):
        att[k] = quantize_weight_int8(att[k]["w"])
    blocks["attention"] = att
    ffn = dict(blocks["feed_forward"])
    if "w13" in ffn or "w1" in ffn:  # dense SwiGLU; MoE experts stay float
        for k in ("w13",) if "w13" in ffn else ("w1", "w3"):
            ffn[k] = quantize_weight_int8(ffn[k]["w"])
        ffn["w2"] = quantize_weight_int8(ffn["w2"]["w"])
        blocks["feed_forward"] = ffn
    p["blocks"] = blocks
    return p
