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


def quantize_weight_int8(w: Array, group_size: int = 0) -> dict:
    """Per-output-channel symmetric int8 quantization of a (..., in, out)
    matmul weight (leading dims, e.g. the stacked-depth axis, are preserved;
    `lax.scan` slices them per block). Returns {"w_q", "w_scale"}.

    group_size > 0 refines the scales per contiguous group of `group_size`
    input channels: w_q (..., G, gs, out) with w_scale (..., G, out). The
    grouped layout drives the G-batched int8 dot in dense_w8a8 (activations
    are then also quantized per (token, group), so BOTH quantization error
    sources shrink ~sqrt(in/gs) in the usual iid model)."""
    wf = w.astype(jnp.float32)
    if group_size:
        d_in = wf.shape[-2]
        assert d_in % group_size == 0, (d_in, group_size)
        g = d_in // group_size
        wf = wf.reshape(wf.shape[:-2] + (g, group_size, wf.shape[-1]))
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)     # (..., [G,] 1, out)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "w_scale": jnp.squeeze(scale, axis=-2)}


def dense_w8a8(params: dict, x: Array, compute_dtype=None) -> Array:
    """y = dequant(quant(x) @ w_q). x: (..., in); w_q: (in, out) int8, or
    (G, gs, out) for the per-group layout (quantize_weight_int8 group_size).

    Activations are quantized per token — per (token, group) in the grouped
    layout — max-abs symmetric at trace time, no calibration pass. The int8 x
    int8 matmul accumulates in int32 on the MXU; scale vectors are applied to
    the int32 result in fp32. The grouped path runs ONE G-batched int8 dot
    and contracts the (G, ..., out) partials in fp32.
    """
    w_q = params["w_q"]
    xf = x.astype(jnp.float32)
    if w_q.ndim == 3:                       # grouped: (G, gs, out)
        g, gs, out = w_q.shape
        xg = xf.reshape(xf.shape[:-1] + (g, gs))
        amax = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)   # (..., G, 1)
        sx = jnp.maximum(amax, 1e-12) / 127.0
        x_q = jnp.clip(jnp.round(xg / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(             # batch over G -> (G, ..., out)
            x_q, w_q,
            dimension_numbers=(((x_q.ndim - 1,), (1,)),
                               ((x_q.ndim - 2,), (0,))),
            preferred_element_type=jnp.int32)
        sxg = jnp.moveaxis(jnp.squeeze(sx, -1), -1, 0)        # (G, ...)
        ws = params["w_scale"].astype(jnp.float32)            # (G, out)
        ws = ws.reshape((g,) + (1,) * (x.ndim - 1) + (out,))
        y = jnp.sum(acc.astype(jnp.float32) * sxg[..., None] * ws, axis=0)
    else:
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)      # (..., 1)
        sx = jnp.maximum(amax, 1e-12) / 127.0
        x_q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_q, w_q,
            dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * sx
             * params["w_scale"].astype(jnp.float32))
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    return y


def _smooth_scales(a_x: Array, a_w: Array, alpha: float) -> Array:
    """SmoothQuant migration scales s_j = amax(X_j)^a / amax(W_j)^(1-a),
    guarded for dead channels and clipped to a sane range."""
    s = (jnp.power(jnp.maximum(a_x, 1e-12), alpha)
         / jnp.power(jnp.maximum(a_w, 1e-12), 1.0 - alpha))
    s = jnp.where(a_x > 1e-12, s, 1.0)
    return jnp.clip(s, 1e-2, 1e2)


def _in_amax(w: Array) -> Array:
    """Per-input-channel weight amax of a (..., in, out) matmul weight."""
    return jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1)


def calibrate_dit_smooth(dit_params: dict, cfg, x0: Array, context: Array,
                         uncond: Array, guidance_scale: float = 5.0,
                         steps: int = 25,
                         compute_dtype=jnp.bfloat16) -> dict:
    """Run the real CFG Euler ODE once, collecting per-(block, channel) amax
    of the three quantized-GEMM inputs (wqkv in, w13 in, w2 in = SwiGLU
    product) across all steps. Returns {"attn_in"/"ffn_in": (depth, H),
    "ffn_prod": (depth, H')} numpy-backed stats for smooth_migrate_dit.

    One jitted per-step program (same shapes every step); the 24-iteration
    host loop is calibration-only."""
    import numpy as np

    from maa3_tpu.diffusion import cfm
    from maa3_tpu.models.dit import dit_apply_planned, dit_sample_plan

    ctx_in = jnp.concatenate([uncond, context], axis=0)
    t_ints = cfm.planned_t_ints(steps)
    plan = dit_sample_plan(dit_params, cfg, t_ints, ctx_in,
                           compute_dtype=compute_dtype)
    t_grid = np.asarray(cfm.euler_t_grid(steps))
    gs = float(guidance_scale)

    @jax.jit
    def step_fn(p, x, mod, final, yk, yv, dt):
        x_in = jnp.concatenate([x, x], axis=0)
        e, st = dit_apply_planned(p, cfg, x_in, mod, final, yk, yv,
                                  compute_dtype=compute_dtype,
                                  return_stats=True)
        e_uc, e_c = jnp.split(e, 2, axis=0)
        v = e_uc + gs * (e_c - e_uc)
        return x + dt * v, st

    x, agg = x0, None
    for i in range(steps - 1):
        x, st = step_fn(dit_params, x, plan["mods"][i], plan["final"][i],
                        plan["yk"], plan["yv"],
                        jnp.float32(t_grid[i + 1] - t_grid[i]))
        st = jax.tree.map(np.asarray, st)
        agg = st if agg is None else jax.tree.map(np.maximum, agg, st)
    return agg


def smooth_migrate_dit(dit_params: dict, stats: dict,
                       alpha: float = 0.5) -> dict:
    """SmoothQuant-style scale migration, folded entirely into existing
    weights (ZERO runtime cost — no new ops):

      wqkv input x/s1:  attention_norm.weight /= s1, adaLN shift_msa
                        out-columns /= s1, wqkv input rows *= s1
      w13 input  x/s2:  ffn_norm.weight /= s2, adaLN shift_mlp /= s2,
                        w1/w3 input rows *= s2
      w2 input   x/s3:  w3 OUTPUT columns /= s3 (the SwiGLU product scales
                        linearly in x3), w2 input rows *= s3

    Exact in real arithmetic (modulate(x,(shift)/s,scale) == modulate(x,
    shift,scale)/s channel-wise since x*(1+scale) is elementwise); the
    quantized GEMMs then see per-channel-equalized activations, which is
    where per-token max-abs quantization loses accuracy on outlier channels.
    Apply BEFORE quantize_dit_serving, on fused or unfused layouts.
    Ref: the int8 drift frontier DRIFT_R03 (per-channel 4.1e-3 vs g128
    2.1e-3 at +60 % latency — this targets g128 accuracy at zero cost)."""
    p = dict(dit_params)
    blocks = dict(p["blocks"])
    att = dict(blocks["attention"])
    ffn = dict(blocks["feed_forward"])
    h_dim = blocks["attention_norm"]["weight"].shape[-1]

    # --- s1: wqkv input -----------------------------------------------------
    if "wqkv" in att:
        a_w1 = _in_amax(att["wqkv"]["w"])
    else:
        a_w1 = jnp.maximum(jnp.maximum(_in_amax(att["wq"]["w"]),
                                       _in_amax(att["wk"]["w"])),
                           _in_amax(att["wv"]["w"]))
    s1 = _smooth_scales(jnp.asarray(stats["attn_in"]), a_w1, alpha)
    for k in ("wqkv",) if "wqkv" in att else ("wq", "wk", "wv"):
        att[k] = {**att[k], "w": att[k]["w"] * s1[..., :, None].astype(att[k]["w"].dtype)}
    blocks["attention"] = att
    blocks["attention_norm"] = {
        "weight": blocks["attention_norm"]["weight"] / s1}

    # --- s2: w1/w3 input; s3: w2 input (SwiGLU product) --------------------
    if "w13" in ffn or "w1" in ffn:  # dense SwiGLU (MoE experts stay as-is)
        if "w13" in ffn:
            a_w2 = _in_amax(ffn["w13"]["w"])
        else:
            a_w2 = jnp.maximum(_in_amax(ffn["w1"]["w"]),
                               _in_amax(ffn["w3"]["w"]))
        s2 = _smooth_scales(jnp.asarray(stats["ffn_in"]), a_w2, alpha)
        s3 = _smooth_scales(jnp.asarray(stats["ffn_prod"]),
                            _in_amax(ffn["w2"]["w"]), alpha)
        if "w13" in ffn:
            w = ffn["w13"]["w"]
            hp = w.shape[-1] // 2
            w = w * s2[..., :, None].astype(w.dtype)
            w = w.at[..., :, hp:].divide(s3[..., None, :].astype(w.dtype))
            ffn["w13"] = {**ffn["w13"], "w": w}
        else:
            ffn["w1"] = {**ffn["w1"],
                         "w": ffn["w1"]["w"] * s2[..., :, None].astype(ffn["w1"]["w"].dtype)}
            w3 = ffn["w3"]["w"] * s2[..., :, None].astype(ffn["w3"]["w"].dtype)
            w3 = w3 / s3[..., None, :].astype(w3.dtype)
            ffn["w3"] = {**ffn["w3"], "w": w3}
        ffn["w2"] = {**ffn["w2"],
                     "w": ffn["w2"]["w"] * s3[..., :, None].astype(ffn["w2"]["w"].dtype)}
        blocks["feed_forward"] = ffn
        blocks["ffn_norm"] = {"weight": blocks["ffn_norm"]["weight"] / s2}
    else:
        s2 = None

    # --- adaLN shift chunks (layout: [shift_msa, scale_msa, gate_msa,
    # shift_mlp, scale_mlp, gate_mlp] along the 6H out axis) ----------------
    ada = dict(blocks["adaLN"])
    w = ada["w"]
    w = w.at[..., :, 0:h_dim].divide(s1[..., None, :].astype(w.dtype))
    if s2 is not None:
        w = w.at[..., :, 3 * h_dim:4 * h_dim].divide(
            s2[..., None, :].astype(w.dtype))
    ada["w"] = w
    if ada.get("b") is not None:
        b = ada["b"]
        b = b.at[..., 0:h_dim].divide(s1.astype(b.dtype))
        if s2 is not None:
            b = b.at[..., 3 * h_dim:4 * h_dim].divide(s2.astype(b.dtype))
        ada["b"] = b
    blocks["adaLN"] = ada
    p["blocks"] = blocks
    return p


def quantize_dit_serving(dit_params: dict, group_size: int = 0,
                         skip_w2: bool = False,
                         classes: "Optional[Sequence[str]]" = None,
                         group_for: "Optional[dict]" = None) -> dict:
    """Quantize the per-ODE-step fat GEMMs of a DiT param tree to int8:
    the qkv and SwiGLU projections plus w2 — in either layout (fused wqkv/
    w13 from utils.nprand.fuse_dit_gemms, or the canonical unfused names —
    the unfused form is what tensor-parallel serving shards, since the
    fused concat axis does not align with TP shard boundaries). Everything
    else (wo — measured slower under dynamic quant at its 1152x1152
    shape — plus all hoisted/one-time GEMMs, norms, gates) is left
    untouched. Works on the stacked-depth pytree; apply BEFORE
    cast_matmul_weights so scales come from fp32.

    group_size > 0 selects per-group weight + per-(token, group) activation
    scales (see quantize_weight_int8) — single-chip serving only (the grouped
    axis is not covered by the TP shard specs). skip_w2 leaves the FFN
    down-projection in bf16: w2's input is the SwiGLU product, the widest-
    dynamic-range activation in the block, so it dominates the a8 error while
    carrying only ~1/5 of the per-step GEMM FLOPs.

    classes restricts quantization to a subset of {"wqkv", "w13", "w2"}
    (per-GEMM-class error decomposition, DRIFT_R05); group_for maps a class
    to its own group size (hybrid modes: e.g. {"w2": 128} runs g128 only on
    the widest-dynamic-range GEMM and per-channel elsewhere)."""
    active = (set(classes) if classes is not None
              else {"wqkv", "w13"} | (set() if skip_w2 else {"w2"}))
    gf = group_for or {}
    p = dict(dit_params)
    blocks = dict(p["blocks"])
    att = dict(blocks["attention"])
    if "wqkv" in active:
        for k in ("wqkv",) if "wqkv" in att else ("wq", "wk", "wv"):
            att[k] = quantize_weight_int8(att[k]["w"],
                                          gf.get("wqkv", group_size))
    blocks["attention"] = att
    ffn = dict(blocks["feed_forward"])
    if "w13" in ffn or "w1" in ffn:  # dense SwiGLU; MoE experts stay float
        if "w13" in active:
            for k in ("w13",) if "w13" in ffn else ("w1", "w3"):
                ffn[k] = quantize_weight_int8(ffn[k]["w"],
                                              gf.get("w13", group_size))
        if "w2" in active:
            ffn["w2"] = quantize_weight_int8(ffn["w2"]["w"],
                                             gf.get("w2", group_size))
        blocks["feed_forward"] = ffn
    p["blocks"] = blocks
    return p
