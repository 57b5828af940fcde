"""Next-DiT (Lumina-Next) text-conditioned flow backbone, TPU-native.

Capability parity with TxtFlagLargeDiT / TxtFlagLargeImprovedDiTV2
(ldm/modules/diffusionmodules/flag_large_dit.py:128-299):

  x (B, C, T) latents -> proj_in -> depth x [RoPE self-attn + gated cross-attn
  to text context + SwiGLU FFN, all 6-way adaLN-modulated] -> zero-init
  FinalLayer -> (B, C, T) velocity.

TPU-first design choices (not a port):
- Transformer blocks are *stacked* into one pytree (leading `depth` axis) and
  iterated with `lax.scan` — one compiled block body instead of `depth` copies;
  compile time and HBM code footprint drop ~depth-fold.
- RoPE tables are computed inside the jitted apply (constant-folded by XLA),
  so there is no device-placement statefulness (the reference hard-codes
  `.cuda()` at flag_large_dit.py:245).
- bf16 matmuls with fp32 islands: RoPE rotation, norm statistics, softmax,
  adaLN modulation branch, and the final layer run in fp32.
- All shapes static; padding masks (instead of varlen unpad) handle ragged
  batches, mirroring flash-attn varlen semantics exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from maa3_tpu.ops.basic import (
    dense, dense_init, layer_norm, modulate, rms_norm, rms_norm_init, silu,
    timestep_embedder_init, timestep_embedder_apply,
)
from maa3_tpu.ops.attention import attention_apply, attention_init
from maa3_tpu.ops.ffn import feed_forward_apply, feed_forward_init
from maa3_tpu.ops.rope import precompute_rope

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    in_channels: int = 20
    context_dim: int = 1024
    hidden_size: int = 768
    depth: int = 16
    num_heads: int = 32
    max_len: int = 1000
    n_kv_heads: Optional[int] = None
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    norm_eps: float = 1e-5
    qk_norm: bool = False
    rope_scaling_factor: float = 1.0
    ntk_factor: float = 1.0
    # Pallas flash-attention: None = mode-aware auto; True/False = force.
    # After the grouped rewrite the kernel's FORWARD beats XLA dense
    # 1.5-2.3x from seq 624 up (PROBE_FLASH_SERVE.json), and
    # the auto threshold is MODE-AWARE (flash_for_len). Training: with the
    # fused single-pass MASKLESS backward (round 4) the flash train grad
    # reaches parity at seq 1248 on the proxy (0.995x) and WINS 1.12x in
    # the XL end-to-end step at the any-len collate cap (b6 x latent 1248:
    # MFU 0.415 vs 0.369, TRAIN_r06) and 1.9x at 2048 — auto-route to the
    # kernel from seq 1248 (real-shape long-mel training stops paying the
    # dense O(L^2) score HBM).
    # Inference: at the production seq 312 the isolated op is ~0.1 ms, so
    # the pallas_call fusion barrier costs more end-to-end than the kernel
    # saves (PROBE_FLASH_E2E.json: forcing it ON loses throughput at every
    # serving batch) — stay dense until seq ~4k. Past seq ~4-8k dense's
    # O(L^2) score buffers blow the HBM budget in either mode (one B*H*L^2
    # bf16 score set is 2.1 GiB at L=8192/B2/H8 and the dense backward
    # keeps several alive) — there the O(L)-memory kernel (fwd AND bwd,
    # ops/flash_attention.py) is the only viable route.
    use_flash: "Optional[bool]" = None
    # bf16-serving drift levers (no effect in fp32 mode): keep the attention
    # score matrices in fp32 (the HBM cost only matters at batch >= 4), and
    # carry the residual stream in fp32 between blocks (activations are tiny
    # next to weights at small batch; matmul inputs still cast to bf16)
    fp32_scores: bool = False
    fp32_residual: bool = False
    # rematerialize each block in the backward pass (training memory lever:
    # saves only the per-block residual stream instead of attention probs /
    # FFN hiddens — trades ~1 extra forward for ~10x less activation HBM)
    remat: bool = False
    # remat granularity: "nothing" recomputes the whole block (max memory
    # savings); "dots_no_batch" keeps every weight-GEMM output and recomputes
    # only attention scores/probs + elementwise (flash-attention-style
    # policy: ~zero extra GEMM FLOPs, still drops the O(L^2) ephemerals)
    remat_policy: str = "nothing"
    # Megatron-style sequence parallelism (TP training): constrain the
    # residual stream between blocks to be sharded over the sequence axis on
    # the 'model' mesh axis. GSPMD then turns each row-parallel (wo/w2)
    # all-reduce into reduce-scatter + all-gather-at-next-GEMM — same comm
    # bytes, but the inter-block activations (and their saved residuals
    # under remat) are stored 1/n_model per chip. No-op off-mesh / at TP=1.
    seq_parallel: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    def flash_for_len(self, seq_len: int, training: bool = False) -> bool:
        if self.use_flash is not None:
            return self.use_flash
        return seq_len >= 1248 if training else seq_len > 4096

    def resolve_flash(self, seq_len: int, training: bool) -> "DiTConfig":
        """Pin use_flash for this apply (a trace-time decision): the block
        bodies then route unconditionally and training/inference can differ."""
        if self.use_flash is not None:
            return self
        return dataclasses.replace(
            self, use_flash=self.flash_for_len(seq_len, training))


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _block_init(key: Array, cfg: DiTConfig) -> dict:
    """One TransformerBlock (flag_large_dit.py:32-54). adaLN zero-init per
    TxtFlagLargeImprovedDiTV2.initialize_weights (flag_large_dit.py:288-291)."""
    ks = jax.random.split(key, 3)
    d = cfg.hidden_size
    return {
        "attention": attention_init(ks[0], d, cfg.num_heads, cfg.n_kv_heads,
                                    cfg.qk_norm, cfg.context_dim),
        "feed_forward": feed_forward_init(ks[1], d, 4 * d, cfg.multiple_of,
                                          cfg.ffn_dim_multiplier),
        "attention_norm": rms_norm_init(d),
        "ffn_norm": rms_norm_init(d),
        "attention_y_norm": rms_norm_init(cfg.context_dim),
        "adaLN": dense_init(ks[2], d, 6 * d, init="zeros"),
    }


def dit_init(key: Array, cfg: DiTConfig) -> dict:
    ks = jax.random.split(key, 6 + cfg.depth)
    d = cfg.hidden_size
    blocks = [_block_init(ks[6 + i], cfg) for i in range(cfg.depth)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "proj_in": dense_init(ks[0], cfg.in_channels, d),
        "t_embedder": timestep_embedder_init(ks[1], d),
        "cap_embedder": {
            "norm": {"weight": jnp.ones((cfg.context_dim,)),
                     "bias": jnp.zeros((cfg.context_dim,))},
            "linear": dense_init(ks[2], cfg.context_dim, d),
        },
        "blocks": stacked,
        "final_layer": {
            # zero-init linear + adaLN (flag_large_dit.py:293-297)
            "linear": dense_init(ks[3], d, cfg.in_channels, init="zeros"),
            "adaLN": dense_init(ks[4], d, 2 * d, init="zeros"),
        },
    }


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _block_apply(p: dict, cfg: DiTConfig, x: Array, cos: Array, sin: Array,
                 y: Array, adaln: Array, x_mask, y_mask, compute_dtype) -> Array:
    """TransformerBlock.forward with adaln_input (flag_large_dit.py:79-91)."""
    mod = dense(p["adaLN"], silu(adaln.astype(jnp.float32)))  # fp32 island
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
        jnp.split(mod, 6, axis=-1))

    h_attn = attention_apply(
        p["attention"],
        modulate(rms_norm(p["attention_norm"], x, cfg.norm_eps), shift_msa, scale_msa),
        cos, sin,
        y=rms_norm(p["attention_y_norm"], y, cfg.norm_eps),
        x_mask=x_mask, y_mask=y_mask,
        n_heads=cfg.num_heads, n_kv_heads=cfg.n_kv_heads,
        compute_dtype=compute_dtype,
        use_flash=cfg.flash_for_len(x.shape[1]),
        fp32_scores=cfg.fp32_scores,
    )
    h = x + gate_msa[:, None, :].astype(x.dtype) * h_attn

    h_ffn = feed_forward_apply(
        p["feed_forward"],
        modulate(rms_norm(p["ffn_norm"], h, cfg.norm_eps), shift_mlp, scale_mlp),
        compute_dtype,
    )
    return h + gate_mlp[:, None, :].astype(h.dtype) * h_ffn


def final_layer_apply(p: dict, x: Array, c: Array) -> Array:
    """FinalLayer (flag_large_dit.py:101-124): non-affine LN, 2-way modulate,
    zero-init linear. Runs fully in fp32 — it sets the ODE velocity scale."""
    mod = dense(p["adaLN"], silu(c.astype(jnp.float32)))
    shift, scale = jnp.split(mod, 2, axis=-1)
    x = modulate(layer_norm(x.astype(jnp.float32), eps=1e-6), shift, scale)
    return dense(p["linear"], x)


def dit_apply(params: dict, cfg: DiTConfig, x: Array, t: Array,
              context: Array, x_mask: Optional[Array] = None,
              context_mask: Optional[Array] = None,
              compute_dtype=jnp.bfloat16, training: bool = False) -> Array:
    """Forward pass. x: (B, C, T); t: (B,) timesteps in [0, 1000);
    context: (B, Ly, context_dim). Returns (B, C, T) velocity.

    training=True selects the train-side flash-attention auto threshold
    (the fused maskless backward wins from seq 1248; inference stays dense
    to 4096).

    Parity: TxtFlagLargeDiT.forward (flag_large_dit.py:177-210).
    """
    b, c, tlen = x.shape
    cfg = cfg.resolve_flash(tlen, training)
    x = x.transpose(0, 2, 1)  # (B, T, C)
    x = dense(params["proj_in"], x, compute_dtype)
    if cfg.fp32_residual:
        x = x.astype(jnp.float32)  # fp32 carry between blocks

    t_emb = timestep_embedder_apply(params["t_embedder"], t)  # fp32 (B, H)

    # pooled caption feature -> cap_embedder (mask-weighted mean; all-ones
    # mask == plain mean, flag_large_dit.py:195-198)
    ctx_f = context.astype(jnp.float32)
    if context_mask is not None:
        mf = context_mask.astype(jnp.float32)[:, :, None]
        pooled = (ctx_f * mf).sum(axis=1) / jnp.maximum(mf.sum(axis=1), 1.0)
    else:
        pooled = ctx_f.mean(axis=1)
    ce = params["cap_embedder"]
    cap_emb = dense(ce["linear"],
                    layer_norm(pooled, ce["norm"]["weight"], ce["norm"]["bias"], eps=1e-5))
    adaln_input = t_emb + cap_emb  # (B, H) fp32

    cos, sin = precompute_rope(cfg.head_dim, tlen, rope_scaling_factor=cfg.rope_scaling_factor,
                               ntk_factor=cfg.ntk_factor)

    y = context

    if cfg.seq_parallel:
        from jax.sharding import PartitionSpec as _P
        seq_spec = _P(None, "model", None)
        x = jax.lax.with_sharding_constraint(x, seq_spec)

    def body(h, block_params):
        h = _block_apply(block_params, cfg, h, cos, sin, y, adaln_input,
                         x_mask, context_mask, compute_dtype)
        if cfg.seq_parallel:
            h = jax.lax.with_sharding_constraint(h, seq_spec)
        return h, None

    if cfg.remat:
        if cfg.remat_policy == "dots_no_batch":
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        elif cfg.remat_policy == "save_gemms":
            # save exactly the FLOP-heavy projection outputs (tagged in
            # ops/attention.py / ops/ffn.py); the backward recomputes only
            # cheap elementwise work + the O(L^2) attention scores — ~5% of
            # block FLOPs instead of the full-block +2PT recompute
            body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_q", "attn_k", "attn_v", "attn_out",
                    "ffn_h1", "ffn_h3", "ffn_out"))
        elif cfg.remat_policy == "save_gemms_lite":
            # like save_gemms but drops the two (T, 8/3 H) SwiGLU hiddens —
            # the dominant saved tensors (~55% of the saved bytes; they OOM
            # the XL at batch 32). The backward re-runs just the w1/w3 GEMMs:
            # ~45% of forward FLOPs ~= 15% of total step FLOPs, for a memory
            # footprint of 5 H-wide tensors per block-token.
            body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_q", "attn_k", "attn_v", "attn_out", "ffn_out"))
        elif cfg.remat_policy == "save_gemms_h1":
            # midpoint of lite and full (round 5): keep the gate hidden x1
            # (silu input — both dx1 and dx3 read silu(x1)) and recompute
            # only the w3 GEMM — half of lite's extra recompute for half of
            # save_gemms' extra bytes. All saveables are compute_dtype
            # (bf16 in production): dense() casts before the matmul, so
            # there is no separate fp32-vs-bf16 saved-bytes lever beyond
            # choosing WHICH tensors to save (TRAIN_r07 dtype audit).
            body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_q", "attn_k", "attn_v", "attn_out",
                    "ffn_h1", "ffn_out"))
        elif cfg.remat_policy == "nothing":
            body = jax.checkpoint(body)
        else:
            raise ValueError(f"unknown remat_policy: {cfg.remat_policy!r} "
                             "(expected 'nothing', 'dots_no_batch', "
                             "'save_gemms', 'save_gemms_lite' or "
                             "'save_gemms_h1')")
    x, _ = jax.lax.scan(body, x, params["blocks"])

    x = final_layer_apply(params["final_layer"], x, adaln_input)
    return x.transpose(0, 2, 1).astype(jnp.float32)  # (B, C, T)


def dit_param_count(params: dict) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Planned sampling (hoisted per-step constants)
# ---------------------------------------------------------------------------
#
# During ODE sampling, every per-step forward recomputes work that does not
# depend on the latent x: the adaLN modulation GEMMs (those weights are ~30%
# of the XL's parameters — re-read from HBM 25x), the cross-attention K/V
# projections of the static text context, and the timestep/caption embedders.
# The Euler timestep grid is known in advance, so ALL of it can be computed
# once, up front, in a handful of large batched GEMMs. `dit_sample_plan`
# builds that cache; `dit_apply_planned` consumes it. Numerics are identical
# to dit_apply (same ops, hoisted). This is a pure TPU-latency optimization —
# the reference (driven step-by-step from Python by torchdyn) cannot do this.

def dit_sample_plan(params: dict, cfg: DiTConfig, t_ints: Array,
                    context: Array, context_mask: Optional[Array] = None,
                    compute_dtype=jnp.bfloat16) -> dict:
    """Precompute token-independent tensors for a known Euler timestep grid.

    t_ints: (S,) int32 model timesteps (floor(t * 1000) per step).
    context: (B, Ly, ctx_dim) — for CFG pass the dual batch [uc; c].

    Returns {"mods": (S, depth, B, 6H) fp32, "final": (S, B, 2H) fp32,
             "yk"/"yv": (depth, B, Ly, kv_dim) in compute_dtype}.
    """
    d = cfg.hidden_size
    blocks = params["blocks"]

    # --- per-step adaLN inputs (fp32, matches dit_apply) -------------------
    t_emb = timestep_embedder_apply(params["t_embedder"], t_ints)  # (S, H)
    ctx_f = context.astype(jnp.float32)
    if context_mask is not None:
        mf = context_mask.astype(jnp.float32)[:, :, None]
        pooled = (ctx_f * mf).sum(axis=1) / jnp.maximum(mf.sum(axis=1), 1.0)
    else:
        pooled = ctx_f.mean(axis=1)
    ce = params["cap_embedder"]
    cap_emb = dense(ce["linear"],
                    layer_norm(pooled, ce["norm"]["weight"], ce["norm"]["bias"],
                               eps=1e-5))
    adaln = silu(t_emb[:, None, :] + cap_emb[None, :, :])  # (S, B, H) fp32

    # --- all blocks' 6-way modulations in one GEMM -------------------------
    w_ada = blocks["adaLN"]["w"].astype(jnp.float32)       # (depth, H, 6H)
    mods = jnp.einsum("sbh,dhm->sdbm", adaln, w_ada)
    mods = mods + blocks["adaLN"]["b"].astype(jnp.float32)[None, :, None, :]

    fl = params["final_layer"]["adaLN"]
    final = jnp.einsum("sbh,hm->sbm", adaln, fl["w"].astype(jnp.float32))
    final = final + fl["b"].astype(jnp.float32)[None, None, :]

    # --- static cross-attention K/V per block ------------------------------
    # rms_norm(attention_y_norm, y) with per-block scale, then wk_y/wv_y;
    # ky_norm (when qk_norm) applies to K only — same ops as attention_apply.
    yf = ctx_f * jax.lax.rsqrt(
        jnp.mean(ctx_f * ctx_f, axis=-1, keepdims=True) + cfg.norm_eps)
    yn = (yf.astype(context.dtype)[None]
          * blocks["attention_y_norm"]["weight"].astype(context.dtype)[:, None, None, :])
    yn = yn.astype(compute_dtype)
    att = blocks["attention"]
    yk = jnp.einsum("dbly,dyk->dblk", yn, att["wk_y"]["w"].astype(compute_dtype))
    yv = jnp.einsum("dbly,dyk->dblk", yn, att["wv_y"]["w"].astype(compute_dtype))
    if "ky_norm" in att:
        yk = layer_norm(yk, att["ky_norm"]["weight"][:, None, None, :],
                        att["ky_norm"]["bias"][:, None, None, :], eps=1e-5)
    return {"mods": mods, "final": final, "yk": yk, "yv": yv}


def _block_apply_planned(p: dict, cfg: DiTConfig, x: Array, cos: Array,
                         sin: Array, mod: Array, yk: Array, yv: Array,
                         x_mask, y_mask, compute_dtype,
                         return_stats: bool = False):
    """_block_apply with the modulation + context K/V precomputed.

    return_stats: also return per-channel amax of the three quantized-GEMM
    inputs (wqkv in, w13 in, w2 in) — SmoothQuant calibration
    (ops/quant.py::calibrate_dit_smooth)."""
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
        jnp.split(mod, 6, axis=-1))

    x_attn_in = modulate(rms_norm(p["attention_norm"], x, cfg.norm_eps),
                         shift_msa, scale_msa)
    h_attn = attention_apply(
        p["attention"], x_attn_in,
        cos, sin,
        y_kv=(yk, yv),
        x_mask=x_mask, y_mask=y_mask,
        n_heads=cfg.num_heads, n_kv_heads=cfg.n_kv_heads,
        compute_dtype=compute_dtype,
        use_flash=cfg.flash_for_len(x.shape[1]),
        fp32_scores=cfg.fp32_scores,
    )
    h = x + gate_msa[:, None, :].astype(x.dtype) * h_attn

    x_ffn_in = modulate(rms_norm(p["ffn_norm"], h, cfg.norm_eps),
                        shift_mlp, scale_mlp)
    ffn_out = feed_forward_apply(p["feed_forward"], x_ffn_in, compute_dtype,
                                 return_stats=return_stats)
    if return_stats:
        h_ffn, prod_amax = ffn_out

        def _amax(a):
            return jnp.max(jnp.abs(a.astype(jnp.float32)), axis=(0, 1))
        stats = {"attn_in": _amax(x_attn_in), "ffn_in": _amax(x_ffn_in),
                 "ffn_prod": prod_amax}
        return h + gate_mlp[:, None, :].astype(h.dtype) * h_ffn, stats
    h_ffn = ffn_out
    return h + gate_mlp[:, None, :].astype(h.dtype) * h_ffn


def dit_apply_planned(params: dict, cfg: DiTConfig, x: Array, mods: Array,
                      final_mod: Array, yk: Array, yv: Array,
                      x_mask: Optional[Array] = None,
                      y_mask: Optional[Array] = None,
                      compute_dtype=jnp.bfloat16,
                      return_stats: bool = False):
    """dit_apply consuming one step's plan slice (mods: (depth, B, 6H),
    final_mod: (B, 2H), yk/yv: (depth, B, Ly, kv_dim)).

    return_stats: also return per-depth per-channel amax of the quantized-
    GEMM inputs ({"attn_in"/"ffn_in": (depth, H), "ffn_prod": (depth, H')})
    for SmoothQuant calibration."""
    x = x.transpose(0, 2, 1)
    x = dense(params["proj_in"], x, compute_dtype)
    if cfg.fp32_residual:
        x = x.astype(jnp.float32)
    cos, sin = precompute_rope(cfg.head_dim, x.shape[1],
                               rope_scaling_factor=cfg.rope_scaling_factor,
                               ntk_factor=cfg.ntk_factor)

    def body(h, xs):
        bp, mod, yk_d, yv_d = xs
        out = _block_apply_planned(bp, cfg, h, cos, sin, mod, yk_d, yv_d,
                                   x_mask, y_mask, compute_dtype,
                                   return_stats=return_stats)
        if return_stats:
            return out[0], out[1]
        return out, None

    x, stats = jax.lax.scan(body, x, (params["blocks"], mods, yk, yv))

    shift, scale = jnp.split(final_mod, 2, axis=-1)
    x = modulate(layer_norm(x.astype(jnp.float32), eps=1e-6), shift, scale)
    x = dense(params["final_layer"]["linear"], x)
    x = x.transpose(0, 2, 1).astype(jnp.float32)
    if return_stats:
        return x, stats
    return x
