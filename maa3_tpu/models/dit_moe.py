"""Video Next-DiT with deterministic dual MoE (time-bucket + frequency-slice).

Capability parity with VideoFlagLargeDiT (flag_large_dit_moe.py:613-740):
- ConditionEmbedder MLP lifts video features (B, Lv, ctx) -> (B, Lv, H)
  (flag_large_dit_moe.py:151-162); cross-attention runs over these.
- Per-block MoE (flag_large_dit_moe.py:493-538):
  * time-MoE: every token of sample b routes to expert `t_b // 250`
    (4 experts over t in [0, 1000));
  * frequency-MoE: the hidden dim is split into `num_experts` contiguous
    slices; slice e of the output is expert e's FFN applied to an input
    where only slice e is nonzero.

TPU-native design — routing is data-independent per sample/channel, so there
is no all-to-all and no sparse dispatch:
- time-MoE gathers per-sample expert weights (jnp.take over the stacked
  expert axis) and runs ONE batched einsum — zero wasted FLOPs, full MXU,
  unlike the reference's python loop over boolean masks.
- freq-MoE pre-slices each expert's w1/w3 rows and w2 columns to its active
  slice; mathematically identical to the reference's mask dance (rows of w1
  outside the slice see zeros; output is sliced), at 1/E of the naive FLOPs.
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
from maa3_tpu.ops.ffn import swiglu_hidden_dim
from maa3_tpu.ops.rope import precompute_rope
from maa3_tpu.models.dit import final_layer_apply

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MoEDiTConfig:
    in_channels: int = 20
    context_dim: int = 768
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
    num_experts: int = 4
    num_timesteps: int = 1000
    use_flash: "Optional[bool]" = None  # None = mode-aware auto (see dit.py)
    remat: bool = False  # rematerialize blocks in backward (training memory)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    def flash_for_len(self, seq_len: int, training: bool = False) -> bool:
        if self.use_flash is not None:
            return self.use_flash
        return seq_len >= 1248 if training else seq_len > 4096

    def resolve_flash(self, seq_len: int, training: bool) -> "MoEDiTConfig":
        """See DiTConfig.resolve_flash (models/dit.py)."""
        if self.use_flash is not None:
            return self
        return dataclasses.replace(
            self, use_flash=self.flash_for_len(seq_len, training))

    @property
    def time_bucket(self) -> int:
        return 250  # flag_large_dit_moe.py:520 (time // 250)


# ---------------------------------------------------------------------------
# MoE FFN
# ---------------------------------------------------------------------------

def _expert_stack_init(key: Array, cfg: MoEDiTConfig) -> dict:
    """E stacked SwiGLU experts: w1/w3 (E, d, h), w2 (E, h, d)."""
    d = cfg.hidden_size
    h = swiglu_hidden_dim(d, 4 * d, cfg.multiple_of, cfg.ffn_dim_multiplier)
    ks = jax.random.split(key, 3 * cfg.num_experts)
    w1 = jnp.stack([dense_init(ks[3 * e], d, h, bias=False)["w"]
                    for e in range(cfg.num_experts)])
    w2 = jnp.stack([dense_init(ks[3 * e + 1], h, d, bias=False)["w"]
                    for e in range(cfg.num_experts)])
    w3 = jnp.stack([dense_init(ks[3 * e + 2], d, h, bias=False)["w"]
                    for e in range(cfg.num_experts)])
    return {"w1": {"w": w1}, "w2": {"w": w2}, "w3": {"w": w3}}


def moe_init(key: Array, cfg: MoEDiTConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {"time_experts": _expert_stack_init(k1, cfg),
            "freq_experts": _expert_stack_init(k2, cfg)}


def moe_apply(p: dict, x: Array, t: Array, cfg: MoEDiTConfig,
              compute_dtype=None) -> Array:
    """x (B, L, D), t (B,) integer timesteps -> (B, L, D)."""
    dt = compute_dtype or x.dtype
    b, l, d = x.shape

    # ---- time-MoE: per-sample expert gather, one batched matmul ----
    idx = jnp.clip(t // cfg.time_bucket, 0, cfg.num_experts - 1)  # (B,)
    te = p["time_experts"]
    w1 = jnp.take(te["w1"]["w"], idx, axis=0).astype(dt)  # (B, d, h)
    w2 = jnp.take(te["w2"]["w"], idx, axis=0).astype(dt)
    w3 = jnp.take(te["w3"]["w"], idx, axis=0).astype(dt)
    xb = x.astype(dt)
    h1 = jnp.einsum("bld,bdh->blh", xb, w1, preferred_element_type=jnp.float32)
    h3 = jnp.einsum("bld,bdh->blh", xb, w3, preferred_element_type=jnp.float32)
    y = jnp.einsum("blh,bhd->bld", (silu(h1) * h3).astype(dt), w2,
                   preferred_element_type=jnp.float32).astype(x.dtype)

    # ---- freq-MoE over y: contiguous channel slices ----
    E = cfg.num_experts
    sl = d // E
    fe = p["freq_experts"]
    # pre-slice: rows of w1/w3 (input slice), cols of w2 (output slice)
    # w1 full: (E, d, h) -> keep rows [e*sl:(e+1)*sl] of expert e
    w1s = jnp.stack([fe["w1"]["w"][e, e * sl:(e + 1) * sl, :] for e in range(E)])
    w3s = jnp.stack([fe["w3"]["w"][e, e * sl:(e + 1) * sl, :] for e in range(E)])
    w2s = jnp.stack([fe["w2"]["w"][e, :, e * sl:(e + 1) * sl] for e in range(E)])
    y_slices = y.reshape(b, l, E, sl).astype(dt)
    g1 = jnp.einsum("bleS,eSh->bleh", y_slices, w1s.astype(dt),
                    preferred_element_type=jnp.float32)
    g3 = jnp.einsum("bleS,eSh->bleh", y_slices, w3s.astype(dt),
                    preferred_element_type=jnp.float32)
    z = jnp.einsum("bleh,ehS->bleS", (silu(g1) * g3).astype(dt), w2s.astype(dt),
                   preferred_element_type=jnp.float32)
    return z.reshape(b, l, d).astype(x.dtype)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

def _block_init(key: Array, cfg: MoEDiTConfig) -> dict:
    ks = jax.random.split(key, 3)
    d = cfg.hidden_size
    return {
        "attention": attention_init(ks[0], d, cfg.num_heads, cfg.n_kv_heads,
                                    cfg.qk_norm, d),  # y_dim == hidden
        "feed_forward": moe_init(ks[1], cfg),
        "attention_norm": rms_norm_init(d),
        "ffn_norm": rms_norm_init(d),
        "attention_y_norm": rms_norm_init(d),
        "adaLN": dense_init(ks[2], d, 6 * d, init="zeros"),
    }


def moe_dit_init(key: Array, cfg: MoEDiTConfig) -> dict:
    ks = jax.random.split(key, 8 + cfg.depth)
    d = cfg.hidden_size
    blocks = [_block_init(ks[8 + i], cfg) for i in range(cfg.depth)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "proj_in": dense_init(ks[0], cfg.in_channels, d),
        "t_embedder": timestep_embedder_init(ks[1], d),
        "c_embedder": {  # ConditionEmbedder (flag_large_dit_moe.py:151-162)
            "mlp0": dense_init(ks[2], cfg.context_dim, d),
            "mlp2": dense_init(ks[3], d, d),
            "ln": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        },
        "cap_embedder": {
            "norm": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "linear": dense_init(ks[4], d, d),
        },
        "blocks": stacked,
        "final_layer": {
            "linear": dense_init(ks[5], d, cfg.in_channels, init="zeros"),
            "adaLN": dense_init(ks[6], d, 2 * d, init="zeros"),
        },
    }


def _cond_embed(p: dict, x: Array, compute_dtype) -> Array:
    h = dense(p["mlp0"], x, compute_dtype)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False)
    h = dense(p["mlp2"], h, compute_dtype)
    return layer_norm(h, p["ln"]["weight"], p["ln"]["bias"], eps=1e-5)


def _freq_sliced_stacks(fe: dict, cfg: MoEDiTConfig, d: int, dt):
    """Pre-slice the freq experts: rows of w1/w3 (input slice), cols of w2
    (output slice). Weight-only — hoistable out of any sampling loop."""
    E = cfg.num_experts
    sl = d // E
    w1s = jnp.stack([fe["w1"]["w"][..., e, e * sl:(e + 1) * sl, :]
                     for e in range(E)], axis=-3)
    w3s = jnp.stack([fe["w3"]["w"][..., e, e * sl:(e + 1) * sl, :]
                     for e in range(E)], axis=-3)
    w2s = jnp.stack([fe["w2"]["w"][..., e, :, e * sl:(e + 1) * sl]
                     for e in range(E)], axis=-3)
    return w1s.astype(dt), w3s.astype(dt), w2s.astype(dt)


def _freq_moe(y: Array, w1s: Array, w3s: Array, w2s: Array, dt) -> Array:
    """Frequency-MoE on pre-sliced stacks (w1s/w3s (E, sl, h), w2s (E, h, sl))."""
    b, l, d = y.shape
    E = w1s.shape[-3]
    y_slices = y.reshape(b, l, E, d // E).astype(dt)
    g1 = jnp.einsum("bleS,eSh->bleh", y_slices, w1s,
                    preferred_element_type=jnp.float32)
    g3 = jnp.einsum("bleS,eSh->bleh", y_slices, w3s,
                    preferred_element_type=jnp.float32)
    z = jnp.einsum("bleh,ehS->bleS", (silu(g1) * g3).astype(dt), w2s,
                   preferred_element_type=jnp.float32)
    return z.reshape(b, l, d)


def moe_apply_shared_t(p: dict, x: Array, t_idx, cfg: MoEDiTConfig,
                       freq_sliced=None, compute_dtype=None) -> Array:
    """moe_apply when every sample shares one timestep (the sampling case):
    the time-expert gather collapses to a single dynamic slice and a plain
    GEMM (no per-sample weight copies). t_idx: scalar int expert index."""
    dt = compute_dtype or x.dtype
    te = p["time_experts"]
    w1 = jax.lax.dynamic_index_in_dim(te["w1"]["w"], t_idx, 0, False).astype(dt)
    w2 = jax.lax.dynamic_index_in_dim(te["w2"]["w"], t_idx, 0, False).astype(dt)
    w3 = jax.lax.dynamic_index_in_dim(te["w3"]["w"], t_idx, 0, False).astype(dt)
    xb = x.astype(dt)
    h1 = jnp.einsum("bld,dh->blh", xb, w1, preferred_element_type=jnp.float32)
    h3 = jnp.einsum("bld,dh->blh", xb, w3, preferred_element_type=jnp.float32)
    y = jnp.einsum("blh,hd->bld", (silu(h1) * h3).astype(dt), w2,
                   preferred_element_type=jnp.float32).astype(x.dtype)

    if freq_sliced is None:
        d = x.shape[-1]
        freq_sliced = _freq_sliced_stacks(p["freq_experts"], cfg, d, dt)
    return _freq_moe(y, *freq_sliced, dt).astype(x.dtype)


def moe_dit_apply(params: dict, cfg: MoEDiTConfig, x: Array, t: Array,
                  context: Array, compute_dtype=jnp.bfloat16,
                  training: bool = False) -> Array:
    """x (B, C, T), t (B,) in [0, 1000), context (B, Lv, ctx) video features.

    Parity: VideoFlagLargeDiT.forward (flag_large_dit_moe.py:664-698).
    """
    b, c_in, tlen = x.shape
    cfg = cfg.resolve_flash(tlen, training)
    x = x.transpose(0, 2, 1)
    x = dense(params["proj_in"], x, compute_dtype)

    t_emb = timestep_embedder_apply(params["t_embedder"], t)  # fp32
    cond = _cond_embed(params["c_embedder"], context, compute_dtype)  # (B, Lv, H)

    pooled = cond.astype(jnp.float32).mean(axis=1)
    ce = params["cap_embedder"]
    cap_emb = dense(ce["linear"],
                    layer_norm(pooled, ce["norm"]["weight"], ce["norm"]["bias"], eps=1e-5))
    adaln_input = t_emb + cap_emb

    cos, sin = precompute_rope(cfg.head_dim, tlen,
                               rope_scaling_factor=cfg.rope_scaling_factor,
                               ntk_factor=cfg.ntk_factor)

    def body(h, bp):
        mod = dense(bp["adaLN"], silu(adaln_input.astype(jnp.float32)))
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = jnp.split(mod, 6, axis=-1)
        ha = attention_apply(
            bp["attention"],
            modulate(rms_norm(bp["attention_norm"], h, cfg.norm_eps), s_msa, sc_msa),
            cos, sin,
            y=rms_norm(bp["attention_y_norm"], cond, cfg.norm_eps),
            n_heads=cfg.num_heads, n_kv_heads=cfg.n_kv_heads,
            compute_dtype=compute_dtype,
            use_flash=cfg.flash_for_len(h.shape[1]))
        h = h + g_msa[:, None, :].astype(h.dtype) * ha
        hf = moe_apply(bp["feed_forward"],
                       modulate(rms_norm(bp["ffn_norm"], h, cfg.norm_eps), s_mlp, sc_mlp),
                       t, cfg, compute_dtype)
        return h + g_mlp[:, None, :].astype(h.dtype) * hf, None

    if cfg.remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = final_layer_apply(params["final_layer"], x, adaln_input)
    return x.transpose(0, 2, 1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Planned sampling (hoisted per-step constants — see models/dit.py for the
# rationale; the MoE adds two more hoists: the video-conditioning tower and
# the freq-expert weight slicing are step-independent, and during sampling
# every sample shares one timestep so the time-expert gather collapses to a
# single dynamic slice per block)
# ---------------------------------------------------------------------------

def moe_dit_sample_plan(params: dict, cfg: MoEDiTConfig, t_ints: Array,
                        context: Array, compute_dtype=jnp.bfloat16) -> dict:
    """t_ints (S,) int32 model timesteps; context (B, Lv, ctx) video feats
    (for CFG pass the dual batch [uc; c]). Returns the per-step plan."""
    d = cfg.hidden_size
    blocks = params["blocks"]

    cond = _cond_embed(params["c_embedder"], context, compute_dtype)  # (B,Lv,H)
    t_emb = timestep_embedder_apply(params["t_embedder"], t_ints)     # (S,H)
    pooled = cond.astype(jnp.float32).mean(axis=1)
    ce = params["cap_embedder"]
    cap_emb = dense(ce["linear"],
                    layer_norm(pooled, ce["norm"]["weight"], ce["norm"]["bias"],
                               eps=1e-5))
    adaln = silu(t_emb[:, None, :] + cap_emb[None, :, :])  # (S, B, H)

    w_ada = blocks["adaLN"]["w"].astype(jnp.float32)       # (depth, H, 6H)
    mods = jnp.einsum("sbh,dhm->sdbm", adaln, w_ada)
    mods = mods + blocks["adaLN"]["b"].astype(jnp.float32)[None, :, None, :]
    fl = params["final_layer"]["adaLN"]
    final = jnp.einsum("sbh,hm->sbm", adaln, fl["w"].astype(jnp.float32))
    final = final + fl["b"].astype(jnp.float32)[None, None, :]

    # static cross-attn K/V over the conditioning (per-block y-norm then
    # wk_y/wv_y; ky_norm on K when qk_norm — same ops as attention_apply)
    cf = cond.astype(jnp.float32)
    yf = cf * jax.lax.rsqrt(jnp.mean(cf * cf, axis=-1, keepdims=True)
                            + cfg.norm_eps)
    yn = (yf.astype(cond.dtype)[None]
          * blocks["attention_y_norm"]["weight"].astype(cond.dtype)[:, None, None, :])
    yn = yn.astype(compute_dtype)
    att = blocks["attention"]
    yk = jnp.einsum("dbly,dyk->dblk", yn, att["wk_y"]["w"].astype(compute_dtype))
    yv = jnp.einsum("dbly,dyk->dblk", yn, att["wv_y"]["w"].astype(compute_dtype))
    if "ky_norm" in att:
        yk = layer_norm(yk, att["ky_norm"]["weight"][:, None, None, :],
                        att["ky_norm"]["bias"][:, None, None, :], eps=1e-5)

    # freq-expert slicing is weight-only: hoist (depth, E, sl, h) stacks
    freq_sliced = _freq_sliced_stacks(blocks["feed_forward"]["freq_experts"],
                                      cfg, d, compute_dtype)
    tidx = jnp.clip(t_ints // cfg.time_bucket, 0, cfg.num_experts - 1)
    return {"mods": mods, "final": final, "yk": yk, "yv": yv,
            "freq_sliced": freq_sliced, "tidx": tidx}


def moe_dit_apply_planned(params: dict, cfg: MoEDiTConfig, x: Array,
                          mods: Array, final_mod: Array, t_idx,
                          yk: Array, yv: Array, freq_sliced,
                          compute_dtype=jnp.bfloat16) -> Array:
    """moe_dit_apply consuming one step's plan slice. All samples share the
    timestep (t_idx scalar) — the sampling case."""
    x = x.transpose(0, 2, 1)
    x = dense(params["proj_in"], x, compute_dtype)
    cos, sin = precompute_rope(cfg.head_dim, x.shape[1],
                               rope_scaling_factor=cfg.rope_scaling_factor,
                               ntk_factor=cfg.ntk_factor)

    def body(h, xs):
        bp, mod, yk_d, yv_d, fs = xs
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = jnp.split(mod, 6, axis=-1)
        ha = attention_apply(
            bp["attention"],
            modulate(rms_norm(bp["attention_norm"], h, cfg.norm_eps), s_msa, sc_msa),
            cos, sin,
            y_kv=(yk_d, yv_d),
            n_heads=cfg.num_heads, n_kv_heads=cfg.n_kv_heads,
            compute_dtype=compute_dtype,
            use_flash=cfg.flash_for_len(h.shape[1]))
        h = h + g_msa[:, None, :].astype(h.dtype) * ha
        hf = moe_apply_shared_t(
            bp["feed_forward"],
            modulate(rms_norm(bp["ffn_norm"], h, cfg.norm_eps), s_mlp, sc_mlp),
            t_idx, cfg, freq_sliced=fs, compute_dtype=compute_dtype)
        return h + g_mlp[:, None, :].astype(h.dtype) * hf, None

    x, _ = jax.lax.scan(body, x, (params["blocks"], mods, yk, yv, freq_sliced))

    shift, scale = jnp.split(final_mod, 2, axis=-1)
    x = modulate(layer_norm(x.astype(jnp.float32), eps=1e-6), shift, scale)
    x = dense(params["final_layer"]["linear"], x)
    return x.transpose(0, 2, 1).astype(jnp.float32)
