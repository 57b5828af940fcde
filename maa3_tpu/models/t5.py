"""JAX T5 encoder (t5-v1.1 / flan-t5 architecture) — the struct-caption tower.

Replaces transformers T5EncoderModel (ldm/modules/encoders/modules.py:54-88,
132-191) which is torch-only in modern transformers. From-scratch JAX
implementation with torch-state_dict importer; parity tested against torch
T5EncoderModel built from a local config.

Pre-RMSNorm architecture with relative position-bucket attention bias
(held by layer 0, shared by all layers), no attention scaling (absorbed into
init), gated-GELU feed-forward (v1.1), final RMSNorm.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from maa3_tpu.ops.basic import dense, dense_init, rms_norm

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 1024
    d_kv: int = 64
    d_ff: int = 2816
    num_layers: int = 24
    num_heads: int = 16
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    gated_ff: bool = True  # v1.1 / flan: gelu_new gated


def t5_init(key: Array, cfg: T5Config) -> dict:
    ks = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    d, inner = cfg.d_model, cfg.num_heads * cfg.d_kv
    from maa3_tpu.utils import nprand
    p: dict = {
        "shared": jnp.asarray(nprand.normal(next(ks), (cfg.vocab_size, d), 1.0)),
        "rel_bias": jnp.asarray(nprand.normal(
            next(ks), (cfg.relative_attention_num_buckets, cfg.num_heads), 0.1)),
        "final_ln": {"weight": jnp.ones((d,))},
    }
    layers = []
    for _ in range(cfg.num_layers):
        lp = {
            "attn_ln": {"weight": jnp.ones((d,))},
            "q": dense_init(next(ks), d, inner, bias=False),
            "k": dense_init(next(ks), d, inner, bias=False),
            "v": dense_init(next(ks), d, inner, bias=False),
            "o": dense_init(next(ks), inner, d, bias=False),
            "ff_ln": {"weight": jnp.ones((d,))},
            "wo": dense_init(next(ks), cfg.d_ff, d, bias=False),
        }
        if cfg.gated_ff:
            lp["wi_0"] = dense_init(next(ks), d, cfg.d_ff, bias=False)
            lp["wi_1"] = dense_init(next(ks), d, cfg.d_ff, bias=False)
        else:
            lp["wi"] = dense_init(next(ks), d, cfg.d_ff, bias=False)
        layers.append(lp)
    p["layers"] = layers
    return p


def _relative_position_bucket(rel_pos: np.ndarray, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """Bidirectional T5 bucketing (HF T5Attention._relative_position_bucket)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(np.int64) * num_buckets
    n = np.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return ret + np.where(is_small, n, large)


def t5_position_bias(params: dict, cfg: T5Config, qlen: int, klen: int) -> Array:
    """(1, heads, qlen, klen) additive attention bias."""
    ctx = np.arange(qlen)[:, None]
    mem = np.arange(klen)[None, :]
    buckets = _relative_position_bucket(
        mem - ctx, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)
    bias = params["rel_bias"][jnp.asarray(buckets)]  # (q, k, heads)
    return bias.transpose(2, 0, 1)[None]


def gelu_new(x: Array) -> Array:
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(0.7978845608028654 *
                                   (xf + 0.044715 * xf ** 3)))
    return y.astype(x.dtype)


def t5_apply(params: dict, cfg: T5Config, input_ids: Array,
             attention_mask: Optional[Array] = None,
             compute_dtype=jnp.float32) -> Array:
    """input_ids (B, L) -> last_hidden_state (B, L, d_model)."""
    b, l = input_ids.shape
    x = params["shared"][input_ids].astype(jnp.float32)
    pos_bias = t5_position_bias(params, cfg, l, l).astype(jnp.float32)
    mask = attention_mask.astype(bool) if attention_mask is not None else None

    for p in params["layers"]:
        h = rms_norm(p["attn_ln"], x, cfg.layer_norm_eps)
        q = dense(p["q"], h, compute_dtype).reshape(b, l, cfg.num_heads, cfg.d_kv)
        k = dense(p["k"], h, compute_dtype).reshape(b, l, cfg.num_heads, cfg.d_kv)
        v = dense(p["v"], h, compute_dtype).reshape(b, l, cfg.num_heads, cfg.d_kv)
        logits = jnp.einsum("blhd,bmhd->bhlm", q, k,
                            preferred_element_type=jnp.float32)  # no 1/sqrt(d)
        logits = logits + pos_bias
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1)
        a = jnp.einsum("bhlm,bmhd->blhd", probs.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(v.dtype)
        a = dense(p["o"], a.reshape(b, l, -1), compute_dtype)
        x = x + a.astype(x.dtype)

        h = rms_norm(p["ff_ln"], x, cfg.layer_norm_eps)
        if cfg.gated_ff:
            hg = gelu_new(dense(p["wi_0"], h, compute_dtype))
            hl = dense(p["wi_1"], h, compute_dtype)
            h = hg * hl
        else:
            h = jax.nn.relu(dense(p["wi"], h, compute_dtype))
        h = dense(p["wo"], h, compute_dtype)
        x = x + h.astype(x.dtype)

    return rms_norm(params["final_ln"], x, cfg.layer_norm_eps)


# ---------------------------------------------------------------------------
# torch state_dict import (HF T5EncoderModel naming)
# ---------------------------------------------------------------------------

def t5_from_torch(sd: dict, cfg: T5Config, prefix: str = "") -> dict:
    from maa3_tpu.torch_import import _np

    def g(name):
        return _np(sd[prefix + name])  # tracer-aware (eval_shape imports)

    def lin(name):
        # raw (out, in); transposed on-device by finalize_linear_tree
        return {"w": g(name + ".weight")}

    p: dict = {
        "shared": g("shared.weight"),
        "rel_bias": g("encoder.block.0.layer.0.SelfAttention."
                      "relative_attention_bias.weight"),
        "final_ln": {"weight": g("encoder.final_layer_norm.weight")},
    }
    layers = []
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}.layer."
        lp = {
            "attn_ln": {"weight": g(pre + "0.layer_norm.weight")},
            "q": lin(pre + "0.SelfAttention.q"),
            "k": lin(pre + "0.SelfAttention.k"),
            "v": lin(pre + "0.SelfAttention.v"),
            "o": lin(pre + "0.SelfAttention.o"),
            "ff_ln": {"weight": g(pre + "1.layer_norm.weight")},
            "wo": lin(pre + "1.DenseReluDense.wo"),
        }
        if cfg.gated_ff:
            lp["wi_0"] = lin(pre + "1.DenseReluDense.wi_0")
            lp["wi_1"] = lin(pre + "1.DenseReluDense.wi_1")
        else:
            lp["wi"] = lin(pre + "1.DenseReluDense.wi")
        layers.append(lp)
    p["layers"] = layers
    from maa3_tpu.torch_import import finalize_linear_tree
    return finalize_linear_tree(p)
