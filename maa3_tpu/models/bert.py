"""JAX BERT encoder (bert-base-uncased architecture) — the CLAP caption tower.

The reference loads the CLAP 2022 text branch via transformers AutoModel
(ldm/modules/encoders/CLAP/clap.py TextEncoder: bert-base-uncased -> last
hidden state). transformers >= 4.50 is torch-only, so this is a from-scratch
JAX implementation with a torch-state_dict importer; parity is tested against
torch BertModel built from a local config.

Post-LN architecture: emb(+pos+type) -> LN ->
N x [MHA -> +res -> LN -> FF(gelu) -> +res -> LN].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from maa3_tpu.ops.basic import dense, dense_init, layer_norm

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


def _ln_init(d):
    return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def bert_init(key: Array, cfg: BertConfig) -> dict:
    ks = iter(jax.random.split(key, 16 + 16 * cfg.num_layers))
    d = cfg.hidden_size
    from maa3_tpu.utils import nprand
    emb = {
        "word": jnp.asarray(nprand.normal(next(ks), (cfg.vocab_size, d), 0.02)),
        "position": jnp.asarray(nprand.normal(next(ks), (cfg.max_position, d), 0.02)),
        "token_type": jnp.asarray(nprand.normal(next(ks), (cfg.type_vocab_size, d), 0.02)),
        "ln": _ln_init(d),
    }
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "q": dense_init(next(ks), d, d),
            "k": dense_init(next(ks), d, d),
            "v": dense_init(next(ks), d, d),
            "attn_out": dense_init(next(ks), d, d),
            "attn_ln": _ln_init(d),
            "ff_in": dense_init(next(ks), d, cfg.intermediate_size),
            "ff_out": dense_init(next(ks), cfg.intermediate_size, d),
            "ff_ln": _ln_init(d),
        })
    return {"embeddings": emb, "layers": layers}


def _mha(p: dict, x: Array, mask: Optional[Array], n_heads: int,
         compute_dtype) -> Array:
    b, l, d = x.shape
    hd = d // n_heads
    q = dense(p["q"], x, compute_dtype).reshape(b, l, n_heads, hd)
    k = dense(p["k"], x, compute_dtype).reshape(b, l, n_heads, hd)
    v = dense(p["v"], x, compute_dtype).reshape(b, l, n_heads, hd)
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhlm,bmhd->blhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return dense(p["attn_out"], out.reshape(b, l, d), compute_dtype)


def bert_apply(params: dict, cfg: BertConfig, input_ids: Array,
               attention_mask: Optional[Array] = None,
               token_type_ids: Optional[Array] = None,
               compute_dtype=jnp.float32) -> Array:
    """input_ids (B, L) -> last_hidden_state (B, L, hidden)."""
    b, l = input_ids.shape
    emb = params["embeddings"]
    x = emb["word"][input_ids]
    x = x + emb["position"][jnp.arange(l)][None]
    tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
    x = x + emb["token_type"][tt]
    x = layer_norm(x, emb["ln"]["weight"], emb["ln"]["bias"], cfg.layer_norm_eps)

    mask = attention_mask.astype(bool) if attention_mask is not None else None
    for p in params["layers"]:
        a = _mha(p, x, mask, cfg.num_heads, compute_dtype)
        x = layer_norm(x + a, p["attn_ln"]["weight"], p["attn_ln"]["bias"],
                       cfg.layer_norm_eps)
        h = dense(p["ff_in"], x, compute_dtype)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
        h = dense(p["ff_out"], h, compute_dtype)
        x = layer_norm(x + h, p["ff_ln"]["weight"], p["ff_ln"]["bias"],
                       cfg.layer_norm_eps)
    return x


# ---------------------------------------------------------------------------
# torch state_dict import (HF BertModel naming)
# ---------------------------------------------------------------------------

def bert_from_torch(sd: dict, cfg: BertConfig, prefix: str = "") -> dict:
    """Map a HF BertModel state_dict (numpy arrays) into our pytree."""

    from maa3_tpu.torch_import import _np

    def g(name):
        return _np(sd[prefix + name])  # tracer-aware (eval_shape imports)

    def lin(name):
        # raw (out, in); transposed on-device by finalize_linear_tree
        return {"w": g(name + ".weight"), "b": g(name + ".bias")}

    emb = {
        "word": g("embeddings.word_embeddings.weight"),
        "position": g("embeddings.position_embeddings.weight"),
        "token_type": g("embeddings.token_type_embeddings.weight"),
        "ln": {"weight": g("embeddings.LayerNorm.weight"),
               "bias": g("embeddings.LayerNorm.bias")},
    }
    layers = []
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        layers.append({
            "q": lin(p + "attention.self.query"),
            "k": lin(p + "attention.self.key"),
            "v": lin(p + "attention.self.value"),
            "attn_out": lin(p + "attention.output.dense"),
            "attn_ln": {"weight": g(p + "attention.output.LayerNorm.weight"),
                        "bias": g(p + "attention.output.LayerNorm.bias")},
            "ff_in": lin(p + "intermediate.dense"),
            "ff_out": lin(p + "output.dense"),
            "ff_ln": {"weight": g(p + "output.LayerNorm.weight"),
                      "bias": g(p + "output.LayerNorm.bias")},
        })
    from maa3_tpu.torch_import import finalize_linear_tree
    return finalize_linear_tree({"embeddings": emb, "layers": layers})
