"""CLAP caption tower + combined CLAP⧺T5 conditioner.

Parity targets:
- Projection (ldm/modules/encoders/CLAP/clap.py Projection): d_in->d_out
  linear1 (no bias), gelu, linear2 (no bias), residual, LayerNorm (dropout is
  inference-inert).
- FrozenCLAPFLANEmbedder.encode (ldm/modules/encoders/modules.py:174-191):
  z  = Projection(BERT(ori_caption tokens).last_hidden)      (B, 77, 1024)
  z2 = T5(struct_caption tokens).last_hidden                 (B, 77, 1024)
  return concat([z, z2], axis=1)                             (B, 154, 1024)
- FrozenCLAPEmbedder (modules.py:91-129): CLAP branch only.
- FrozenFLANEmbedder (modules.py:54-88): T5 branch only.
- Video_Feat_Encoder_NoPosembed (modules.py:16-27): Linear(512 -> embed).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from maa3_tpu.ops.basic import dense, dense_init, layer_norm
from maa3_tpu.models.bert import BertConfig, bert_apply, bert_init, bert_from_torch
from maa3_tpu.models.t5 import T5Config, t5_apply, t5_init, t5_from_torch

Array = jax.Array


def projection_init(key: Array, d_in: int = 768, d_out: int = 1024) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "linear1": dense_init(k1, d_in, d_out, bias=False),
        "linear2": dense_init(k2, d_out, d_out, bias=False),
        "ln": {"weight": jnp.ones((d_out,)), "bias": jnp.zeros((d_out,))},
    }


def projection_apply(p: dict, x: Array, compute_dtype=None) -> Array:
    e1 = dense(p["linear1"], x, compute_dtype)
    e2 = dense(p["linear2"],
               jax.nn.gelu(e1.astype(jnp.float32), approximate=False).astype(e1.dtype),
               compute_dtype)
    return layer_norm(e1 + e2, p["ln"]["weight"], p["ln"]["bias"], eps=1e-5)


def projection_from_torch(sd: dict, prefix: str = "") -> dict:
    g = lambda n: jnp.asarray(sd[prefix + n])
    return {
        "linear1": {"w": g("linear1.weight").T},
        "linear2": {"w": g("linear2.weight").T},
        "ln": {"weight": g("layer_norm.weight"), "bias": g("layer_norm.bias")},
    }


@dataclasses.dataclass(frozen=True)
class CLAPFLANConfig:
    bert: BertConfig = BertConfig()
    t5: T5Config = T5Config()
    d_proj: int = 1024
    max_length: int = 77


def clap_flan_init(key: Array, cfg: CLAPFLANConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "bert": bert_init(k1, cfg.bert),
        "projection": projection_init(k2, cfg.bert.hidden_size, cfg.d_proj),
        "t5": t5_init(k3, cfg.t5),
    }


def clap_flan_encode(params: dict, cfg: CLAPFLANConfig,
                     ori_ids: Array, struct_ids: Array,
                     ori_mask: Optional[Array] = None,
                     struct_mask: Optional[Array] = None,
                     compute_dtype=jnp.float32) -> Array:
    """(B, 77) + (B, 77) token ids -> (B, 154, 1024) conditioning.

    NOTE: matches the reference exactly — BERT/T5 attention *does* use the
    padding masks if given, but the returned per-token features are taken for
    all 77 positions (padding rows included), as the reference does.
    """
    z = bert_apply(params["bert"], cfg.bert, ori_ids, ori_mask,
                   compute_dtype=compute_dtype)
    z = projection_apply(params["projection"], z, compute_dtype)
    z2 = t5_apply(params["t5"], cfg.t5, struct_ids, struct_mask,
                  compute_dtype=compute_dtype)
    return jnp.concatenate([z, z2], axis=1)


def clap_encode(params: dict, cfg: CLAPFLANConfig, ids: Array,
                mask: Optional[Array] = None, compute_dtype=jnp.float32) -> Array:
    """FrozenCLAPEmbedder: CLAP branch only -> (B, 77, 1024)."""
    z = bert_apply(params["bert"], cfg.bert, ids, mask, compute_dtype=compute_dtype)
    return projection_apply(params["projection"], z, compute_dtype)


def flan_encode(params: dict, cfg: CLAPFLANConfig, ids: Array,
                mask: Optional[Array] = None, compute_dtype=jnp.float32) -> Array:
    """FrozenFLANEmbedder: T5 branch only -> (B, 77, d_model)."""
    return t5_apply(params["t5"], cfg.t5, ids, mask, compute_dtype=compute_dtype)


# ---------------------------------------------------------------------------
# CLIP-visual (+) CLAP-text fusion (scripts/video2audio_flow_CLAP.py:485)
# ---------------------------------------------------------------------------

def clap_fusion_init(key: Array, visual_dim: int = 512, text_dim: int = 1024,
                     out_dim: int = 512) -> dict:
    """Fork experiment: per-frame concat of CLIP visual features with a tiled
    CLAP text embedding, projected back to the video-feature width."""
    return {"fuse": dense_init(key, visual_dim + text_dim, out_dim)}


def clap_fusion_apply(params: dict, video_feat: Array, text_emb: Array,
                      compute_dtype=None) -> Array:
    """video_feat (B, Lv, Dv) + text_emb (B, Dt) -> (B, Lv, out)."""
    lv = video_feat.shape[1]
    text_tiled = jnp.broadcast_to(text_emb[:, None, :],
                                  (text_emb.shape[0], lv, text_emb.shape[-1]))
    fused = jnp.concatenate([video_feat, text_tiled.astype(video_feat.dtype)],
                            axis=-1)
    return dense(params["fuse"], fused, compute_dtype)


# ---------------------------------------------------------------------------
# Video feature conditioner (modules.py:16-27)
# ---------------------------------------------------------------------------

def video_feat_encoder_init(key: Array, origin_dim: int = 512,
                            embed_dim: int = 768) -> dict:
    return {"embedder": dense_init(key, origin_dim, embed_dim)}


def video_feat_encoder_apply(params: dict, x: Array, compute_dtype=None) -> Array:
    return dense(params["embedder"], x, compute_dtype)
