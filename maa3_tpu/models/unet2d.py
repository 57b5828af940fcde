"""Legacy 2-D UNet backbone (OpenAI UNet + spatial-transformer cross-attn).

Capability parity with ldm/modules/diffusionmodules/openaimodel.py (UNetModel)
+ ldm/modules/attention.py:152 (SpatialTransformer) — the 2-D LatentDiffusion
backbone kept by the reference for older checkpoints (unused by CFM configs):

  x (B, C, H, W), t (B,), context (B, L, D)
  -> conv_in -> down blocks [ResBlock(t-emb FiLM) + optional SpatialTransformer,
  stride-2 downsample per level] -> middle (Res + ST + Res) -> up blocks with
  skip concats + 2x nearest upsample -> GroupNorm/silu/conv_out.

Functional JAX re-design; attention through the shared fused-softmax op.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from maa3_tpu.ops.basic import dense, dense_init, layer_norm, silu, timestep_embedding
from maa3_tpu.utils import nprand

Array = jax.Array

_DN2 = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                  ("NCHW", "OIHW", "NCHW"))


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 64
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    attention_levels: Tuple[int, ...] = (1, 2)   # levels with transformers
    num_heads: int = 4
    context_dim: Optional[int] = None            # None -> self-attn only
    transformer_depth: int = 1
    film_dim: Optional[int] = None               # FiLM/class-label embedding
                                                 # added to temb (AudioLDM
                                                 # 'film' conditioning;
                                                 # ddpm.py:1429-1431)


def _conv2d_init(key, cin, cout, k, zero=False):
    if zero:
        return {"w": jnp.zeros((cout, cin, k, k), jnp.float32),
                "b": jnp.zeros((cout,), jnp.float32)}
    rng = nprand.np_rng(key)
    bound = 1.0 / np.sqrt(cin * k * k)
    return {"w": jnp.asarray(rng.uniform(-bound, bound, (cout, cin, k, k))
                             .astype("float32")),
            "b": jnp.zeros((cout,), jnp.float32)}


def _conv2d(p, x, stride=1, padding=1):
    y = lax.conv_general_dilated(x, p["w"], (stride, stride),
                                 [(padding, padding), (padding, padding)],
                                 dimension_numbers=_DN2)
    return y + p["b"][None, :, None, None]


def _gn_init(c):
    return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _gn(p, x, groups=32, eps=1e-5):
    b, c, h, w = x.shape
    g = min(groups, c)
    xf = x.astype(jnp.float32).reshape(b, g, -1)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = ((xf - mean) * lax.rsqrt(var + eps)).reshape(b, c, h, w)
    return (y * p["weight"][None, :, None, None]
            + p["bias"][None, :, None, None]).astype(x.dtype)


# -- ResBlock with timestep FiLM (openaimodel ResBlock) ----------------------

def _res_init(key, cin, cout, temb_dim):
    ks = jax.random.split(key, 4)
    p = {"norm1": _gn_init(cin), "conv1": _conv2d_init(ks[0], cin, cout, 3),
         "temb": dense_init(ks[1], temb_dim, cout),
         "norm2": _gn_init(cout),
         "conv2": _conv2d_init(ks[2], cout, cout, 3, zero=True)}
    if cin != cout:
        p["skip"] = _conv2d_init(ks[3], cin, cout, 1)
    return p


def _res(p, x, temb):
    h = _conv2d(p["conv1"], silu(_gn(p["norm1"], x)))
    h = h + dense(p["temb"], silu(temb))[:, :, None, None]
    h = _conv2d(p["conv2"], silu(_gn(p["norm2"], h)))
    if "skip" in p:
        x = _conv2d(p["skip"], x, padding=0)
    return x + h


# -- SpatialTransformer (attention.py:152) -----------------------------------

def _st_init(key, c, n_heads, ctx_dim, depth):
    ks = iter(jax.random.split(key, 4 + 10 * depth))
    blocks = []
    for _ in range(depth):
        blocks.append({
            "ln1": {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            "q1": dense_init(next(ks), c, c, bias=False),
            "k1": dense_init(next(ks), c, c, bias=False),
            "v1": dense_init(next(ks), c, c, bias=False),
            "o1": dense_init(next(ks), c, c),
            "ln2": {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            "q2": dense_init(next(ks), c, c, bias=False),
            "k2": dense_init(next(ks), ctx_dim or c, c, bias=False),
            "v2": dense_init(next(ks), ctx_dim or c, c, bias=False),
            "o2": dense_init(next(ks), c, c),
            "ln3": {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            "ff1": dense_init(next(ks), c, 4 * c),
            "ff2": dense_init(next(ks), 4 * c, c),
        })
    return {"norm": _gn_init(c),
            "proj_in": _conv2d_init(next(ks), c, c, 1),
            "blocks": blocks,
            "proj_out": _conv2d_init(next(ks), c, c, 1, zero=True)}


def _mha(q, k, v, n_heads):
    b, lq, c = q.shape
    hd = c // n_heads
    q = q.reshape(b, lq, n_heads, hd)
    k = k.reshape(b, -1, n_heads, hd)
    v = v.reshape(b, -1, n_heads, hd)
    s = jnp.einsum("blhd,bmhd->bhlm", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(hd)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhlm,bmhd->blhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    return o.reshape(b, lq, c)


def _st(p, x, context, n_heads):
    b, c, h, w = x.shape
    res = x
    y = _conv2d(p["proj_in"], _gn(p["norm"], x), padding=0)
    y = y.reshape(b, c, h * w).transpose(0, 2, 1)  # (B, HW, C)
    for bp in p["blocks"]:
        z = layer_norm(y, bp["ln1"]["weight"], bp["ln1"]["bias"])
        y = y + dense(bp["o1"], _mha(dense(bp["q1"], z), dense(bp["k1"], z),
                                     dense(bp["v1"], z), n_heads))
        z = layer_norm(y, bp["ln2"]["weight"], bp["ln2"]["bias"])
        ctx = context if context is not None else z
        y = y + dense(bp["o2"], _mha(dense(bp["q2"], z), dense(bp["k2"], ctx),
                                     dense(bp["v2"], ctx), n_heads))
        z = layer_norm(y, bp["ln3"]["weight"], bp["ln3"]["bias"])
        y = y + dense(bp["ff2"], jax.nn.gelu(dense(bp["ff1"], z)))
    y = y.transpose(0, 2, 1).reshape(b, c, h, w)
    return res + _conv2d(p["proj_out"], y, padding=0)


# -- UNet --------------------------------------------------------------------

def unet2d_init(key: Array, cfg: UNet2DConfig) -> dict:
    ks = iter(jax.random.split(key, 512))
    mc = cfg.model_channels
    temb_dim = 4 * mc
    p: dict = {
        "temb1": dense_init(next(ks), mc, temb_dim),
        "temb2": dense_init(next(ks), temb_dim, temb_dim),
        "conv_in": _conv2d_init(next(ks), cfg.in_channels, mc, 3),
    }
    if cfg.film_dim:
        p["film_emb"] = dense_init(next(ks), cfg.film_dim, temb_dim)
    downs, ch, chans = [], mc, [mc]
    for lvl, mult in enumerate(cfg.channel_mult):
        level = {"res": [], "attn": []}
        for _ in range(cfg.num_res_blocks):
            level["res"].append(_res_init(next(ks), ch, mc * mult, temb_dim))
            ch = mc * mult
            level["attn"].append(
                _st_init(next(ks), ch, cfg.num_heads, cfg.context_dim,
                         cfg.transformer_depth)
                if lvl in cfg.attention_levels else None)
            chans.append(ch)
        if lvl != len(cfg.channel_mult) - 1:
            level["down"] = _conv2d_init(next(ks), ch, ch, 3)
            chans.append(ch)
        downs.append(level)
    p["down"] = downs
    p["mid"] = {"res1": _res_init(next(ks), ch, ch, temb_dim),
                "attn": _st_init(next(ks), ch, cfg.num_heads, cfg.context_dim,
                                 cfg.transformer_depth),
                "res2": _res_init(next(ks), ch, ch, temb_dim)}
    ups = []
    for lvl, mult in reversed(list(enumerate(cfg.channel_mult))):
        level = {"res": [], "attn": []}
        for _ in range(cfg.num_res_blocks + 1):
            skip = chans.pop()
            level["res"].append(_res_init(next(ks), ch + skip, mc * mult,
                                          temb_dim))
            ch = mc * mult
            level["attn"].append(
                _st_init(next(ks), ch, cfg.num_heads, cfg.context_dim,
                         cfg.transformer_depth)
                if lvl in cfg.attention_levels else None)
        if lvl != 0:
            level["up"] = _conv2d_init(next(ks), ch, ch, 3)
        ups.append(level)
    p["up"] = ups
    p["norm_out"] = _gn_init(ch)
    p["conv_out"] = _conv2d_init(next(ks), ch, cfg.out_channels, 3, zero=True)
    return p


def unet2d_apply(params: dict, cfg: UNet2DConfig, x: Array, t: Array,
                 context: Optional[Array] = None,
                 film: Optional[Array] = None) -> Array:
    temb = timestep_embedding(t, cfg.model_channels)
    temb = dense(params["temb2"], silu(dense(params["temb1"], temb)))
    if film is not None:
        # 'film' conditioning: pooled embedding joins the timestep embedding
        # (the y/label_emb route of the reference UNet, ddpm.py:1429-1437)
        temb = temb + dense(params["film_emb"], film)

    h = _conv2d(params["conv_in"], x)
    skips = [h]
    for lvl, level in enumerate(params["down"]):
        for rp, ap in zip(level["res"], level["attn"]):
            h = _res(rp, h, temb)
            if ap is not None:
                h = _st(ap, h, context, cfg.num_heads)
            skips.append(h)
        if "down" in level:
            h = _conv2d(level["down"], jnp.pad(h, ((0, 0), (0, 0), (0, 1),
                                                   (0, 1))), stride=2,
                        padding=0)
            skips.append(h)

    h = _res(params["mid"]["res1"], h, temb)
    h = _st(params["mid"]["attn"], h, context, cfg.num_heads)
    h = _res(params["mid"]["res2"], h, temb)

    for level in params["up"]:
        for rp, ap in zip(level["res"], level["attn"]):
            h = jnp.concatenate([h, skips.pop()], axis=1)
            h = _res(rp, h, temb)
            if ap is not None:
                h = _st(ap, h, context, cfg.num_heads)
        if "up" in level:
            h = jnp.repeat(jnp.repeat(h, 2, axis=2), 2, axis=3)
            h = _conv2d(level["up"], h)

    return _conv2d(params["conv_out"], silu(_gn(params["norm_out"], h)))
