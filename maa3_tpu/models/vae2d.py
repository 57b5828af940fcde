"""Legacy 2-D VAE family: KL and VQ autoencoders over (B, 1, 80, T) mels.

Capability parity with ldm/models/autoencoder.py (AutoencoderKL:305,
VQModel:14, IdentityFirstStage:486) and the 2-D Encoder/Decoder backbone
(ldm/modules/diffusionmodules/model.py:368-517): conv-resnet stacks with
GroupNorm+swish, stride-2 downsamples with (0,1,0,1) asymmetric pad, 2x
nearest upsamples, optional self-attention at chosen resolutions, mid
attn block; VQ uses nearest-codebook quantization with straight-through
gradients. Kept for older-checkpoint compatibility — the CFM models all use
the 1-D VAE (vae1d.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from maa3_tpu.utils import nprand

Array = jax.Array

_DN2 = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                  ("NCHW", "OIHW", "NCHW"))


@dataclasses.dataclass(frozen=True)
class VAE2DConfig:
    in_channels: int = 1
    out_ch: int = 1
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    z_channels: int = 4
    double_z: bool = True
    embed_dim: int = 4
    resolution: int = 80          # freq axis size, drives attn_resolutions
    n_embed: int = 0              # >0 -> VQ model

    @property
    def num_levels(self) -> int:
        return len(self.ch_mult)


def _conv2d_init(key, cin, cout, k):
    rng = nprand.np_rng(key)
    import numpy as np
    bound = 1.0 / np.sqrt(cin * k * k)
    return {"w": jnp.asarray(rng.uniform(-bound, bound, (cout, cin, k, k))
                             .astype("float32")),
            "b": jnp.zeros((cout,), jnp.float32)}


def _conv2d(p, x, stride=1, padding=1):
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = lax.conv_general_dilated(x, p["w"], (stride, stride), padding,
                                 dimension_numbers=_DN2)
    return y + p["b"][None, :, None, None]


def _gn_init(c):
    return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _gn(p, x, groups=32, eps=1e-6):
    b, c, h, w = x.shape
    xf = x.astype(jnp.float32).reshape(b, groups, -1)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = ((xf - mean) * lax.rsqrt(var + eps)).reshape(b, c, h, w)
    return (y * p["weight"][None, :, None, None]
            + p["bias"][None, :, None, None]).astype(x.dtype)


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _res_init(key, cin, cout):
    ks = jax.random.split(key, 3)
    p = {"norm1": _gn_init(cin), "conv1": _conv2d_init(ks[0], cin, cout, 3),
         "norm2": _gn_init(cout), "conv2": _conv2d_init(ks[1], cout, cout, 3)}
    if cin != cout:
        p["nin_shortcut"] = _conv2d_init(ks[2], cin, cout, 1)
    return p


def _res(p, x):
    h = _conv2d(p["conv1"], _swish(_gn(p["norm1"], x)))
    h = _conv2d(p["conv2"], _swish(_gn(p["norm2"], h)))
    if "nin_shortcut" in p:
        x = _conv2d(p["nin_shortcut"], x, padding=0)
    return x + h


def _attn_init(key, c):
    ks = jax.random.split(key, 4)
    return {"norm": _gn_init(c), "q": _conv2d_init(ks[0], c, c, 1),
            "k": _conv2d_init(ks[1], c, c, 1), "v": _conv2d_init(ks[2], c, c, 1),
            "proj_out": _conv2d_init(ks[3], c, c, 1)}


def _attn(p, x):
    b, c, h, w = x.shape
    hn = _gn(p["norm"], x)
    q = _conv2d(p["q"], hn, padding=0).reshape(b, c, h * w)
    k = _conv2d(p["k"], hn, padding=0).reshape(b, c, h * w)
    v = _conv2d(p["v"], hn, padding=0).reshape(b, c, h * w)
    wts = jax.nn.softmax(jnp.einsum("bci,bcj->bij", q, k,
                                    preferred_element_type=jnp.float32)
                         * (c ** -0.5), axis=-1)
    out = jnp.einsum("bij,bcj->bci", wts.astype(v.dtype), v).reshape(b, c, h, w)
    return x + _conv2d(p["proj_out"], out, padding=0)


def encoder2d_init(key: Array, cfg: VAE2DConfig) -> dict:
    ks = iter(jax.random.split(key, 256))
    p: dict = {"conv_in": _conv2d_init(next(ks), cfg.in_channels, cfg.ch, 3)}
    in_mult = (1,) + tuple(cfg.ch_mult)
    res = cfg.resolution
    down = []
    block_in = cfg.ch
    for lvl in range(cfg.num_levels):
        block_in = cfg.ch * in_mult[lvl]
        block_out = cfg.ch * cfg.ch_mult[lvl]
        blocks, attns = [], []
        for _ in range(cfg.num_res_blocks):
            blocks.append(_res_init(next(ks), block_in, block_out))
            block_in = block_out
            if res in cfg.attn_resolutions:
                attns.append(_attn_init(next(ks), block_in))
        lp = {"block": blocks, "attn": attns}
        if lvl != cfg.num_levels - 1:
            lp["downsample"] = _conv2d_init(next(ks), block_in, block_in, 3)
            res //= 2
        down.append(lp)
    p["down"] = down
    p["mid"] = {"block_1": _res_init(next(ks), block_in, block_in),
                "attn_1": _attn_init(next(ks), block_in),
                "block_2": _res_init(next(ks), block_in, block_in)}
    p["norm_out"] = _gn_init(block_in)
    zc = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    p["conv_out"] = _conv2d_init(next(ks), block_in, zc, 3)
    return p


def encoder2d_apply(p: dict, cfg: VAE2DConfig, x: Array) -> Array:
    h = _conv2d(p["conv_in"], x)
    for lvl in range(cfg.num_levels):
        lp = p["down"][lvl]
        for i in range(cfg.num_res_blocks):
            h = _res(lp["block"][i], h)
            if lp["attn"]:
                h = _attn(lp["attn"][i], h)
        if "downsample" in lp:
            # asymmetric (0,1) pad both spatial dims (model.py Downsample)
            h = jnp.pad(h, ((0, 0), (0, 0), (0, 1), (0, 1)))
            h = _conv2d(lp["downsample"], h, stride=2, padding=0)
    h = _res(p["mid"]["block_1"], h)
    h = _attn(p["mid"]["attn_1"], h)
    h = _res(p["mid"]["block_2"], h)
    return _conv2d(p["conv_out"], _swish(_gn(p["norm_out"], h)))


def decoder2d_init(key: Array, cfg: VAE2DConfig) -> dict:
    ks = iter(jax.random.split(key, 256))
    block_in = cfg.ch * cfg.ch_mult[-1]
    p: dict = {"conv_in": _conv2d_init(next(ks), cfg.z_channels, block_in, 3)}
    p["mid"] = {"block_1": _res_init(next(ks), block_in, block_in),
                "attn_1": _attn_init(next(ks), block_in),
                "block_2": _res_init(next(ks), block_in, block_in)}
    up = [None] * cfg.num_levels
    for lvl in reversed(range(cfg.num_levels)):
        block_out = cfg.ch * cfg.ch_mult[lvl]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_res_init(next(ks), block_in, block_out))
            block_in = block_out
        lp = {"block": blocks}
        if lvl != 0:
            lp["upsample"] = _conv2d_init(next(ks), block_in, block_in, 3)
        up[lvl] = lp
    p["up"] = up
    p["norm_out"] = _gn_init(block_in)
    p["conv_out"] = _conv2d_init(next(ks), block_in, cfg.out_ch, 3)
    return p


def decoder2d_apply(p: dict, cfg: VAE2DConfig, z: Array) -> Array:
    h = _conv2d(p["conv_in"], z)
    h = _res(p["mid"]["block_1"], h)
    h = _attn(p["mid"]["attn_1"], h)
    h = _res(p["mid"]["block_2"], h)
    for lvl in reversed(range(cfg.num_levels)):
        lp = p["up"][lvl]
        for blk in lp["block"]:
            h = _res(blk, h)
        if "upsample" in lp:
            b, c, hh, ww = h.shape
            h = jnp.repeat(jnp.repeat(h, 2, axis=2), 2, axis=3)
            h = _conv2d(lp["upsample"], h)
    return _conv2d(p["conv_out"], _swish(_gn(p["norm_out"], h)))


# ---------------------------------------------------------------------------
# KL and VQ wrappers
# ---------------------------------------------------------------------------

def vae2d_init(key: Array, cfg: VAE2DConfig) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    p = {"encoder": encoder2d_init(k1, cfg), "decoder": decoder2d_init(k2, cfg)}
    if cfg.n_embed > 0:  # VQ
        p["quant_conv"] = _conv2d_init(k3, cfg.z_channels, cfg.embed_dim, 1)
        p["post_quant_conv"] = _conv2d_init(k4, cfg.embed_dim, cfg.z_channels, 1)
        p["codebook"] = jnp.asarray(
            nprand.uniform(k5, (cfg.n_embed, cfg.embed_dim),
                           -1.0 / cfg.n_embed, 1.0 / cfg.n_embed))
    else:
        p["quant_conv"] = _conv2d_init(k3, 2 * cfg.z_channels,
                                       2 * cfg.embed_dim, 1)
        p["post_quant_conv"] = _conv2d_init(k4, cfg.embed_dim, cfg.z_channels, 1)
    return p


def vae2d_encode_moments(p: dict, cfg: VAE2DConfig, x: Array) -> Array:
    h = encoder2d_apply(p["encoder"], cfg, x)
    return _conv2d(p["quant_conv"], h, padding=0)


def vae2d_decode(p: dict, cfg: VAE2DConfig, z: Array) -> Array:
    return decoder2d_apply(p["decoder"], cfg, _conv2d(p["post_quant_conv"], z,
                                                      padding=0))


def vq_quantize(codebook: Array, z: Array):
    """Nearest-codebook quantization with straight-through estimator.
    z (B, C, H, W) -> (z_q, indices, commit_loss)."""
    b, c, h, w = z.shape
    flat = z.transpose(0, 2, 3, 1).reshape(-1, c)
    d = (jnp.sum(flat ** 2, -1, keepdims=True)
         - 2 * flat @ codebook.T + jnp.sum(codebook ** 2, -1)[None])
    idx = jnp.argmin(d, axis=-1)
    zq = codebook[idx].reshape(b, h, w, c).transpose(0, 3, 1, 2)
    commit = jnp.mean((jax.lax.stop_gradient(zq) - z) ** 2)
    embed = jnp.mean((zq - jax.lax.stop_gradient(z)) ** 2)
    zq = z + jax.lax.stop_gradient(zq - z)  # straight-through
    return zq, idx.reshape(b, h, w), commit + 0.25 * embed
