"""1-D mel KL-VAE: (B, 80, T) log-mel  <->  (B, 20, T/2) latent.

Capability parity with AutoencoderKL / Encoder1D / Decoder1D
(ldm/models/autoencoder1d.py). Architecture notes (matched exactly so the
released checkpoints import):

- config used by every released model: ch=384, ch_mult=(1,2,4),
  num_res_blocks=2, kernel_size=5, down_layers=[0], attn_layers=[3].
  With 3 levels, `attn_layers=[3]` never fires inside the levels — only the
  mid block has attention (autoencoder1d.py:344-378).
- Encoder resblocks/conv use kernel_size (5); the Decoder's res/up blocks use
  the ResnetBlock1D *default* kernel 3 while its conv_in/conv_out use 5
  (autoencoder1d.py:436-440,460-464,477-482 — an asymmetry the checkpoints
  bake in).
- Downsample: stride-2 conv with manual (0,1) zero pad (autoencoder1d.py:310-317).
- Upsample: 2x nearest + conv3 (autoencoder1d.py:291-295); decoder upsamples
  at level `down_layers[i]+1` (autoencoder1d.py:427).
- GroupNorm(32, eps=1e-6) + swish everywhere; DiagonalGaussian posterior with
  logvar clamp [-30, 20].

All convs run through lax.conv_general_dilated in NCL layout; on TPU, XLA maps
1-D convs onto the MXU as implicit GEMMs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from maa3_tpu.ops.conv import conv1d, conv1d_init, pad_1d

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 80
    out_ch: int = 80
    ch: int = 384
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_layers: Tuple[int, ...] = ()
    down_layers: Tuple[int, ...] = (0,)
    kernel_size: int = 5
    z_channels: int = 20
    double_z: bool = True
    embed_dim: int = 20
    tanh_out: bool = False

    @property
    def num_layers(self) -> int:
        return len(self.ch_mult)

    @property
    def downsample_rate(self) -> int:
        return 2 ** len(self.down_layers)


def swish(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# GroupNorm in NCL
# ---------------------------------------------------------------------------

def _gn_init(ch: int) -> dict:
    return {"weight": jnp.ones((ch,), jnp.float32),
            "bias": jnp.zeros((ch,), jnp.float32)}


def _gn(p: dict, x: Array, num_groups: int = 32, eps: float = 1e-6) -> Array:
    b, c, t = x.shape
    xf = x.astype(jnp.float32).reshape(b, num_groups, (c // num_groups) * t)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, c, t)
    y = y * p["weight"][None, :, None] + p["bias"][None, :, None]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _resblock_init(key: Array, in_ch: int, out_ch: int, k: int) -> dict:
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _gn_init(in_ch),
        "conv1": conv1d_init(ks[0], in_ch, out_ch, k),
        "norm2": _gn_init(out_ch),
        "conv2": conv1d_init(ks[1], out_ch, out_ch, k),
    }
    if in_ch != out_ch:
        p["nin_shortcut"] = conv1d_init(ks[2], in_ch, out_ch, 1)
    return p


def _resblock(p: dict, x: Array, k: int, compute_dtype=None) -> Array:
    h = conv1d(p["conv1"], swish(_gn(p["norm1"], x)), padding=k // 2,
               compute_dtype=compute_dtype)
    h = conv1d(p["conv2"], swish(_gn(p["norm2"], h)), padding=k // 2,
               compute_dtype=compute_dtype)
    if "nin_shortcut" in p:
        x = conv1d(p["nin_shortcut"], x, compute_dtype=compute_dtype)
    return x.astype(h.dtype) + h


def _attnblock_init(key: Array, ch: int) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "norm": _gn_init(ch),
        "q": conv1d_init(ks[0], ch, ch, 1),
        "k": conv1d_init(ks[1], ch, ch, 1),
        "v": conv1d_init(ks[2], ch, ch, 1),
        "proj_out": conv1d_init(ks[3], ch, ch, 1),
    }


def _attnblock(p: dict, x: Array, compute_dtype=None) -> Array:
    """Single-head full attention over time. NOTE: matches the reference's
    scaling quirk — logits scaled by channels^-0.5 (the variable named `t` at
    autoencoder1d.py:265-269 is actually the channel dim of the NCL tensor).
    Softmax statistics stay fp32 regardless of compute_dtype."""
    h = _gn(p["norm"], x)
    q = conv1d(p["q"], h, compute_dtype=compute_dtype)   # (B, C, T)
    k = conv1d(p["k"], h, compute_dtype=compute_dtype)
    v = conv1d(p["v"], h, compute_dtype=compute_dtype)
    b, c, t = q.shape
    logits = jnp.einsum("bci,bcj->bij", q, k,
                        preferred_element_type=jnp.float32) * (c ** -0.5)
    w = jax.nn.softmax(logits, axis=-1)
    h = jnp.einsum("bij,bcj->bci", w.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return x + conv1d(p["proj_out"], h,
                      compute_dtype=compute_dtype).astype(x.dtype)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def encoder_init(key: Array, cfg: VAEConfig) -> dict:
    ks = iter(jax.random.split(key, 256))
    k = cfg.kernel_size
    p: dict = {"conv_in": conv1d_init(next(ks), cfg.in_channels, cfg.ch, k)}
    in_mult = (1,) + tuple(cfg.ch_mult)
    down = []
    block_in = cfg.ch
    for lvl in range(cfg.num_layers):
        block_in = cfg.ch * in_mult[lvl]
        block_out = cfg.ch * cfg.ch_mult[lvl]
        blocks, attns = [], []
        for _ in range(cfg.num_res_blocks):
            blocks.append(_resblock_init(next(ks), block_in, block_out, k))
            block_in = block_out
            if lvl in cfg.attn_layers:
                attns.append(_attnblock_init(next(ks), block_in))
        lvl_p = {"block": blocks, "attn": attns}
        if lvl in cfg.down_layers:
            lvl_p["downsample"] = conv1d_init(next(ks), block_in, block_in, 3)
        down.append(lvl_p)
    p["down"] = down
    p["mid"] = {
        "block_1": _resblock_init(next(ks), block_in, block_in, k),
        "attn_1": _attnblock_init(next(ks), block_in),
        "block_2": _resblock_init(next(ks), block_in, block_in, k),
    }
    p["norm_out"] = _gn_init(block_in)
    out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    p["conv_out"] = conv1d_init(next(ks), block_in, out_ch, k)
    return p


def encoder_apply(p: dict, cfg: VAEConfig, x: Array, compute_dtype=None) -> Array:
    k = cfg.kernel_size
    h = conv1d(p["conv_in"], x, padding=k // 2, compute_dtype=compute_dtype)
    for lvl in range(cfg.num_layers):
        lp = p["down"][lvl]
        for i in range(cfg.num_res_blocks):
            h = _resblock(lp["block"][i], h, k, compute_dtype)
            if lp["attn"]:
                h = _attnblock(lp["attn"][i], h, compute_dtype)
        if lvl in cfg.down_layers:
            # stride-2 conv with asymmetric (0,1) pad (autoencoder1d.py:310-314)
            h = conv1d(lp["downsample"], pad_1d(h, 0, 1), stride=2,
                       compute_dtype=compute_dtype)
    h = _resblock(p["mid"]["block_1"], h, k, compute_dtype)
    h = _attnblock(p["mid"]["attn_1"], h, compute_dtype)
    h = _resblock(p["mid"]["block_2"], h, k, compute_dtype)
    h = swish(_gn(p["norm_out"], h))
    # conv_out emits the posterior moments — keep it fp32
    return conv1d(p["conv_out"], h.astype(jnp.float32), padding=k // 2)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decoder_init(key: Array, cfg: VAEConfig) -> dict:
    ks = iter(jax.random.split(key, 256))
    k = cfg.kernel_size
    block_in = cfg.ch * cfg.ch_mult[-1]
    p: dict = {"conv_in": conv1d_init(next(ks), cfg.z_channels, block_in, k)}
    # decoder mid + up resblocks use the default kernel 3 (autoencoder1d.py:444-464)
    p["mid"] = {
        "block_1": _resblock_init(next(ks), block_in, block_in, 3),
        "attn_1": _attnblock_init(next(ks), block_in),
        "block_2": _resblock_init(next(ks), block_in, block_in, 3),
    }
    up_layers = tuple(d + 1 for d in cfg.down_layers)
    up: list = [None] * cfg.num_layers
    for lvl in reversed(range(cfg.num_layers)):
        block_out = cfg.ch * cfg.ch_mult[lvl]
        blocks, attns = [], []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_resblock_init(next(ks), block_in, block_out, 3))
            block_in = block_out
            if lvl in cfg.attn_layers:
                attns.append(_attnblock_init(next(ks), block_in))
        lvl_p = {"block": blocks, "attn": attns}
        if lvl in up_layers:
            lvl_p["upsample"] = conv1d_init(next(ks), block_in, block_in, 3)
        up[lvl] = lvl_p
    p["up"] = up
    p["norm_out"] = _gn_init(block_in)
    p["conv_out"] = conv1d_init(next(ks), block_in, cfg.out_ch, k)
    return p


def decoder_apply(p: dict, cfg: VAEConfig, z: Array, compute_dtype=None) -> Array:
    k = cfg.kernel_size
    up_layers = tuple(d + 1 for d in cfg.down_layers)
    h = conv1d(p["conv_in"], z, padding=k // 2, compute_dtype=compute_dtype)
    h = _resblock(p["mid"]["block_1"], h, 3, compute_dtype)
    h = _attnblock(p["mid"]["attn_1"], h, compute_dtype)
    h = _resblock(p["mid"]["block_2"], h, 3, compute_dtype)
    for lvl in reversed(range(cfg.num_layers)):
        lp = p["up"][lvl]
        for i in range(cfg.num_res_blocks + 1):
            h = _resblock(lp["block"][i], h, 3, compute_dtype)
            if lp["attn"]:
                h = _attnblock(lp["attn"][i], h, compute_dtype)
        if lvl in up_layers:
            # 2x nearest upsample + conv3 (autoencoder1d.py:291-295)
            b, c, t = h.shape
            h = jnp.repeat(h, 2, axis=-1)
            h = conv1d(lp["upsample"], h, padding=1,
                       compute_dtype=compute_dtype)
    h = swish(_gn(p["norm_out"], h))
    # final mel projection in fp32 (feeds the log-mel parity gate)
    h = conv1d(p["conv_out"], h.astype(jnp.float32), padding=k // 2)
    if cfg.tanh_out:
        h = jnp.tanh(h)
    return h


# ---------------------------------------------------------------------------
# AutoencoderKL
# ---------------------------------------------------------------------------

def vae_init(key: Array, cfg: VAEConfig) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "encoder": encoder_init(k1, cfg),
        "decoder": decoder_init(k2, cfg),
        "quant_conv": conv1d_init(k3, 2 * cfg.z_channels, 2 * cfg.embed_dim, 1),
        "post_quant_conv": conv1d_init(k4, cfg.embed_dim, cfg.z_channels, 1),
    }


def vae_encode_moments(params: dict, cfg: VAEConfig, x: Array,
                       compute_dtype=None) -> Array:
    """x (B, 80, T) -> moments (B, 2*embed_dim, T/2)."""
    h = encoder_apply(params["encoder"], cfg, x, compute_dtype)
    return conv1d(params["quant_conv"], h)


def gaussian_sample(moments: Array, key: Optional[Array] = None,
                    sample: bool = True) -> Array:
    """DiagonalGaussianDistribution.sample()/mode()
    (ldm/modules/distributions/distributions.py:24-44): logvar clamp [-30,20]."""
    mean, logvar = jnp.split(moments, 2, axis=1)
    if not sample or key is None:
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def gaussian_kl(moments: Array) -> Array:
    """KL(q || N(0,1)) summed over (C, T), per sample."""
    mean, logvar = jnp.split(moments, 2, axis=1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    var = jnp.exp(logvar)
    return 0.5 * jnp.sum(mean * mean + var - 1.0 - logvar, axis=(1, 2))


def vae_decode(params: dict, cfg: VAEConfig, z: Array,
               compute_dtype=None) -> Array:
    """z (B, embed_dim, T/2) -> mel (B, 80, T).

    compute_dtype=bf16 runs the conv stack in bf16 (GroupNorm stats, softmax
    and the final mel projection stay fp32) — the serving fast path; None
    keeps full fp32 (the parity/`--fp32` path).
    """
    h = conv1d(params["post_quant_conv"], z)
    return decoder_apply(params["decoder"], cfg, h, compute_dtype)
