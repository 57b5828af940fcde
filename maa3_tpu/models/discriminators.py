"""GAN discriminators for VAE and vocoder training.

- NLayerDiscriminator: PatchGAN over (B, 1, 80, T) mels
  (ldm/modules/discriminator/model.py:98-152; conv4 stride-2 stack with
  BatchNorm + LeakyReLU(0.2)).
- MultiPeriodDiscriminator / MultiResolutionDiscriminator: BigVGAN's wav
  discriminators (vocoder/bigvgan/models.py:218-357) with the mse GAN
  losses and feature-matching loss (:360-391).

Training-mode BatchNorm uses batch statistics (functional, no running-stat
state needed for GAN training parity).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from maa3_tpu.ops.basic import dense_init
from maa3_tpu.ops.conv import conv1d, conv1d_init
from maa3_tpu.ops.stft import _stft_constants
from maa3_tpu.utils import nprand

Array = jax.Array

_DN2 = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                  ("NCHW", "OIHW", "NCHW"))


def _conv2d_init(key, cin, cout, kh, kw, bias=True):
    rng = nprand.np_rng(key)
    fan_in = cin * kh * kw
    bound = 1.0 / np.sqrt(fan_in)
    p = {"w": jnp.asarray(rng.normal(0.0, 0.02, (cout, cin, kh, kw)).astype("float32"))}
    if bias:
        p["b"] = jnp.asarray(rng.uniform(-bound, bound, (cout,)).astype("float32"))
    return p


def _conv2d(p, x, stride=(1, 1), padding=(1, 1)):
    y = lax.conv_general_dilated(
        x, p["w"], stride, [(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=_DN2)
    if "b" in p:
        y = y + p["b"][None, :, None, None]
    return y


def _batchnorm_train(p, x):
    mean = jnp.mean(x, axis=(0, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(0, 2, 3), keepdims=True)
    xn = (x - mean) * lax.rsqrt(var + 1e-5)
    return xn * p["weight"][None, :, None, None] + p["bias"][None, :, None, None]


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


# ---------------------------------------------------------------------------
# PatchGAN (VAE mel discriminator)
# ---------------------------------------------------------------------------

def nlayer_disc_init(key: Array, input_nc: int = 1, ndf: int = 64,
                     n_layers: int = 3) -> dict:
    ks = iter(jax.random.split(key, n_layers + 3))
    layers = [{"conv": _conv2d_init(next(ks), input_nc, ndf, 4, 4), "bn": None}]
    nf = 1
    for n in range(1, n_layers):
        nf_prev, nf = nf, min(2 ** n, 8)
        layers.append({
            "conv": _conv2d_init(next(ks), ndf * nf_prev, ndf * nf, 4, 4,
                                 bias=False),
            "bn": {"weight": jnp.ones((ndf * nf,)), "bias": jnp.zeros((ndf * nf,))},
        })
    nf_prev, nf = nf, min(2 ** n_layers, 8)
    layers.append({
        "conv": _conv2d_init(next(ks), ndf * nf_prev, ndf * nf, 4, 4, bias=False),
        "bn": {"weight": jnp.ones((ndf * nf,)), "bias": jnp.zeros((ndf * nf,))},
    })
    layers.append({"conv": _conv2d_init(next(ks), ndf * nf, 1, 4, 4), "bn": None})
    return {"layers": layers}


def nlayer_disc_apply(params: dict, x: Array) -> Array:
    """x (B, C, H, W) -> patch logits."""
    layers = params["layers"]
    n_layers = len(layers) - 2  # stride-2 prefix (init appends 2 stride-1)
    # strides: first n_layers convs stride 2, then stride 1, final stride 1
    for i, lp in enumerate(layers):
        stride = (2, 2) if i < n_layers else (1, 1)
        x = _conv2d(lp["conv"], x, stride=stride, padding=(1, 1))
        if lp["bn"] is not None:
            x = _batchnorm_train(lp["bn"], x)
        if i < len(layers) - 1:
            x = leaky_relu(x)
    return x


# ---------------------------------------------------------------------------
# GAN losses (ldm/modules/losses_audio/vqperceptual.py + models.py:360-391)
# ---------------------------------------------------------------------------

def hinge_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real))
                  + jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def mse_d_loss(reals: Sequence[Array], fakes: Sequence[Array]) -> Array:
    r = sum(jnp.mean((1 - dr) ** 2) for dr in reals) / len(reals)
    g = sum(jnp.mean(df ** 2) for df in fakes) / len(fakes)
    return 0.5 * (r + g)


def mse_g_loss(fakes: Sequence[Array]) -> Array:
    return sum(jnp.mean((1 - df) ** 2) for df in fakes)


def feature_matching_loss(fmap_real: Sequence[Sequence[Array]],
                          fmap_fake: Sequence[Sequence[Array]]) -> Array:
    loss = 0.0
    for dr, dg in zip(fmap_real, fmap_fake):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def adopt_weight(weight: float, global_step, threshold: int = 0) -> Array:
    return jnp.where(jnp.asarray(global_step) < threshold, 0.0, weight)


# ---------------------------------------------------------------------------
# BigVGAN wav discriminators
# ---------------------------------------------------------------------------

def period_disc_init(key: Array, period: int, d_mult: int = 1) -> dict:
    ks = iter(jax.random.split(key, 8))
    chans = [1, 32 * d_mult, 128 * d_mult, 512 * d_mult, 1024 * d_mult,
             1024 * d_mult]
    convs = []
    for i in range(5):
        convs.append(_conv2d_init(next(ks), chans[i], chans[i + 1], 5, 1))
    post = _conv2d_init(next(ks), chans[-1], 1, 3, 1)
    return {"convs": convs, "post": post}


def period_disc_apply(p: dict, wav: Array, period: int) -> Tuple[Array, List[Array]]:
    """wav (B, T) -> (logits, feature maps). models.py:218-252. `period` is
    static (kept out of the param pytree so jit never traces it)."""
    b, t = wav.shape
    if t % period:
        pad = period - t % period
        wav = jnp.pad(wav, [(0, 0), (0, pad)], mode="reflect")
        t += pad
    x = wav.reshape(b, 1, t // period, period)
    fmap = []
    for i, cp in enumerate(p["convs"]):
        stride = (3, 1) if i < 4 else (1, 1)
        x = _conv2d(cp, x, stride=stride, padding=(2, 0))
        x = leaky_relu(x, 0.1)
        fmap.append(x)
    x = _conv2d(p["post"], x, stride=(1, 1), padding=(1, 0))
    fmap.append(x)
    return x.reshape(b, -1), fmap


DEFAULT_PERIODS = (2, 3, 5, 7, 11)


def mpd_init(key: Array, periods=DEFAULT_PERIODS, d_mult: int = 1) -> dict:
    ks = jax.random.split(key, len(periods))
    return {"discs": [period_disc_init(k, pr, d_mult)
                      for k, pr in zip(ks, periods)]}


def mpd_apply(params: dict, wav: Array, periods=None):
    periods = periods or DEFAULT_PERIODS[: len(params["discs"])]
    outs = [period_disc_apply(p, wav, pr)
            for p, pr in zip(params["discs"], periods)]
    return [o[0] for o in outs], [o[1] for o in outs]


def resolution_disc_init(key: Array, resolution, d_mult: int = 1) -> dict:
    ks = iter(jax.random.split(key, 8))
    c = 32 * d_mult
    convs = [
        _conv2d_init(next(ks), 1, c, 3, 9),
        _conv2d_init(next(ks), c, c, 3, 9),
        _conv2d_init(next(ks), c, c, 3, 9),
        _conv2d_init(next(ks), c, c, 3, 9),
        _conv2d_init(next(ks), c, c, 3, 3),
    ]
    post = _conv2d_init(next(ks), c, 1, 3, 3)
    return {"convs": convs, "post": post}


def resolution_disc_apply(p: dict, wav: Array, resolution):
    """STFT-magnitude 2D discriminator (models.py:279-329). `resolution`
    (n_fft, hop, win) is static."""
    n_fft, hop, win = resolution
    pad = (n_fft - hop) // 2
    y = jnp.pad(wav, [(0, 0), (pad, pad)], mode="reflect")
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    starts = jnp.arange(n_frames) * hop
    frames = y[:, starts[:, None] + jnp.arange(n_fft)[None, :]]
    # torch.stft is called with NO window here (models.py:325) -> rectangular
    cos_b, sin_b = _stft_constants(n_fft, win, window="ones")
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    mag = jnp.sqrt(re * re + im * im + 1e-9)          # (B, T, F)
    x = mag.transpose(0, 2, 1)[:, None, :, :]          # (B, 1, F, T)
    fmap = []
    strides = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
    pads = [(1, 4), (1, 4), (1, 4), (1, 4), (1, 1)]
    for cp, st, pd in zip(p["convs"], strides, pads):
        x = _conv2d(cp, x, stride=st, padding=pd)
        x = leaky_relu(x, 0.1)
        fmap.append(x)
    x = _conv2d(p["post"], x, stride=(1, 1), padding=(1, 1))
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


# ---------------------------------------------------------------------------
# Multi-window mel discriminator (ldm/modules/discriminator/multi_window_disc
# .py:6-197): per-window 3x 2x-downsample conv stacks + linear validity head,
# run over several random time windows of the mel.
# ---------------------------------------------------------------------------

def window_disc_init(key: Array, time_length: int, freq_length: int = 80,
                     hidden: int = 128) -> dict:
    ks = iter(jax.random.split(key, 8))
    blocks = []
    cin = 1
    for i in range(3):
        blocks.append({
            "conv": _conv2d_init(next(ks), cin, hidden, 3, 3),
            "bn": None if i == 0 else {"weight": jnp.ones((hidden,)),
                                       "bias": jnp.zeros((hidden,))},
        })
        cin = hidden
    ds_t = time_length // 8
    ds_f = (freq_length + 7) // 8
    return {"blocks": blocks,
            "adv": dense_init(next(ks), hidden * ds_t * ds_f, 1)}


def window_disc_apply(p: dict, x: Array) -> Array:
    """x (B, 1, T, F) -> validity (B, 1)."""
    for bp in p["blocks"]:
        x = _conv2d(bp["conv"], x, stride=(2, 2), padding=(1, 1))
        x = leaky_relu(x)
        if bp["bn"] is not None:
            x = _batchnorm_train(bp["bn"], x)
    x = x.reshape(x.shape[0], -1)
    from maa3_tpu.ops.basic import dense
    return dense(p["adv"], x)


def multi_window_disc_init(key: Array, time_lengths=(32, 64, 128),
                           freq_length: int = 80, hidden: int = 128) -> dict:
    ks = jax.random.split(key, len(time_lengths))
    return {"discs": [window_disc_init(k, t, freq_length, hidden)
                      for k, t in zip(ks, time_lengths)]}


def multi_window_disc_apply(params: dict, mel: Array, starts,
                            time_lengths=(32, 64, 128)) -> Array:
    """mel (B, T, F); starts: per-window start indices (static ints or traced
    scalars). Returns summed validity (B, 1)."""
    import jax as _jax
    total = 0.0
    for p, tl, s in zip(params["discs"], time_lengths, starts):
        win = _jax.lax.dynamic_slice_in_dim(mel, s, tl, axis=1)
        total = total + window_disc_apply(p, win[:, None, :, :])
    return total


DEFAULT_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def mrd_init(key: Array, resolutions=DEFAULT_RESOLUTIONS, d_mult: int = 1) -> dict:
    ks = jax.random.split(key, len(resolutions))
    return {"discs": [resolution_disc_init(k, r, d_mult)
                      for k, r in zip(ks, resolutions)]}


def mrd_apply(params: dict, wav: Array, resolutions=None):
    resolutions = resolutions or DEFAULT_RESOLUTIONS[: len(params["discs"])]
    outs = [resolution_disc_apply(p, wav, r)
            for p, r in zip(params["discs"], resolutions)]
    return [o[0] for o in outs], [o[1] for o in outs]
