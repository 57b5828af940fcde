"""Cnn14 audio encoder (PANNs) — the CLAP audio tower for CLAP-score eval.

Capability parity with wav_evaluation/models/audio.py:12-180:
wav (B, L) @ 44.1 kHz -> power spectrogram (center=True, hann 1024, hop 320)
-> 64-bin log-mel (10*log10, amin 1e-10) -> bn0 (over mel) -> 6 ConvBlocks
(3x3 conv-bn-relu x2 + 2x2 avg-pool; last block pools 1x1) -> mean over mel,
max+mean over time -> fc1+relu -> 2048-d embedding (+ classifier head).

Inference-only (dropout inert, batchnorm in eval mode with running stats).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from maa3_tpu.ops.stft import mel_filterbank, _stft_constants
from maa3_tpu.ops.basic import dense, dense_init

Array = jax.Array

_DN2 = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                  ("NCHW", "OIHW", "NCHW"))


@dataclasses.dataclass(frozen=True)
class Cnn14Config:
    sample_rate: int = 44100
    window_size: int = 1024
    hop_size: int = 320
    mel_bins: int = 64
    fmin: float = 50.0
    fmax: float = 14000.0
    classes_num: int = 527
    out_emb: int = 2048


def _bn_init(c: int) -> dict:
    return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _bn(p: dict, x: Array, axis: int = 1, eps: float = 1e-5) -> Array:
    shape = [1] * x.ndim
    shape[axis] = -1
    scale = (p["weight"] / jnp.sqrt(p["var"] + eps)).reshape(shape)
    shift = (p["bias"] - p["mean"] * p["weight"]
             / jnp.sqrt(p["var"] + eps)).reshape(shape)
    return x * scale + shift


def _conv_block_init(key, cin, cout):
    from maa3_tpu.utils import nprand
    k1, k2 = jax.random.split(key)
    std1 = float(np.sqrt(2.0 / (cin * 9)))
    std2 = float(np.sqrt(2.0 / (cout * 9)))
    return {
        "conv1": {"w": jnp.asarray(nprand.normal(k1, (cout, cin, 3, 3), std1))},
        "conv2": {"w": jnp.asarray(nprand.normal(k2, (cout, cout, 3, 3), std2))},
        "bn1": _bn_init(cout),
        "bn2": _bn_init(cout),
    }


def _conv2d(w: Array, x: Array, padding: int = 1) -> Array:
    return lax.conv_general_dilated(x, w, (1, 1),
                                    [(padding, padding), (padding, padding)],
                                    dimension_numbers=_DN2)


def _avg_pool(x: Array, size: Tuple[int, int]) -> Array:
    if size == (1, 1):
        return x
    return lax.reduce_window(x, 0.0, lax.add,
                             (1, 1) + size, (1, 1) + size, "VALID") / (
        size[0] * size[1])


def _conv_block(p: dict, x: Array, pool: Tuple[int, int]) -> Array:
    x = jax.nn.relu(_bn(p["bn1"], _conv2d(p["conv1"]["w"], x)))
    x = jax.nn.relu(_bn(p["bn2"], _conv2d(p["conv2"]["w"], x)))
    return _avg_pool(x, pool)


def cnn14_init(key: Array, cfg: Cnn14Config = Cnn14Config()) -> dict:
    ks = jax.random.split(key, 8)
    chans = [1, 64, 128, 256, 512, 1024, 2048]
    return {
        "bn0": _bn_init(cfg.mel_bins),
        "blocks": [_conv_block_init(ks[i], chans[i], chans[i + 1])
                   for i in range(6)],
        "fc1": dense_init(ks[6], 2048, cfg.out_emb),
        "fc_audioset": dense_init(ks[7], cfg.out_emb, cfg.classes_num),
    }


def cnn14_logmel(wav: Array, cfg: Cnn14Config) -> Array:
    """(B, L) -> (B, 1, T, mel): power spec (center=True) -> 10*log10 mel."""
    n_fft, hop = cfg.window_size, cfg.hop_size
    pad = n_fft // 2
    y = jnp.pad(wav.astype(jnp.float32), [(0, 0), (pad, pad)], mode="reflect")
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    starts = jnp.arange(n_frames) * hop
    frames = y[:, starts[:, None] + jnp.arange(n_fft)[None, :]]
    cos_b, sin_b = _stft_constants(n_fft, n_fft)
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    power = re * re + im * im  # (B, T, bins)
    basis = jnp.asarray(mel_filterbank(cfg.sample_rate, n_fft, cfg.mel_bins,
                                       cfg.fmin, cfg.fmax))
    mel = jnp.einsum("btf,mf->btm", power, basis)
    logmel = 10.0 * jnp.log10(jnp.clip(mel, 1e-10, None))
    return logmel[:, None, :, :]  # (B, 1, T, mel)


def cnn14_apply_logmel(params: dict, cfg: Cnn14Config, logmel: Array) -> dict:
    """Conv backbone from a precomputed logmel (B, 1, T, mel) —
    wav_evaluation/models/audio.py:144-180 after the torchlibrosa frontend."""
    # bn0 normalizes the mel axis (transpose(1,3) dance in torch)
    x = _bn(params["bn0"], logmel, axis=3)
    pools = [(2, 2)] * 5 + [(1, 1)]
    for p, pool in zip(params["blocks"], pools):
        x = _conv_block(p, x, pool)
    x = jnp.mean(x, axis=3)                      # mean over mel
    x = jnp.max(x, axis=2) + jnp.mean(x, axis=2)  # max+mean over time
    x = jax.nn.relu(dense(params["fc1"], x))
    logits = dense(params["fc_audioset"], x)
    return {"embedding": x, "clipwise_output": jax.nn.sigmoid(logits)}


def cnn14_apply(params: dict, cfg: Cnn14Config, wav: Array) -> dict:
    """wav (B, L) -> {"embedding": (B, out_emb), "clipwise_output": (B, classes)}."""
    return cnn14_apply_logmel(params, cfg, cnn14_logmel(wav, cfg))


def cnn14_from_torch(sd: dict, cfg: Cnn14Config, prefix: str = "") -> dict:
    """Map a PANNs Cnn14 state_dict into our pytree."""
    def g(n):
        return jnp.asarray(np.asarray(sd[prefix + n]))

    def bn(n):
        return {"weight": g(n + ".weight"), "bias": g(n + ".bias"),
                "mean": g(n + ".running_mean"), "var": g(n + ".running_var")}

    blocks = []
    for i in range(1, 7):
        b = f"conv_block{i}."
        blocks.append({
            "conv1": {"w": g(b + "conv1.weight")},
            "conv2": {"w": g(b + "conv2.weight")},
            "bn1": bn(b + "bn1"),
            "bn2": bn(b + "bn2"),
        })
    return {
        "bn0": bn("bn0"),
        "blocks": blocks,
        "fc1": {"w": g("fc1.weight").T, "b": g("fc1.bias")},
        "fc_audioset": {"w": g("fc_audioset.weight").T, "b": g("fc_audioset.bias")},
    }
