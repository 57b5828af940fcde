"""LPAPS — learned perceptual audio patch similarity over mel-classifier
features.

Capability parity with ldm/modules/losses_audio/lpaps.py:17-142: channel-
normalized feature differences from a pretrained audio backbone, combined
with per-layer linear weights. (The shipped configs disable the perceptual
term — contperceptual.py:32-33 raises if enabled — so this is the standalone
metric/loss the class provides, backed by our VGGishish-style classifier.)
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from maa3_tpu.models.melclf import MelClfConfig, _bn_batch, _DN2

Array = jax.Array


def _normalize(x: Array, eps: float = 1e-10) -> Array:
    return x / (jnp.sqrt(jnp.sum(x ** 2, axis=1, keepdims=True)) + eps)


def melclf_features(params: dict, cfg: MelClfConfig, mel: Array) -> List[Array]:
    """Per-stage feature maps (after each MP boundary) of the classifier."""
    x = mel[:, None, :, :].astype(jnp.float32)
    feats = []
    conv_iter = iter(params["features"])
    for v in cfg.conv_layers:
        if v == "MP":
            feats.append(x)
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 2),
                                  (1, 1, 2, 2), "VALID")
            continue
        layer = next(conv_iter)
        x = lax.conv_general_dilated(x, layer["w"], (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=_DN2)
        x = x + layer["b"][None, :, None, None]
        if "bn" in layer:
            x = _bn_batch(layer["bn"], x)
        x = jax.nn.relu(x)
    feats.append(x)
    return feats


def lpaps_distance(params: dict, cfg: MelClfConfig, mel_a: Array,
                   mel_b: Array,
                   layer_weights: Sequence[float] = None) -> Array:
    """Per-sample perceptual distance between two (B, 80, T) mels:
    sum_l w_l * mean(||norm(f_l(a)) - norm(f_l(b))||^2)."""
    fa = melclf_features(params, cfg, mel_a)
    fb = melclf_features(params, cfg, mel_b)
    if layer_weights is None:
        layer_weights = [1.0] * len(fa)
    total = 0.0
    for w, a, b in zip(layer_weights, fa, fb):
        d = (_normalize(a) - _normalize(b)) ** 2
        total = total + w * d.mean(axis=(1, 2, 3))
    return total
