"""LPAPS — learned perceptual audio patch similarity over VGGishish features.

Structural parity with ldm/modules/losses_audio/lpaps.py:17-142:
  (inp - shift) / scale             per-FREQUENCY ScalingLayer (:62-78)
  VGGishish16 (use_bn=False)        5 post-ReLU taps relu1_2..relu5_3 (:90-125)
  normalize_tensor over channels    (:139-141)
  lin_k: learned 1x1 conv (C_k->1)  NetLinLayer, no bias (:81-87)
  sum_k spatial_mean(lin_k(diff^2)) (:48-60)

The shipped configs disable the perceptual term (contperceptual.py:32-33
raises if enabled), so this is the standalone metric/loss the class provides.
`lpaps_apply` is the exact reference forward (anchored vs the executed torch
class in scripts/lpaps_reference_parity.py via torch_import.lpaps_from_torch);
`lpaps_distance` is the scalar-layer-weight variant kept for callers that
have only a classifier backbone (melclf) and no trained lin weights.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from maa3_tpu.models.melclf import MelClfConfig, _bn_batch, _DN2
from maa3_tpu.utils import nprand

Array = jax.Array

# Feature channel width at each of the 5 taps (vggish16 blocks).
LPAPS_CHNS = (64, 128, 256, 512, 512)

# The LPAPS backbone is the bn-less VGGishish (lpaps.py:127-135).
LPAPS_BACKBONE_CFG = MelClfConfig(use_bn=False)


def _normalize(x: Array, eps: float = 1e-10) -> Array:
    return x / (jnp.sqrt(jnp.sum(x ** 2, axis=1, keepdims=True)) + eps)


def melclf_features(params: dict, cfg: MelClfConfig, mel: Array) -> List[Array]:
    """The 5 VGG tap activations (post-ReLU, pre-MaxPool) of the classifier:
    relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 (lpaps.py:113-125)."""
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


def lpaps_init(key: Array, cfg: MelClfConfig = LPAPS_BACKBONE_CFG,
               n_mels: int = 80) -> dict:
    """Random-init LPAPS params (the trained ones come from
    torch_import.lpaps_from_torch). Backbone convs use kaiming fan_out like
    the reference reset_parameters; scaling defaults to identity; lin weights
    default to the uniform 1/C average so the random-init metric is a plain
    normalized-feature distance."""
    ks = iter(jax.random.split(key, 32))
    feats = []
    in_ch = 1
    for v in cfg.conv_layers:
        if v == "MP":
            continue
        rng = nprand.np_rng(next(ks))
        std = float(np.sqrt(2.0 / (v * 9)))
        feats.append({"w": jnp.asarray(rng.normal(0, std, (v, in_ch, 3, 3))
                                       .astype("float32")),
                      "b": jnp.zeros((v,), jnp.float32)})
        in_ch = v
    return {
        "scaling": {"shift": jnp.zeros((n_mels,), jnp.float32),
                    "scale": jnp.ones((n_mels,), jnp.float32)},
        "features": feats,
        "lins": [jnp.full((c,), 1.0 / c, jnp.float32) for c in LPAPS_CHNS],
    }


def lpaps_apply(params: dict, cfg: MelClfConfig, mel_a: Array,
                mel_b: Array) -> Array:
    """Reference LPAPS.forward (lpaps.py:48-60) over two (B, n_mels, T) mels
    -> per-sample perceptual distance (B,):

        sum_k mean_{h,w}( lin_k . (norm(f_k(a)) - norm(f_k(b)))^2 )

    with the per-frequency ScalingLayer applied to both inputs first."""
    shift = params["scaling"]["shift"][None, :, None]
    scale = params["scaling"]["scale"][None, :, None]
    a = (mel_a - shift) / scale
    b = (mel_b - shift) / scale
    fa = melclf_features(params, cfg, a)
    fb = melclf_features(params, cfg, b)
    total = 0.0
    for w, xa, xb in zip(params["lins"], fa, fb):
        d = (_normalize(xa) - _normalize(xb)) ** 2          # (B, C, H, W)
        lin = jnp.einsum("bchw,c->bhw", d, w)               # 1x1 conv, no bias
        total = total + lin.mean(axis=(1, 2))               # spatial_average
    return total


def lpaps_distance(params: dict, cfg: MelClfConfig, mel_a: Array,
                   mel_b: Array,
                   layer_weights: Sequence[float] = None) -> Array:
    """Scalar-layer-weight perceptual distance between two (B, 80, T) mels:
    sum_l w_l * mean(||norm(f_l(a)) - norm(f_l(b))||^2). Works with any
    classifier backbone params (melclf_init), trained or not."""
    fa = melclf_features(params, cfg, mel_a)
    fb = melclf_features(params, cfg, mel_b)
    if layer_weights is None:
        layer_weights = [1.0] * len(fa)
    total = 0.0
    for w, a, b in zip(layer_weights, fa, fb):
        d = (_normalize(a) - _normalize(b)) ** 2
        total = total + w * d.mean(axis=(1, 2, 3))
    return total
