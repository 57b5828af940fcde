"""VGGishish mel classifier — the FID/KL eval backbone + LPAPS feature net.

Capability parity with ldm/modules/losses_audio/vggishish/model.py:1-68:
VGG-style conv3 stacks (+optional BN) with MP downsamples over (B, 80, T)
log-mels, adaptive avg-pool to (5, 10), 3-layer MLP head. The penultimate
4096-d activation is the embedding used for Frechet-distance metrics.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from maa3_tpu.ops.basic import dense, dense_init
from maa3_tpu.utils import nprand

Array = jax.Array

_DN2 = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                  ("NCHW", "OIHW", "NCHW"))

DEFAULT_CONV_LAYERS: Tuple[Union[int, str], ...] = (
    64, 64, "MP", 128, 128, "MP", 256, 256, 256, "MP",
    512, 512, 512, "MP", 512, 512, 512)


@dataclasses.dataclass(frozen=True)
class MelClfConfig:
    conv_layers: Tuple[Union[int, str], ...] = DEFAULT_CONV_LAYERS
    use_bn: bool = True
    num_classes: int = 309    # VGGSound
    pool_hw: Tuple[int, int] = (5, 10)


def melclf_init(key: Array, cfg: MelClfConfig = MelClfConfig()) -> dict:
    ks = iter(jax.random.split(key, 64))
    feats = []  # conv layers only; "MP" entries live in cfg (static)
    in_ch = 1
    for v in cfg.conv_layers:
        if v == "MP":
            continue
        k = next(ks)
        rng = nprand.np_rng(k)
        std = float(np.sqrt(2.0 / (v * 9)))  # kaiming fan_out relu
        layer = {"w": jnp.asarray(rng.normal(0, std, (v, in_ch, 3, 3))
                                  .astype("float32")),
                 "b": jnp.zeros((v,), jnp.float32)}
        if cfg.use_bn:
            layer["bn"] = {"weight": jnp.ones((v,)), "bias": jnp.zeros((v,))}
        feats.append(layer)
        in_ch = v
    flat = in_ch * cfg.pool_hw[0] * cfg.pool_hw[1]
    return {
        "features": feats,
        "fc1": dense_init(next(ks), flat, 4096, init="normal", scale=0.01),
        "fc2": dense_init(next(ks), 4096, 4096, init="normal", scale=0.01),
        "fc3": dense_init(next(ks), 4096, cfg.num_classes, init="normal",
                          scale=0.01),
    }


def _bn_batch(p, x):
    """BatchNorm2d: eval mode (running stats, present on imported trained
    weights — torch_import.melclf_from_torch) or train mode (batch stats,
    random-init training via train_melclf)."""
    if "mean" in p:
        mean = p["mean"][None, :, None, None]
        var = p["var"][None, :, None, None]
    else:
        mean = jnp.mean(x, axis=(0, 2, 3), keepdims=True)
        var = jnp.var(x, axis=(0, 2, 3), keepdims=True)
    xn = (x - mean) * lax.rsqrt(var + 1e-5)
    return xn * p["weight"][None, :, None, None] + p["bias"][None, :, None, None]


def _adaptive_avg_pool(x: Array, out_hw: Tuple[int, int]) -> Array:
    b, c, h, w = x.shape
    oh, ow = out_hw
    # torch AdaptiveAvgPool2d bin edges: floor(i*H/oh) .. ceil((i+1)*H/oh)
    ys = [(int(np.floor(i * h / oh)), int(np.ceil((i + 1) * h / oh)))
          for i in range(oh)]
    xs = [(int(np.floor(j * w / ow)), int(np.ceil((j + 1) * w / ow)))
          for j in range(ow)]
    rows = []
    for y0, y1 in ys:
        cols = [jnp.mean(x[:, :, y0:y1, x0:x1], axis=(2, 3))
                for x0, x1 in xs]
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)  # (B, C, oh, ow)


def melclf_apply(params: dict, cfg: MelClfConfig, mel: Array,
                 return_embedding: bool = False):
    """mel (B, 80, T) -> logits (B, classes) [or (logits, 4096-d embedding)]."""
    x = mel[:, None, :, :].astype(jnp.float32)
    conv_iter = iter(params["features"])
    for v in cfg.conv_layers:
        if v == "MP":
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
    x = _adaptive_avg_pool(x, cfg.pool_hw)
    x = x.reshape(x.shape[0], -1)
    h = jax.nn.relu(dense(params["fc1"], x))
    emb = jax.nn.relu(dense(params["fc2"], h))
    logits = dense(params["fc3"], emb)
    if return_embedding:
        return logits, emb
    return logits


# ---------------------------------------------------------------------------
# FID-style metrics over classifier embeddings (the melception FD role)
# ---------------------------------------------------------------------------

def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """FD between two embedding sets (n, d): ||mu1-mu2||^2 +
    Tr(C1 + C2 - 2 (C1 C2)^{1/2})."""
    from scipy import linalg
    mu1, mu2 = feats_a.mean(0), feats_b.mean(0)
    c1 = np.cov(feats_a, rowvar=False)
    c2 = np.cov(feats_b, rowvar=False)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(c1 @ c2, disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(c1 + c2 - 2.0 * covmean))


def kl_divergence_softmax(logits_gen: np.ndarray,
                          logits_ref: np.ndarray) -> float:
    """Mean KL(ref || gen) over paired classifier posteriors (the KL metric
    reported alongside FD in the Make-An-Audio line of papers)."""
    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)
    p = softmax(logits_ref)
    q = softmax(logits_gen)
    return float(np.mean(np.sum(p * (np.log(p + 1e-10) - np.log(q + 1e-10)),
                                axis=-1)))
