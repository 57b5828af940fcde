"""Melception — the Inception3-for-mel FID backbone.

Capability parity with ldm/modules/losses_audio/vggishish/train_melception.py:
20-34: torchvision's `Inception3` with two melception modifications — the stem
takes a 1-channel (mel) input instead of RGB, and both stem maxpools are
removed because the mel "height" is 80 (vs 299 for images). Published
audio-FID numbers for the Make-An-Audio line are computed in melception
embedding space, so this backbone (not VGGishish) is what makes our FD
comparable to the literature.

The pytree mirrors torchvision's module names exactly
(`Conv2d_1a_3x3.conv/bn`, `Mixed_5b.branch1x1`, ..., `fc`), so a trained
torchvision-based melception checkpoint imports key-for-key
(torch_import.melception_from_torch). torchvision itself is not installed in
this environment; the executable parity reference
(tests/torch_inception_ref.py + scripts/melception_reference_parity.py) is a
clean-room torch implementation of the same public architecture with
identical state_dict keys.

All convs are BasicConv2d = Conv2d(bias=False) + BatchNorm2d(eps=1e-3) + ReLU.
BatchNorm runs in eval mode when running stats are present (imported
checkpoints) and batch mode otherwise (training from random init) — same
convention as models/melclf.py. Feature vector for FD = the 2048-d global
average pool before `fc`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from maa3_tpu.utils import nprand

Array = jax.Array

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NCHW", "OIHW", "NCHW"))


@dataclasses.dataclass(frozen=True)
class MelceptionConfig:
    num_classes: int = 309       # VGGSound
    in_channels: int = 1         # melception: mono mel "image"
    aux_logits: bool = True      # torchvision default; present in ckpts
    dropout: float = 0.5         # inference: identity


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _trunc_normal(key: Array, shape, stddev: float) -> jnp.ndarray:
    """torchvision inception init: values drawn from a normal truncated to
    2 sigma (scipy.stats.truncnorm(-2, 2) * stddev)."""
    rng = nprand.np_rng(key)
    x = rng.normal(0.0, 1.0, shape)
    bad = np.abs(x) > 2.0
    while bad.any():
        x[bad] = rng.normal(0.0, 1.0, int(bad.sum()))
        bad = np.abs(x) > 2.0
    return jnp.asarray((x * stddev).astype("float32"))


def _basic_conv_init(key: Array, c_in: int, c_out: int,
                     kh: int, kw: int, stddev: float = 0.1) -> dict:
    return {"conv": {"w": _trunc_normal(key, (c_out, c_in, kh, kw), stddev)},
            "bn": {"weight": jnp.ones((c_out,)), "bias": jnp.zeros((c_out,))}}


def melception_init(key: Array,
                    cfg: MelceptionConfig = MelceptionConfig()) -> dict:
    ks = iter(jax.random.split(key, 128))

    def bc(ci, co, kh, kw, stddev=0.1):
        return _basic_conv_init(next(ks), ci, co, kh, kw, stddev)

    def inception_a(ci, pool):
        return {"branch1x1": bc(ci, 64, 1, 1),
                "branch5x5_1": bc(ci, 48, 1, 1),
                "branch5x5_2": bc(48, 64, 5, 5),
                "branch3x3dbl_1": bc(ci, 64, 1, 1),
                "branch3x3dbl_2": bc(64, 96, 3, 3),
                "branch3x3dbl_3": bc(96, 96, 3, 3),
                "branch_pool": bc(ci, pool, 1, 1)}

    def inception_b(ci):
        return {"branch3x3": bc(ci, 384, 3, 3),
                "branch3x3dbl_1": bc(ci, 64, 1, 1),
                "branch3x3dbl_2": bc(64, 96, 3, 3),
                "branch3x3dbl_3": bc(96, 96, 3, 3)}

    def inception_c(ci, c7):
        return {"branch1x1": bc(ci, 192, 1, 1),
                "branch7x7_1": bc(ci, c7, 1, 1),
                "branch7x7_2": bc(c7, c7, 1, 7),
                "branch7x7_3": bc(c7, 192, 7, 1),
                "branch7x7dbl_1": bc(ci, c7, 1, 1),
                "branch7x7dbl_2": bc(c7, c7, 7, 1),
                "branch7x7dbl_3": bc(c7, c7, 1, 7),
                "branch7x7dbl_4": bc(c7, c7, 7, 1),
                "branch7x7dbl_5": bc(c7, 192, 1, 7),
                "branch_pool": bc(ci, 192, 1, 1)}

    def inception_d(ci):
        return {"branch3x3_1": bc(ci, 192, 1, 1),
                "branch3x3_2": bc(192, 320, 3, 3),
                "branch7x7x3_1": bc(ci, 192, 1, 1),
                "branch7x7x3_2": bc(192, 192, 1, 7),
                "branch7x7x3_3": bc(192, 192, 7, 1),
                "branch7x7x3_4": bc(192, 192, 3, 3)}

    def inception_e(ci):
        return {"branch1x1": bc(ci, 320, 1, 1),
                "branch3x3_1": bc(ci, 384, 1, 1),
                "branch3x3_2a": bc(384, 384, 1, 3),
                "branch3x3_2b": bc(384, 384, 3, 1),
                "branch3x3dbl_1": bc(ci, 448, 1, 1),
                "branch3x3dbl_2": bc(448, 384, 3, 3),
                "branch3x3dbl_3a": bc(384, 384, 1, 3),
                "branch3x3dbl_3b": bc(384, 384, 3, 1),
                "branch_pool": bc(ci, 192, 1, 1)}

    p = {
        "Conv2d_1a_3x3": bc(cfg.in_channels, 32, 3, 3),
        "Conv2d_2a_3x3": bc(32, 32, 3, 3),
        "Conv2d_2b_3x3": bc(32, 64, 3, 3),
        "Conv2d_3b_1x1": bc(64, 80, 1, 1),
        "Conv2d_4a_3x3": bc(80, 192, 3, 3),
        "Mixed_5b": inception_a(192, 32),
        "Mixed_5c": inception_a(256, 64),
        "Mixed_5d": inception_a(288, 64),
        "Mixed_6a": inception_b(288),
        "Mixed_6b": inception_c(768, 128),
        "Mixed_6c": inception_c(768, 160),
        "Mixed_6d": inception_c(768, 160),
        "Mixed_6e": inception_c(768, 192),
        "Mixed_7a": inception_d(768),
        "Mixed_7b": inception_e(1280),
        "Mixed_7c": inception_e(2048),
        "fc": {"w": _trunc_normal(next(ks), (2048, cfg.num_classes), 0.1),
               "b": jnp.zeros((cfg.num_classes,))},
    }
    if cfg.aux_logits:
        p["AuxLogits"] = {
            "conv0": bc(768, 128, 1, 1),
            "conv1": bc(128, 768, 5, 5, stddev=0.01),
            "fc": {"w": _trunc_normal(next(ks), (768, cfg.num_classes),
                                      0.001),
                   "b": jnp.zeros((cfg.num_classes,))},
        }
    return p


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _bn(p: dict, x: Array, eps: float = 1e-3) -> Array:
    """BatchNorm2d: eval mode when running stats are present (imported
    checkpoints), batch stats otherwise (random-init training)."""
    if "mean" in p:
        mean = p["mean"][None, :, None, None]
        var = p["var"][None, :, None, None]
    else:
        mean = jnp.mean(x, axis=(0, 2, 3), keepdims=True)
        var = jnp.var(x, axis=(0, 2, 3), keepdims=True)
    xn = (x - mean) * lax.rsqrt(var + eps)
    return (xn * p["weight"][None, :, None, None]
            + p["bias"][None, :, None, None])


def _basic_conv(p: dict, x: Array, stride=(1, 1), padding=((0, 0), (0, 0)),
                ) -> Array:
    x = lax.conv_general_dilated(x, p["conv"]["w"], stride, list(padding),
                                 dimension_numbers=_DN)
    return jax.nn.relu(_bn(p["bn"], x))


def _avg_pool3(x: Array) -> Array:
    """F.avg_pool2d(x, 3, stride=1, padding=1) with torch's default
    count_include_pad=True: always divide by 9."""
    s = lax.reduce_window(x, 0.0, lax.add, (1, 1, 3, 3), (1, 1, 1, 1),
                          [(0, 0), (0, 0), (1, 1), (1, 1)])
    return s / 9.0


def _max_pool(x: Array, k: int, stride: int) -> Array:
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, k, k),
                             (1, 1, stride, stride), "VALID")


def _inception_a(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b5 = _basic_conv(p["branch5x5_1"], x)
    b5 = _basic_conv(p["branch5x5_2"], b5, padding=((2, 2), (2, 2)))
    b3 = _basic_conv(p["branch3x3dbl_1"], x)
    b3 = _basic_conv(p["branch3x3dbl_2"], b3, padding=((1, 1), (1, 1)))
    b3 = _basic_conv(p["branch3x3dbl_3"], b3, padding=((1, 1), (1, 1)))
    bp = _basic_conv(p["branch_pool"], _avg_pool3(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b(p, x):
    b3 = _basic_conv(p["branch3x3"], x, stride=(2, 2))
    bd = _basic_conv(p["branch3x3dbl_1"], x)
    bd = _basic_conv(p["branch3x3dbl_2"], bd, padding=((1, 1), (1, 1)))
    bd = _basic_conv(p["branch3x3dbl_3"], bd, stride=(2, 2))
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=1)


def _inception_c(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b7 = _basic_conv(p["branch7x7_1"], x)
    b7 = _basic_conv(p["branch7x7_2"], b7, padding=((0, 0), (3, 3)))
    b7 = _basic_conv(p["branch7x7_3"], b7, padding=((3, 3), (0, 0)))
    bd = _basic_conv(p["branch7x7dbl_1"], x)
    bd = _basic_conv(p["branch7x7dbl_2"], bd, padding=((3, 3), (0, 0)))
    bd = _basic_conv(p["branch7x7dbl_3"], bd, padding=((0, 0), (3, 3)))
    bd = _basic_conv(p["branch7x7dbl_4"], bd, padding=((3, 3), (0, 0)))
    bd = _basic_conv(p["branch7x7dbl_5"], bd, padding=((0, 0), (3, 3)))
    bp = _basic_conv(p["branch_pool"], _avg_pool3(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d(p, x):
    b3 = _basic_conv(p["branch3x3_1"], x)
    b3 = _basic_conv(p["branch3x3_2"], b3, stride=(2, 2))
    b7 = _basic_conv(p["branch7x7x3_1"], x)
    b7 = _basic_conv(p["branch7x7x3_2"], b7, padding=((0, 0), (3, 3)))
    b7 = _basic_conv(p["branch7x7x3_3"], b7, padding=((3, 3), (0, 0)))
    b7 = _basic_conv(p["branch7x7x3_4"], b7, stride=(2, 2))
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=1)


def _inception_e(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b3 = _basic_conv(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _basic_conv(p["branch3x3_2a"], b3, padding=((0, 0), (1, 1))),
        _basic_conv(p["branch3x3_2b"], b3, padding=((1, 1), (0, 0)))],
        axis=1)
    bd = _basic_conv(p["branch3x3dbl_1"], x)
    bd = _basic_conv(p["branch3x3dbl_2"], bd, padding=((1, 1), (1, 1)))
    bd = jnp.concatenate([
        _basic_conv(p["branch3x3dbl_3a"], bd, padding=((0, 0), (1, 1))),
        _basic_conv(p["branch3x3dbl_3b"], bd, padding=((1, 1), (0, 0)))],
        axis=1)
    bp = _basic_conv(p["branch_pool"], _avg_pool3(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


def _aux(p, x, ):
    # F.avg_pool2d(x, 5, stride=3) then 1x1/5x5 convs, global avg pool, fc
    s = lax.reduce_window(x, 0.0, lax.add, (1, 1, 5, 5), (1, 1, 3, 3),
                          "VALID") / 25.0
    s = _basic_conv(p["conv0"], s)
    s = _basic_conv(p["conv1"], s)
    s = jnp.mean(s, axis=(2, 3))
    return s @ p["fc"]["w"] + p["fc"]["b"]


def melception_apply(params: dict, cfg: MelceptionConfig, mel: Array,
                     return_features: bool = False,
                     return_aux: bool = False):
    """mel (B, 80, T) -> logits (B, num_classes).

    return_features: also return the 2048-d pooled embedding (the FD
    feature). return_aux: also return the InceptionAux logits (training).
    Mirrors Melception.forward (train_melception.py:32-34: unsqueeze(1) then
    Inception3.forward with maxpool1/2 = Identity)."""
    x = mel[:, None, :, :].astype(jnp.float32)
    x = _basic_conv(params["Conv2d_1a_3x3"], x, stride=(2, 2))
    x = _basic_conv(params["Conv2d_2a_3x3"], x)
    x = _basic_conv(params["Conv2d_2b_3x3"], x, padding=((1, 1), (1, 1)))
    # maxpool1 removed (melception)
    x = _basic_conv(params["Conv2d_3b_1x1"], x)
    x = _basic_conv(params["Conv2d_4a_3x3"], x)
    # maxpool2 removed (melception)
    x = _inception_a(params["Mixed_5b"], x)
    x = _inception_a(params["Mixed_5c"], x)
    x = _inception_a(params["Mixed_5d"], x)
    x = _inception_b(params["Mixed_6a"], x)
    x = _inception_c(params["Mixed_6b"], x)
    x = _inception_c(params["Mixed_6c"], x)
    x = _inception_c(params["Mixed_6d"], x)
    x = _inception_c(params["Mixed_6e"], x)
    aux = (_aux(params["AuxLogits"], x)
           if return_aux and "AuxLogits" in params else None)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x)
    x = _inception_e(params["Mixed_7c"], x)
    feats = jnp.mean(x, axis=(2, 3))           # adaptive avg pool (1, 1)
    logits = feats @ params["fc"]["w"] + params["fc"]["b"]
    out = (logits,)
    if return_features:
        out = out + (feats,)
    if return_aux:
        out = out + (aux,)
    return out[0] if len(out) == 1 else out


def melception_param_count(params: dict) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
