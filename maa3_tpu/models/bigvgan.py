"""BigVGAN ("bigvnat") vocoder generator: (B, 80, T) log10-mel -> (B, T*256) wav.

Capability parity with vocoder/bigvgan/models.py:32-215 (generator path):
conv_pre(7) -> per-stage [ConvTranspose1d upsample; parallel AMPBlock1s
averaged] -> anti-aliased Snake/SnakeBeta -> conv_post(7) -> tanh.

TPU-native notes:
- weight_norm is folded into plain weights at import time (inference removes
  it anyway, models.py:551); training re-parameterizes explicitly if needed.
- The anti-aliased activations (2x sinc up / nonlinearity / 2x sinc down) are
  depthwise convs that XLA fuses; filters are compile-time constants.
- snake runs in fp32 (sin^2 of large activations is precision-sensitive);
  convs run in the requested compute dtype.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from maa3_tpu.ops.conv import (conv1d, conv1d_init, conv1d_unfold,
                                conv_transpose1d, conv_transpose1d_polyphase)
from maa3_tpu.ops.resample import Activation1d, sin2_poly, use_fast_sin2

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BigVGANConfig:
    num_mels: int = 80
    upsample_rates: Tuple[int, ...] = (4, 4, 2, 2, 2, 2)       # prod = 256 = hop
    upsample_kernel_sizes: Tuple[int, ...] = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    activation: str = "snakebeta"
    snake_logscale: bool = True
    sampling_rate: int = 16000

    @classmethod
    def from_dict(cls, h: dict) -> "BigVGANConfig":
        def tup(x):
            return tuple(tuple(v) if isinstance(v, (list, tuple)) else v for v in x)
        return cls(
            num_mels=h.get("num_mels", 80),
            upsample_rates=tuple(h["upsample_rates"]),
            upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
            upsample_initial_channel=h["upsample_initial_channel"],
            resblock=str(h.get("resblock", "1")),
            resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tup(h["resblock_dilation_sizes"]),
            activation=h.get("activation", "snakebeta"),
            snake_logscale=bool(h.get("snake_logscale", True)),
            sampling_rate=h.get("sampling_rate", 16000),
        )


# ---------------------------------------------------------------------------
# Snake activations (vocoder/bigvgan/activations.py:9-119)
# ---------------------------------------------------------------------------

def snake(x: Array, alpha: Array, logscale: bool,
          fast: "bool | None" = None) -> Array:
    """snake(x) = x + sin^2(a x)/a, per-channel alpha over (B, C, T). fp32.

    fast=None keys the poly-sin^2 routing on x.dtype; inside the AA pipeline
    the FIR taps promote x to fp32 before snake sees it, so bigvgan_apply
    resolves the flag ONCE from its compute_dtype and threads it here."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    a = alpha.astype(jnp.float32)[None, :, None]
    if logscale:
        a = jnp.exp(a)
    if fast is None:
        fast = _use_fast_sin2(orig)
    s2 = _sin2_poly(xf * a) if fast else jnp.square(jnp.sin(xf * a))
    return (xf + (1.0 / (a + 1e-9)) * s2).astype(orig)


# Fast-path sin^2 shared with the Pallas AA kernels (see ops/resample.py).
_sin2_poly = sin2_poly
_use_fast_sin2 = use_fast_sin2


def snake_beta(x: Array, alpha: Array, beta: Array, logscale: bool,
               fast: "bool | None" = None) -> Array:
    """snakebeta(x) = x + sin^2(a x)/b. See snake() for the fast flag."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    a = alpha.astype(jnp.float32)[None, :, None]
    b = beta.astype(jnp.float32)[None, :, None]
    if logscale:
        a = jnp.exp(a)
        b = jnp.exp(b)
    if fast is None:
        fast = _use_fast_sin2(orig)
    s2 = _sin2_poly(xf * a) if fast else jnp.square(jnp.sin(xf * a))
    return (xf + (1.0 / (b + 1e-9)) * s2).astype(orig)


def _act_init(ch: int, cfg: BigVGANConfig) -> dict:
    if cfg.activation == "lrelu":  # HiFiGAN: no activation params
        return {}
    if cfg.activation == "snake":
        init = jnp.zeros if cfg.snake_logscale else jnp.ones
        return {"alpha": init((ch,), jnp.float32)}
    init = jnp.zeros if cfg.snake_logscale else jnp.ones
    return {"alpha": init((ch,), jnp.float32), "beta": init((ch,), jnp.float32)}


def _aa_class(compute_dtype=None):
    """Non-Pallas AA lowering. MAA3_AA_MXU=1 selects the banded-matmul MXU
    form (ops/resample.py MXUActivation1d) — measured SLOWER at every b8
    stage (probe r04-D: res1 95 vs 67 ms aa-only; XLA materializes the
    overlapping windows, so the einsum trades VPU rotates for >2x HBM
    traffic), so the default stays the shift-add form; the class is kept
    as the A/B lever and the building block for an in-VMEM Pallas variant
    (where the windows never touch HBM)."""
    from maa3_tpu.ops.resample import FusedActivation1d, MXUActivation1d
    env = os.environ.get("MAA3_AA_MXU")
    use = (env is not None and
           env.strip().lower() not in ("0", "false", "off", "no", ""))
    return MXUActivation1d if use else FusedActivation1d


def _make_aa(cfg: BigVGANConfig, use_pallas: bool = False,
             compute_dtype=None):
    """Anti-aliased activation closure over params.

    Three formulations, numerically equivalent to the reference conv
    pipeline:
    - MXU banded-matmul FIRs (ops/resample.py MXUActivation1d) — the TPU
      default for the non-Pallas path (see _aa_class);
    - XLA shift-add polyphase (FusedActivation1d) — CPU / parity reference;
    - Pallas fused kernel (ops/pallas_aa_snake.py) — one-HBM-pass kernel,
      kept for the narrow-stage A/B (use_pallas).

    `activation: lrelu` selects the plain HiFiGAN nonlinearity (no
    anti-aliasing) — the AudioLDM-variant vocoder family
    (ldm/models/diffusion/audioldm.py HiFiGAN path)."""
    FusedActivation1d = _aa_class(compute_dtype)
    # resolve the poly-sin^2 routing from the GENERATOR compute dtype: the
    # AA FIR taps promote the upsampled signal to fp32, so dtype-sniffing
    # inside snake()/snake_beta() would never fire (bench regression: the
    # full generator silently ran libm sin, 42 vs 27.6 ms)
    fast = use_fast_sin2(compute_dtype) if compute_dtype is not None else None
    if cfg.activation == "lrelu":
        def act(p):
            return lambda x: jnp.where(x >= 0, x, 0.1 * x)
    elif cfg.activation == "snake":
        if use_pallas:
            from maa3_tpu.ops.pallas_aa_snake import aa_snake_fused
            def act(p):
                return lambda x: aa_snake_fused(
                    x, p["alpha"], logscale=cfg.snake_logscale,
                    has_beta=False, fast_sin2=fast)
        else:
            def act(p):
                return FusedActivation1d(
                    lambda x: snake(x, p["alpha"], cfg.snake_logscale,
                                    fast=fast))
    else:
        if use_pallas:
            from maa3_tpu.ops.pallas_aa_snake import aa_snake_fused
            def act(p):
                return lambda x: aa_snake_fused(
                    x, p["alpha"], p["beta"], logscale=cfg.snake_logscale,
                    has_beta=True, fast_sin2=fast)
        else:
            def act(p):
                return FusedActivation1d(
                    lambda x: snake_beta(x, p["alpha"], p["beta"],
                                         cfg.snake_logscale, fast=fast))
    return act


def _auto_pallas_aa(pallas_aa, batch: int) -> bool:
    """Resolve the pallas_aa tri-state. MAA3_PALLAS_AA=0/1 overrides.

    Measured on v5e (XL pipeline, 10 s clips): at batch 1 XLA wins (it fuses
    the shift-add activations into the neighbouring convs; a pallas_call is a
    fusion barrier), at batch >= 4 the one-pass kernel wins (~23 % vocoder
    latency at batch 8). Auto therefore keys on the (static) batch size and
    requires a TPU backend. The Pallas kernel is forward-only (no VJP);
    training passes False."""
    if pallas_aa is not None:  # explicit caller choice wins (training MUST
        return bool(pallas_aa)  # be able to force the differentiable path)
    env = os.environ.get("MAA3_PALLAS_AA")
    if env is not None:
        return env.strip().lower() not in ("0", "false", "off", "no", "")
    return jax.default_backend() != "cpu" and batch >= 4


def _auto_wide_unfold(batch: int) -> bool:
    """Wide-stage unfold routing A/B flag (MAA3_WIDE_UNFOLD=0/1). Default
    OFF: the round-4 per-stage probe shows the k-fold im2col duplication
    LOSES to lax.conv at >=384 channels at b8 (res0: 42.6 vs 36.3 ms) —
    round 3's apparent wide-stage 'unfold win' was actually the XLA-AA vs
    Pallas-AA difference (see _pallas_aa_max_ch)."""
    env = os.environ.get("MAA3_WIDE_UNFOLD")
    if env is not None:
        return env.strip().lower() not in ("0", "false", "off", "no", "")
    return False


def _pallas_aa_max_ch() -> int:
    """Channel cutoff for the Pallas one-pass AA-snake at batch >= 4.

    With the banded-matmul FIR kernel (round-4 default, _use_mxu_fir) the
    one-pass AA wins EVERY stage width it runs on (probe F: res0 26.2 vs
    32.5 ms best-previous, res1 34.3 vs 64.1) — no upper cutoff. With the
    shift-add kernel (MAA3_AA_SNAKE_MXU=0) the r03 measurement stands:
    XLA's shift-add AA wins the wide stages, cutoff 192.
    MAA3_PALLAS_AA_MAX_CH overrides."""
    env = os.environ.get("MAA3_PALLAS_AA_MAX_CH")
    if env is not None:
        return int(env)
    from maa3_tpu.ops.pallas_aa_snake import _use_mxu_fir
    return 1 << 30 if _use_mxu_fir() else 192


def quantize_bigvgan(params: dict, cfg: BigVGANConfig,
                     min_ch: "int | None" = None) -> dict:
    """int8-quantize the resblock conv GEMMs of stages with >= min_ch
    channels (serving only — no VJP on the w8a8 path).

    The wide stages are the only vocoder components not at a hardware bound
    at batch (res1 alone is 64-76 ms/batch at b8, PROBE_VOC_B8_ROUTE); their
    convs already run as unfold GEMMs in the batched mix, so w8a8 halves the
    im2col HBM bytes and doubles the MXU rate. conv_pre / upsamplers /
    conv_post and all snake parameters stay float. Quantize from fp32
    weights, BEFORE any bf16 serving cast. min_ch default 384 (res0+res1,
    the measured-unbound stages); MAA3_VOC_QUANT_MIN_CH overrides for
    sweeps."""
    from maa3_tpu.ops.conv import quantize_conv_int8
    if min_ch is None:
        min_ch = int(os.environ.get("MAA3_VOC_QUANT_MIN_CH", "384"))
    p = dict(params)
    nk = len(cfg.resblock_kernel_sizes)
    res = list(p["resblocks"])
    for i in range(len(cfg.upsample_rates)):
        cout = cfg.upsample_initial_channel // (2 ** (i + 1))
        if cout < min_ch:
            continue
        for j in range(nk):
            rb = dict(res[i * nk + j])
            for key in ("convs1", "convs2", "convs"):
                if key in rb:
                    rb[key] = [quantize_conv_int8(c) for c in rb[key]]
            res[i * nk + j] = rb
    p["resblocks"] = res
    return p


# ---------------------------------------------------------------------------
# AMP blocks (models.py:32-128)
# ---------------------------------------------------------------------------

def _get_padding(k: int, d: int) -> int:
    return (k * d - d) // 2


def _resolve_unfold_cutoff(batch: int = 1) -> int:
    """Channel cutoff below which stride-1 convs use the unfold-GEMM lowering.

    MAA3_UNFOLD_CUTOFF overrides; default 192 on TPU at batch 1 (where the
    narrow-stage lax.conv lowering starves the MXU — see
    ops/conv.py::conv1d_unfold), 0 at batch >= 4 (the batched per-position
    work feeds lax.conv fine and the im2col traffic turns into pure loss:
    r03 probe res5 b8 unfold 87.7 vs lax.conv ~16 ms) and 0 on CPU (stock
    path; equivalence is unit-tested explicitly)."""
    env = os.environ.get("MAA3_UNFOLD_CUTOFF")
    if env is not None:
        return int(env)
    return 192 if (jax.default_backend() != "cpu" and batch < 4) else 0


# Unfold materializes a (B, k*C, T) im2col buffer; beyond ~256 MB the win
# turns into an HBM/compile hazard (a 675 MB k=11 b8 buffer produced a
# 40+ min remote compile). Batches whose whole-batch buffer exceeds the cap
# are processed in lax.map chunks small enough to fit — the per-chunk GEMM
# (T >= 20k on every narrow stage) is already MXU-saturating, so chunking
# costs only the scan glue.
_UNFOLD_MAX_BYTES = 256 * 1024 * 1024


def _conv_site(p: dict, x: Array, k: int, d: int, compute_dtype,
               unfold_cutoff: int, wide_unfold: bool = False) -> Array:
    """One stride-1 resblock conv, routed by channel width.

    wide_unfold: batched serving mix (PROBE_VOC_B8_ROUTE) — at batch >= 4
    the batch-chunked unfold-GEMM also wins the WIDE stages (res0 768ch
    36.3->31.8 ms, res1 384ch 75.9->63.8 at b8), while the narrow stages
    stay on their fused-Pallas path. int8-quantized sites ("w_q" marker,
    quantize_bigvgan) always run the w8a8 unfold GEMM."""
    pad = _get_padding(k, d)
    quant = "w_q" in p
    if quant or x.shape[1] <= unfold_cutoff or wide_unfold:
        # quant chunk sizing uses fp32 itemsize: conv1d_unfold_w8a8's im2col
        # "cols" buffer is built fp32 (feeds both amax and quantize), so the
        # per-chunk transient is 4 bytes/element, not 1
        itemsize = 4 if quant else jnp.dtype(compute_dtype or x.dtype).itemsize
        per_sample = k * x.shape[1] * x.shape[2] * itemsize
        if quant or per_sample <= _UNFOLD_MAX_BYTES:
            b = x.shape[0]
            bchunk = min(b, max(1, _UNFOLD_MAX_BYTES // per_sample))
            while b % bchunk:
                bchunk -= 1
            if quant:
                from maa3_tpu.ops.conv import (conv1d_tapgemm_w8a8,
                                               conv1d_unfold_w8a8)
                xq = (x.astype(compute_dtype)
                      if compute_dtype is not None else x)
                # wide channels: k shifted tap-GEMMs (no im2col duplication
                # — the unfold form loses from ~256ch up, PROBE r04)
                tap_min = int(os.environ.get(
                    "MAA3_VOC_QUANT_TAPGEMM_MIN_CH", "256"))
                if x.shape[1] >= tap_min:
                    def fn(z):
                        return conv1d_tapgemm_w8a8(p, z, padding=pad,
                                                   dilation=d)
                else:
                    def fn(z):
                        return conv1d_unfold_w8a8(p, z, padding=pad,
                                                  dilation=d)
                x = xq
            else:
                def fn(z):
                    return conv1d_unfold(p, z, padding=pad, dilation=d,
                                         compute_dtype=compute_dtype)
            if bchunk == b:
                return fn(x)
            xc = x.reshape(b // bchunk, bchunk, x.shape[1], x.shape[2])
            y = jax.lax.map(fn, xc)
            return y.reshape(b, y.shape[2], y.shape[3])
    return conv1d(p, x, padding=pad, dilation=d, compute_dtype=compute_dtype)


def _amp1_init(key: Array, ch: int, k: int, dilations: Sequence[int],
               cfg: BigVGANConfig) -> dict:
    ks = jax.random.split(key, 6)
    return {
        "convs1": [conv1d_init(ks[i], ch, ch, k) for i in range(3)],
        "convs2": [conv1d_init(ks[3 + i], ch, ch, k) for i in range(3)],
        "acts": [_act_init(ch, cfg) for _ in range(6)],
    }


def _fused_site(act_p: dict, conv_p: dict, x: Array, k: int, d: int,
                cfg: BigVGANConfig) -> Array:
    """One act->conv site through the fused Pallas kernel (ops/pallas_amp)."""
    from maa3_tpu.ops.pallas_amp import conv_snake_fused
    return conv_snake_fused(x, act_p["alpha"], act_p.get("beta"),
                            conv_p["w"], conv_p["b"], k=k, dilation=d,
                            logscale=cfg.snake_logscale,
                            has_beta=cfg.activation != "snake")


def _amp1_apply(p: dict, x: Array, k: int, dilations: Sequence[int],
                cfg: BigVGANConfig, compute_dtype, use_pallas: bool = False,
                fused_cutoff: int = 0, unfold_cutoff: int = 0,
                wide_unfold: bool = False) -> Array:
    fused = (cfg.activation != "lrelu" and x.shape[1] <= fused_cutoff
             and "w_q" not in p["convs1"][0])  # quantized convs: GEMM path
    aa = _make_aa(cfg, use_pallas and x.shape[1] <= _pallas_aa_max_ch(),
                  compute_dtype)
    # activations alternate [::2] / [1::2] (models.py:75)
    for i, d in enumerate(dilations):
        if fused:
            xc = x.astype(compute_dtype)
            xt = _fused_site(p["acts"][2 * i], p["convs1"][i], xc, k, d, cfg)
            xt = _fused_site(p["acts"][2 * i + 1], p["convs2"][i], xt, k, 1, cfg)
        else:
            xt = aa(p["acts"][2 * i])(x)
            xt = _conv_site(p["convs1"][i], xt, k, d, compute_dtype,
                            unfold_cutoff, wide_unfold)
            xt = aa(p["acts"][2 * i + 1])(xt)
            xt = _conv_site(p["convs2"][i], xt, k, 1, compute_dtype,
                            unfold_cutoff, wide_unfold)
        x = xt + x
    return x


def _amp2_init(key: Array, ch: int, k: int, dilations: Sequence[int],
               cfg: BigVGANConfig) -> dict:
    ks = jax.random.split(key, len(dilations))
    return {
        "convs": [conv1d_init(ks[i], ch, ch, k) for i in range(len(dilations))],
        "acts": [_act_init(ch, cfg) for _ in range(len(dilations))],
    }


def _amp2_apply(p: dict, x: Array, k: int, dilations: Sequence[int],
                cfg: BigVGANConfig, compute_dtype, use_pallas: bool = False,
                fused_cutoff: int = 0, unfold_cutoff: int = 0,
                wide_unfold: bool = False) -> Array:
    fused = (cfg.activation != "lrelu" and x.shape[1] <= fused_cutoff
             and "w_q" not in p["convs"][0])
    aa = _make_aa(cfg, use_pallas and x.shape[1] <= _pallas_aa_max_ch(),
                  compute_dtype)
    for i, d in enumerate(dilations):
        if fused:
            xt = _fused_site(p["acts"][i], p["convs"][i],
                             x.astype(compute_dtype), k, d, cfg)
        else:
            xt = aa(p["acts"][i])(x)
            xt = _conv_site(p["convs"][i], xt, k, d, compute_dtype,
                            unfold_cutoff, wide_unfold)
        x = xt + x
    return x


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------

def bigvgan_init(key: Array, cfg: BigVGANConfig) -> dict:
    ks = iter(jax.random.split(key, 512))
    p: dict = {"conv_pre": conv1d_init(next(ks), cfg.num_mels,
                                       cfg.upsample_initial_channel, 7)}
    amp_init = _amp1_init if cfg.resblock == "1" else _amp2_init
    ups, resblocks = [], []
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin = cfg.upsample_initial_channel // (2 ** i)
        cout = cfg.upsample_initial_channel // (2 ** (i + 1))
        # ConvTranspose1d weight layout (in, out, k)
        import math as _m
        from maa3_tpu.utils import nprand
        bound = 1.0 / _m.sqrt(cin * k)
        ups.append({
            "w": jnp.asarray(nprand.uniform(next(ks), (cin, cout, k), -bound, bound)),
            "b": jnp.zeros((cout,), jnp.float32),
        })
        for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            resblocks.append(amp_init(next(ks), cout, rk, rd, cfg))
    p["ups"] = ups
    p["resblocks"] = resblocks
    ch = cfg.upsample_initial_channel // (2 ** len(cfg.upsample_rates))
    p["activation_post"] = _act_init(ch, cfg)
    p["conv_post"] = conv1d_init(next(ks), ch, 1, 7)
    return p


def bigvgan_apply(params: dict, cfg: BigVGANConfig, mel: Array,
                  compute_dtype=jnp.float32, pallas_aa=None) -> Array:
    """mel (B, num_mels, T) -> wav (B, T * prod(upsample_rates)).

    Parity: BigVGAN.forward (models.py:183-205). pallas_aa: tri-state Pallas
    fast path (None = auto; forward-only, so training callers pass False).
    When on: act->conv sites on narrow stages (C <= MAA3_AMP_FUSED_CUTOFF,
    default 192) run the fused snake+im2col+MXU kernel (ops/pallas_amp); wide
    stages use the one-pass AA kernel (ops/pallas_aa_snake) at batch >= 4.
    """
    use_pallas = _auto_pallas_aa(pallas_aa, mel.shape[0])
    # both Pallas paths lose at batch 1 (XLA's act-into-conv fusion plus
    # per-program overheads win on small data; measured on v5e) — one gate
    fused_cutoff = 0
    if use_pallas:
        # with the banded-FIR AA kernel, only the narrowest stages (C<=48)
        # keep the act->conv conv_snake kernel (probe F: res4/5 fused 41/39
        # vs paa 43/75 ms); the shift-add fallback keeps the r03 192 cutoff
        from maa3_tpu.ops.pallas_aa_snake import _use_mxu_fir
        fused_cutoff = int(os.environ.get(
            "MAA3_AMP_FUSED_CUTOFF", "48" if _use_mxu_fir() else "192"))
    unfold_cutoff = _resolve_unfold_cutoff(mel.shape[0])
    wide_unfold = _auto_wide_unfold(mel.shape[0])
    num_kernels = len(cfg.resblock_kernel_sizes)
    amp_apply = _amp1_apply if cfg.resblock == "1" else _amp2_apply
    aa = _make_aa(cfg, use_pallas, compute_dtype)

    x = conv1d(params["conv_pre"], mel, padding=3, compute_dtype=compute_dtype)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        pad = (k - u) // 2
        if k <= 3 * u and k - 2 * pad == u:
            # dense polyphase GEMM lowering (no zero-stuffed MACs on the MXU)
            x = conv_transpose1d_polyphase(params["ups"][i], x, stride=u,
                                           padding=pad,
                                           compute_dtype=compute_dtype)
        else:
            x = conv_transpose1d(params["ups"][i], x, stride=u, padding=pad,
                                 compute_dtype=compute_dtype)
        xs = None
        for j in range(num_kernels):
            rb = params["resblocks"][i * num_kernels + j]
            y = amp_apply(rb, x, cfg.resblock_kernel_sizes[j],
                          cfg.resblock_dilation_sizes[j], cfg, compute_dtype,
                          use_pallas, fused_cutoff, unfold_cutoff,
                          wide_unfold)
            xs = y if xs is None else xs + y
        x = xs / num_kernels
    if cfg.activation != "lrelu" and x.shape[1] <= fused_cutoff:
        x = _fused_site(params["activation_post"], params["conv_post"],
                        x.astype(compute_dtype), 7, 1, cfg)
    else:
        x = aa(params["activation_post"])(x)
        x = _conv_site(params["conv_post"], x, 7, 1, compute_dtype,
                       unfold_cutoff)
    return jnp.tanh(x)[:, 0, :]
