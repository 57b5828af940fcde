#!/usr/bin/env python
"""Measure bf16-serving drift vs the fp32 parity path at XL shapes on TPU,
sweeping the serving drift levers.

The BASELINE.md quality gate (mel MAE < 1e-3) is defined against the fp32
reference path. The bf16 fast mode trades drift for latency; this script
quantifies each lever at the REAL serving configuration (bf16-cast + fused
weights, planned sampler):

  bf16            baseline serving mode
  +fp32_scores    fp32 attention score storage (HBM-free at batch 1)
  +fp32_residual  fp32 residual carry between blocks
  +both           both levers
  +both+dec32     both + fp32 VAE decode (the gate metric is mel-space)

Prints one JSON line per mode (mel/latent MAE + p50 latency), then a
summary. Evidence behind PARITY.md's precision policy and the bench's
published drift number.

Run: python scripts/measure_precision_drift.py           (XL on TPU)
     python scripts/measure_precision_drift.py --small   (CPU smoke)
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()

from maa3_tpu.models.dit import DiTConfig
from maa3_tpu.models.vae1d import VAEConfig
from maa3_tpu.models.bigvgan import BigVGANConfig
from maa3_tpu.pipeline import T2APipeline


def main():
    small = "--small" in sys.argv  # CPU smoke
    key = jax.random.PRNGKey(0)
    if small:
        dit = DiTConfig(in_channels=20, context_dim=64, hidden_size=128,
                        depth=2, num_heads=4, max_len=256)
        vae, voc = VAEConfig(ch=64, ch_mult=(1, 2)), BigVGANConfig(
            upsample_initial_channel=64)
        latent_len, ctx_len, ctx_dim = 40, 10, 64
    else:
        dit = DiTConfig(in_channels=20, context_dim=1024, hidden_size=1152,
                        depth=28, num_heads=16, max_len=1000)
        vae, voc = VAEConfig(), BigVGANConfig()
        latent_len, ctx_len, ctx_dim = 312, 154, 1024

    pipe32 = T2APipeline.random_init(key, dit, vae, voc,
                                     compute_dtype=jnp.float32)
    # zero-init adaLN/final/gates make every block an identity at init —
    # perturb them so drift reflects the full 28-block path
    from maa3_tpu.utils.nprand import (cast_matmul_weights, fuse_dit_gemms,
                                       unfreeze_zero_init)
    pipe32.params["dit"] = unfreeze_zero_init(pipe32.params["dit"], key)
    params16 = dict(pipe32.params)
    params16["dit"] = fuse_dit_gemms(
        cast_matmul_weights(pipe32.params["dit"], jnp.bfloat16))

    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, ctx_len, ctx_dim))
    uc = jnp.zeros_like(ctx)
    k = jax.random.PRNGKey(2)

    def gen(pipe):
        z, mel, wav = pipe.generate(ctx, uc, k, latent_len=latent_len,
                                    steps=25)
        return (np.asarray(z, np.float32), np.asarray(mel, np.float32),
                np.asarray(wav, np.float32))

    def p50(pipe, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(jnp.sum(pipe.generate(ctx, uc, k, latent_len=latent_len,
                                        steps=25)[2]))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    # TRUE-fp32 oracle: TPU's DEFAULT matmul precision computes fp32 dots
    # via bf16 MXU passes; 'highest' (6-pass emulation) makes the reference
    # leg actually fp32 (see scripts/xl_consistency.py). The oracle is
    # skippable (MAA3_DRIFT_NO_ORACLE=1, or automatically on OOM): the
    # decomposition's ranking metric is mel_mae_vs_bf16, which only needs
    # the bf16 leg.
    have_oracle = os.environ.get("MAA3_DRIFT_NO_ORACLE", "") == ""
    if have_oracle:
        try:
            with jax.default_matmul_precision("highest"):
                z32, mel32, wav32 = gen(pipe32)
        except Exception as e:
            print(json.dumps({"oracle_skipped": repr(e)[:200]}), flush=True)
            have_oracle = False
    if not have_oracle:
        z32 = mel32 = wav32 = None
    base16 = dataclasses.replace(pipe32, compute_dtype=jnp.bfloat16,
                                 params=params16)  # fp32 decode (default)
    # Mode pipes are built LAZILY, one at a time, and dropped after
    # measuring: 8+ concurrently-held quantized XL param sets OOM the 16 GB
    # chip (round-4 post-mortem of the first drift-sweep attempt).
    modes = {
        "bf16_dec16": lambda: dataclasses.replace(base16, decode_dtype=None),
        "bf16": lambda: base16,
        "bf16+fp32_scores": lambda: dataclasses.replace(
            base16, dit_cfg=dataclasses.replace(dit, fp32_scores=True)),
        "bf16+fp32_residual": lambda: dataclasses.replace(
            base16, dit_cfg=dataclasses.replace(dit, fp32_residual=True)),
        "bf16+both": lambda: dataclasses.replace(
            base16, dit_cfg=dataclasses.replace(dit, fp32_scores=True,
                                                fp32_residual=True)),
    }
    # int8 (w8a8) turbo modes: per-step GEMMs quantized (ops/quant.py),
    # fp32 residual carry as in the serving default. Variants sweep the two
    # drift levers set_serving_quant exposes: per-group-128 weight +
    # per-(token, group) activation scales, and keeping w2 (the SwiGLU
    # down-projection, whose input has the widest dynamic range) in bf16.
    from maa3_tpu.ops.quant import quantize_dit_serving
    gs = 32 if small else 128

    def _int8_pipe(kw, migrate=None):
        fused = fuse_dit_gemms(pipe32.params["dit"])
        if migrate is not None:
            fused = migrate(fused)
        params8 = dict(pipe32.params)
        params8["dit"] = cast_matmul_weights(
            quantize_dit_serving(fused, **kw), jnp.bfloat16)
        del fused
        return dataclasses.replace(
            base16, params=params8,
            dit_cfg=dataclasses.replace(dit, fp32_residual=True))

    for tag, kw in (("", {}),
                    (f":g{gs}", {"group_size": gs}),
                    (":now2", {"skip_w2": True}),
                    (f":g{gs},now2", {"group_size": gs, "skip_w2": True})):
        modes[f"int8{tag}+fp32_residual"] = (
            lambda kw=kw: _int8_pipe(kw))

    # per-GEMM-class error decomposition (DRIFT_R05): quantize ONE class at
    # a time to rank mel-MAE contributions, then the hybrid candidates —
    # g128 only on the worst class(es), per-channel elsewhere (most of
    # g128's accuracy at a fraction of its 60% latency cost if the error
    # profile is peaked)
    for cls in ("wqkv", "w13", "w2"):
        modes[f"int8@{cls}+fp32_residual"] = (
            lambda cls=cls: _int8_pipe({"classes": (cls,)}))
    modes["int8:hyb_w2g+fp32_residual"] = (
        lambda: _int8_pipe({"group_for": {"w2": gs}}))
    modes["int8:hyb_w13w2g+fp32_residual"] = (
        lambda: _int8_pipe({"group_for": {"w2": gs, "w13": gs}}))

    # SmoothQuant scale migration (round 4, VERDICT #3): calibrate one ODE
    # on this context, fold the equalization into the weights (zero runtime
    # cost), then per-channel-quantize as usual. alpha sweep 0.5 / 0.75.
    from maa3_tpu.ops.quant import calibrate_dit_smooth, smooth_migrate_dit
    serving_cfg = dataclasses.replace(dit, fp32_residual=True)
    x0_cal = jax.random.normal(k, (1, dit.in_channels, latent_len),
                               jnp.float32)  # same draw as pipe.generate(k)
    _stats_cache = {}

    def _smooth_stats():
        if "s" not in _stats_cache:
            fused = fuse_dit_gemms(pipe32.params["dit"])
            _stats_cache["s"] = calibrate_dit_smooth(
                fused, serving_cfg, x0_cal, ctx, uc, steps=25,
                compute_dtype=jnp.bfloat16)
            del fused
        return _stats_cache["s"]

    for tag, alpha, kw in (("smooth", 0.5, {}),
                           ("smooth75", 0.75, {}),
                           ("smooth,now2", 0.5, {"skip_w2": True})):
        modes[f"int8:{tag}+fp32_residual"] = (
            lambda alpha=alpha, kw=kw: _int8_pipe(
                kw, migrate=lambda f: smooth_migrate_dit(
                    f, _smooth_stats(), alpha=alpha)))

    out = ({"mel_rms": float(np.sqrt((mel32 ** 2).mean())),
            "latent_rms": float(np.sqrt((z32 ** 2).mean()))}
           if have_oracle else {"oracle": "skipped"})
    # how far DEFAULT-precision fp32 sits from true fp32 (the quiet
    # bf16-passes effect measured on its own)
    if have_oracle:
        z32d, mel32d, _ = gen(pipe32)
        out["fp32_default_vs_highest"] = {
            "latent_mae": float(np.abs(z32 - z32d).mean()),
            "mel_mae": float(np.abs(mel32 - mel32d).mean()),
        }
        print(json.dumps({"fp32_default_vs_highest":
                          out["fp32_default_vs_highest"]}), flush=True)
    mel_bf16 = None
    # --modes a,b,c filters to a comma-separated subset (substring match);
    # 'bf16' is always kept (the int8 rows' vs-bf16 metric needs it)
    for a in sys.argv[1:]:
        if a.startswith("--modes="):
            keep = a.split("=", 1)[1].split(",")
            modes = {n: p for n, p in modes.items()
                     if n == "bf16" or any(k in n for k in keep)}
    for name, build in modes.items():
        pipe = build()   # device params live only for this iteration
        z16, mel16, wav16 = gen(pipe)
        row = {"p50_s": round(p50(pipe), 4)}
        if have_oracle:
            row.update({
                "latent_mae": float(np.abs(z32 - z16).mean()),
                "mel_mae": float(np.abs(mel32 - mel16).mean()),
                "wav_mae": float(np.abs(wav32 - wav16).mean()),
            })
        if name == "bf16":
            mel_bf16 = mel16
        if name.startswith("int8") and mel_bf16 is not None:
            # the headline int8 drift metric: extra error over the bf16
            # fast mode (BENCH mel_mae_int8_vs_bf16)
            row["mel_mae_vs_bf16"] = float(np.abs(mel_bf16 - mel16).mean())
        out[name] = row
        del pipe
        print(json.dumps({name: row}), flush=True)
    if have_oracle:
        out["fp32_p50_s"] = round(p50(pipe32), 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
