#!/usr/bin/env python
"""XL (750M) train-step benchmark on one TPU chip: steps/sec, train MFU, and
peak HBM with block rematerialization. Evidence that full-size training fits
and runs at speed on a single 16 GB v5e (the reference trains on 8x A100,
README.md:76). Prints one JSON line.

Usage: python scripts/bench_train_step.py [--batch 8] [--latent 312] [--no-remat]
"""

import argparse
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

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()

from maa3_tpu.models.dit import DiTConfig, dit_init, dit_param_count
from maa3_tpu.models.vae1d import VAEConfig, vae_init
from maa3_tpu.train.optim import make_optimizer
from maa3_tpu.train.step import create_train_state, make_train_step
from maa3_tpu.utils.profiling import device_memory_stats

V5E_PEAK_BF16 = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--latent", type=int, default=312)  # 10 s clips
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--remat_policy", type=str, default="nothing",
                    choices=["nothing", "dots_no_batch", "save_gemms",
                             "save_gemms_lite", "save_gemms_h1"])
    ap.add_argument("--mu_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="AdamW first-moment storage dtype (bfloat16 frees "
                         "~1.5 GB for the XL, letting dots_no_batch fit)")
    ap.add_argument("--factored", action="store_true",
                    help="Adafactor-style factored second moment (kills the "
                         "3 GB nu read+write per step; opt-in, not the "
                         "reference AdamW recipe)")
    ap.add_argument("--cached_latents", action="store_true",
                    help="feed precomputed VAE posterior moments instead of "
                         "mel (the scripts/encode_latents.py training path) "
                         "- measures the step without the frozen encode")
    ap.add_argument("--fuse", action="store_true",
                    help="train with fused wqkv/w13 params (wider MXU GEMMs "
                         "fwd+bwd; single-axis DP only — TP wants unfused)")
    ap.add_argument("--use_flash", choices=["auto", "on", "off"],
                    default="auto",
                    help="attention route: auto = mode-aware threshold "
                         "(flash from seq 2048 in training), on/off = force")
    ap.add_argument("--param_dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="bfloat16 casts the DiT params (and hence grads/"
                         "mu) — NOT the production recipe; the single-chip "
                         "XXL proxy when fp32 params+grads+mu (~14.8 GB) "
                         "OOM a 16 GB chip, matching XXL_MEM_r04's 22.7 GB "
                         "replicated estimate")
    ap.add_argument("--model", choices=["xl", "xxl"], default="xl",
                    help="xxl = 1536x32Lx32H (1.47B, "
                         "configs/txt2audio-cfm-cfg-XXL.yaml:38-41) — the "
                         "round-5 real-chip XXL train-step measurement")
    ap.add_argument("--small", action="store_true")  # CPU smoke
    ap.add_argument("--profile", type=str, default="",
                    help="capture a jax.profiler trace of 3 steps to DIR")
    opt = ap.parse_args()
    use_flash = {"auto": None, "on": True, "off": False}[opt.use_flash]

    if opt.small:
        dit_cfg = DiTConfig(in_channels=20, context_dim=64, hidden_size=128,
                            depth=2, num_heads=4, max_len=256,
                            remat=not opt.no_remat,
                            remat_policy=opt.remat_policy,
                            use_flash=use_flash)
        vae_cfg = VAEConfig(ch=64, ch_mult=(1, 2))
        ctx_len, ctx_dim = 10, 64
        opt.latent = min(opt.latent, 64)
    else:
        h, d, nh = ((1536, 32, 32) if opt.model == "xxl"
                    else (1152, 28, 16))
        dit_cfg = DiTConfig(in_channels=20, context_dim=1024,
                            hidden_size=h, depth=d, num_heads=nh,
                            max_len=1000, remat=not opt.no_remat,
                            remat_policy=opt.remat_policy,
                            use_flash=use_flash)
        vae_cfg = VAEConfig()
        ctx_len, ctx_dim = 154, 1024

    key = jax.random.PRNGKey(0)
    dit_params = dit_init(key, dit_cfg)
    if opt.param_dtype == "bfloat16":
        dit_params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, dit_params)
    if opt.fuse:
        from maa3_tpu.utils.nprand import fuse_dit_gemms
        dit_params = fuse_dit_gemms(dit_params)
    vae_params = vae_init(jax.random.PRNGKey(1), vae_cfg)
    n_params = dit_param_count(dit_params)

    optimizer = make_optimizer(mu_dtype=jnp.dtype(opt.mu_dtype),
                               factored=opt.factored)
    state = create_train_state({"dit": dit_params}, {"vae": vae_params},
                               optimizer, use_ema=False)
    train_step = jax.jit(make_train_step(dit_cfg, vae_cfg, optimizer,
                                         compute_dtype=jnp.bfloat16),
                         donate_argnums=(0,))

    if opt.cached_latents:
        batch = {
            "moments": jax.random.normal(
                key, (opt.batch, 2 * vae_cfg.embed_dim, opt.latent),
                jnp.float32),
            "context": jax.random.normal(key, (opt.batch, ctx_len, ctx_dim),
                                         jnp.float32),
        }
    else:
        batch = {
            "mel": jax.random.normal(key, (opt.batch, vae_cfg.in_channels,
                                           opt.latent * 2), jnp.float32),
            "context": jax.random.normal(key, (opt.batch, ctx_len, ctx_dim),
                                         jnp.float32),
        }

    state, m = train_step(state, batch, jax.random.PRNGKey(2))  # compile
    float(m["loss"])  # forced fetch: block_until_ready can under-report
    if opt.profile:
        with jax.profiler.trace(opt.profile):
            for i in range(3):
                state, m = train_step(state, batch, jax.random.PRNGKey(50 + i))
            float(m["loss"])
        print(f"profile written to {opt.profile}", file=sys.stderr)
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        state, m = train_step(state, batch, jax.random.PRNGKey(3 + i))
        float(m["loss"])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    step_t = ts[len(ts) // 2]

    # fwd 2PT, bwd ~2x fwd -> 6 * P * tokens per sample
    flops = 6 * n_params * opt.latent * opt.batch
    mem = device_memory_stats()
    out = {
        "model_params": n_params,
        "batch": opt.batch,
        "latent_len": opt.latent,
        "remat": not opt.no_remat,
        "remat_policy": opt.remat_policy,
        "fused_gemms": opt.fuse,
        "cached_latents": opt.cached_latents,
        "factored": opt.factored,
        "mu_dtype": opt.mu_dtype,
        "param_dtype": opt.param_dtype,
        "use_flash": opt.use_flash,
        "step_ms": round(step_t * 1e3, 1),
        "steps_per_sec": round(1.0 / step_t, 2),
        "train_mfu": round(flops / step_t / V5E_PEAK_BF16, 3),
        "samples_per_sec": round(opt.batch / step_t, 2),
        "peak_hbm_gb": round((mem or {}).get("peak_bytes_in_use", 0) / 2**30, 2),
        "loss": round(float(m["loss"]), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
