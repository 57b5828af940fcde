#!/usr/bin/env python
"""Per-component batch-scaling diagnostic for the XL serving path.

bench.py measured throughput FALLING with batch (58.8 s-audio/s/chip at
batch 8 -> 46.4 at 32) — something scales super-linearly. This times the
three pipeline components (ODE, VAE decode, vocoder) separately at each
batch size to localize it. Prints one cumulative JSON line per batch.

Usage:  MAA3_BATCHES=1,8,32 python scripts/bench_batch_scaling.py
"""

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

from maa3_tpu.models.dit import DiTConfig
from maa3_tpu.models.vae1d import VAEConfig
from maa3_tpu.models.bigvgan import BigVGANConfig
from maa3_tpu.pipeline import T2APipeline

LATENT_LEN = 312
CTX_LEN = 154
STEPS = 25


def component_time(fn, args, n=5):
    """1-vs-3 back-to-back slope; cancels the tunnel's dispatch+fetch RPC
    (same method as bench.py)."""
    def run_k(k):
        out = None
        for _ in range(k):
            out = fn(*args)
        return float(jnp.sum(out))

    run_k(3)
    t1s, t3s = [], []
    for _ in range(n):
        t0 = time.perf_counter(); run_k(1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run_k(3); t3s.append(time.perf_counter() - t0)
    t1s.sort(); t3s.sort()
    return max((t3s[len(t3s) // 2] - t1s[len(t1s) // 2]) / 2.0, 0.0)


def main():
    import dataclasses
    batches = [int(b) for b in
               os.environ.get("MAA3_BATCHES", "1,8,32").split(",")]

    key = jax.random.PRNGKey(0)
    xl = DiTConfig(in_channels=20, context_dim=1024, hidden_size=1152,
                   depth=28, num_heads=16, max_len=1000)
    print(f"[{time.strftime('%H:%M:%S')}] init XL weights...",
          file=sys.stderr, flush=True)
    pipe32 = T2APipeline.random_init(key, xl, VAEConfig(), BigVGANConfig(),
                                     compute_dtype=jnp.float32)
    from maa3_tpu.utils.nprand import cast_matmul_weights, fuse_dit_gemms
    params16 = dict(pipe32.params)
    params16["dit"] = fuse_dit_gemms(
        cast_matmul_weights(pipe32.params["dit"], jnp.bfloat16))
    pipe = dataclasses.replace(
        pipe32, compute_dtype=jnp.bfloat16, params=params16,
        dit_cfg=dataclasses.replace(xl, fp32_residual=True))

    out = {"shape": "XL", "steps": STEPS, "latent_len": LATENT_LEN,
           "per_batch": {}}
    for bsz in batches:
        print(f"[{time.strftime('%H:%M:%S')}] batch {bsz}...",
              file=sys.stderr, flush=True)
        ctx = jax.random.normal(key, (bsz, CTX_LEN, 1024), jnp.float32)
        uc = jnp.zeros_like(ctx)
        x0 = jax.random.normal(jax.random.PRNGKey(2),
                               (bsz, 20, LATENT_LEN), jnp.float32)
        scale = jnp.float32(5.0)

        ode_t = component_time(
            lambda x: pipe._sample_latent(pipe.params, x, ctx, uc, scale,
                                          STEPS), (x0,))
        z1 = pipe._sample_latent(pipe.params, x0, ctx, uc, scale, STEPS)
        dec_t = component_time(
            lambda z: pipe._decode_mel(pipe.params, z), (z1,))
        mel1 = pipe._decode_mel(pipe.params, z1)
        voc_t = component_time(
            lambda m: pipe._vocode(pipe.params, m), (mel1,))

        def run_e2e(k):
            _, _, wav = pipe.generate(ctx, uc, k, latent_len=LATENT_LEN,
                                      guidance_scale=5.0, steps=STEPS)
            return wav

        e2e_t = component_time(run_e2e, (jax.random.PRNGKey(7),), n=3)

        out["per_batch"][bsz] = {
            "ode_ms": round(ode_t * 1e3, 1),
            "ode_ms_per_clip": round(ode_t * 1e3 / bsz, 2),
            "vae_decode_ms": round(dec_t * 1e3, 1),
            "vocoder_ms": round(voc_t * 1e3, 1),
            "vocoder_ms_per_clip": round(voc_t * 1e3 / bsz, 2),
            "e2e_ms": round(e2e_t * 1e3, 1),
            "throughput_s_audio_per_s": round(bsz * 10.0 / e2e_t, 1),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
