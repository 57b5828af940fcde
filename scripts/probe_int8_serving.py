"""Probe: XL serving latency, bf16 vs int8 (w8a8) per-step GEMMs.

Times the full 25-step CFG generate and the isolated ODE component in both
serving modes, plus the mel drift int8-vs-bf16 and int8-vs-fp32. Standalone
GEMM probes (probe_int8_gemm.py) measured 1.7-2.0x on the quantized shapes;
this measures what survives in the end-to-end planned sampler.

Run detached on TPU: nohup python scripts/probe_int8_serving.py > log 2>&1 &
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maa3_tpu.utils import enable_compile_cache

enable_compile_cache()

import dataclasses

from maa3_tpu.models.dit import DiTConfig
from maa3_tpu.models.vae1d import VAEConfig
from maa3_tpu.models.bigvgan import BigVGANConfig
from maa3_tpu.ops.quant import quantize_dit_serving
from maa3_tpu.pipeline import T2APipeline
from maa3_tpu.utils.nprand import (cast_matmul_weights, fuse_dit_gemms,
                                   unfreeze_zero_init)

LATENT_LEN, CTX_LEN, STEPS = 312, 154, 25


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def median_time(fn, args, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def component_time(fn, args, n=5):
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
    key = jax.random.PRNGKey(0)
    xl = DiTConfig(in_channels=20, context_dim=1024, hidden_size=1152,
                   depth=28, num_heads=16, max_len=1000)
    log("init XL fp32 (minutes on the 1-core host)...")
    pipe32 = T2APipeline.random_init(key, xl, VAEConfig(), BigVGANConfig(),
                                     compute_dtype=jnp.float32)
    pipe32.params["dit"] = unfreeze_zero_init(pipe32.params["dit"], key)
    log("init done")

    serving_cfg = dataclasses.replace(xl, fp32_residual=True)

    params16 = dict(pipe32.params)
    params16["dit"] = fuse_dit_gemms(
        cast_matmul_weights(pipe32.params["dit"], jnp.bfloat16))
    pipe16 = dataclasses.replace(pipe32, compute_dtype=jnp.bfloat16,
                                 params=params16, dit_cfg=serving_cfg)

    params8 = dict(pipe32.params)
    params8["dit"] = cast_matmul_weights(
        quantize_dit_serving(fuse_dit_gemms(pipe32.params["dit"])),
        jnp.bfloat16)
    pipe8 = dataclasses.replace(pipe32, compute_dtype=jnp.bfloat16,
                                params=params8, dit_cfg=serving_cfg)

    ctx = jax.random.normal(key, (1, CTX_LEN, 1024), jnp.float32)
    uc = jnp.zeros_like(ctx)
    gk = jax.random.PRNGKey(1)
    out = {}

    for name, pipe in (("bf16", pipe16), ("int8", pipe8)):
        def run(k, _pipe=pipe):
            return _pipe.generate(ctx, uc, k, latent_len=LATENT_LEN,
                                  guidance_scale=5.0, steps=STEPS)[2]

        log(f"{name}: compiling generate...")
        t0 = time.perf_counter()
        mel = np.asarray(pipe.generate(ctx, uc, gk, latent_len=LATENT_LEN,
                                       guidance_scale=5.0, steps=STEPS)[1],
                         dtype=np.float32)
        log(f"{name}: compiled+ran in {time.perf_counter() - t0:.1f}s")
        p50 = median_time(run, (gk,))
        x0 = jax.random.normal(jax.random.PRNGKey(2), (1, 20, LATENT_LEN),
                               jnp.float32)
        ode = component_time(
            lambda x, _pipe=pipe: _pipe._sample_latent(
                _pipe.params, x, ctx, uc, jnp.float32(5.0), STEPS), (x0,))
        out[name] = {"p50_s": round(p50, 4), "ode_ms": round(ode * 1e3, 1)}
        out[name + "_mel"] = mel
        print(json.dumps({k: v for k, v in out.items()
                          if not k.endswith("_mel")}), flush=True)

    # batched throughput in int8 (batch 8: the probe sweet spot for dyn quant)
    for bsz in (8,):
        ctx_b = jnp.broadcast_to(ctx, (bsz,) + ctx.shape[1:])
        uc_b = jnp.zeros_like(ctx_b)

        def run_b(k):
            return pipe8.generate(ctx_b, uc_b, k, latent_len=LATENT_LEN,
                                  guidance_scale=5.0, steps=STEPS)[2]

        log(f"int8 batch{bsz}: compiling...")
        run_b(jax.random.PRNGKey(99))
        tb = median_time(run_b, (jax.random.PRNGKey(100),), n=3)
        out[f"int8_b{bsz}"] = {"p50_s": round(tb, 4),
                               "throughput_s_audio_per_s": round(bsz * 10 / tb, 1)}
        print(json.dumps({k: v for k, v in out.items()
                          if not k.endswith("_mel")}), flush=True)

    # drift: int8 vs bf16, and vs fp32 (one more compile)
    out["mel_mae_int8_vs_bf16"] = float(
        np.abs(out["int8_mel"] - out["bf16_mel"]).mean())
    log("fp32: compiling generate for the drift anchor...")
    mel32 = np.asarray(pipe32.generate(ctx, uc, gk, latent_len=LATENT_LEN,
                                       guidance_scale=5.0, steps=STEPS)[1],
                       dtype=np.float32)
    out["mel_mae_int8_vs_fp32"] = float(np.abs(out["int8_mel"] - mel32).mean())
    out["mel_mae_bf16_vs_fp32"] = float(np.abs(out["bf16_mel"] - mel32).mean())
    print(json.dumps({k: v for k, v in out.items()
                      if not k.endswith("_mel")}), flush=True)


if __name__ == "__main__":
    main()
