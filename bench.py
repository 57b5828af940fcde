"""Benchmark: flagship XL (750M) text-to-audio, 25-step CFG Euler CFM, 10 s clip.

Measures the full generation path on one TPU chip (DiT ODE -> VAE decode ->
BigVGAN vocode) and prints ONE JSON line:
  {"metric": "t2a_xl_10s_latency_p50", "value": <s>, "unit": "s", "vs_baseline": <x>}

vs_baseline is relative to the BASELINE.md north star of 1.0 s per 10 s clip
on one v5e chip (the reference publishes no numbers; >1.0 means faster than
the north star).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from maa3_tpu.utils import enable_compile_cache

enable_compile_cache()

from maa3_tpu.models.dit import DiTConfig
from maa3_tpu.models.vae1d import VAEConfig
from maa3_tpu.models.bigvgan import BigVGANConfig
from maa3_tpu.pipeline import T2APipeline

NORTH_STAR_S = 1.0
LATENT_LEN = 312          # 10 s: 625 mel frames // 2
CTX_LEN = 154             # CLAP(77) ++ T5(77)
STEPS = 25


def main():
    key = jax.random.PRNGKey(0)
    xl = DiTConfig(in_channels=20, context_dim=1024, hidden_size=1152,
                   depth=28, num_heads=16, max_len=1000)
    pipe = T2APipeline.random_init(key, xl, VAEConfig(), BigVGANConfig(),
                                   compute_dtype=jnp.bfloat16)
    # bf16 weight storage: halves DiT weight HBM reads per ODE step
    from maa3_tpu.utils.nprand import cast_matmul_weights
    pipe.params["dit"] = cast_matmul_weights(pipe.params["dit"], jnp.bfloat16)

    ctx = jax.random.normal(key, (1, CTX_LEN, 1024), jnp.float32)
    uc = jnp.zeros_like(ctx)

    def run(k):
        z, mel, wav = pipe.generate(ctx, uc, k, latent_len=LATENT_LEN,
                                    guidance_scale=5.0, steps=STEPS)
        return wav

    # compile + warmup
    run(key).block_until_ready()

    times = []
    for i in range(5):
        k = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        run(k).block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]

    # batched throughput: secs-of-audio generated per wall-second per chip
    bsz = 8
    ctx_b = jnp.broadcast_to(ctx, (bsz,) + ctx.shape[1:])
    uc_b = jnp.zeros_like(ctx_b)

    def run_b(k):
        _, _, wav = pipe.generate(ctx_b, uc_b, k, latent_len=LATENT_LEN,
                                  guidance_scale=5.0, steps=STEPS)
        return wav

    run_b(key).block_until_ready()
    tb = []
    for i in range(3):
        t0 = time.perf_counter()
        run_b(jax.random.PRNGKey(100 + i)).block_until_ready()
        tb.append(time.perf_counter() - t0)
    tb.sort()
    throughput = bsz * 10.0 / tb[len(tb) // 2]

    print(json.dumps({
        "metric": "t2a_xl_10s_latency_p50",
        "value": round(p50, 4),
        "unit": "s",
        "vs_baseline": round(NORTH_STAR_S / p50, 3),
        "throughput_secs_audio_per_sec_chip": round(throughput, 1),
        "throughput_batch": bsz,
    }))


if __name__ == "__main__":
    main()
