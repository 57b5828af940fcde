"""End-to-end batched-serving probe: XL 25-step generate with the Pallas
flash self-attention kernel forced ON vs OFF, at batch 8/16/32.

The per-op probe (probe_flash_serve.py) shows the rewritten kernel beating
XLA dense attention 1.5-2.1x wherever the op is big enough to time cleanly,
but the routing decision must come from the number that matters: delivered
s-audio/s/chip through the full ODE->VAE->vocoder path (BENCH throughput
falls b8->b32 because of dense attention's O(B*H*L^2) score HBM traffic —
PARITY.md). This probe measures exactly that falloff with the kernel on/off.

Usage: python scripts/probe_flash_e2e.py [--batches 8,16,32]
Writes one JSON line per (batch, mode); run detached on the tunneled chip.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

if os.environ.get("MAA3_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")

LATENT_LEN = 312
CTX_LEN = 154
STEPS = 25


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="8,16,32")
    p.add_argument("--n", type=int, default=3)
    opt = p.parse_args()

    from maa3_tpu.utils import enable_compile_cache
    if jax.default_backend() != "cpu":
        enable_compile_cache()
    from maa3_tpu.models.dit import DiTConfig
    from maa3_tpu.models.vae1d import VAEConfig
    from maa3_tpu.models.bigvgan import BigVGANConfig
    from maa3_tpu.pipeline import T2APipeline
    from maa3_tpu.utils.nprand import (cast_matmul_weights, fuse_dit_gemms,
                                       unfreeze_zero_init)

    key = jax.random.PRNGKey(0)
    xl = DiTConfig(in_channels=20, context_dim=1024, hidden_size=1152,
                   depth=28, num_heads=16, max_len=1000)
    print(json.dumps({"metric": "flash_e2e_init_start"}), flush=True)
    pipe32 = T2APipeline.random_init(key, xl, VAEConfig(), BigVGANConfig(),
                                     compute_dtype=jnp.float32)
    pipe32.params["dit"] = unfreeze_zero_init(pipe32.params["dit"], key)
    params16 = dict(pipe32.params)
    params16["dit"] = fuse_dit_gemms(
        cast_matmul_weights(pipe32.params["dit"], jnp.bfloat16))
    del pipe32

    ctx1 = jax.random.normal(key, (1, CTX_LEN, 1024), jnp.float32)
    results = []
    for bsz in [int(s) for s in opt.batches.split(",")]:
        ctx = jnp.broadcast_to(ctx1, (bsz, CTX_LEN, 1024))
        uc = jnp.zeros_like(ctx)
        for flash in (False, True):
            cfg = dataclasses.replace(xl, fp32_residual=True,
                                      use_flash=flash)
            pipe = T2APipeline(cfg, VAEConfig(), BigVGANConfig(), params16,
                               compute_dtype=jnp.bfloat16)

            def run(k):
                return pipe.generate(ctx, uc, k, latent_len=LATENT_LEN,
                                     guidance_scale=5.0, steps=STEPS)[2]

            t0 = time.perf_counter()
            float(jnp.sum(run(jax.random.PRNGKey(99))))
            compile_s = time.perf_counter() - t0
            ts = []
            for i in range(opt.n):
                t0 = time.perf_counter()
                float(jnp.sum(run(jax.random.PRNGKey(100 + i))))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            med = ts[len(ts) // 2]
            row = {"metric": "flash_e2e", "batch": bsz, "flash": flash,
                   "p50_s": round(med, 4),
                   "throughput_sa_per_s": round(bsz * 10.0 / med, 1),
                   "compile_s": round(compile_s, 1)}
            results.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"metric": "flash_e2e_all", "rows": results}),
          flush=True)


if __name__ == "__main__":
    main()
