#!/usr/bin/env python
"""Where does the batched-serving falloff live? Per-component device time
(ODE / VAE decode / vocoder) for the XL pipeline at batch 1/8/16/32.

BENCH_r02 throughput_by_batch fell 66.0 -> 57.5 -> 48.7 s-audio/s/chip from
b8 to b32, and probe_flash_e2e showed the falloff persists with the flash
kernel OFF — so it is not attention-score HBM traffic (round-2 PARITY.md's
diagnosis). This probe decomposes the batched pipeline the way bench.py
stage 3 does at b1, using the shared 1-vs-3 slope estimator to cancel the
~30 ms axon RPC, and prints ms/clip per component so the super-linear stage
is unambiguous.

Run (detached, TPU):  setsid nohup python scripts/probe_batch_decompose.py \
    > /tmp/probe_batch_decomp.log 2>&1 &
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

from _probe_util import slope_time  # noqa: E402  (scripts/ on path via cwd)

from maa3_tpu.models.dit import DiTConfig
from maa3_tpu.models.vae1d import VAEConfig
from maa3_tpu.models.bigvgan import BigVGANConfig
from maa3_tpu.pipeline import T2APipeline
from maa3_tpu.utils.nprand import cast_matmul_weights, fuse_dit_gemms

LATENT_LEN = 312
CTX_LEN = 154
STEPS = 25
BATCHES = tuple(int(b) for b in os.environ.get(
    "MAA3_BATCHES", "1,8,16,32").split(","))


def main():
    import dataclasses

    key = jax.random.PRNGKey(0)
    xl = DiTConfig(in_channels=20, context_dim=1024, hidden_size=1152,
                   depth=28, num_heads=16, max_len=1000)
    print(json.dumps({"metric": "batch_decompose_init_start"}), flush=True)
    pipe32 = T2APipeline.random_init(key, xl, VAEConfig(), BigVGANConfig(),
                                     compute_dtype=jnp.float32)
    params16 = dict(pipe32.params)
    params16["dit"] = fuse_dit_gemms(
        cast_matmul_weights(pipe32.params["dit"], jnp.bfloat16))
    pipe = dataclasses.replace(
        pipe32, compute_dtype=jnp.bfloat16, params=params16,
        dit_cfg=dataclasses.replace(xl, fp32_residual=True))

    ctx1 = jax.random.normal(key, (1, CTX_LEN, 1024), jnp.float32)
    scale = jnp.float32(5.0)
    rows = []
    for b in BATCHES:
        t_start = time.time()
        ctx = jnp.broadcast_to(ctx1, (b,) + ctx1.shape[1:])
        uc = jnp.zeros_like(ctx)
        x0 = jax.random.normal(jax.random.PRNGKey(2),
                               (b, 20, LATENT_LEN), jnp.float32)
        row = {"metric": "batch_decompose", "batch": b}
        try:
            ode_t = slope_time(
                lambda x: pipe._sample_latent(pipe.params, x, ctx, uc,
                                              scale, STEPS), (x0,), n=5)
            z1 = pipe._sample_latent(pipe.params, x0, ctx, uc, scale, STEPS)
            dec_t = slope_time(
                lambda z: pipe._decode_mel(pipe.params, z), (z1,), n=5)
            mel1 = pipe._decode_mel(pipe.params, z1)
            voc_t = slope_time(
                lambda m: pipe._vocode(pipe.params, m), (mel1,), n=5)
            tot = ode_t + dec_t + voc_t
            row.update({
                "ode_ms": round(ode_t * 1e3, 1),
                "vae_ms": round(dec_t * 1e3, 1),
                "voc_ms": round(voc_t * 1e3, 1),
                "ode_ms_per_clip": round(ode_t * 1e3 / b, 2),
                "vae_ms_per_clip": round(dec_t * 1e3 / b, 2),
                "voc_ms_per_clip": round(voc_t * 1e3 / b, 2),
                "sum_ms_per_clip": round(tot * 1e3 / b, 2),
                "implied_tput_sa_per_s": round(b * 10.0 / tot, 1),
                "wall_s": round(time.time() - t_start, 1),
            })
        except Exception as e:
            row["error"] = repr(e)[:300]
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"metric": "batch_decompose_all", "steps": STEPS,
                      "latent_len": LATENT_LEN, "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
