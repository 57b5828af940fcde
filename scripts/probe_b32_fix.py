#!/usr/bin/env python
"""Attack the named b16/b32 ODE falloff (PROBE_B32_TRACE_r05).

The device trace decomposed the +58 ms/clip b8->b32 falloff into:
  +28 ms/clip attention score/probs/output-dot + softmax HBM traffic
  +12 ms/clip fp32-residual converts/copies ([B,312,1152] f32 per block)
  + 9 ms/clip RoPE pair materializations ([B,312,16,36,*] stacks)
  + 5 ms/clip per-step context dynamic-slice
all HBM-bound. Two existing config levers directly remove classes of this
traffic: use_flash=True (one-pass attention, no materialized scores/probs)
and fp32_residual=False (bf16 residual stream, half the convert/copy
bytes). This probe times the 25-step XL ODE at b8/16/32 for the four
combinations and reports implied serving throughput per variant.

Run (detached, TPU):  setsid nohup python scripts/probe_b32_fix.py \
    > /tmp/probe_b32_fix.log 2>&1 &
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import jax.numpy as jnp

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()

from _probe_util import slope_time  # noqa: E402

from maa3_tpu.models.dit import DiTConfig
from maa3_tpu.models.vae1d import VAEConfig
from maa3_tpu.models.bigvgan import BigVGANConfig
from maa3_tpu.pipeline import T2APipeline
from maa3_tpu.utils.nprand import cast_matmul_weights, fuse_dit_gemms

LATENT_LEN = 312
CTX_LEN = 154
STEPS = 25
BATCHES = tuple(int(b) for b in os.environ.get(
    "MAA3_BATCHES", "8,16,32").split(","))
VARIANTS = {
    "base": dict(fp32_residual=True, use_flash=None),
    "flash": dict(fp32_residual=True, use_flash=True),
    "bf16res": dict(fp32_residual=False, use_flash=None),
    "flash_bf16res": dict(fp32_residual=False, use_flash=True),
}
OUT = os.environ.get("MAA3_PROBE_OUT", "PROBE_B32_FIX_r05.json")


def main():
    key = jax.random.PRNGKey(0)
    xl = DiTConfig(in_channels=20, context_dim=1024, hidden_size=1152,
                   depth=28, num_heads=16, max_len=1000)
    pipe32 = T2APipeline.random_init(key, xl, VAEConfig(), BigVGANConfig(),
                                     compute_dtype=jnp.float32)
    params16 = dict(pipe32.params)
    params16["dit"] = fuse_dit_gemms(
        cast_matmul_weights(pipe32.params["dit"], jnp.bfloat16))

    ctx1 = jax.random.normal(key, (1, CTX_LEN, 1024), jnp.float32)
    scale = jnp.float32(5.0)
    results = {"metric": "b32_fix", "steps": STEPS,
               "latent_len": LATENT_LEN, "rows": []}
    names = [n for n in os.environ.get(
        "MAA3_VARIANTS", ",".join(VARIANTS)).split(",") if n]
    for name in names:
        kw = VARIANTS[name]
        pipe = dataclasses.replace(
            pipe32, compute_dtype=jnp.bfloat16, params=params16,
            dit_cfg=dataclasses.replace(xl, **kw))
        for b in BATCHES:
            t0 = time.time()
            ctx = jnp.broadcast_to(ctx1, (b,) + ctx1.shape[1:])
            uc = jnp.zeros_like(ctx)
            x0 = jax.random.normal(jax.random.PRNGKey(2),
                                   (b, 20, LATENT_LEN), jnp.float32)
            row = {"variant": name, "batch": b}
            try:
                ode_t = slope_time(
                    lambda x: pipe._sample_latent(pipe.params, x, ctx, uc,
                                                  scale, STEPS), (x0,), n=5)
                row.update({
                    "ode_ms": round(ode_t * 1e3, 1),
                    "ode_ms_per_clip": round(ode_t * 1e3 / b, 2),
                    "implied_ode_tput": round(b * 10.0 / ode_t, 1),
                    "wall_s": round(time.time() - t0, 1),
                })
            except Exception as e:
                row["error"] = repr(e)[:300]
            results["rows"].append(row)
            print(json.dumps(row), flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"metric": "b32_fix_done", "out": OUT}), flush=True)


if __name__ == "__main__":
    main()
