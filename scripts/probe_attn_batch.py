#!/usr/bin/env python
"""Localize the ODE's super-linear batch scaling: time ONE XL DiT forward
at growing (dual-CFG) batch with the default materialized-score attention
vs the Pallas flash kernel. If scores' O(B H T^2) HBM traffic is the cause,
flash should cross over at large batch even at seq 312.

Usage: MAA3_DUALS=2,16,32,64 python scripts/probe_attn_batch.py
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

from maa3_tpu.models.dit import DiTConfig, dit_init, dit_apply
from maa3_tpu.utils.nprand import cast_matmul_weights, fuse_dit_gemms

T = 312


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
    duals = [int(b) for b in os.environ.get("MAA3_DUALS", "2,16,32,64").split(",")]
    key = jax.random.PRNGKey(0)
    base = DiTConfig(in_channels=20, context_dim=1024, hidden_size=1152,
                     depth=28, num_heads=16, max_len=1000)
    print(f"[{time.strftime('%H:%M:%S')}] init...", file=sys.stderr, flush=True)
    params = fuse_dit_gemms(cast_matmul_weights(dit_init(key, base),
                                                jnp.bfloat16))
    out = {"seq": T, "per_dual_batch": {}}
    for b in duals:
        x = jax.random.normal(key, (b, 20, T), jnp.float32)
        t = jnp.full((b,), 500, jnp.int32)
        ctx = jax.random.normal(key, (b, 154, 1024), jnp.float32)
        row = {}
        for name, flash in (("sdpa", False), ("flash", True)):
            cfg = DiTConfig(**{**base.__dict__, "use_flash": flash})

            @jax.jit
            def fwd(p, x, t, ctx, cfg=cfg):
                return dit_apply(p, cfg, x, t, ctx,
                                 compute_dtype=jnp.bfloat16)

            try:
                dt = component_time(fwd, (params, x, t, ctx))
                row[name + "_ms"] = round(dt * 1e3, 2)
                row[name + "_ms_per_item"] = round(dt * 1e3 / b, 3)
            except Exception as e:
                row[name + "_error"] = repr(e)[:150]
        out["per_dual_batch"][b] = row
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
