#!/usr/bin/env python
"""Standalone attention timing at XL serving shapes: materialized-score SDPA
vs the Pallas flash kernel at several block configurations. The goal: find a
config where scores never touch HBM without the 128x128 blocking overhead
that makes flash 2.2x slower than SDPA at seq 312.

Shapes: (B_dual, H=16, T=312, D=72)."""

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

from maa3_tpu.ops.flash_attention import flash_attention

H, T, D = 16, 312, 72
SCALE = 1.0 / (D ** 0.5)


def component_time(fn, args, n=7):
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


def sdpa(q, k, v):
    # mirrors ops/attention.py::_sdpa bf16-score path
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * SCALE
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def main():
    key = jax.random.PRNGKey(0)
    out = {}
    for b in (4, 32, 64):
        q = jax.random.normal(key, (b, H, T, D), jnp.bfloat16)
        k = jax.random.normal(key, (b, H, T, D), jnp.bfloat16)
        v = jax.random.normal(key, (b, H, T, D), jnp.bfloat16)
        row = {"sdpa_ms": round(component_time(jax.jit(sdpa), (q, k, v)) * 1e3, 3)}
        for bq, bk in ((128, 128), (384, 384), (384, 128), (192, 384),
                       (96, 384)):
            fn = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                q, k, v, scale=SCALE, block_q=bq, block_k=bk))
            try:
                row[f"flash_{bq}x{bk}_ms"] = round(
                    component_time(fn, (q, k, v)) * 1e3, 3)
            except Exception as e:
                row[f"flash_{bq}x{bk}_error"] = repr(e)[:120]
        out[b] = row
        print(json.dumps({b: row}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
