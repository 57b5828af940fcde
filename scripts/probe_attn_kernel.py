#!/usr/bin/env python
"""Standalone attention timing at XL serving shapes: materialized-score SDPA
vs the Pallas flash kernel at several block configurations. Sub-ms kernels
cannot be timed individually through the ~30 ms axon RPC tunnel, so each
measurement chains ITERS data-dependent attention calls inside one jitted
lax.scan (output feeds the next query) and divides.

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
ITERS = 50


def program_time(fn, args, n=5):
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


def chained(attn_fn):
    @jax.jit
    def run(q, k, v):
        def body(c, _):
            o = attn_fn(c, k, v)
            return (o * 2.0).astype(jnp.bfloat16), None
        c, _ = jax.lax.scan(body, q, None, length=ITERS)
        return c
    return run


def main():
    key = jax.random.PRNGKey(0)
    out = {}
    for b in (4, 32, 64):
        q = jax.random.normal(key, (b, H, T, D), jnp.bfloat16)
        k = jax.random.normal(key, (b, H, T, D), jnp.bfloat16)
        v = jax.random.normal(key, (b, H, T, D), jnp.bfloat16)
        row = {"sdpa_us": round(
            program_time(chained(sdpa), (q, k, v)) / ITERS * 1e6, 1)}
        for bq, bk in ((128, 128), (384, 384), (192, 384), (96, 384)):
            fn = chained(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                q, k, v, scale=SCALE, block_q=bq, block_k=bk))
            try:
                row[f"flash_{bq}x{bk}_us"] = round(
                    program_time(fn, (q, k, v)) / ITERS * 1e6, 1)
            except Exception as e:
                row[f"flash_{bq}x{bk}_error"] = repr(e)[:120]
        out[b] = row
        print(json.dumps({b: row}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
