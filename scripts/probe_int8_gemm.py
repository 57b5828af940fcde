#!/usr/bin/env python
"""Does XLA hit the v5e's 2x int8 MXU path? Single sub-ms GEMMs cannot be
timed through the ~30 ms axon RPC tunnel, so each measurement chains ITERS
data-dependent GEMMs inside one jitted lax.scan and divides: per-GEMM time
is (t_program / ITERS), with the dispatch/fetch overhead cancelled by a
1-vs-3 program slope on top. Prints JSON with per-GEMM microseconds."""

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

ITERS = 100


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


def main():
    key = jax.random.PRNGKey(0)
    out = {}
    for M in (624, 9984):
        for K in (1152, 3456):
            a16 = jax.random.normal(key, (M, K), jnp.bfloat16) * 0.1
            w16 = jax.random.normal(key, (K, K), jnp.bfloat16) * 0.03
            a8 = (a16 * 100).astype(jnp.int8)
            w8 = (w16 * 40).astype(jnp.int8)

            @jax.jit
            def chain_bf16(a, w):
                def body(c, _):
                    c = jax.lax.dot(c, w,
                                    preferred_element_type=jnp.float32)
                    return (c * 0.03).astype(jnp.bfloat16), None
                c, _ = jax.lax.scan(body, a, None, length=ITERS)
                return c

            @jax.jit
            def chain_int8(a, w):
                def body(c, _):
                    acc = jax.lax.dot(c, w,
                                      preferred_element_type=jnp.int32)
                    return jnp.clip(acc >> 6, -127, 127).astype(jnp.int8), None
                c, _ = jax.lax.scan(body, a, None, length=ITERS)
                return c

            @jax.jit
            def chain_int8_dyn(a, w):
                # bf16 carry; per-token dynamic quant + int8 dot + dequant —
                # the full w8a8 serving recipe per GEMM
                def body(c, _):
                    amax = jnp.max(jnp.abs(c), axis=1, keepdims=True)
                    s = jnp.maximum(amax.astype(jnp.float32), 1e-6) / 127.0
                    q = jnp.clip(jnp.round(c.astype(jnp.float32) / s),
                                 -127, 127).astype(jnp.int8)
                    acc = jax.lax.dot(q, w,
                                      preferred_element_type=jnp.int32)
                    c = (acc.astype(jnp.float32) * s * 3e-4)
                    return c.astype(jnp.bfloat16), None
                c, _ = jax.lax.scan(body, a, None, length=ITERS)
                return c

            tag = f"M{M}_KN{K}"
            row = {}
            for name, fn, args in (("bf16", chain_bf16, (a16, w16)),
                                   ("int8", chain_int8, (a8, w8)),
                                   ("int8_dyn", chain_int8_dyn, (a16, w8))):
                t = program_time(fn, args)
                row[name + "_us_per_gemm"] = round(t / ITERS * 1e6, 2)
            flops = 2.0 * M * K * K
            row["bf16_tflops"] = round(
                flops / (row["bf16_us_per_gemm"] * 1e-6) / 1e12, 1)
            row["int8_tops"] = round(
                flops / (row["int8_us_per_gemm"] * 1e-6) / 1e12, 1)
            out[tag] = row
            print(json.dumps({tag: row}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
