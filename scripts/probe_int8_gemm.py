#!/usr/bin/env python
"""Does XLA hit the v5e's 2x int8 MXU path? Times the XL block GEMM shapes
(dual-batch token dim M=624) in bf16 vs int8(->int32) vs int8 with
per-token dynamic activation quantization fused in. Prints JSON."""

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


def main():
    key = jax.random.PRNGKey(0)
    out = {}
    # XL block GEMMs at serving batch 1 (dual 2x312 tokens) and batch 16
    for M in (624, 9984):
        for K, N in ((1152, 3456), (1152, 1152), (1152, 6144), (3072, 1152)):
            a16 = jax.random.normal(key, (M, K), jnp.bfloat16)
            w16 = jax.random.normal(key, (K, N), jnp.bfloat16)
            a8 = (a16 * 10).astype(jnp.int8)
            w8 = (w16 * 10).astype(jnp.int8)
            wscale = jnp.abs(jax.random.normal(key, (N,), jnp.float32))

            @jax.jit
            def f16(a, w):
                return jax.lax.dot(a, w,
                                   preferred_element_type=jnp.float32)

            @jax.jit
            def f8(a, w):
                return jax.lax.dot(a, w,
                                   preferred_element_type=jnp.int32)

            @jax.jit
            def f8_dynamic(a, w, ws):
                # per-token dynamic activation quant + dequant epilogue —
                # the full w8a8 serving recipe
                amax = jnp.max(jnp.abs(a), axis=1, keepdims=True)
                s = jnp.maximum(amax, 1e-6) / 127.0
                aq = jnp.clip(jnp.round(a.astype(jnp.float32) / s),
                              -127, 127).astype(jnp.int8)
                acc = jax.lax.dot(aq, w, preferred_element_type=jnp.int32)
                return acc.astype(jnp.float32) * s * ws[None, :]

            tag = f"M{M}_K{K}_N{N}"
            out[tag] = {
                "bf16_us": round(component_time(f16, (a16, w16)) * 1e6, 1),
                "int8_us": round(component_time(f8, (a8, w8)) * 1e6, 1),
                "int8_dyn_us": round(
                    component_time(f8_dynamic, (a16, w8, wscale)) * 1e6, 1),
            }
            print(json.dumps({tag: out[tag]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
