"""Serving-shape probe: Pallas flash fwd vs XLA dense SDPA at XL attention
shapes (h=16, d=72, seq 312/624/1248) across batch 8/16/32.

This is the evidence for the batched-serving flash routing: XLA dense
attention materializes O(B·H·L²) score/prob buffers in HBM, which is what
makes BENCH throughput fall from b8 to b32 (PARITY.md); the flash kernel
keeps scores in VMEM. Measures per-call time of ONE attention op (self-attn
only, bf16 inputs) via the 1-vs-3 slope trick.

Usage: MAA3_PLATFORM=tpu python scripts/probe_flash_serve.py
Writes one JSON line per shape; run detached on the tunneled chip.
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

if os.environ.get("MAA3_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--head_dim", type=int, default=72)
    p.add_argument("--seqs", type=str, default="312,624,1248")
    p.add_argument("--batches", type=str, default="8,16,32")
    p.add_argument("--dtype", type=str, default="bfloat16")
    opt = p.parse_args()

    from maa3_tpu.utils import enable_compile_cache
    if jax.default_backend() != "cpu":
        enable_compile_cache()
    from maa3_tpu.ops.attention import _sdpa
    from maa3_tpu.ops.flash_attention import flash_attention
    from _probe_util import slope_time, chained

    dt = jnp.dtype(opt.dtype)
    h, d = opt.heads, opt.head_dim
    scale = 1.0 / math.sqrt(d)
    results = []
    for seq in [int(s) for s in opt.seqs.split(",")]:
        for b in [int(s) for s in opt.batches.split(",")]:
            key = jax.random.PRNGKey(0)
            # (B, L, H, D) is what attention_apply holds; flash transposes
            q = jax.random.normal(key, (b, seq, h, d), dt)
            k = jax.random.normal(key, (b, seq, h, d), dt)
            v = jax.random.normal(key, (b, seq, h, d), dt)

            # chained scans: ITERS back-to-back applications per dispatch,
            # so tunnel RPC jitter is amortized 1/ITERS per call
            ITERS = 20
            dense = chained(lambda k, v, q: _sdpa(q, k, v, scale, None),
                            ITERS)
            flash = chained(lambda k, v, q: flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), scale=scale).transpose(0, 2, 1, 3),
                ITERS)
            # bare kernel: inputs already (B, H, L, D) — isolates the
            # XLA transpose cost around the kernel from the kernel itself
            qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
            bare = chained(lambda k, v, q: flash_attention(
                q, k, v, scale=scale), ITERS)

            row = {"metric": "flash_serve", "b": b, "h": h, "seq": seq,
                   "d": d, "dtype": opt.dtype,
                   "score_mib": round(b * h * seq * seq * 2 / 2**20, 1)}
            for name, fn, ops in (("dense", dense, (k, v, q)),
                                  ("flash", flash, (k, v, q)),
                                  ("bare", bare, (kt, vt, qt))):
                t0 = time.time()
                float(jnp.sum(fn(*ops)))
                row[f"compile_{name}_s"] = round(time.time() - t0, 1)
                row[f"{name}_ms"] = round(1e3 * slope_time(
                    lambda a: fn(ops[0], ops[1], a), (ops[2],), n=7) / ITERS,
                    3)
            row["flash_speedup"] = (
                round(row["dense_ms"] / row["flash_ms"], 3)
                if row["flash_ms"] > 0 else None)
            results.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"metric": "flash_serve_all", "rows": results}),
          flush=True)


if __name__ == "__main__":
    main()
