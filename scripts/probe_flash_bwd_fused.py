"""Op-level A/B of the fused single-pass flash backward vs the split
two-pass kernels vs XLA dense autodiff.

The split backward (commit 303d25c) runs two pallas_calls (dk/dv then dq),
each recomputing the score matrix and do·v^T — 7 (bq, bk)-sized matmuls per
block pair and two full HBM streams of q/do/k/v. The fused kernel computes
scores/dp ONCE and feeds dv, dk and dq in one pass (5 matmuls, one stream),
accumulating dq in a full-length fp32 output block. This probe measures the
attention-op VJP (fwd + bwd, the thing training pays under remat) at train
shapes for all three routes.

Usage: MAA3_PLATFORM=tpu python scripts/probe_flash_bwd_fused.py
Writes one JSON line; run detached on the tunneled chip (CLAUDE.md).
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

if os.environ.get("MAA3_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--head_dim", type=int, default=64)
    p.add_argument("--seqs", type=str, default="312,624,1248,2048,4096")
    p.add_argument("--dtype", type=str, default="bfloat16")
    opt = p.parse_args()

    from maa3_tpu.utils import enable_compile_cache
    if jax.default_backend() != "cpu":
        enable_compile_cache()
    from maa3_tpu.ops.flash_attention import flash_attention, _flash_pallas_bwd
    from _probe_util import slope_time

    dt = jnp.dtype(opt.dtype)
    b, h, d = opt.batch, opt.heads, opt.head_dim
    scale = 1.0 / math.sqrt(d)

    def dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p_ = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p_, v)

    rows = []
    for l in [int(s) for s in opt.seqs.split(",")]:
        key = jax.random.PRNGKey(0)
        q, k, v = (jax.random.normal(kk, (b, h, l, d), jnp.float32).astype(dt)
                   for kk in jax.random.split(key, 3))
        row = {"seq": l}
        for name, fn in (("dense", dense), ("flash", flash_attention)):
            loss = lambda a, bb, c: jnp.sum(
                fn(a, bb, c).astype(jnp.float32) ** 2)
            grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            ms = 1e3 * slope_time(lambda *xs: grad(*xs)[0], (q, k, v), n=7)
            row[f"grad_ms_{name}"] = round(ms, 3)
        # isolated backward kernels, fused vs split (same residuals)
        o = flash_attention(q, k, v)
        lse_fn = jax.jit(lambda q, k, v: _lse(q, k, v, scale))
        lse = lse_fn(q, k, v)
        mask = jnp.ones((b, l), jnp.int32)
        do = jax.random.normal(jax.random.PRNGKey(9), (b, h, l, d),
                               jnp.float32).astype(dt)
        for mode in ("fused", "split"):
            os.environ["MAA3_FLASH_BWD"] = mode
            bwd = jax.jit(lambda *xs: _flash_pallas_bwd(
                *xs, scale=scale, block_q=None, block_k=None,
                interpret=False)[0])
            ms = 1e3 * slope_time(bwd, (q, k, v, mask, o, lse, do), n=7)
            row[f"bwd_ms_{mode}"] = round(ms, 3)
        os.environ.pop("MAA3_FLASH_BWD", None)
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"metric": "flash_bwd_fused_vs_split", "batch": b, "heads": h,
           "head_dim": d, "dtype": opt.dtype, "rows": rows}
    print(json.dumps(out), flush=True)


def _lse(q, k, v, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    return jax.nn.logsumexp(s, axis=-1).reshape(
        q.shape[0] * q.shape[1], q.shape[2], 1)


if __name__ == "__main__":
    main()
