#!/usr/bin/env python
"""Pinpoint the narrow-stage vocoder cost at batch 1: time ONE dilated conv
(XLA lax.conv vs an explicit unfold+GEMM lowering), ONE AA-snake activation,
and one full k=11 AMP dilation site, at the res3/res4/res5 shapes. Chained
inside lax.scan to cancel the axon RPC. Decides whether the 12-16 ms/stage
goes to lane-starved convs (fixable by re-lowering) or to the activations.
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

from maa3_tpu.models.bigvgan import BigVGANConfig, _act_init, _make_aa
from maa3_tpu.ops.conv import conv1d, conv1d_init

ITERS = int(os.environ.get("MAA3_ITERS", "16"))
DT = jnp.bfloat16


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


def chained(apply_fn):
    @jax.jit
    def run(p, x):
        def body(c, _):
            return apply_fn(p, c).astype(c.dtype), None
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c
    return run


def conv1d_unfold_gemm(params, x, dilation: int, padding: int,
                       compute_dtype=None) -> jax.Array:
    """Stride-1 dilated conv lowered as explicit unfold + one GEMM:
    (C_out, C_in*k) x (C_in*k, T). Keeps T on the 128-lane axis for
    narrow-channel stages where the stock conv lowering starves the MXU."""
    w, b = params["w"], params.get("b")
    c_out, c_in, k = w.shape
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    t = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)))
    cols = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(xp, j * dilation, t, axis=2)
         for j in range(k)], axis=1)                     # (B, C_in*k, T)
    y = jnp.einsum("oc,bct->bot",
                   w.transpose(0, 2, 1).reshape(c_out, k * c_in), cols,
                   preferred_element_type=jnp.float32).astype(
        x.dtype if compute_dtype is None else compute_dtype)
    if b is not None:
        y = y + b.astype(y.dtype)[None, :, None]
    return y


def main():
    key = jax.random.PRNGKey(0)
    cfg = BigVGANConfig()
    aa = _make_aa(cfg, use_pallas=False)
    out = {"iters": ITERS}

    for C, T in ((192, 19968), (96, 39936), (48, 79872), (24, 159744)):
        x = jax.random.normal(key, (1, C, T), jnp.float32)
        cp = conv1d_init(key, C, C, 11)
        act = _act_init(C, cfg)
        row = {}

        pad = (11 - 1) * 5 // 2  # k=11, d=5 site
        row["conv_k11d5_lax_ms"] = round(program_time(
            chained(lambda p, z: conv1d(p, z, padding=pad, dilation=5,
                                        compute_dtype=DT)),
            (cp, x)) / ITERS * 1e3, 3)
        row["conv_k11d5_unfold_ms"] = round(program_time(
            chained(lambda p, z: conv1d_unfold_gemm(p, z, 5, pad,
                                                    compute_dtype=DT)),
            (cp, x)) / ITERS * 1e3, 3)
        # correctness spot-check of the relowering
        import numpy as np
        a = np.asarray(conv1d(cp, x, padding=pad, dilation=5), np.float32)
        bb = np.asarray(conv1d_unfold_gemm(cp, x, 5, pad), np.float32)
        row["unfold_rel_err"] = float(np.abs(a - bb).max() /
                                      (np.abs(a).max() + 1e-9))

        row["aa_snake_ms"] = round(program_time(
            chained(lambda p, z: aa(p)(z)), (act, x)) / ITERS * 1e3, 3)
        out[f"C{C}_T{T}"] = row
        print(json.dumps({f"C{C}_T{T}": row}), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
