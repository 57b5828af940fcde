#!/usr/bin/env python
"""BigVGAN per-stage device-time breakdown at batch 1 (the serving shape).

Each stage's resblock group is chained ITERS times inside one jitted
lax.scan (output feeds input — same (C, T) shape) and the 1-vs-3 program
slope divides out the ~30 ms axon RPC. The up-convs change shape, so they
are timed as a chained scan over a scalar-perturbed input instead.

Decides where the remaining vocoder headroom is: the wide early stages
(C 768/384 — MXU-friendly GEMMs) vs the narrow late stages (C <= 96 —
lane-starved convs) vs the AA-snake activations.
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

from maa3_tpu.models.bigvgan import (BigVGANConfig, bigvgan_init, _make_aa,
                                     _amp1_apply)
from maa3_tpu.ops.conv import conv1d, conv_transpose1d_polyphase

ITERS = int(os.environ.get("MAA3_ITERS", "8"))


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


def chained_same_shape(apply_fn):
    # params are an explicit jit argument — closing over them would bake
    # the weights into the program (413s from the remote-compile tunnel)
    @jax.jit
    def run(p, x):
        def body(c, _):
            o = apply_fn(p, c)
            return o.astype(c.dtype), None
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c
    return run


def chained_scalar_dep(apply_fn):
    @jax.jit
    def run(p, x):
        def body(c, _):
            o = apply_fn(p, x * (1.0 + 1e-9 * c))
            return jnp.mean(o).astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c
    return run


def main():
    key = jax.random.PRNGKey(0)
    cfg = BigVGANConfig()
    params = bigvgan_init(key, cfg)
    num_kernels = len(cfg.resblock_kernel_sizes)
    DT = jnp.bfloat16  # serving compute dtype

    res = {"iters": ITERS}
    ch = cfg.upsample_initial_channel
    t_len = 624
    total = 0.0

    # conv_pre (80 -> 1536, k7)
    x = jax.random.normal(key, (1, cfg.num_mels, t_len), jnp.float32)
    t = program_time(chained_scalar_dep(
        lambda p, z: conv1d(p, z, padding=3, compute_dtype=DT)),
        (params["conv_pre"], x)) / ITERS
    res["conv_pre_ms"] = round(t * 1e3, 2)
    total += t

    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        cin, cout = ch // (2 ** i), ch // (2 ** (i + 1))
        x = jax.random.normal(key, (1, cin, t_len), jnp.float32)
        t = program_time(chained_scalar_dep(
            lambda p, z, u=u, k=k: conv_transpose1d_polyphase(
                p, z, stride=u, padding=(k - u) // 2,
                compute_dtype=DT)),
            (params["ups"][i], x)) / ITERS
        res[f"up{i}_ms"] = round(t * 1e3, 2)
        total += t
        t_len *= u

        y = jax.random.normal(key, (1, cout, t_len), jnp.float32)

        def stage(rbs, z):
            acc = None
            for j in range(num_kernels):
                kk = cfg.resblock_kernel_sizes[j]
                dd = cfg.resblock_dilation_sizes[j]
                o = _amp1_apply(rbs[j], z, kk, dd, cfg, DT, False, 0)
                acc = o if acc is None else acc + o
            return acc / num_kernels

        rbs = [params["resblocks"][i * num_kernels + j]
               for j in range(num_kernels)]
        t = program_time(chained_same_shape(stage), (rbs, y)) / ITERS
        res[f"res{i}_ms"] = round(t * 1e3, 2)
        res[f"res{i}_shape"] = [cout, t_len]
        total += t
        print(json.dumps(res), flush=True)

    res["sum_ms"] = round(total * 1e3, 2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
