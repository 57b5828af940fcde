#!/usr/bin/env python
"""BigVGAN per-stage device-time breakdown at batch >= 4 (the serving
throughput shape), A/B-ing three narrow-stage routings per stage:

  fused  — the current batch>=4 auto: Pallas act->conv kernel on C<=192
           stages + Pallas one-pass AA-snake on wide stages
  unfold — the b1-winning path extended to batches: XLA AA-snake (poly
           sin^2 under bf16) + chunked unfold-GEMM convs (models/bigvgan.py
           _conv_site caps each lax.map chunk's im2col at 256 MB)
  xla    — stock lax.conv + XLA AA-snake (the no-tricks floor)

The b8 vocoder is ~30 % of batched serving time (VERDICT weak #3); this
probe decides the per-stage routing that replaces the single batch>=4 gate.
Each stage is chained ITERS times inside one jitted lax.scan and timed by
the 1-vs-3 program slope (cancels the ~30 ms axon RPC).

Usage: python scripts/probe_voc_batch_breakdown.py [--batch 8] [--routes ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import jax.numpy as jnp

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()

from maa3_tpu.models.bigvgan import (BigVGANConfig, bigvgan_init, _make_aa,
                                     _amp1_apply, _conv_site)
from maa3_tpu.ops.conv import conv1d, conv_transpose1d_polyphase

ITERS = int(os.environ.get("MAA3_ITERS", "4"))

# (use_pallas, fused_cutoff, unfold_cutoff, wide_unfold) per route
ROUTES = {
    "fused": (True, 192, 0, False),    # round-3 batch>=4 auto
    "unfold": (False, 0, 192, False),
    "xla": (False, 0, 0, False),
    "mix": (True, 192, 0, True),       # fused narrow + chunked-unfold wide
    # int8: this stage's resblock convs w8a8-quantized (forces the unfold
    # GEMM); Pallas one-pass AA for the snakes ("int8x": XLA AA instead)
    "int8": (True, 0, 0, False),
    "int8x": (False, 0, 0, False),
    # decomposition-only routes: convs without activations / acts without
    # convs (per-stage AA-vs-conv split; NOT a valid generator)
    "noaa": (False, 0, 0, False),
    "aaonly": (False, 0, 0, False),
    # Pallas one-pass AA + lax.conv on every stage; combine with
    # MAA3_AA_SNAKE_MXU=1 MAA3_PALLAS_AA_MAX_CH=9999 to probe the
    # banded-matmul FIR kernel (_kernel_mxu) at all widths
    "paa": (True, 0, 0, False),
    # the round-4 production mix: banded-FIR AA everywhere except the
    # C<=48 conv_snake stages, lax.conv for the rest
    "mix4": (True, 48, 0, False),
}


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
    # the weights into the program
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--routes", type=str, default="fused,unfold")
    ap.add_argument("--stages", type=str, default="0,1,2,3,4,5")
    opt = ap.parse_args()
    routes = [r for r in opt.routes.split(",") if r]
    stages = {int(s) for s in opt.stages.split(",")}

    key = jax.random.PRNGKey(0)
    cfg = BigVGANConfig()
    params = bigvgan_init(key, cfg)
    num_kernels = len(cfg.resblock_kernel_sizes)
    DT = jnp.bfloat16
    B = opt.batch

    res = {"iters": ITERS, "batch": B}
    ch = cfg.upsample_initial_channel
    t_len = 624
    totals = {r: 0.0 for r in routes}

    # conv_pre (80 -> 1536, k7) — one routing, always wide
    x = jax.random.normal(key, (B, cfg.num_mels, t_len), jnp.float32)
    t = program_time(chained_scalar_dep(
        lambda p, z: conv1d(p, z, padding=3, compute_dtype=DT)),
        (params["conv_pre"], x)) / ITERS
    res["conv_pre_ms"] = round(t * 1e3, 2)

    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        cin, cout = ch // (2 ** i), ch // (2 ** (i + 1))
        if i in stages:
            x = jax.random.normal(key, (B, cin, t_len), jnp.float32)
            t = program_time(chained_scalar_dep(
                lambda p, z, u=u, k=k: conv_transpose1d_polyphase(
                    p, z, stride=u, padding=(k - u) // 2,
                    compute_dtype=DT)),
                (params["ups"][i], x)) / ITERS
            res[f"up{i}_ms"] = round(t * 1e3, 2)
        t_len *= u
        if i not in stages:
            continue

        y = jax.random.normal(key, (B, cout, t_len), jnp.float32)
        rbs = [params["resblocks"][i * num_kernels + j]
               for j in range(num_kernels)]

        for route in routes:
            up, fc, uc, wu = ROUTES[route]
            rbl_in = rbs
            if route.startswith("int8"):
                from maa3_tpu.ops.conv import quantize_conv_int8
                rbl_in = [
                    {**rb,
                     "convs1": [quantize_conv_int8(c) for c in rb["convs1"]],
                     "convs2": [quantize_conv_int8(c) for c in rb["convs2"]]}
                    for rb in rbs]

            if route == "noaa":
                def stage(rbl, z, uc=uc):
                    for j in range(num_kernels):
                        kk = cfg.resblock_kernel_sizes[j]
                        for dd in cfg.resblock_dilation_sizes[j]:
                            z = _conv_site(rbl[j]["convs1"][0], z, kk, dd,
                                           DT, uc)
                    return z
            elif route == "aaonly":
                from maa3_tpu.models.bigvgan import _make_aa

                def stage(rbl, z):
                    aa = _make_aa(cfg, False, DT)
                    for j in range(num_kernels):
                        for i2, _ in enumerate(
                                cfg.resblock_dilation_sizes[j]):
                            z = aa(rbl[j]["acts"][2 * i2])(z)
                            z = aa(rbl[j]["acts"][2 * i2 + 1])(z)
                    return z
            else:
                def stage(rbl, z, up=up, fc=fc, uc=uc, wu=wu):
                    acc = None
                    for j in range(num_kernels):
                        kk = cfg.resblock_kernel_sizes[j]
                        dd = cfg.resblock_dilation_sizes[j]
                        o = _amp1_apply(rbl[j], z, kk, dd, cfg, DT, up, fc,
                                        uc, wu)
                        acc = o if acc is None else acc + o
                    return acc / num_kernels

            t = program_time(chained_same_shape(stage), (rbl_in, y)) / ITERS
            res[f"res{i}_{route}_ms"] = round(t * 1e3, 2)
            totals[route] += t
        res[f"res{i}_shape"] = [cout, t_len]
        print(json.dumps(res), flush=True)

    for r in routes:
        res[f"res_sum_{r}_ms"] = round(totals[r] * 1e3, 2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
