#!/usr/bin/env python
"""Load-test the serving daemon: sustained throughput under concurrent
clients through the real HTTP + micro-batching path.

Spins an in-process AudioServer (random weights — latency is
value-independent), fires --requests requests from --clients concurrent
client threads, and reports sustained secs-of-audio/sec plus request
latency percentiles and the realized batch histogram. Complements bench.py
(single-stream + fixed-batch device numbers) with the end-to-end serving
number a deployment actually sees.

  MAA3_BENCH_BUDGET_S: not used here; the warmup compiles (bucket 1 + max
  batch) are the slow part on a cold cache.

  python scripts/bench_serve.py -b configs/txt2audio-cfm-cfg-XL.yaml \
      --clients 16 --requests 64 --quant int8
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", type=str, default="")
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--reps", type=int, default=1,
                   help="repeat the request storm N times (one warmup); "
                        "each rep reports separately plus a spread summary "
                        "— makes run-to-run variance visible INSIDE one "
                        "artifact (round-5 serve-bench hardening)")
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--window_ms", type=float, default=30.0)
    p.add_argument("--fp32", action="store_true",
                   help="deprecated alias for --precision fp32")
    p.add_argument("--precision", type=str, default="bf16",
                   choices=["bf16", "fp32", "fp32_highest"],
                   help="serving numerics (see scripts/serve.py --precision)")
    p.add_argument("--quant", type=str, default="",
                   help="int8 | int8:g128 | int8:now2 | int8:g128,now2")
    p.add_argument("--out", type=str, default="",
                   help="append the result JSON line to this file "
                        "(per-mode artifact, e.g. BENCH_SERVE_r03.json)")
    return p.parse_args()


def main():
    opt = parse_args()

    import jax.numpy as jnp
    from maa3_tpu.system import MAA3System
    from maa3_tpu.serving import AudioServer, ServeConfig

    cfg_paths = [c for c in opt.base.split(",") if c] or [
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "txt2audio-cfm-cfg.yaml")]
    precision = "fp32" if opt.fp32 else opt.precision
    if opt.quant and precision != "bf16":
        sys.exit("--quant int8 composes with --precision bf16 only")
    if precision == "fp32_highest":
        jax.config.update("jax_default_matmul_precision", "highest")
    system = MAA3System.from_config(
        cfg_paths,
        compute_dtype=jnp.bfloat16 if precision == "bf16" else jnp.float32)
    if opt.quant:
        system.set_serving_quant(opt.quant)

    server = AudioServer(system, ServeConfig(
        max_batch=opt.max_batch, batch_window_ms=opt.window_ms,
        default_steps=opt.steps, default_scale=opt.scale))
    server.start()
    # warm EVERY power-of-two bucket <= max_batch: with few concurrent
    # clients the micro-batcher forms mid-size batches (e.g. 4 clients ->
    # bucket 4), and a cold mid-bucket compile lands on a measured request
    # (observed: 168 s p95 from one cold bucket-4 hit)
    buckets, b = [], 1
    while b < opt.max_batch:
        buckets.append(b)
        b *= 2
    buckets.append(opt.max_batch)
    print(f"[bench_serve] warmup buckets {tuple(buckets)}...",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    server.batcher.warmup(tuple(buckets), steps=opt.steps)
    print(f"[bench_serve] warm in {time.perf_counter() - t0:.1f}s; "
          f"firing {opt.requests} requests from {opt.clients} clients",
          file=sys.stderr, flush=True)

    def storm():
        lock = threading.Lock()
        latencies = []
        audio_s = [0.0]
        next_id = [0]
        served_before = server.batcher.stats()["served"]

        def client():
            while True:
                with lock:
                    if next_id[0] >= opt.requests:
                        return
                    i = next_id[0]
                    next_id[0] += 1
                body = json.dumps({"prompt": f"load test prompt {i}",
                                   "steps": opt.steps,
                                   "scale": opt.scale}).encode()
                req = urllib.request.Request(
                    f"http://127.0.0.1:{server.port}/generate", data=body,
                    headers={"Content-Type": "application/json"})
                t = time.perf_counter()
                with urllib.request.urlopen(req, timeout=600) as r:
                    data = r.read()
                dt = time.perf_counter() - t
                with lock:
                    latencies.append(dt)
                    audio_s[0] += (len(data) - 44) / 2 / 16000.0

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client)
                   for _ in range(opt.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        latencies.sort()
        return {
            "value": round(audio_s[0] / wall, 2),
            "wall_s": round(wall, 2),
            "request_p50_s": round(latencies[len(latencies) // 2], 4),
            "request_p95_s": round(latencies[int(len(latencies) * 0.95)], 4),
            "served": server.batcher.stats()["served"] - served_before,
        }

    reps = [storm() for _ in range(opt.reps)]
    stats = server.batcher.stats()
    hist = {k: v for k, v in stats["batch_histogram"].items()}
    vals = [r["value"] for r in reps]
    out = {
        "metric": "serve_sustained_secs_audio_per_sec",
        "value": round(sum(vals) / len(vals), 2),
        "unit": "s-audio/s",
        "requests": opt.requests,
        "clients": opt.clients,
        "steps": opt.steps,
        "wall_s": round(sum(r["wall_s"] for r in reps), 2),
        "request_p50_s": reps[-1]["request_p50_s"],
        "request_p95_s": max(r["request_p95_s"] for r in reps),
        "served_total": sum(r["served"] for r in reps),
        "batch_histogram": hist,
        "mode": opt.quant or precision,
        "config": os.path.basename(cfg_paths[0]),
    }
    if opt.reps > 1:
        out["reps"] = reps
        out["rep_spread_pct"] = round(
            100.0 * (max(vals) - min(vals)) / max(sum(vals) / len(vals),
                                                  1e-9), 1)
    print(json.dumps(out), flush=True)
    if opt.out:
        with open(opt.out, "a") as f:
            f.write(json.dumps(out) + "\n")
    server.shutdown()


if __name__ == "__main__":
    main()
