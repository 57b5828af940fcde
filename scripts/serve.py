#!/usr/bin/env python
"""Text-to-audio serving daemon: micro-batching HTTP server over the
serving fast path (planned CFG ODE, bf16/int8 GEMMs, optional TP mesh).

The reference has no online serving story (only offline CLIs,
scripts/txt2audio_for_2cap_flow.py); this is the deployment entry point.

  python scripts/serve.py -b configs/txt2audio-cfm-cfg-XL.yaml -r model.ckpt \
      --vocoder-ckpt vocoder/ --quant int8 --port 8000 --warmup 1,8

  curl -X POST localhost:8000/generate -d '{"prompt": "a dog barks"}' \
      -o dog.wav
  curl localhost:8000/healthz

Concurrent requests arriving within --window_ms coalesce into one batched
ODE launch (one v5e sustains ~66 s-audio/s at batch 8 vs ~50 at batch 1).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

if os.environ.get("MAA3_PLATFORM"):
    # the axon sitecustomize overrides JAX_PLATFORMS; this is the off switch
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("-b", "--base", type=str, default="",
                   help="comma-separated config yamls")
    p.add_argument("-r", "--resume", type=str, default="",
                   help="torch .ckpt or Orbax dir to load")
    p.add_argument("--vocoder-ckpt", type=str, default="")
    p.add_argument("--tokenizer_dir", type=str, default="")
    p.add_argument("--fp32", action="store_true",
                   help="deprecated alias for --precision fp32")
    p.add_argument("--precision", type=str, default="bf16",
                   choices=["bf16", "fp32", "fp32_highest"],
                   help="serving numerics: bf16 fast mode (default), fp32 "
                        "parity mode (TPU-default matmuls: bf16 MXU passes "
                        "with fp32 accumulation), or fp32_highest (6-pass "
                        "fp32 matmul emulation — the mode that reproduces "
                        "reference fp32 math bit-closely, ~4x slower)")
    p.add_argument("--quant", type=str, default="",
                   help="int8 w8a8 per-step DiT GEMMs (~19%% faster ODE); "
                        "composes with --precision bf16 only")
    p.add_argument("--n_model", type=int, default=1,
                   help="tensor-parallel serving over n_model chips")
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--window_ms", type=float, default=30.0)
    p.add_argument("--warmup", type=str, default="1",
                   help="comma-separated batch buckets to compile before "
                        "accepting traffic ('' to skip); e.g. 1,8")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    opt = parse_args()

    import jax.numpy as jnp
    from maa3_tpu.system import MAA3System
    from maa3_tpu.serving import AudioServer, ServeConfig

    cfg_paths = [c for c in opt.base.split(",") if c] or [
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "txt2audio-cfm-cfg.yaml")]
    if opt.tokenizer_dir:
        os.environ["MAA3_TOKENIZER_DIR"] = opt.tokenizer_dir
    precision = "fp32" if opt.fp32 else opt.precision
    if opt.quant and precision != "bf16":
        sys.exit("--quant int8 composes with --precision bf16 only")
    if precision == "fp32_highest":
        jax.config.update("jax_default_matmul_precision", "highest")
    system = MAA3System.from_config(
        cfg_paths, ckpt_path=opt.resume or None,
        vocoder_dir=opt.vocoder_ckpt or None, seed=opt.seed,
        compute_dtype=jnp.bfloat16 if precision == "bf16" else jnp.float32)
    if opt.n_model > 1:
        from maa3_tpu.parallel.mesh import make_mesh
        system.shard_serving(make_mesh(n_model=opt.n_model))
    if opt.quant:
        system.set_serving_quant(opt.quant)
    if not opt.resume:
        print("WARNING: no checkpoint given (-r); serving random weights")

    server = AudioServer(
        system,
        ServeConfig(max_batch=opt.max_batch, batch_window_ms=opt.window_ms,
                    default_steps=opt.steps, default_scale=opt.scale,
                    seed=opt.seed),
        host=opt.host, port=opt.port)
    if opt.warmup:
        buckets = [int(b) for b in opt.warmup.split(",") if b]
        print(f"warming up buckets {buckets} (first compile can take "
              "minutes on a cold cache)...", flush=True)
        server.batcher.warmup(buckets, steps=opt.steps)
    print(f"serving on http://{opt.host}:{server.port}  "
          f"(POST /generate, GET /healthz, GET /stats)", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
