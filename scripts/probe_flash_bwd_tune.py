"""Raw attention-op grad probe: Pallas flash vs XLA dense, fwd and grad
separately, sweeping the backward block caps (env overrides in
ops/flash_attention.py). Isolates the attention op from the rest of the DiT
step that probe_flash_train.py wraps — the 7.5 ms flash deficit there is
~1.9 ms/layer, far above the op's FLOP floor, so the question is where the
kernel time actually goes.

Usage: python scripts/probe_flash_bwd_tune.py [--seq 2048] [--caps 256,512]
Each cap value re-imports nothing: caps are read at call time? No — they are
module constants, so the sweep re-execs itself per cap via env.
"""

import argparse
import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_one():
    import jax
    import jax.numpy as jnp
    from maa3_tpu.utils import enable_compile_cache
    if jax.default_backend() != "cpu":
        enable_compile_cache()
    from maa3_tpu.ops.attention import _sdpa
    from maa3_tpu.ops.flash_attention import (flash_attention,
                                              _BLOCK_Q_BWD_CAP,
                                              _BLOCK_K_BWD_CAP)
    from _probe_util import slope_time

    seq = int(os.environ["PROBE_SEQ"])
    b = int(os.environ.get("PROBE_B", "2"))
    h = int(os.environ.get("PROBE_H", "8"))
    d = int(os.environ.get("PROBE_D", "64"))
    dt = jnp.bfloat16
    scale = 1.0 / math.sqrt(d)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, seq, d), dt)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, seq, d), dt)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, seq, d), dt)

    def floss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=scale) ** 2)

    def dloss(q, k, v):
        qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
        return jnp.sum(_sdpa(qt, kt, vt, scale, None) ** 2)

    row = {"metric": "flash_bwd_tune", "seq": seq, "b": b, "h": h, "d": d,
           "bq_bwd": _BLOCK_Q_BWD_CAP, "bk_bwd": _BLOCK_K_BWD_CAP}
    for name, fn in (("flash_fwd", jax.jit(floss)),
                     ("dense_fwd", jax.jit(dloss)),
                     ("flash_grad", jax.jit(jax.grad(floss))),
                     ("dense_grad", jax.jit(jax.grad(dloss)))):
        t0 = time.time()
        out = fn(q, k, v)
        float(jnp.sum(out if isinstance(out, jax.Array) else out))
        row[f"compile_{name}_s"] = round(time.time() - t0, 1)
        row[f"{name}_ms"] = round(1e3 * slope_time(
            lambda a: fn(a, k, v), (q,), n=5), 3)
    # FLOP floor: fwd 2 dots, flash bwd 7 dots, dense bwd 4 dots (p saved)
    flops1 = 2 * b * h * seq * seq * d
    row["fwd_floor_ms_at_peak"] = round(1e3 * 2 * flops1 / 197e12, 3)
    print(json.dumps(row), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seq", type=str, default="2048")
    p.add_argument("--caps", type=str, default="256,512")
    p.add_argument("--b", type=str, default="2")
    p.add_argument("--h", type=str, default="8")
    p.add_argument("--d", type=str, default="64")
    opt = p.parse_args()
    for seq in opt.seq.split(","):
        for cap in opt.caps.split(","):
            env = dict(os.environ, PROBE_SEQ=seq, PROBE_B=opt.b,
                       PROBE_H=opt.h, PROBE_D=opt.d, PROBE_CHILD="1",
                       MAA3_FLASH_BQ_BWD_CAP=cap,
                       MAA3_FLASH_BK_BWD_CAP=cap)
            subprocess.run([sys.executable, __file__, "--child"], env=env)


if __name__ == "__main__":
    if "--child" in sys.argv:
        run_one()
    else:
        main()
