"""Long-context training probe: Pallas flash (fwd + O(L) bwd) vs XLA dense
attention through a DiT train-style gradient at long sequence.

This probe produced the evidence behind the use_flash auto threshold
(DiTConfig: kernel only past seq 4096): at seq 2048 dense XLA attention is
~2x FASTER for the train grad (head_dim pads to 128 MXU lanes in the
kernel), so the flash route is memory-motivated. The axon-tunneled backend
exposes no memory_stats (peak_mib_* report null there) and
peak_bytes_in_use is a process-lifetime high-water mark anyway, so the
memory side is reported ANALYTICALLY: dense_score_mib_analytic is the size
of ONE materialized (L, L) score matrix set (B*H*L^2 bf16); the dense
backward holds several of these live, while the flash path holds none.

Usage: MAA3_PLATFORM=tpu python scripts/probe_flash_train.py [--seq 2048]
Writes one JSON line; run detached on the tunneled chip (CLAUDE.md).
"""

import argparse
import json
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
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--heads", type=int, default=8)
    opt = p.parse_args()

    from maa3_tpu.utils import enable_compile_cache
    if jax.default_backend() != "cpu":
        enable_compile_cache()
    from maa3_tpu.models.dit import DiTConfig, dit_init, dit_apply
    from maa3_tpu.utils.nprand import unfreeze_zero_init
    from maa3_tpu.utils.profiling import device_memory_stats
    from _probe_util import slope_time

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (opt.batch, 20, opt.seq), jnp.float32)
    t = jnp.full((opt.batch,), 500, jnp.int32)
    ctx = jax.random.normal(key, (opt.batch, 77, 1024), jnp.float32)

    out = {"metric": "flash_train_step", "seq": opt.seq, "batch": opt.batch,
           "hidden": opt.hidden, "depth": opt.depth,
           # one materialized (L, L) bf16 score-matrix set; the dense
           # backward keeps several alive (logits + probs + their grads)
           "dense_score_mib_analytic": round(
               opt.batch * opt.heads * opt.seq ** 2 * 2 / 2 ** 20, 1)}
    for name, use_flash in (("flash", True), ("dense", False)):
        cfg = DiTConfig(in_channels=20, context_dim=1024,
                        hidden_size=opt.hidden, depth=opt.depth,
                        num_heads=opt.heads, max_len=4096,
                        use_flash=use_flash)
        params = unfreeze_zero_init(dit_init(jax.random.PRNGKey(1), cfg),
                                    jax.random.PRNGKey(2))

        def loss(p, x, t, c):
            return jnp.sum(dit_apply(p, cfg, x, t, c,
                                     compute_dtype=jnp.bfloat16) ** 2)

        grad = jax.jit(jax.grad(loss))
        t0 = time.time()
        g = grad(params, x, t, ctx)  # compile
        float(jnp.sum(g["proj_in"]["w"]))
        out[f"compile_{name}_s"] = round(time.time() - t0, 1)
        out[f"grad_ms_{name}"] = round(1e3 * slope_time(
            lambda p: grad(p, x, t, ctx)["proj_in"]["w"], (params,), n=5), 2)
        out[f"peak_mib_{name}"] = device_memory_stats().get("mem_peak_mib")
        print(json.dumps(out), flush=True)

    # explicit presence + nonzero checks: slope_time clamps at 0.0, and a
    # jittery tunnel can return 0.0 for either arm — report null, not a
    # silently missing field or a ZeroDivisionError
    if "grad_ms_dense" in out and "grad_ms_flash" in out:
        out["flash_speedup"] = (
            round(out["grad_ms_dense"] / out["grad_ms_flash"], 3)
            if out["grad_ms_flash"] > 0 else None)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
