#!/usr/bin/env python
"""Name the batch-16/32 serving falloff with a per-op device trace.

Three rounds of eliminations (PROBE_ATTN_BATCH: not attention-score HBM;
BENCH_r04 int8 sweep: not GEMM activation/weight bytes) left the b32 ODE
falloff (71.4 -> 51.4 s-audio/s bf16) cause-unknown. This probe captures a
`jax.profiler.trace` of the 25-step XL ODE at batch 8 and batch 32 and
parses the xplane with xprof's `hlo_stats` converter, producing a per-HLO
decomposition of device time. Ranking (b32_self_us/4 - b8_self_us) per
clip names the ops whose per-clip cost GROWS with batch — the consumer of
the extra ~58 ms/clip.

Falls back to recording trace-capture failure (the axon tunnel may not
support device tracing) so the artifact is written either way; the slope
methodology in probe_batch_decompose.py remains the coarse decomposition.

Run (detached, TPU):  setsid nohup python scripts/probe_b32_trace.py \
    > /tmp/probe_b32_trace.log 2>&1 &

Serving role of the reference model this decomposes:
/root/reference/ldm/modules/diffusionmodules/flag_large_dit_moe.py:355-408.
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import jax.numpy as jnp

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()

LATENT_LEN = 312
CTX_LEN = 154
STEPS = 25
BATCHES = tuple(int(b) for b in os.environ.get("MAA3_BATCHES", "8,32").split(","))
TRACE_ROOT = os.environ.get("MAA3_TRACE_DIR", "/tmp/b32trace")
OUT = os.environ.get("MAA3_PROBE_OUT", "PROBE_B32_TRACE_r05.json")


def build_pipe():
    import dataclasses
    from maa3_tpu.models.dit import DiTConfig
    from maa3_tpu.models.vae1d import VAEConfig
    from maa3_tpu.models.bigvgan import BigVGANConfig
    from maa3_tpu.pipeline import T2APipeline
    from maa3_tpu.utils.nprand import cast_matmul_weights, fuse_dit_gemms

    key = jax.random.PRNGKey(0)
    xl = DiTConfig(in_channels=20, context_dim=1024, hidden_size=1152,
                   depth=28, num_heads=16, max_len=1000)
    pipe32 = T2APipeline.random_init(key, xl, VAEConfig(), BigVGANConfig(),
                                     compute_dtype=jnp.float32)
    params16 = dict(pipe32.params)
    params16["dit"] = fuse_dit_gemms(
        cast_matmul_weights(pipe32.params["dit"], jnp.bfloat16))
    return dataclasses.replace(
        pipe32, compute_dtype=jnp.bfloat16, params=params16,
        dit_cfg=dataclasses.replace(xl, fp32_residual=True))


def parse_hlo_stats(trace_dir):
    """xplane.pb -> list of {name, category, occurrences, self_us} rows."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tbl = json.loads(data)
    cols = [c["label"] for c in tbl["cols"]]
    rows = []
    for r in tbl["rows"]:
        vals = dict(zip(cols, [c["v"] for c in r["c"]]))
        rows.append(vals)
    return rows


def aggregate(rows):
    """Sum self-time by (category, hlo-op base name without ids)."""
    import re
    agg = {}
    for r in rows:
        # column labels vary across xprof versions — find them defensively
        name = (r.get("HLO op name") or r.get("HLO Op Name")
                or r.get("hlo_op_name") or "")
        cat = (r.get("HLO op category") or r.get("Op Category")
               or r.get("category") or "")
        t = None
        for k in ("Total self time (us)", "Self time (us)",
                  "total_self_time_us", "self_time_us"):
            if k in r and r[k] is not None:
                t = float(r[k])
                break
        if t is None:
            continue
        base = re.sub(r"[.\d]+$", "", str(name))
        k = (str(cat), base)
        agg[k] = agg.get(k, 0.0) + t
    return agg


def main():
    os.makedirs(TRACE_ROOT, exist_ok=True)
    pipe = build_pipe()
    key = jax.random.PRNGKey(0)
    ctx1 = jax.random.normal(key, (1, CTX_LEN, 1024), jnp.float32)
    scale = jnp.float32(5.0)

    result = {"metric": "b32_trace", "steps": STEPS,
              "latent_len": LATENT_LEN, "batches": list(BATCHES)}
    per_batch = {}
    for b in BATCHES:
        ctx = jnp.broadcast_to(ctx1, (b,) + ctx1.shape[1:])
        uc = jnp.zeros_like(ctx)
        x0 = jax.random.normal(jax.random.PRNGKey(2),
                               (b, 20, LATENT_LEN), jnp.float32)

        def run():
            out = pipe._sample_latent(pipe.params, x0, ctx, uc, scale, STEPS)
            return float(jnp.sum(out))

        t0 = time.time()
        run(); run()  # compile + warm
        warm_s = time.time() - t0
        t0 = time.time(); run(); run_1 = time.time() - t0
        print(json.dumps({"metric": "warm", "batch": b,
                          "compile_s": round(warm_s, 1),
                          "run_s": round(run_1, 3)}), flush=True)

        tdir = os.path.join(TRACE_ROOT, f"b{b}")
        entry = {"run_s_untraced": round(run_1, 3)}
        try:
            with jax.profiler.trace(tdir):
                run()
            rows = parse_hlo_stats(tdir)
            agg = aggregate(rows)
            total = sum(agg.values())
            entry["trace_ok"] = True
            entry["device_total_us"] = round(total, 1)
            entry["n_hlo_rows"] = len(rows)
            entry["by_cat"] = {}
            for (cat, _), v in agg.items():
                entry["by_cat"][cat] = round(
                    entry["by_cat"].get(cat, 0.0) + v, 1)
            entry["_agg"] = {f"{cat}|{name}": v for (cat, name), v in agg.items()}
            if not rows:
                entry["trace_ok"] = False
                entry["error"] = "empty hlo_stats"
        except Exception as e:
            entry["trace_ok"] = False
            entry["error"] = repr(e)[:500]
        per_batch[b] = entry
        print(json.dumps({"metric": "trace", "batch": b,
                          **{k: v for k, v in entry.items()
                             if k != "_agg"}}), flush=True)

    # growth table: per-clip self time delta b_hi vs b_lo
    if all(per_batch.get(b, {}).get("trace_ok") for b in BATCHES) \
            and len(BATCHES) == 2:
        lo, hi = BATCHES
        a_lo = per_batch[lo].pop("_agg")
        a_hi = per_batch[hi].pop("_agg")
        keys = set(a_lo) | set(a_hi)
        growth = []
        for k in keys:
            pc_lo = a_lo.get(k, 0.0) / lo
            pc_hi = a_hi.get(k, 0.0) / hi
            growth.append({
                "op": k,
                "us_per_clip_b%d" % lo: round(pc_lo, 1),
                "us_per_clip_b%d" % hi: round(pc_hi, 1),
                "delta_us_per_clip": round(pc_hi - pc_lo, 1),
            })
        growth.sort(key=lambda r: -r["delta_us_per_clip"])
        result["growth_top"] = growth[:25]
        result["shrink_top"] = sorted(
            growth, key=lambda r: r["delta_us_per_clip"])[:5]
        result["total_us_per_clip"] = {
            str(b): round(per_batch[b]["device_total_us"] / b, 1)
            for b in BATCHES}
    else:
        for b in BATCHES:
            per_batch.get(b, {}).pop("_agg", None)

    result["per_batch"] = {str(b): per_batch[b] for b in per_batch}
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"metric": "b32_trace_done", "out": OUT,
                      "trace_ok": [per_batch[b].get("trace_ok")
                                   for b in BATCHES]}), flush=True)


if __name__ == "__main__":
    main()
