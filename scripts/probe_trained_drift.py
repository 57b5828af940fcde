#!/usr/bin/env python
"""Quantization drift on a TRAINED checkpoint (DRIFT_R05 trained-model leg).

Every previous drift number (DRIFT_R03/R04, BENCH mel_mae_*) came from
random-init weights; DRIFT_R04's SmoothQuant negative explicitly
hypothesized that "trained DiTs develop outlier channels" that migration
needs to pay off. This probe loads the round-5 locally-trained M
checkpoint (scripts/run_train2eval_r05.sh) and measures mel MAE of
bf16 / int8 / int8:g128 / int8:smooth serving modes against the fp32
reference on real caption conditioning — the first non-degenerate test bed
for the whole quant stack.

Run: python scripts/probe_trained_drift.py [-r logs/m_synth/last]
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
import numpy as np

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()


PROMPTS = ["a high pitched steady tone", "bursts of static noise",
           "an upward frequency sweep", "rhythmic clicking sounds"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-r", "--resume", default="logs/m_synth/last")
    ap.add_argument("-b", "--base", default="configs/txt2audio-cfm-cfg.yaml")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--out", default="DRIFT_R05_TRAINED.json")
    args = ap.parse_args()

    from maa3_tpu.system import MAA3System

    def build(dtype):
        return MAA3System.from_config([args.base], ckpt_path=args.resume,
                                      compute_dtype=dtype)

    sys32 = build(jnp.float32)
    caps = {"ori_caption": PROMPTS,
            "struct_caption": [f"<{p}& all>" for p in PROMPTS]}
    ucaps = {"ori_caption": [""] * len(PROMPTS),
             "struct_caption": [""] * len(PROMPTS)}
    c = sys32.get_learned_conditioning(caps)
    uc = sys32.get_learned_conditioning(ucaps)
    key = jax.random.PRNGKey(7)
    shape = (len(PROMPTS), 20, 312)
    x0 = jax.random.normal(key, shape, jnp.float32)

    def gen(system):
        z = system.sample_cfg(jnp.asarray(c), 5.0, jnp.asarray(uc), key,
                              shape=shape, timesteps=args.steps, x0=x0)
        mel = system.decode_first_stage(z)
        return np.asarray(mel, np.float32)

    with jax.default_matmul_precision("highest"):
        mel32 = gen(sys32)
    del sys32
    out = {"metric": "drift_trained_ckpt", "ckpt": args.resume,
           "prompts": PROMPTS, "mel_rms": float(np.sqrt((mel32**2).mean()))}

    sys16 = build(jnp.bfloat16)
    c16, uc16 = jnp.asarray(c), jnp.asarray(uc)
    mel_bf16 = None
    for mode in (None, "int8", "int8:g128", "int8:smooth", "int8:now2"):
        t0 = time.time()
        sys16.set_serving_quant(mode)
        if mode and "smooth" in mode:
            sys16.calibrate_smooth(c16, uc16, timesteps=args.steps)
        mel = gen(sys16)
        name = mode or "bf16"
        row = {"mel_mae_vs_fp32": float(np.abs(mel - mel32).mean()),
               "wall_s": round(time.time() - t0, 1)}
        if mel_bf16 is None:
            mel_bf16 = mel
        else:
            row["mel_mae_vs_bf16"] = float(np.abs(mel - mel_bf16).mean())
        out[name] = row
        print(json.dumps({name: row}), flush=True)

    smooth = out.get("int8:smooth", {}).get("mel_mae_vs_bf16")
    plain = out.get("int8", {}).get("mel_mae_vs_bf16")
    if smooth is not None and plain is not None:
        out["smooth_flips_to_win"] = bool(smooth < plain)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"done": args.out}), flush=True)


if __name__ == "__main__":
    main()
