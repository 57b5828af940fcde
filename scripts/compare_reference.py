#!/usr/bin/env python
"""Reference parity harness: compare this framework's outputs against saved
reference outputs (the BASELINE.md mel-MAE < 1e-3 gate).

Two modes:

1. --gen_mels/--ref_mels: directories of <name>_mel.npy (or <name>.npy) —
   per-file MAE/max-abs + summary. Use after generating with the SAME
   checkpoint, prompts, and initial noise on both sides.

2. --ckpt + --latents: deterministic single-forward check — load a reference
   .ckpt, run the DiT velocity forward on saved (x, t, context) triples from
   an .npz and compare against saved reference outputs (keys x, t, context,
   expected). This isolates backbone parity from sampler RNG differences.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import numpy as np


def compare_dirs(gen_dir: str, ref_dir: str, gate: float) -> int:
    import collections
    gen = {os.path.basename(p): p for p in glob.glob(os.path.join(gen_dir, "*.npy"))}
    ref = {os.path.basename(p): p for p in glob.glob(os.path.join(ref_dir, "*.npy"))}
    common = sorted(set(gen) & set(ref))
    if not common:
        raise SystemExit("no common npy names between the two dirs")
    maes, worst = [], ("", 0.0)
    for name in common:
        a = np.load(gen[name]).astype(np.float64)
        b = np.load(ref[name]).astype(np.float64)
        t = min(a.shape[-1], b.shape[-1])
        mae = float(np.abs(a[..., :t] - b[..., :t]).mean())
        maes.append(mae)
        if mae > worst[1]:
            worst = (name, mae)
        print(f"{name}: MAE {mae:.3e}  maxabs "
              f"{float(np.abs(a[..., :t] - b[..., :t]).max()):.3e}")
    mean_mae = float(np.mean(maes))
    ok = mean_mae < gate
    print(f"\n{len(common)} files; mean MAE {mean_mae:.3e}  "
          f"worst {worst[0]} ({worst[1]:.3e})  "
          f"gate {gate:g}: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


def compare_forward(cfg_paths, ckpt, latents_npz, gate, fp32=True):
    import jax.numpy as jnp
    from maa3_tpu.system import MAA3System
    system = MAA3System.from_config(
        cfg_paths, ckpt_path=ckpt,
        compute_dtype=jnp.float32 if fp32 else jnp.bfloat16)
    data = np.load(latents_npz)
    vel = system._velocity_fn(system.params["dit"])
    out = np.asarray(jax.jit(vel)(jnp.asarray(data["x"]),
                                  jnp.asarray(data["t"]),
                                  jnp.asarray(data["context"])))
    expected = data["expected"]
    mae = float(np.abs(out - expected).mean())
    print(f"velocity forward MAE {mae:.3e}  maxabs "
          f"{float(np.abs(out - expected).max()):.3e}  "
          f"gate {gate:g}: {'PASS' if mae < gate else 'FAIL'}")
    return 0 if mae < gate else 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gen_mels", default="")
    p.add_argument("--ref_mels", default="")
    p.add_argument("--ckpt", default="")
    p.add_argument("--latents", default="",
                   help=".npz with x/t/context/expected for forward parity")
    p.add_argument("-b", "--base", type=str, default="")
    p.add_argument("--gate", type=float, default=1e-3)
    p.add_argument("--bf16", action="store_true")
    opt = p.parse_args()

    if opt.gen_mels and opt.ref_mels:
        sys.exit(compare_dirs(opt.gen_mels, opt.ref_mels, opt.gate))
    if opt.ckpt and opt.latents:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfgs = [c for c in opt.base.split(",") if c] or [
            os.path.join(root, "configs", "txt2audio-cfm-cfg.yaml")]
        sys.exit(compare_forward(cfgs, opt.ckpt, opt.latents, opt.gate,
                                 fp32=not opt.bf16))
    raise SystemExit("need --gen_mels/--ref_mels or --ckpt/--latents")


if __name__ == "__main__":
    main()
