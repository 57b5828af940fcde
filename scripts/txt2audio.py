#!/usr/bin/env python
"""Text-to-audio CLI — flag-compatible with the reference
scripts/txt2audio_for_2cap_flow.py (--prompt, -b config, -r ckpt, --scale,
--ddim_steps, --vocoder-ckpt, --outdir, --test-dataset, --n_samples, -H -W).

Generates: uc = encode({"",""}), c = encode(prompt), x0 ~ N(0, (H, W)),
CFM.sample_cfg 25 steps -> VAE decode -> BigVGAN -> wav + result.csv
(reference call stack at scripts/txt2audio_for_2cap_flow.py:151-217).
"""

import argparse
import csv
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
    enable_compile_cache()  # CPU AOT cache entries can SIGILL across hosts

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--prompt", type=str, default="a bird chirps")
    p.add_argument("--test-dataset", type=str, default="none",
                   help="TSV manifest to generate for (testset mode)")
    p.add_argument("--outdir", type=str, default="outputs/txt2audio-samples")
    p.add_argument("--ddim_steps", type=int, default=25)
    p.add_argument("--steps", type=int, default=None, help="alias of --ddim_steps")
    p.add_argument("--n_iter", type=int, default=1)
    p.add_argument("-H", type=int, default=20)
    p.add_argument("-W", type=int, default=312)
    p.add_argument("--n_samples", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=1,
                   help="distinct testset prompts per ODE launch (throughput "
                        "mode: one v5e sustains ~59 s-audio/s at batch 8 vs "
                        "~36 at batch 1; requires --n_samples 1)")
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("-r", "--resume", type=str, default="",
                   help="torch .ckpt to import")
    p.add_argument("-b", "--base", type=str, default="",
                   help="comma-separated config yamls")
    p.add_argument("--vocoder-ckpt", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tokenizer_dir", type=str, default="",
                   help="dir with bert/vocab.txt + t5/tokenizer.json "
                        "(default: $MAA3_TOKENIZER_DIR)")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--fp32", action="store_true",
                   help="run the DiT in fp32 (parity mode)")
    p.add_argument("--quant", type=str, default="",
                   help="serving quantization: 'int8' runs the per-step DiT "
                        "GEMMs w8a8 on the MXU (~19%% faster ODE, ~2x the "
                        "bf16 mode's mel drift); the vocoder stays bf16 by "
                        "default (int8 vocoder convs measured slower, "
                        "PROBE_VOC_DECOMP_R04) — opt in with 'int8:voc'; "
                        "other variants: int8:g128 / :now2 / :smooth "
                        "(SmoothQuant migration, auto-calibrated on the "
                        "first prompt)")
    p.add_argument("--n_model", type=int, default=1,
                   help="tensor-parallel serving over n_model chips "
                        "(devices reshape to (n_dev/n_model, n_model); "
                        "weights shard Megatron-style, XLA adds the "
                        "all-reduces)")
    p.add_argument("--save_mel", action="store_true",
                   help="also write <name>_mel.npy (decoded mels) next to "
                        "each wav — feeds scripts/cal_fd_score.py's "
                        "mel-space FD/KL without a vocoder round-trip")
    p.add_argument("--interactive", action="store_true",
                   help="REPL: read prompts from stdin and generate with "
                        "warm jits (first prompt compiles; later ones run "
                        "at ~0.2 s on a v5e)")
    return p.parse_args()


def main():
    opt = parse_args()
    steps = opt.steps or opt.ddim_steps

    import jax
    import jax.numpy as jnp
    from scipy.io import wavfile
    from maa3_tpu.system import MAA3System
    from maa3_tpu.data.datasets import read_tsv

    cfg_paths = [c for c in opt.base.split(",") if c] or [
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "txt2audio-cfm-cfg.yaml")]
    if opt.tokenizer_dir:
        os.environ["MAA3_TOKENIZER_DIR"] = opt.tokenizer_dir
    system = MAA3System.from_config(
        cfg_paths, ckpt_path=opt.resume or None,
        vocoder_dir=opt.vocoder_ckpt or None, seed=opt.seed,
        compute_dtype=jnp.float32 if opt.fp32 else jnp.bfloat16)
    if opt.n_model > 1:
        from maa3_tpu.parallel.mesh import make_mesh
        system.shard_serving(make_mesh(n_model=opt.n_model))
    if opt.quant:
        system.set_serving_quant(opt.quant)
    if not opt.resume:
        print("WARNING: no checkpoint given (-r); generating with random weights")

    os.makedirs(opt.outdir, exist_ok=True)
    key = jax.random.PRNGKey(opt.seed)

    if opt.test_dataset != "none":
        rows = read_tsv(opt.test_dataset)
        prompts = [{"ori_caption": r["ori_cap"],
                    "struct_caption": r.get("caption", r["ori_cap"]),
                    "name": r.get("name", f"sample_{i}")}
                   for i, r in enumerate(rows)]
    else:
        prompts = [{"ori_caption": opt.prompt,
                    "struct_caption": f"<{opt.prompt}& all>",
                    "name": "prompt"}]

    if opt.interactive:
        import time
        uc1 = system.get_learned_conditioning(
            {"ori_caption": [""], "struct_caption": [""]})
        print("interactive mode — type a prompt (empty line to quit)")
        n = 0
        while True:
            try:
                prompt = input("> ").strip()
            except EOFError:
                break
            if not prompt:
                break
            t0 = time.perf_counter()
            c = system.get_learned_conditioning(
                {"ori_caption": [prompt],
                 "struct_caption": [f"<{prompt}& all>"]})
            key, sub = jax.random.split(key)
            z = system.sample_cfg(c, opt.scale, uc1, sub,
                                  shape=(1, opt.H, opt.W), timesteps=steps)
            wav = system.vocode(system.decode_first_stage(z))
            path = os.path.join(opt.outdir, f"interactive_{n}.wav")
            wavfile.write(path, opt.sample_rate,
                          (np.clip(wav[0], -1, 1) * 32767).astype(np.int16))
            print(f"{path}  ({time.perf_counter() - t0:.3f} s)")
            n += 1
        return

    bs = max(1, opt.batch_size)
    if bs > 1 and opt.n_samples != 1:
        raise SystemExit("--batch_size > 1 requires --n_samples 1")
    per_launch = bs if bs > 1 else opt.n_samples
    uc = system.get_learned_conditioning(
        {"ori_caption": [""] * per_launch,
         "struct_caption": [""] * per_launch})

    results = []
    chunks = [prompts[i:i + bs] for i in range(0, len(prompts), bs)]
    if opt.quant and "smooth" in opt.quant:
        # SmoothQuant: one calibration ODE on the first prompt's conditioning
        c0 = system.get_learned_conditioning(
            {"ori_caption": [prompts[0]["ori_caption"]] * per_launch,
             "struct_caption": [prompts[0]["struct_caption"]] * per_launch})
        system.calibrate_smooth(c0, uc, timesteps=steps, scale=opt.scale)
    for i, chunk in enumerate(chunks):
        pad = bs - len(chunk) if bs > 1 else 0
        launch = chunk + [chunk[-1]] * pad  # ragged tail: repeat, drop later
        if bs > 1:
            c = system.get_learned_conditioning(
                {"ori_caption": [p["ori_caption"] for p in launch],
                 "struct_caption": [p["struct_caption"] for p in launch]})
        else:
            c = system.get_learned_conditioning(
                {"ori_caption": [launch[0]["ori_caption"]] * opt.n_samples,
                 "struct_caption": [launch[0]["struct_caption"]] * opt.n_samples})
        key, sub = jax.random.split(key)
        z = system.sample_cfg(c, opt.scale, uc, sub,
                              shape=(per_launch, opt.H, opt.W),
                              timesteps=steps)
        mel = system.decode_first_stage(z)
        wav = system.vocode(mel)
        for n in range(per_launch - pad):
            pr = launch[n] if bs > 1 else launch[0]
            fname = (f"{pr['name']}_{n if bs == 1 else 0}.wav")
            path = os.path.join(opt.outdir, fname)
            wavfile.write(path, opt.sample_rate,
                          (np.clip(wav[n], -1, 1) * 32767).astype(np.int16))
            if opt.save_mel:
                np.save(path[:-4] + "_mel.npy",
                        np.asarray(mel[n], np.float32))
            results.append({"caption": pr["ori_caption"], "file": fname})
        done = min((i + 1) * max(bs, 1), len(prompts)) if bs > 1 else i + 1
        total = len(prompts) if bs > 1 else len(chunks)
        print(f"[{done}/{total}] wrote {per_launch - pad} wav(s), "
              f"mel {tuple(mel.shape)}")

    with open(os.path.join(opt.outdir, "result.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["caption", "file"])
        w.writeheader()
        w.writerows(results)
    print(f"done -> {opt.outdir}")


if __name__ == "__main__":
    main()
