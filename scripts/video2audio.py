#!/usr/bin/env python
"""Video-to-audio CLI — windowed generation over CLIP/CAVP features,
flag-compatible with the reference scripts/video2audio_flow.py.

Per sample: load .npz features (T, 512), tile/truncate to fps*duration
frames, window into `truncate_frame` chunks, per-window CFM sample_cfg ->
VAE decode -> optional mean/std renorm to GT log-mel stats (fork behavior,
video2audio_flow.py:526-567) -> concat mel chunks -> BigVGAN -> wav.

Also supports --inpaint: keeps unmasked regions of a GT mel via the
mask-guided CFM ODE (see maa3_tpu.diffusion.cfm.sample_cfg_inpaint).
"""

import argparse
import glob
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()  # CPU AOT cache entries can SIGILL across hosts

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--feat_dir", type=str, required=True,
                   help="dir of CAVP/CLIP .npz feature files")
    p.add_argument("--mel_gt_dir", type=str, default="",
                   help="optional GT mel dir (renorm stats / inpainting)")
    p.add_argument("--outdir", type=str, default="outputs/video2audio-samples")
    p.add_argument("--ddim_steps", type=int, default=25)
    p.add_argument("--scale", type=float, default=4.5)
    p.add_argument("-r", "--resume", type=str, default="")
    p.add_argument("-b", "--base", type=str, default="")
    p.add_argument("--vocoder-ckpt", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tokenizer_dir", type=str, default="",
                   help="dir with bert/vocab.txt + t5/tokenizer.json "
                        "(default: $MAA3_TOKENIZER_DIR)")
    p.add_argument("--fps", type=float, default=4.0)
    p.add_argument("--duration", type=float, default=10.0)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--hop_len", type=int, default=256)
    p.add_argument("--renorm", action="store_true",
                   help="z-renorm generated mel to GT stats (fork behavior)")
    p.add_argument("--inpaint", action="store_true")
    p.add_argument("--mask_ratio", type=float, default=0.5)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--clap_text", type=str, default="",
                   help="fuse a CLAP text prompt into the visual features "
                        "(video2audio_flow_CLAP.py fork experiment)")
    return p.parse_args()


def main():
    opt = parse_args()
    import jax.numpy as jnp
    from scipy.io import wavfile
    from maa3_tpu.system import MAA3System
    from maa3_tpu.diffusion import cfm

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_paths = [c for c in opt.base.split(",") if c] or [
        os.path.join(root, "configs", "video2audio-cfm-cfg-moe.yaml")]
    if opt.tokenizer_dir:
        os.environ["MAA3_TOKENIZER_DIR"] = opt.tokenizer_dir
    system = MAA3System.from_config(
        cfg_paths, ckpt_path=opt.resume or None,
        vocoder_dir=opt.vocoder_ckpt or None, seed=opt.seed,
        compute_dtype=jnp.float32 if opt.fp32 else jnp.bfloat16)
    if not opt.resume:
        print("WARNING: no checkpoint given (-r); generating with random weights")
    os.makedirs(opt.outdir, exist_ok=True)

    truncate_frame = int(opt.fps * opt.duration)          # frames per window
    spec_len = int(opt.sample_rate * opt.duration / opt.hop_len)
    latent_len = spec_len // system.spec.vae.downsample_rate

    key = jax.random.PRNGKey(opt.seed)
    feat_files = sorted(glob.glob(os.path.join(opt.feat_dir, "*.npz")))
    if not feat_files:
        raise SystemExit(f"no .npz features in {opt.feat_dir}")

    # one jitted inpaint ODE shared by all windows/files; params are jit
    # ARGUMENTS (a closure would bake GBs of weights in as constants)
    inpaint_fn = jax.jit(
        lambda dit_params, x0, c, uc, s, known, keep: cfm.sample_cfg_inpaint(
            system._velocity_fn(dit_params), x0, c, uc, s, known, keep,
            steps=opt.ddim_steps))

    uc_feat = jnp.zeros((1, truncate_frame, 512), jnp.float32)
    uc = system.get_learned_conditioning(uc_feat)

    fuse = None
    if opt.clap_text:
        # CLIP-visual + CLAP-text fusion (random-init fusion layer unless a
        # trained one is in the checkpoint)
        from maa3_tpu.models import clap as clap_mod
        from maa3_tpu.models.bert import bert_apply
        fusion_params = system.params.get("clap_fusion") or clap_mod.clap_fusion_init(
            jax.random.PRNGKey(opt.seed + 1))
        ids, mask = system.bert_tokenizer([opt.clap_text])
        h = bert_apply(system.params["cond"]["bert"], system.clap_cfg.bert,
                       jnp.asarray(ids), jnp.asarray(mask)) \
            if "cond" in system.params and "bert" in system.params.get("cond", {}) \
            else None
        if h is not None:
            text_emb = clap_mod.projection_apply(
                system.params["cond"]["projection"], h)[:, 0, :]
        else:  # no text tower in a pure-video checkpoint: hashed embedding
            rng = np.random.RandomState(abs(hash(opt.clap_text)) % (2 ** 31))
            text_emb = jnp.asarray(rng.randn(1, 1024).astype(np.float32))

        def fuse(feat):
            return clap_mod.clap_fusion_apply(fusion_params, feat, text_emb)

        print(f"clap fusion: caption {opt.clap_text!r} fused into the "
              f"video conditioning (dim {int(text_emb.shape[-1])})")

    for fpath in feat_files:
        name = os.path.splitext(os.path.basename(fpath))[0]
        if name == "empty_vid":
            continue
        feat = np.load(fpath)["feat"].astype(np.float32)
        total_frames = feat.shape[0]
        n_windows = max(1, math.ceil(total_frames / truncate_frame))

        gt_mel = None
        if opt.mel_gt_dir:
            gp = os.path.join(opt.mel_gt_dir, name + "_mel.npy")
            if os.path.exists(gp):
                gt_mel = np.load(gp).astype(np.float32)

        chunks = []
        for w in range(n_windows):
            seg = feat[w * truncate_frame : (w + 1) * truncate_frame]
            if seg.shape[0] < truncate_frame:
                seg = np.concatenate(
                    [seg, np.zeros((truncate_frame - seg.shape[0], seg.shape[1]),
                                   np.float32)])
            seg_in = jnp.asarray(seg[None])
            if fuse is not None:
                seg_in = fuse(seg_in)
            c = system.get_learned_conditioning(seg_in)
            key, sub = jax.random.split(key)
            shape = (1, system.spec.mel_dim, latent_len)
            if opt.inpaint and gt_mel is not None:
                gseg = gt_mel[:, w * spec_len : (w + 1) * spec_len]
                if gseg.shape[1] < spec_len:
                    gseg = np.pad(gseg, ((0, 0), (0, spec_len - gseg.shape[1])))
                known = system.encode_first_stage(jnp.asarray(gseg[None]), sub)
                keep = np.ones((1, 1, latent_len), np.float32)
                m0 = int(latent_len * 0.25)
                keep[:, :, m0 : m0 + int(latent_len * opt.mask_ratio)] = 0.0
                x0 = jax.random.normal(sub, shape)
                z = inpaint_fn(system.params["dit"], x0, c, uc,
                               jnp.float32(opt.scale), known,
                               jnp.asarray(keep))
            else:
                z = system.sample_cfg(c, opt.scale, uc, sub, shape=shape,
                                      timesteps=opt.ddim_steps)
            mel = np.asarray(system.decode_first_stage(z))[0]
            if opt.renorm and gt_mel is not None:
                std = mel.std()
                if std > 1e-5:
                    mel = (mel - mel.mean()) / std
                    mel = mel * gt_mel.std() + gt_mel.mean()
            chunks.append(mel)

        full_mel = np.concatenate(chunks, axis=1)
        wav = system.vocode(jnp.asarray(full_mel[None]))[0]
        out = os.path.join(opt.outdir, name + ".wav")
        wavfile.write(out, opt.sample_rate,
                      (np.clip(wav, -1, 1) * 32767).astype(np.int16))
        print(f"{name}: {n_windows} windows -> mel {full_mel.shape} -> {out}")

    print(f"done -> {opt.outdir}")


if __name__ == "__main__":
    main()
