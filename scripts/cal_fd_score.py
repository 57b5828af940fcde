#!/usr/bin/env python
"""Frechet-distance / KL eval over mel classifier embeddings — the
melception/vggishish FID-style metric pipeline (the reference delegates this
to the upstream Make-An-Audio repo; here it is first-class).

  python scripts/cal_fd_score.py --gen_dir genmels/ --ref_dir gtmels/ \
      [--clf_ckpt logs/melclf/final] [--small]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gen_dir", required=True)
    p.add_argument("--ref_dir", required=True)
    p.add_argument("--clf_ckpt", default="")
    p.add_argument("--mel_len", type=int, default=624)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--num_classes", type=int, default=309)
    p.add_argument("--small", action="store_true")
    p.add_argument("--backbone", default="vggishish",
                   choices=["vggishish", "melception"],
                   help="melception = the Inception3-for-mel backbone the "
                        "published audio-FID numbers use "
                        "(train_melception.py:20-34); 2048-d features")
    p.add_argument("--norm_stats", default="",
                   help="cached train_means_stds txt — the upstream protocol "
                        "z-normalizes eval mels with TRAIN-split stats "
                        "(vggishish/transforms.py StandardNormalizeAudio); "
                        "produced by train_melclf.py --norm")
    opt = p.parse_args()

    import jax.numpy as jnp
    from maa3_tpu.models.melclf import (MelClfConfig, melclf_init,
                                        melclf_apply, frechet_distance,
                                        kl_divergence_softmax)
    from maa3_tpu.native.io import NativeLoader

    if opt.backbone == "melception":
        from maa3_tpu.models.melception import (MelceptionConfig,
                                                melception_init,
                                                melception_apply)
        mcfg = MelceptionConfig(num_classes=opt.num_classes)
        params = melception_init(jax.random.PRNGKey(0), mcfg)
        if opt.clf_ckpt.endswith((".pt", ".pth", ".ckpt")):
            # a torchvision-based melception checkpoint (e.g. the public
            # melception-21-05-10T09-28-40.pt): key-for-key torch import
            import torch
            from maa3_tpu.torch_import import melception_from_torch
            sd = torch.load(opt.clf_ckpt, map_location="cpu",
                            weights_only=False)
            sd = sd.get("model", sd.get("state_dict", sd))
            params = melception_from_torch(
                {k: np.asarray(v) for k, v in sd.items()})
        elif opt.clf_ckpt:
            import orbax.checkpoint as ocp
            restored = ocp.StandardCheckpointer().restore(
                os.path.abspath(opt.clf_ckpt), target={"params": params})
            params = restored["params"]
        else:
            print("WARNING: random classifier (relative numbers only)")
        apply_fn = jax.jit(lambda m: melception_apply(
            params, mcfg, m, return_features=True))
    else:
        conv = ((16, "MP", 32, "MP", 64, "MP") if opt.small
                else MelClfConfig().conv_layers)
        cfg = MelClfConfig(conv_layers=conv, num_classes=opt.num_classes)
        params = melclf_init(jax.random.PRNGKey(0), cfg)
        if opt.clf_ckpt:
            import orbax.checkpoint as ocp
            restored = ocp.StandardCheckpointer().restore(
                os.path.abspath(opt.clf_ckpt), target={"params": params})
            params = restored["params"]
        else:
            print("WARNING: random classifier (relative numbers only)")
        apply_fn = jax.jit(lambda m: melclf_apply(params, cfg, m,
                                                  return_embedding=True))

    loader = NativeLoader(rows=80)
    norm = None
    if opt.norm_stats:
        from maa3_tpu.data.transforms import StandardNormalizeAudio
        norm = StandardNormalizeAudio.from_stats_file(opt.norm_stats)

    def embed_dir(d):
        paths = sorted(glob.glob(os.path.join(d, "*.npy")))
        if not paths:
            raise SystemExit(f"no npy mels in {d}")
        logits_all, emb_all = [], []
        for i in range(0, len(paths), opt.batch):
            mel = loader.load_batch(paths[i : i + opt.batch], opt.mel_len,
                                    mode="tile")
            if norm is not None:
                mel = norm(mel).astype(np.float32)
            logits, emb = apply_fn(jnp.asarray(mel))
            logits_all.append(np.asarray(logits))
            emb_all.append(np.asarray(emb))
        return np.concatenate(logits_all), np.concatenate(emb_all), paths

    g_logits, g_emb, g_paths = embed_dir(opt.gen_dir)
    r_logits, r_emb, r_paths = embed_dir(opt.ref_dir)

    fd = frechet_distance(g_emb, r_emb)
    out = {"fd": round(fd, 4), "n_gen": len(g_paths), "n_ref": len(r_paths)}
    if len(g_logits) == len(r_logits):
        out["kl"] = round(kl_divergence_softmax(g_logits, r_logits), 4)
    print(out)


if __name__ == "__main__":
    main()
