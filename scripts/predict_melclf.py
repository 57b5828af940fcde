#!/usr/bin/env python
"""Batch-predict CLI for the trained mel eval-classifier — the
vggishish/predict.py equivalent: load the best checkpoint, run the test
split, print the metrics dict (accuracy@k, mAP, mROCAUC, d-prime, avg CE
loss, parameter count).

Parity: ldm/modules/losses_audio/vggishish/predict.py:14-93 — same output
surface (`metrics(...) + avg_loss + param_num` printed as one dict), fed by
TSV manifests (mel_path, label) instead of the VGGSound split txts, with the
StandardNormalizeAudio training-stats z-norm applied when --norm_stats is
given (predict.py:24-27 builds the same transform chain).

  python scripts/predict_melclf.py --tsv test.tsv --clf_ckpt logs/melclf/final \
      [--backbone melception] [--norm_stats data/train_means_stds_mels.txt]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", required=True, help="TSV with mel_path, label")
    p.add_argument("--clf_ckpt", required=True,
                   help="orbax dir, or a torch .pt/.ckpt for melception")
    p.add_argument("--backbone", default="vggishish",
                   choices=["vggishish", "melception"])
    p.add_argument("--mel_len", type=int, default=624)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_classes", type=int, default=0,
                   help="0 = infer from labels")
    p.add_argument("--small", action="store_true")
    p.add_argument("--norm_stats", default="",
                   help="cached train_means_stds txt (StandardNormalizeAudio)")
    opt = p.parse_args()

    import jax.numpy as jnp
    import optax
    from maa3_tpu.data.datasets import read_tsv
    from maa3_tpu.data.transforms import StandardNormalizeAudio
    from maa3_tpu.eval.metrics import metrics as eval_metrics
    from maa3_tpu.native.io import NativeLoader

    rows = read_tsv(opt.tsv)
    labels = [r["label"] for r in rows]
    if opt.num_classes == 0:
        classes = sorted(set(labels))
        lut = {c: i for i, c in enumerate(classes)}
        y_all = np.array([lut[l] for l in labels], np.int32)
        num_classes = len(classes)
    else:
        y_all = np.array([int(l) for l in labels], np.int32)
        num_classes = opt.num_classes
    paths = [r["mel_path"] for r in rows]

    if opt.backbone == "melception":
        from maa3_tpu.models.melception import (MelceptionConfig,
                                                melception_init,
                                                melception_apply)
        cfg = MelceptionConfig(num_classes=num_classes)
        params = melception_init(jax.random.PRNGKey(0), cfg)
        if opt.clf_ckpt.endswith((".pt", ".pth", ".ckpt")):
            import torch
            from maa3_tpu.torch_import import melception_from_torch
            sd = torch.load(opt.clf_ckpt, map_location="cpu",
                            weights_only=False)
            sd = sd.get("model", sd.get("state_dict", sd))
            if "epoch" in sd or "loss" in sd:  # predict.py:53 banner
                print(f"The model was trained for {sd.get('epoch', '?')} "
                      f"epochs. Loss: {sd.get('loss', float('nan')):.4f}")
            params = melception_from_torch(
                {k: np.asarray(v) for k, v in sd.items()})
        else:
            import orbax.checkpoint as ocp
            params = ocp.StandardCheckpointer().restore(
                os.path.abspath(opt.clf_ckpt),
                target={"params": params})["params"]
        fwd = jax.jit(lambda m: melception_apply(params, cfg, m))
    else:
        from maa3_tpu.models.melclf import (MelClfConfig, melclf_init,
                                            melclf_apply)
        conv = ((16, "MP", 32, "MP", 64, "MP") if opt.small
                else MelClfConfig().conv_layers)
        cfg = MelClfConfig(conv_layers=conv, num_classes=num_classes)
        params = melclf_init(jax.random.PRNGKey(0), cfg)
        import orbax.checkpoint as ocp
        params = ocp.StandardCheckpointer().restore(
            os.path.abspath(opt.clf_ckpt),
            target={"params": params})["params"]
        fwd = jax.jit(lambda m: melclf_apply(params, cfg, m))

    norm = (StandardNormalizeAudio.from_stats_file(opt.norm_stats)
            if opt.norm_stats else None)
    loader = NativeLoader(rows=80)
    logits_all, running_loss, n_batches = [], 0.0, 0
    for i in range(0, len(paths), opt.batch_size):
        mel = loader.load_batch(paths[i: i + opt.batch_size], opt.mel_len,
                                mode="tile")
        if norm is not None:
            mel = norm(mel).astype(np.float32)
        logits = np.asarray(fwd(jnp.asarray(mel)))
        y = y_all[i: i + opt.batch_size]
        running_loss += float(np.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                jnp.asarray(logits), jnp.asarray(y))))
        n_batches += 1
        logits_all.append(logits)
    logits_all = np.concatenate(logits_all)

    out = eval_metrics(y_all, logits_all, topk=(1, min(5, num_classes)))
    out["avg_loss"] = running_loss / max(n_batches, 1)
    out["param_num"] = int(sum(x.size for x in jax.tree.leaves(params)))
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
