#!/usr/bin/env python
"""Mel-classifier trainer — vggishish/train_vggishish.py + train_melception.py
equivalent: trains the FID/KL eval backbone on (mel, label) TSVs.

TSV columns: mel_path, label (integer or class-name; names are indexed).

--backbone melception trains the Inception3-for-mel backbone
(train_melception.py:20-34). --aux_weight defaults to 0.0 because the
reference computes `loss1 + 0.4*loss2` and then immediately OVERWRITES it
with the plain weighted CE (train_melception.py:126-129) — the aux head is
dead code in the shipped trainer; pass --aux_weight 0.4 for the intended
Inception3 recipe. --cls_weights reproduces `1/class_counts` weighted CE
(train_melception.py:92-95). Validation (--val_tsv) logs the reference's
epoch metrics: accuracy@k, mAP, mROCAUC, d-prime (vggishish/metrics.py).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", required=True)
    p.add_argument("--mel_len", type=int, default=624)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--num_classes", type=int, default=0,
                   help="0 = infer from labels")
    p.add_argument("--small", action="store_true",
                   help="small conv stack (fast smoke runs)")
    p.add_argument("--ckpt_dir", default="logs/melclf")
    p.add_argument("--backbone", default="vggishish",
                   choices=["vggishish", "melception"])
    p.add_argument("--aux_weight", type=float, default=0.0,
                   help="InceptionAux loss weight (reference ships 0 — see "
                        "module docstring)")
    p.add_argument("--cls_weights", action="store_true",
                   help="weight CE by 1/class_counts (reference "
                        "cls_weights_in_loss)")
    p.add_argument("--val_tsv", default="",
                   help="held-out TSV; logs accuracy@k/mAP/mROCAUC/dprime")
    p.add_argument("--val_every", type=int, default=0,
                   help="0 = only at the end")
    p.add_argument("--norm", action="store_true",
                   help="frequency-wise z-norm from training-set stats "
                        "(vggishish StandardNormalizeAudio; stats derived "
                        "from this TSV's mels and cached)")
    p.add_argument("--norm_cache", default="./data/",
                   help="stats cache dir (transforms.py:20)")
    opt = p.parse_args()

    import jax.numpy as jnp
    import optax
    from maa3_tpu.data.datasets import read_tsv
    from maa3_tpu.native.io import NativeLoader
    from maa3_tpu.models.melclf import MelClfConfig, melclf_init, melclf_apply
    from maa3_tpu.eval.metrics import metrics as eval_metrics

    rows = read_tsv(opt.tsv)
    labels = [r["label"] for r in rows]
    if opt.num_classes == 0:
        classes = sorted(set(labels))
        lut = {c: i for i, c in enumerate(classes)}
        y_all = np.array([lut[l] for l in labels], np.int32)
        num_classes = len(classes)
    else:
        lut = None
        y_all = np.array([int(l) for l in labels], np.int32)
        num_classes = opt.num_classes
    paths = [r["mel_path"] for r in rows]
    print(f"{len(rows)} samples, {num_classes} classes")

    # upstream eval protocol trains the classifier on z-normalized mels
    # (vggishish/transforms.py StandardNormalizeAudio; train.py builds the
    # same chain) — the cached stats file is reused by predict/cal_fd_score
    norm = None
    if opt.norm:
        from maa3_tpu.data.transforms import StandardNormalizeAudio
        norm = StandardNormalizeAudio(
            os.path.dirname(paths[0]) or ".", cache_path=opt.norm_cache,
            train_paths=paths)
        print(f"norm stats cached -> {norm.cache_path}")

    if opt.backbone == "melception":
        from maa3_tpu.models.melception import (MelceptionConfig,
                                                melception_init,
                                                melception_apply)
        cfg = MelceptionConfig(num_classes=num_classes)
        params = melception_init(jax.random.PRNGKey(0), cfg)

        def fwd_train(p, mel):
            return melception_apply(p, cfg, mel, return_aux=True)

        def fwd_eval(p, mel):
            return melception_apply(p, cfg, mel)
    else:
        conv = ((16, "MP", 32, "MP", 64, "MP") if opt.small
                else MelClfConfig().conv_layers)
        cfg = MelClfConfig(conv_layers=conv, num_classes=num_classes)
        # small stack: fewer channels -> smaller flatten
        params = melclf_init(jax.random.PRNGKey(0), cfg)

        def fwd_train(p, mel):
            return melclf_apply(p, cfg, mel), None

        def fwd_eval(p, mel):
            return melclf_apply(p, cfg, mel)

    # reference cls_weights_in_loss: weights = 1 / class_counts
    # (train_melception.py:92-95); WeightedCrossEntropy multiplies each
    # sample's loss by its target-class weight.
    if opt.cls_weights:
        counts = np.bincount(y_all, minlength=num_classes).astype(np.float32)
        w_cls = jnp.asarray(1.0 / np.maximum(counts, 1.0))
    else:
        w_cls = jnp.ones((num_classes,), jnp.float32)

    tx = optax.adamw(opt.lr)
    opt_state = tx.init(params)
    loader = NativeLoader(rows=80)

    def wce(logits, y):
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return jnp.mean(ce * w_cls[y])

    @jax.jit
    def step(params, opt_state, mel, y):
        def loss_fn(p):
            logits, aux = fwd_train(p, mel)
            loss = wce(logits, y)
            if aux is not None and opt.aux_weight > 0:
                loss = loss + opt.aux_weight * wce(aux, y)
            acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
            return loss, acc
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    val_paths, val_y = [], None
    if opt.val_tsv:
        vrows = read_tsv(opt.val_tsv)
        val_paths = [r["mel_path"] for r in vrows]
        if lut is not None:
            val_y = np.array([lut[r["label"]] for r in vrows], np.int32)
        else:
            val_y = np.array([int(r["label"]) for r in vrows], np.int32)

    eval_fn = jax.jit(fwd_eval)

    def run_val(it):
        logits_all = []
        for i in range(0, len(val_paths), opt.batch_size):
            mel = loader.load_batch(val_paths[i : i + opt.batch_size],
                                    opt.mel_len, mode="tile")
            if norm is not None:
                mel = norm(mel).astype(np.float32)
            logits_all.append(np.asarray(eval_fn(params, jnp.asarray(mel))))
        m = eval_metrics(val_y, np.concatenate(logits_all),
                         topk=(1, min(5, num_classes)))
        print(f"val@{it} " + json.dumps({k: round(v, 4)
                                         for k, v in m.items()}), flush=True)

    rng = np.random.RandomState(0)
    os.makedirs(opt.ckpt_dir, exist_ok=True)
    t0 = time.time()
    for it in range(opt.steps):
        idx = rng.randint(0, len(rows), opt.batch_size)
        mel = loader.load_batch([paths[i] for i in idx], opt.mel_len,
                                mode="tile")
        if norm is not None:
            mel = norm(mel).astype(np.float32)
        y = jnp.asarray(y_all[idx])
        params, opt_state, loss, acc = step(params, opt_state,
                                            jnp.asarray(mel), y)
        if it % 50 == 0 or it == opt.steps - 1:
            print(f"step {it}  loss {float(loss):.4f}  acc {float(acc):.3f}  "
                  f"({it / max(time.time() - t0, 1e-9):.2f} it/s)", flush=True)
        if (val_paths and opt.val_every
                and it % opt.val_every == opt.val_every - 1):
            run_val(it)
    if val_paths:
        run_val(opt.steps - 1)

    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(opt.ckpt_dir), "final")
    ckptr.save(path, {"params": params}, force=True)
    ckptr.wait_until_finished()
    print(f"saved -> {path}")


if __name__ == "__main__":
    main()
