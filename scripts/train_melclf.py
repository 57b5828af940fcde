#!/usr/bin/env python
"""Mel-classifier trainer — vggishish/train_vggishish.py + train_melception.py
equivalent: trains the FID/KL eval backbone on (mel, label) TSVs.

TSV columns: mel_path, label (integer or class-name; names are indexed).
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
    opt = p.parse_args()

    import jax.numpy as jnp
    import optax
    from maa3_tpu.data.datasets import read_tsv
    from maa3_tpu.native.io import NativeLoader
    from maa3_tpu.models.melclf import MelClfConfig, melclf_init, melclf_apply

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
    print(f"{len(rows)} samples, {num_classes} classes")

    conv = ((16, "MP", 32, "MP", 64, "MP") if opt.small
            else MelClfConfig().conv_layers)
    cfg = MelClfConfig(conv_layers=conv, num_classes=num_classes)
    # small stack: fewer channels -> smaller flatten
    params = melclf_init(jax.random.PRNGKey(0), cfg)
    tx = optax.adamw(opt.lr)
    opt_state = tx.init(params)
    loader = NativeLoader(rows=80)

    @jax.jit
    def step(params, opt_state, mel, y):
        def loss_fn(p):
            logits = melclf_apply(p, cfg, mel)
            loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                logits, y))
            acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
            return loss, acc
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    rng = np.random.RandomState(0)
    os.makedirs(opt.ckpt_dir, exist_ok=True)
    t0 = time.time()
    for it in range(opt.steps):
        idx = rng.randint(0, len(rows), opt.batch_size)
        mel = loader.load_batch([paths[i] for i in idx], opt.mel_len,
                                mode="tile")
        y = jnp.asarray(y_all[idx])
        params, opt_state, loss, acc = step(params, opt_state,
                                            jnp.asarray(mel), y)
        if it % 50 == 0 or it == opt.steps - 1:
            print(f"step {it}  loss {float(loss):.4f}  acc {float(acc):.3f}  "
                  f"({it / max(time.time() - t0, 1e-9):.2f} it/s)", flush=True)

    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(opt.ckpt_dir), "final")
    ckptr.save(path, {"params": params}, force=True)
    ckptr.wait_until_finished()
    print(f"saved -> {path}")


if __name__ == "__main__":
    main()
