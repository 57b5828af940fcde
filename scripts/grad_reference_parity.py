"""Training-GRADIENT parity vs the executed torch reference (M scale, CPU).

Forward parity (tests/test_reference_parity.py, PARITY_XL_REF.json,
PARITY_FAMILIES_REF.json) anchors inference; nothing yet anchors the
BACKWARD pass to the reference. This script does: it computes the CFM
training loss (cfm1_audio.py:37-58 — OT interpolant x_t = t*x1 + (1-(1-s)t)*x0,
target ut = x1 - (1-s)*x0, MSE) on the SAME weights/inputs through

  torch:  reference TxtFlagLargeDiT (flag_large_dit.py:128-255) + autograd
  jax:    dit_from_torch-imported params + jax.grad over dit_apply

and compares the gradient of EVERY parameter tensor. dit_from_torch is a
pure linear re-arrangement (rename / transpose / stack), so feeding the
torch GRADIENTS through the same mapping yields gradients in our pytree
layout — leaf-for-leaf comparable.

M scale (768 x 16L x 32H, 198M params — the smallest released family) keeps
the 1-core run in minutes while exercising every op's backward (RoPE,
gated cross-attn, adaLN modulation, SwiGLU, RMSNorm, scan-stacked blocks).

Writes PARITY_GRAD_REF.json; tests/test_xl_ref_parity.py asserts it.
Run: python scripts/grad_reference_parity.py   (~5 min)
"""

import json
import os
import sys
import time

os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize ignores the env var

import jax.numpy as jnp
import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from gen_reference_fixtures import install_stubs, randomize_  # noqa: E402

M_CFG = dict(in_channels=20, context_dim=1024, hidden_size=768, depth=16,
             num_heads=32, max_len=1000)
B, T, LY = 2, 312, 154
SIGMA_MIN = 1e-4
SEED_W, SEED_X = 31, 32


def main():
    t0 = time.time()

    def log(msg):
        print(f"[grad-ref] {msg} ({time.time()-t0:.0f}s)", flush=True)

    install_stubs()
    from ldm.modules.diffusionmodules.flag_large_dit import TxtFlagLargeDiT

    torch.manual_seed(0)
    model = TxtFlagLargeDiT(**M_CFG).eval()
    randomize_(model, seed=SEED_W)
    log(f"reference M model: "
        f"{sum(p.numel() for p in model.parameters())/1e6:.1f}M params")

    # CFM batch (cfm1_audio.py:37-58): x1 = data latent, x0 = noise,
    # t ~ U[0,1) -> model timestep floor(t*1000)
    g = torch.Generator().manual_seed(SEED_X)
    x1 = torch.randn(B, M_CFG["in_channels"], T, generator=g)
    x0 = torch.randn(B, M_CFG["in_channels"], T, generator=g)
    ctx = torch.randn(B, LY, M_CFG["context_dim"], generator=g)
    t_cont = torch.tensor([0.137, 0.861])
    t_int = (t_cont * 1000).long()
    tb = t_cont.view(B, 1, 1)
    x_noisy = tb * x1 + (1.0 - (1.0 - SIGMA_MIN) * tb) * x0
    ut = x1 - (1.0 - SIGMA_MIN) * x0

    # ---- torch loss + autograd -------------------------------------------
    out = model(x_noisy, t_int, ctx)
    loss = torch.mean((out - ut) ** 2)
    loss.backward()
    ref_loss = float(loss.detach())
    log(f"torch loss {ref_loss:.6f}, backward done")

    param_names = {n for n, _ in model.named_parameters()}
    grad_sd = {n: p.grad.numpy() for n, p in model.named_parameters()}
    # buffers (freqs_cis) have no grads; fill zeros so the importer mapping
    # sees a complete state_dict
    for k, v in model.state_dict().items():
        if k not in param_names:
            grad_sd[k] = np.zeros(v.shape, np.float32)
    weight_sd = {k: v.numpy() for k, v in model.state_dict().items()}
    del model

    # ---- jax loss + grad --------------------------------------------------
    from maa3_tpu.models.dit import DiTConfig, dit_apply
    from maa3_tpu.torch_import import dit_from_torch

    cfg = DiTConfig(**M_CFG)
    params = dit_from_torch(weight_sd, depth=cfg.depth)
    ref_grads = dit_from_torch(grad_sd, depth=cfg.depth)  # same linear map
    del weight_sd, grad_sd

    xj, utj = jnp.asarray(x_noisy.numpy()), jnp.asarray(ut.numpy())
    tj, ctxj = jnp.asarray(t_int.numpy()), jnp.asarray(ctx.numpy())

    def loss_fn(p):
        pred = dit_apply(p, cfg, xj, tj, ctxj, compute_dtype=jnp.float32)
        return jnp.mean((pred - utj) ** 2)

    ours_loss, ours_grads = jax.value_and_grad(loss_fn)(params)
    ours_loss = float(ours_loss)
    log(f"jax loss {ours_loss:.6f}, grad done")

    # ---- leaf-by-leaf comparison ------------------------------------------
    ref_leaves, treedef = jax.tree_util.tree_flatten_with_path(ref_grads)
    ours_flat = jax.tree_util.tree_leaves(ours_grads)
    assert len(ref_leaves) == len(ours_flat)

    rows = []
    for (path, ref_g), ours_g in zip(ref_leaves, ours_flat):
        name = jax.tree_util.keystr(path)
        if "freqs" in name or "rope" in name:
            continue  # buffer placeholders, no grad
        r = np.asarray(ref_g, np.float64)
        o = np.asarray(ours_g, np.float64)
        scale = max(float(np.mean(np.abs(r))), 1e-12)
        rows.append({
            "leaf": name,
            "rel_mae": float(np.mean(np.abs(o - r))) / scale,
            "ref_norm": float(np.linalg.norm(r)),
            "norm_ratio": float(np.linalg.norm(o) /
                                max(np.linalg.norm(r), 1e-30)),
        })
    rows.sort(key=lambda r: -r["rel_mae"])

    gref = np.concatenate([np.asarray(r, np.float64).ravel()
                           for _, r in ref_leaves])
    gours = np.concatenate([np.asarray(o, np.float64).ravel()
                            for o in ours_flat])
    cos = float(np.dot(gref, gours) /
                (np.linalg.norm(gref) * np.linalg.norm(gours)))

    res = {
        "loss_torch": ref_loss,
        "loss_jax": ours_loss,
        "loss_rel_diff": abs(ours_loss - ref_loss) / abs(ref_loss),
        "global_cosine": cos,
        "global_norm_ratio": float(np.linalg.norm(gours) /
                                   np.linalg.norm(gref)),
        "n_leaves": len(rows),
        "worst_leaf_rel_mae": rows[0]["rel_mae"],
        "median_leaf_rel_mae": rows[len(rows) // 2]["rel_mae"],
        "worst5": rows[:5],
        "_meta": {**M_CFG, "batch": B, "latent_len": T, "ctx_len": LY,
                  "sigma_min": SIGMA_MIN, "t_cont": [0.137, 0.861],
                  "seed_weights": SEED_W, "seed_inputs": SEED_X,
                  "dtype": "float32", "backend": "cpu (torch MKL vs XLA)",
                  "loss": "CFM MSE, cfm1_audio.py:37-58",
                  "wall_s": round(time.time() - t0, 1)},
    }
    out_path = os.path.join(REPO, "PARITY_GRAD_REF.json")
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
