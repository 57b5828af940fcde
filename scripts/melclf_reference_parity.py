"""Mel-classifier (VGGishish) parity vs the executed reference (CPU).

Executes ldm/modules/losses_audio/vggishish/model.py's VGGishish at the real
eval config (use_bn=True, 309 VGGSound classes) in eval mode — with nonzero
running BN stats, so the eval-mode normalization path is actually exercised —
and compares torch_import.melclf_from_torch + models.melclf.melclf_apply:
final logits AND the 4096-d penultimate embedding (the Frechet-distance
feature used by scripts/cal_fd_score.py).

Writes PARITY_MELCLF_REF.json; tests/test_xl_ref_parity.py asserts it.
Run: python scripts/melclf_reference_parity.py   (~1 min)
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

B, F, T = 2, 80, 176  # T/16=11 -> adaptive pool (5,11)->(5,10), uneven bins


def _stats(ours, ref):
    ours = np.asarray(ours, np.float64)
    ref = np.asarray(ref, np.float64)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    scale = max(float(np.mean(np.abs(ref))), 1e-8)
    return {"rel_mae": float(np.mean(np.abs(ours - ref))) / scale,
            "rel_max": float(np.max(np.abs(ours - ref))) / scale}


def main():
    t0 = time.time()
    install_stubs()
    from ldm.modules.losses_audio.vggishish.model import VGGishish
    from maa3_tpu.models.melclf import MelClfConfig, melclf_apply
    from maa3_tpu.torch_import import melclf_from_torch

    cfg = MelClfConfig(use_bn=True, num_classes=309)
    torch.manual_seed(81)
    ref = VGGishish(list(cfg.conv_layers), use_bn=True,
                    num_classes=cfg.num_classes)
    randomize_(ref, seed=82)
    # randomize_ leaves buffers alone — give the BN running stats nonzero
    # values so eval mode differs from train mode
    g = torch.Generator().manual_seed(83)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(0.3 * torch.randn(m.num_features,
                                                   generator=g))
            m.running_var.copy_(
                (0.5 + torch.rand(m.num_features, generator=g)))
    ref.eval()
    n_params = sum(p.numel() for p in ref.parameters())

    mel = torch.randn(B, F, T, generator=g)
    with torch.no_grad():
        ref_logits = ref(mel)
        # penultimate 4096-d embedding (post second ReLU) — the FD feature
        x = ref.features(mel.unsqueeze(1))
        x = ref.flatten(ref.avgpool(x))
        ref_emb = ref.classifier[:4](x)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    del ref

    params = melclf_from_torch(sd, cfg)
    logits, emb = melclf_apply(params, cfg, jnp.asarray(mel.numpy()),
                               return_embedding=True)

    res = {"logits": _stats(logits, ref_logits.numpy()),
           "embedding": _stats(emb, ref_emb.numpy()),
           "params_m": round(n_params / 1e6, 1),
           "_meta": {"batch": B, "n_mels": F, "frames": T,
                     "num_classes": cfg.num_classes, "use_bn": True,
                     "bn": "eval mode, nonzero running stats",
                     "dtype": "float32", "backend": "cpu (torch vs XLA)",
                     "ref": "losses_audio/vggishish/model.py:5-68 executed",
                     "wall_s": round(time.time() - t0, 1)}}
    out = os.path.join(REPO, "PARITY_MELCLF_REF.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)
    print(f"[melclf-ref] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
