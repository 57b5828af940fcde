"""Melception (Inception3-for-mel FID backbone) parity vs an executed torch
reference (CPU).

The reference class (ldm/modules/losses_audio/vggishish/train_melception.py:
20-34) subclasses torchvision's Inception3 (1-channel stem, stem maxpools
removed). torchvision is not installed here; the executable reference is
tests/torch_inception_ref.py — a clean-room torch implementation of the same
public architecture with torchvision-identical state_dict keys, so
torch_import.melception_from_torch is exercised on exactly the key-set a
real released melception checkpoint (melception-21-05-10T09-28-40.pt) has.

Runs at the REAL eval config: 309 VGGSound classes, 80-band mel, eval-mode
BN with nonzero running stats. Compares final logits, the 2048-d global-pool
FD feature (what scripts/cal_fd_score.py --backbone melception embeds), and
the InceptionAux head.

Writes PARITY_MELCEPTION_REF.json; tests/test_xl_ref_parity.py asserts it.
Run: python scripts/melception_reference_parity.py   (~2 min)
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

B, F, T = 2, 80, 176  # 10 s clip at hop 256 windows to ~176-frame crops


def _stats(ours, ref):
    ours = np.asarray(ours, np.float64)
    ref = np.asarray(ref, np.float64)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    scale = max(float(np.mean(np.abs(ref))), 1e-8)
    return {"rel_mae": float(np.mean(np.abs(ours - ref))) / scale,
            "rel_max": float(np.max(np.abs(ours - ref))) / scale}


def main():
    t0 = time.time()
    from torch_inception_ref import MelceptionRef
    from maa3_tpu.models.melception import MelceptionConfig, melception_apply
    from maa3_tpu.torch_import import melception_from_torch

    cfg = MelceptionConfig(num_classes=309)
    torch.manual_seed(91)
    ref = MelceptionRef(num_classes=cfg.num_classes)
    # nonzero BN running stats so the eval-mode normalization path (the one
    # an imported trained checkpoint takes) is actually exercised
    g = torch.Generator().manual_seed(92)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    0.1 * torch.randn(m.num_features, generator=g))
                m.running_var.copy_(
                    0.7 + 0.6 * torch.rand(m.num_features, generator=g))
    ref.eval()
    n_params = sum(p.numel() for p in ref.parameters())

    mel = 0.5 * torch.randn(B, F, T, generator=g)
    with torch.no_grad():
        ref_logits, ref_feats, _ = ref(mel, return_features=True)
        # aux head only runs in train mode in the reference forward; drive it
        # on the eval-mode Mixed_6e activation directly (same convention as
        # tests/test_melception.py)
        captured = {}
        h = ref.Mixed_6e.register_forward_hook(
            lambda m, i, o: captured.__setitem__("x", o))
        ref(mel)
        ref_aux = ref.AuxLogits(captured["x"])
        h.remove()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    del ref

    params = melception_from_torch(sd)
    logits, feats, aux = melception_apply(
        params, cfg, jnp.asarray(mel.numpy()),
        return_features=True, return_aux=True)

    res = {"logits": _stats(logits, ref_logits.numpy()),
           "fd_features_2048d": _stats(feats, ref_feats.numpy()),
           "aux_logits": _stats(aux, ref_aux.numpy()),
           "params_m": round(n_params / 1e6, 1),
           "_meta": {"batch": B, "n_mels": F, "frames": T,
                     "num_classes": cfg.num_classes,
                     "bn": "eval mode, nonzero running stats",
                     "dtype": "float32", "backend": "cpu (torch vs XLA)",
                     "ref": "vggishish/train_melception.py:20-34 "
                            "(torchvision Inception3 w/ 1-ch stem, maxpools "
                            "removed) executed via tests/torch_inception_ref",
                     "wall_s": round(time.time() - t0, 1)}}
    out = os.path.join(REPO, "PARITY_MELCEPTION_REF.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)
    print(f"[melception-ref] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
