"""LPAPS parity vs the executed reference (CPU).

Executes ldm/modules/losses_audio/lpaps.py's LPAPS class (per-frequency
ScalingLayer + bn-less VGGishish16 + 5 NetLinLayer 1x1 convs) on seeded
random weights — get_ckpt_path is pointed at locally generated files (the
real ones live behind an unreachable download, util.py:12-23) — and compares
torch_import.lpaps_from_torch + eval.lpaps.lpaps_apply on the same inputs:
the final perceptual distance AND all 5 tap activations.

Writes PARITY_LPAPS_REF.json; tests/test_xl_ref_parity.py asserts it.
Run: python scripts/lpaps_reference_parity.py   (~1 min)
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

B, F, T = 2, 80, 96
CHNS = (64, 128, 256, 512, 512)


def _stats(ours, ref):
    ours = np.asarray(ours, np.float64)
    ref = np.asarray(ref, np.float64)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    scale = max(float(np.mean(np.abs(ref))), 1e-8)
    return {"rel_mae": float(np.mean(np.abs(ours - ref))) / scale,
            "rel_max": float(np.max(np.abs(ours - ref))) / scale}


def _make_fake_ckpts(tmpdir):
    """Seeded stand-ins for the two unreachable downloads: the vggishish+lin
    weights and the per-frequency mel stats file (lpaps.py:33-36,66-69)."""
    from ldm.modules.losses_audio.vggishish.model import VGGishish
    torch.manual_seed(71)
    conv_layers = [64, 64, "MP", 128, 128, "MP", 256, 256, 256, "MP",
                   512, 512, 512, "MP", 512, 512, 512]
    vgg = VGGishish(conv_layers, use_bn=False, num_classes=309)
    randomize_(vgg, seed=72)
    sd = {k: v for k, v in vgg.state_dict().items()
          if k.startswith("features.")}
    g = torch.Generator().manual_seed(73)
    for k, c in enumerate(CHNS):
        sd[f"lin{k}.model.1.weight"] = torch.randn((1, c, 1, 1), generator=g)
    ckpt = os.path.join(tmpdir, "vggishish16.pt")
    torch.save(sd, ckpt)

    rng = np.random.default_rng(74)
    means = rng.uniform(0.2, 0.8, F).astype(np.float32)
    stds = rng.uniform(0.05, 0.3, F).astype(np.float32)
    stats = os.path.join(tmpdir, "means_stds.txt")
    np.savetxt(stats, np.stack([means, stds], axis=1))
    return {"vggishish_lpaps": ckpt,
            "vggishish_mean_std_melspec_10s_22050hz": stats}


def main():
    t0 = time.time()
    install_stubs()
    import ldm.modules.losses_audio.lpaps as lpaps_mod
    from maa3_tpu.eval.lpaps import (LPAPS_BACKBONE_CFG, lpaps_apply,
                                     melclf_features)
    from maa3_tpu.torch_import import lpaps_from_torch

    tmpdir = "/tmp/lpaps_parity"
    os.makedirs(tmpdir, exist_ok=True)
    paths = _make_fake_ckpts(tmpdir)
    lpaps_mod.get_ckpt_path = lambda name, root=None, check=False: paths[name]

    ref = lpaps_mod.LPAPS(use_dropout=True).eval()
    n_params = sum(p.numel() for p in ref.parameters())

    g = torch.Generator().manual_seed(75)
    mel_a = torch.rand(B, 1, F, T, generator=g) * 2 - 1   # [-1, 1] image mels
    mel_b = mel_a + 0.3 * torch.randn(B, 1, F, T, generator=g)
    with torch.no_grad():
        ref_val = ref(mel_a, mel_b)                        # (B, 1, 1, 1)
        ref_taps = ref.net(ref.scaling_layer(mel_a))       # 5 activations

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    del ref

    params = lpaps_from_torch(sd)
    a_j = jnp.asarray(mel_a.numpy()[:, 0])                 # (B, F, T)
    b_j = jnp.asarray(mel_b.numpy()[:, 0])
    ours_val = lpaps_apply(params, LPAPS_BACKBONE_CFG, a_j, b_j)

    shift = params["scaling"]["shift"][None, :, None]
    scale = params["scaling"]["scale"][None, :, None]
    ours_taps = melclf_features(params, LPAPS_BACKBONE_CFG,
                                (a_j - shift) / scale)

    res = {"distance": _stats(ours_val, ref_val.numpy().reshape(-1)),
           "taps": {f"relu{i+1}": _stats(o, r.numpy())
                    for i, (o, r) in enumerate(zip(ours_taps, ref_taps))},
           "params_m": round(n_params / 1e6, 1),
           "_meta": {"batch": B, "n_mels": F, "frames": T,
                     "chns": list(CHNS), "dtype": "float32",
                     "backend": "cpu (torch vs XLA)",
                     "ref": "ldm/modules/losses_audio/lpaps.py:17-142 "
                            "executed (local seeded ckpts)",
                     "wall_s": round(time.time() - t0, 1)}}
    out = os.path.join(REPO, "PARITY_LPAPS_REF.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)
    print(f"[lpaps-ref] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
