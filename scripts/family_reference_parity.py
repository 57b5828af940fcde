"""Executed-reference parity for EVERY DiT family at its real config shape.

scripts/xl_reference_parity.py anchors the XL text DiT (and the ODE + VAE +
vocoder chain) to the executed torch reference; this script sweeps the
remaining released model families at their production configurations:

  M    — text DiT 768 x 16L x 32H  (configs/txt2audio-cfm-cfg.yaml:34-39;
         txt2music-cfm-cfg.yaml is the identical architecture, so this row
         covers the music family too)
  XXL  — text DiT 1536 x 32L x 32H (configs/txt2audio-cfm-cfg-XXL.yaml:19-24)
  V2A  — video MoE DiT 768 x 16L x 32H, 4 time-bucket + 4 freq-slice experts
         (configs/video2audio-cfm-cfg-moe.yaml:19-25,
          flag_large_dit_moe.py:613-740)

Each family: build the reference model with seeded random weights (zero-init
gates unfrozen), run one fp32 forward at the real latent/context shape, feed
the SAME state_dict through the torch->JAX importer, compare.

Writes PARITY_FAMILIES_REF.json; tests/test_xl_ref_parity.py asserts it.
Run: python scripts/family_reference_parity.py   (~5-10 min, 1-core CPU)
"""

import gc
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

T_LATENT = 312          # 10 s clip latent frames
T_PLAIN = [17, 940]

FAMILIES = {
    "M": dict(in_channels=20, context_dim=1024, hidden_size=768, depth=16,
              num_heads=32, max_len=1000),
    "XXL": dict(in_channels=20, context_dim=1024, hidden_size=1536, depth=32,
                num_heads=32, max_len=1000),
    "V2A_MoE": dict(in_channels=20, context_dim=768, hidden_size=768,
                    depth=16, num_heads=32, max_len=1000, multiple_of=256,
                    num_experts=4),
}


def _stats(ours, ref):
    ours = np.asarray(ours, np.float64)
    ref = np.asarray(ref, np.float64)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    scale = max(float(np.mean(np.abs(ref))), 1e-6)
    return {
        "rel_mae": float(np.mean(np.abs(ours - ref))) / scale,
        "rel_max": float(np.max(np.abs(ours - ref))) / scale,
        "ref_rms": float(np.sqrt(np.mean(ref * ref))),
    }


def run_family(name, cfg_d, t0):
    def log(msg):
        print(f"[fam:{name}] {msg} ({time.time()-t0:.0f}s)", flush=True)

    moe = "num_experts" in cfg_d
    if moe:
        from ldm.modules.diffusionmodules.flag_large_dit_moe import (
            VideoFlagLargeDiT as RefModel)
    else:
        from ldm.modules.diffusionmodules.flag_large_dit import (
            TxtFlagLargeDiT as RefModel)

    torch.manual_seed(0)
    model = RefModel(**cfg_d).eval()
    randomize_(model, seed=21)
    n_params = sum(p.numel() for p in model.parameters())
    log(f"reference params: {n_params/1e6:.1f}M")

    g = torch.Generator().manual_seed(22)
    if moe:
        # 40-frame video-feature window (video2audio_flow.py seq_len), one
        # timestep per time-bucket expert (t // 250)
        b, ly = 4, 40
        t = torch.tensor([0, 260, 600, 999], dtype=torch.long)
    else:
        b, ly = 2, 154
        t = torch.tensor(T_PLAIN, dtype=torch.long)
    x = torch.randn(b, cfg_d["in_channels"], T_LATENT, generator=g)
    ctx = torch.randn(b, ly, cfg_d["context_dim"], generator=g)

    with torch.no_grad():
        ref_out = model(x, t, ctx).numpy()
    log("torch forward done")
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    del model
    gc.collect()

    from maa3_tpu.torch_import import dit_from_torch

    if moe:
        from maa3_tpu.models.dit_moe import MoEDiTConfig, moe_dit_apply
        cfg = MoEDiTConfig(**cfg_d)
        params = dit_from_torch(sd, depth=cfg.depth, moe=True,
                                num_experts=cfg.num_experts)
        del sd
        ours = moe_dit_apply(params, cfg, jnp.asarray(x.numpy()),
                             jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()),
                             compute_dtype=jnp.float32)
    else:
        from maa3_tpu.models.dit import DiTConfig, dit_apply
        cfg = DiTConfig(**cfg_d)
        params = dit_from_torch(sd, depth=cfg.depth)
        del sd
        ours = dit_apply(params, cfg, jnp.asarray(x.numpy()),
                         jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()),
                         compute_dtype=jnp.float32)
    log("jax forward done")
    s = _stats(ours, ref_out)
    s["cfg"] = dict(cfg_d)
    s["params_m"] = round(n_params / 1e6, 1)
    del params, ours
    gc.collect()
    return s


def main():
    t0 = time.time()
    install_stubs()
    res = {}
    for name, cfg_d in FAMILIES.items():
        res[name] = run_family(name, cfg_d, t0)
    res["_meta"] = {
        "latent_len": T_LATENT, "dtype": "float32",
        "backend": "cpu (torch MKL vs XLA)",
        "note": "M covers txt2music (identical architecture/config)",
        "ref": "flag_large_dit(_moe).py executed via "
               "tests/gen_reference_fixtures.py stubs",
        "wall_s": round(time.time() - t0, 1),
    }
    out = os.path.join(REPO, "PARITY_FAMILIES_REF.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)
    print(f"[fam] wrote {out} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
