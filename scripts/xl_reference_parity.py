"""XL-/real-shape parity vs the EXECUTED torch reference (CPU, fp32).

Runs the reference code itself (/root/reference, CPU fp32, seeded random
weights) at the REAL production shapes and compares the torch->JAX importer +
our models against it:

  stage 1 — XL text DiT forward (flag_large_dit.py:128-299 at
            configs/txt2audio-cfm-cfg-XL.yaml shapes: in 20, ctx 1024,
            hidden 1152, depth 28, heads 16): plain path (per-element t),
            shared-t anchor, and the serving planned path
            (dit_sample_plan + dit_apply_planned).
  stage 2 — full 25-step Euler CFG ODE at XL (Wrapper_cfg semantics,
            cfm1_audio.py:88-161) -> latent z.
  stage 3 — z / scale_factor -> REAL-config 1-D VAE decode
            (autoencoder1d.py at ch 384, ch_mult [1,2,4], z 20) -> the
            BASELINE.md mel-gate surface, end-to-end at XL scale.
  stage 4 — REAL-config BigVGAN ("bigvnat": upsample 4,4,2,2,2,2, initial
            channel 1536, snakebeta, vocoder/bigvgan/models.py:135-215) on
            the reference mel — component parity at production size.

Closes VERDICT round-1 weak #3: the committed fixtures are toy-scale
(hidden 64 / depth 2) and PARITY_XL.json is self-consistency only; this
artifact anchors the full stacks at real shapes to the reference itself.

~10 min on the 1-core VM (torch: 2 forwards + 24 dual-batch ODE steps + VAE
+ vocoder; JAX mirrors each). Writes PARITY_XL_REF.json at the repo root;
tests/test_xl_ref_parity.py asserts the committed artifact's tolerances.

Run: python scripts/xl_reference_parity.py
"""

import json
import os
import sys
import time

os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

# CPU-only comparison; never touches the TPU tunnel (the axon sitecustomize
# ignores JAX_PLATFORMS=cpu — must set the config programmatically).
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from gen_reference_fixtures import install_stubs, randomize_  # noqa: E402

XL = dict(in_channels=20, context_dim=1024, hidden_size=1152, depth=28,
          num_heads=16, max_len=1000)
# real 1-D VAE (configs/txt2audio-cfm-cfg-XL.yaml first_stage_config)
DDCONFIG = dict(double_z=True, in_channels=80, out_ch=80, z_channels=20,
                kernel_size=5, ch=384, ch_mult=[1, 2, 4], num_res_blocks=2,
                attn_layers=[3], down_layers=[0], dropout=0.0)
EMBED_DIM = 20
# real bigvnat 16 kHz vocoder (hop 256 = prod(upsample_rates))
BIGV_H = dict(num_mels=80, upsample_rates=[4, 4, 2, 2, 2, 2],
              upsample_kernel_sizes=[8, 8, 4, 4, 4, 4],
              upsample_initial_channel=1536, resblock="1",
              resblock_kernel_sizes=[3, 7, 11],
              resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
              activation="snakebeta", snake_logscale=True)

B, T, LY = 2, 312, 154
SEED_W, SEED_X = 11, 12
T_PLAIN = [17, 940]     # per-element timesteps (exercise t_embedder batching)
T_SHARED = 777          # planned path precomputes per-STEP (shared-t) slices
ODE_STEPS, CFG_SCALE, SCALE_FACTOR = 25, 3.0, 0.6404


def _stats(ours, ref):
    ours = np.asarray(ours, np.float64)
    ref = np.asarray(ref, np.float64)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    scale = max(float(np.mean(np.abs(ref))), 1e-6)
    return {
        "rel_mae": float(np.mean(np.abs(ours - ref))) / scale,
        "rel_max": float(np.max(np.abs(ours - ref))) / scale,
        "abs_mae": float(np.mean(np.abs(ours - ref))),
        "ref_mean_abs": scale,
        "ref_rms": float(np.sqrt(np.mean(ref * ref))),
    }


def main():
    t0 = time.time()

    def log(msg):
        print(f"[xl-ref] {msg} ({time.time()-t0:.0f}s)", flush=True)

    install_stubs()
    from ldm.modules.diffusionmodules.flag_large_dit import TxtFlagLargeDiT
    from ldm.models.autoencoder1d import AutoencoderKL
    from vocoder.bigvgan.models import BigVGAN

    res = {}

    # ---------------- stage 1+2: reference XL DiT ---------------------------
    log("building reference XL DiT (750M fp32)...")
    torch.manual_seed(0)
    model = TxtFlagLargeDiT(**XL).eval()
    randomize_(model, seed=SEED_W)
    n_params = sum(p.numel() for p in model.parameters())
    log(f"reference DiT params: {n_params/1e6:.1f}M")

    g = torch.Generator().manual_seed(SEED_X)
    x = torch.randn(B, XL["in_channels"], T, generator=g)
    ctx = torch.randn(B, LY, XL["context_dim"], generator=g)
    t_plain = torch.tensor(T_PLAIN, dtype=torch.long)
    t_shared = torch.tensor([T_SHARED] * B, dtype=torch.long)

    with torch.no_grad():
        ref_plain = model(x, t_plain, ctx).numpy()
        log("torch forward (per-element t) done")
        ref_shared = model(x, t_shared, ctx).numpy()
        log("torch forward (shared t) done")

    # 25-step Euler CFG ODE, Wrapper_cfg semantics (cfm1_audio.py:88-161):
    # cat([x]*2), cat([uc,c]), t = floor(t*1000), e_uc + s*(e_c - e_uc)
    x0 = torch.randn(1, XL["in_channels"], T, generator=g)
    c = ctx[:1]
    uc = torch.zeros_like(c)
    t_span = torch.linspace(0, 1, ODE_STEPS)
    z = x0.clone()
    with torch.no_grad():
        for i in range(ODE_STEPS - 1):
            dt = t_span[i + 1] - t_span[i]
            x_in = torch.cat([z] * 2)
            t_in = torch.cat([torch.tensor([t_span[i] * 1000]).long()] * 2)
            e_uc, e_c = model(x_in, t_in, torch.cat([uc, c])).chunk(2)
            z = z + dt * (e_uc + CFG_SCALE * (e_c - e_uc))
            if i % 6 == 0:
                log(f"torch ODE step {i}/{ODE_STEPS-1}, |z|rms="
                    f"{float(z.pow(2).mean().sqrt()):.3f}")
    ref_z = z.numpy()
    log("torch 25-step ODE done")

    dit_sd = {k: v.numpy() for k, v in model.state_dict().items()}
    del model

    # ---------------- JAX side: DiT forward + planned + ODE -----------------
    from maa3_tpu.models.dit import (DiTConfig, dit_apply, dit_apply_planned,
                                     dit_sample_plan)
    from maa3_tpu.torch_import import dit_from_torch
    from maa3_tpu.diffusion.cfm import sample_cfg

    cfg = DiTConfig(**XL)
    params = dit_from_torch(dit_sd, depth=cfg.depth)
    del dit_sd
    log("DiT imported to JAX")

    xj = jnp.asarray(x.numpy())
    ctxj = jnp.asarray(ctx.numpy())

    ours_plain = dit_apply(params, cfg, xj, jnp.asarray(T_PLAIN), ctxj,
                           compute_dtype=jnp.float32)
    res["dit_plain_vs_ref"] = _stats(ours_plain, ref_plain)
    log("jax plain forward done")

    ours_shared = dit_apply(params, cfg, xj, jnp.asarray([T_SHARED] * B),
                            ctxj, compute_dtype=jnp.float32)
    res["dit_plain_vs_ref_shared_t"] = _stats(ours_shared, ref_shared)

    plan = dit_sample_plan(params, cfg, jnp.asarray([T_SHARED]), ctxj,
                           compute_dtype=jnp.float32)
    ours_planned = dit_apply_planned(params, cfg, xj, plan["mods"][0],
                                     plan["final"][0], plan["yk"],
                                     plan["yv"], compute_dtype=jnp.float32)
    res["dit_planned_vs_ref"] = _stats(ours_planned, ref_shared)
    log("jax planned forward done")
    del ours_plain, ours_shared, ours_planned, plan

    def velocity(x_in, t_int, ctx_in):
        return dit_apply(params, cfg, x_in, t_int, ctx_in,
                         compute_dtype=jnp.float32)

    ours_z = sample_cfg(velocity, jnp.asarray(x0.numpy()),
                        jnp.asarray(c.numpy()), jnp.asarray(uc.numpy()),
                        guidance_scale=CFG_SCALE, steps=ODE_STEPS)
    ours_z = np.asarray(ours_z)
    res["ode25_z_vs_ref"] = _stats(ours_z, ref_z)
    log("jax 25-step ODE done")
    del params

    # ---------------- stage 3: real-config VAE decode (mel gate) ------------
    log("building reference real-config VAE...")
    torch.manual_seed(0)
    vae = AutoencoderKL(embed_dim=EMBED_DIM, ddconfig=DDCONFIG,
                        lossconfig={"target": "torch.nn.Identity"}).eval()
    randomize_(vae, seed=SEED_W + 1)
    with torch.no_grad():
        ref_mel = vae.decode(torch.from_numpy(ref_z) / SCALE_FACTOR).numpy()
    log("torch VAE decode done")
    vae_sd = {k: v.numpy() for k, v in vae.state_dict().items()}
    del vae

    from maa3_tpu.models.vae1d import VAEConfig, vae_decode
    from maa3_tpu.torch_import import vae_from_torch

    vcfg = VAEConfig(in_channels=DDCONFIG["in_channels"],
                     out_ch=DDCONFIG["out_ch"], ch=DDCONFIG["ch"],
                     ch_mult=tuple(DDCONFIG["ch_mult"]),
                     num_res_blocks=DDCONFIG["num_res_blocks"],
                     attn_layers=tuple(l for l in DDCONFIG["attn_layers"]
                                       if l < len(DDCONFIG["ch_mult"])),
                     down_layers=tuple(DDCONFIG["down_layers"]),
                     kernel_size=DDCONFIG["kernel_size"],
                     z_channels=DDCONFIG["z_channels"], embed_dim=EMBED_DIM)
    vparams = vae_from_torch(vae_sd, vcfg)
    del vae_sd

    # component parity: same input (the reference latent) through both decoders
    ours_mel_comp = np.asarray(
        vae_decode(vparams, vcfg, jnp.asarray(ref_z) / SCALE_FACTOR))
    res["vae_decode_vs_ref"] = _stats(ours_mel_comp, ref_mel)
    # end-to-end: OUR ODE latent through OUR decoder vs reference end-to-end
    ours_mel_e2e = np.asarray(
        vae_decode(vparams, vcfg, jnp.asarray(ours_z) / SCALE_FACTOR))
    res["e2e_mel_vs_ref"] = _stats(ours_mel_e2e, ref_mel)
    log("jax VAE decode done")
    del vparams, ours_mel_comp, ours_mel_e2e

    # ---------------- stage 4: real-config BigVGAN --------------------------
    log("building reference real-config BigVGAN...")

    class _H(dict):
        __getattr__ = dict.__getitem__

    torch.manual_seed(0)
    bigv = BigVGAN(_H(BIGV_H)).eval()
    randomize_(bigv, seed=SEED_W + 2)
    n_voc = sum(p.numel() for p in bigv.parameters())
    mel_in = torch.from_numpy(ref_mel)
    with torch.no_grad():
        ref_wav = bigv(mel_in).numpy()
    log(f"torch BigVGAN ({n_voc/1e6:.1f}M) done")
    bigv_sd = {k: v.numpy() for k, v in bigv.state_dict().items()}
    del bigv

    from maa3_tpu.models.bigvgan import BigVGANConfig, bigvgan_apply
    from maa3_tpu.torch_import import bigvgan_from_torch

    bcfg = BigVGANConfig.from_dict(BIGV_H)
    bparams = bigvgan_from_torch(bigv_sd, bcfg)
    del bigv_sd
    ours_wav = np.asarray(bigvgan_apply(bparams, bcfg, jnp.asarray(ref_mel)))
    res["bigvgan_vs_ref"] = _stats(ours_wav, ref_wav[:, 0, :])
    log("jax BigVGAN done")

    res["_meta"] = {
        **XL, "batch": B, "latent_len": T, "ctx_len": LY,
        "seed_weights": SEED_W, "seed_inputs": SEED_X,
        "t_plain": T_PLAIN, "t_shared": T_SHARED,
        "ode_steps": ODE_STEPS, "cfg_scale": CFG_SCALE,
        "scale_factor": SCALE_FACTOR,
        "vae": {"ch": DDCONFIG["ch"], "ch_mult": DDCONFIG["ch_mult"],
                "z_channels": DDCONFIG["z_channels"]},
        "vocoder": {"upsample_rates": BIGV_H["upsample_rates"],
                    "initial_channel": BIGV_H["upsample_initial_channel"],
                    "params_m": round(n_voc / 1e6, 1)},
        "dit_params_m": round(n_params / 1e6, 1),
        "dtype": "float32", "backend": "cpu (torch MKL vs XLA)",
        "ref": "flag_large_dit.py / autoencoder1d.py / bigvgan models.py "
               "executed via tests/gen_reference_fixtures.py stubs",
        "wall_s": round(time.time() - t0, 1),
    }
    out = os.path.join(REPO, "PARITY_XL_REF.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
