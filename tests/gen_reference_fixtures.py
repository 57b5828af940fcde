"""Generate parity fixtures by EXECUTING the reference torch code.

This script imports the actual modules under /root/reference (CPU, fp32),
runs them on seeded random weights/inputs, and saves state_dicts + inputs +
outputs as .npz goldens in tests/fixtures/. The parity tests
(tests/test_reference_parity.py) then assert that importer + JAX models
reproduce these outputs — closing the "self-authored oracle" gap: nothing
here re-implements reference math, it runs the reference code itself.

Reference modules executed (all fp32 on CPU, which takes the SDPA attention
path — the same math the flash path computes):
  - ldm/modules/diffusionmodules/flag_large_dit.py      (TxtFlagLargeDiT)
  - ldm/modules/diffusionmodules/flag_large_dit_moe.py  (VideoFlagLargeDiT)
  - ldm/models/autoencoder1d.py                         (AutoencoderKL 1-D)
  - vocoder/bigvgan/models.py                           (BigVGAN + alias-free)
  - preprocess/NAT_mel.py                               (MelNet)
  - cfm1_audio.py:145-161 Wrapper_cfg semantics, replicated as a plain torch
    Euler loop over the reference DiT (torchdyn's euler solver steps exactly
    on the t_span nodes: x <- x + dt * f(t_i, x)).

Unavailable CUDA/absent deps are stubbed at import time only:
  - flash_attn (never called: fp32 input takes the SDPA branch,
    flag_large_dit_moe.py:382-388)
  - pytorch_lightning.LightningModule -> nn.Module (AutoencoderKL base; no
    PL machinery used at inference)
  - omegaconf (BigVGAN models.py imports it at top level; unused by the class)
  - librosa.filters.mel -> maa3_tpu.ops.stft.mel_filterbank (librosa is not
    installed in this image; the slaney filterbank is shared between both
    sides, so the mel fixture verifies the STFT + log-compression path
    against torch.stft — the fbank itself is covered by formula-level tests
    in tests/test_mel.py)
  - torch.Tensor.cuda -> identity (precompute_freqs_cis hardcodes .cuda(),
    flag_large_dit.py:245)

Run: python tests/gen_reference_fixtures.py  (regenerates tests/fixtures/)
"""

import io
import json
import os
import sys
import types

os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")  # neuter @torch.compile
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import numpy as np
import torch
import torch.nn as nn

REF = os.environ.get("MAA3_REFERENCE_DIR", "/root/reference")
HERE = os.path.dirname(os.path.abspath(__file__))
FIXDIR = os.path.join(HERE, "fixtures")
REPO = os.path.dirname(HERE)


def _module(name):
    """Stub module with a valid __spec__ (importlib.util.find_spec — used by
    transformers' optional-dependency probing — raises on spec-less modules)."""
    import importlib.machinery
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m


def install_stubs():
    # flash_attn: imported at module top; never called on fp32 inputs
    fa = _module("flash_attn")

    def _no_flash(*a, **k):
        raise RuntimeError("flash_attn stub called — fp32 should use SDPA")

    fa.flash_attn_func = _no_flash
    fa.flash_attn_varlen_func = _no_flash
    bp = _module("flash_attn.bert_padding")
    bp.index_first_axis = _no_flash
    bp.pad_input = _no_flash
    bp.unpad_input = _no_flash
    fa.bert_padding = bp
    sys.modules["flash_attn"] = fa
    sys.modules["flash_attn.bert_padding"] = bp

    # pytorch_lightning: AutoencoderKL subclasses pl.LightningModule but uses
    # no PL machinery on the encode/decode path
    pl = _module("pytorch_lightning")
    pl.LightningModule = nn.Module
    sys.modules["pytorch_lightning"] = pl

    # omegaconf: imported at top of vocoder/bigvgan/models.py, unused by BigVGAN
    oc = _module("omegaconf")

    class _OmegaConf:
        pass

    oc.OmegaConf = _OmegaConf
    sys.modules["omegaconf"] = oc

    # librosa.filters.mel: not installed; shared slaney implementation
    sys.path.insert(0, REPO)
    from maa3_tpu.ops.stft import mel_filterbank

    lr = _module("librosa")
    lf = _module("librosa.filters")

    def _mel(sr, n_fft, n_mels, fmin, fmax):
        return np.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax),
                          dtype=np.float32)

    lf.mel = _mel
    lr.filters = lf
    sys.modules["librosa"] = lr
    sys.modules["librosa.filters"] = lf

    # .cuda() hardcoded in precompute_freqs_cis (flag_large_dit.py:245)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    sys.path.insert(0, REF)


def randomize_(module: nn.Module, seed: int):
    """Fill every parameter with seeded values that keep activations O(1)
    but exercise every code path (zero-init gates/adaLN would otherwise hide
    the cross-attention and modulation branches)."""
    g = torch.Generator().manual_seed(seed)
    param_names = {n for n, _ in module.named_parameters()}
    sd = module.state_dict()
    for k, v in sd.items():
        if k not in param_names:
            continue  # buffers (e.g. alias-free sinc filters) stay computed
        if v.dtype not in (torch.float32, torch.float64):
            continue
        r = torch.randn(v.shape, generator=g)
        if ("norm" in k.lower() or "alpha" in k or "beta" in k) and v.ndim <= 1:
            sd[k] = 1.0 + 0.1 * r          # norm scales / snake alpha-beta
        elif k.endswith(".gate") or k == "gate" or "gate" in k:
            sd[k] = 0.7 * r                # open the cross-attn gates
        elif "bias" in k:
            sd[k] = 0.02 * r
        else:
            fan_in = v.shape[-1] if v.ndim >= 2 else max(v.numel(), 1)
            sd[k] = r / np.sqrt(max(fan_in, 1))
    module.load_state_dict(sd)


def save_fixture(name: str, sd: dict, arrays: dict, meta: dict):
    os.makedirs(FIXDIR, exist_ok=True)
    out = {f"sd.{k}": v.detach().numpy() for k, v in sd.items()
           if v.dtype in (torch.float32, torch.float64)}
    out.update(arrays)
    out["meta"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    path = os.path.join(FIXDIR, name + ".npz")
    np.savez_compressed(path, **out)
    size = os.path.getsize(path) / 1e6
    print(f"  wrote {path} ({size:.2f} MB)")


# ---------------------------------------------------------------------------
# 1. Text DiT (TxtFlagLargeDiT) + 25-step CFG ODE golden
# ---------------------------------------------------------------------------

def gen_dit_text():
    from ldm.modules.diffusionmodules.flag_large_dit import TxtFlagLargeDiT

    cfg = dict(in_channels=8, context_dim=24, hidden_size=64, depth=2,
               num_heads=4, max_len=64)
    torch.manual_seed(0)
    model = TxtFlagLargeDiT(**cfg).eval()
    randomize_(model, seed=1)

    g = torch.Generator().manual_seed(2)
    x = torch.randn(2, 8, 32, generator=g)
    t = torch.tensor([17, 940], dtype=torch.long)
    ctx = torch.randn(2, 7, 24, generator=g)
    with torch.no_grad():
        out = model(x, t, ctx)
    save_fixture("ref_dit_text", model.state_dict(),
                 {"in.x": x.numpy(), "in.t": t.numpy().astype(np.int32),
                  "in.ctx": ctx.numpy(), "out.v": out.numpy()},
                 {"cfg": cfg, "src": "flag_large_dit.py:127-210"})

    # --- 25-step Euler CFG ODE (Wrapper_cfg semantics, cfm1_audio.py:88-161)
    g = torch.Generator().manual_seed(3)
    x0 = torch.randn(1, 8, 32, generator=g)
    c = torch.randn(1, 7, 24, generator=g)
    uc = torch.zeros_like(c)
    scale = 3.0
    t_span = torch.linspace(0, 1, 25)
    x = x0.clone()
    with torch.no_grad():
        for i in range(len(t_span) - 1):
            dt = t_span[i + 1] - t_span[i]
            x_in = torch.cat([x] * 2)
            t_in = torch.tensor([t_span[i] * 1000] * x.shape[0]).long()
            t_in = torch.cat([t_in] * 2)
            c_in = torch.cat([uc, c])
            e_uc, e_c = model(x_in, t_in, c_in).chunk(2)
            e = e_uc + scale * (e_c - e_uc)
            x = x + dt * e
    save_fixture("ref_ode_cfg", model.state_dict(),
                 {"in.x0": x0.numpy(), "in.c": c.numpy(),
                  "in.uc": uc.numpy(), "out.x1": x.numpy()},
                 {"cfg": cfg, "scale": scale, "steps": 25,
                  "src": "cfm1_audio.py:88-161 Wrapper_cfg + torchdyn euler"})


# ---------------------------------------------------------------------------
# 2. Video MoE DiT (VideoFlagLargeDiT)
# ---------------------------------------------------------------------------

def gen_dit_moe():
    from ldm.modules.diffusionmodules.flag_large_dit_moe import VideoFlagLargeDiT

    cfg = dict(in_channels=8, context_dim=24, hidden_size=64, depth=2,
               num_heads=4, max_len=64, multiple_of=32, num_experts=4)
    torch.manual_seed(0)
    model = VideoFlagLargeDiT(**cfg).eval()
    randomize_(model, seed=4)

    g = torch.Generator().manual_seed(5)
    x = torch.randn(4, 8, 32, generator=g)
    # one timestep per expert bucket (t // 250)
    t = torch.tensor([0, 260, 600, 999], dtype=torch.long)
    ctx = torch.randn(4, 10, 24, generator=g)
    with torch.no_grad():
        out = model(x, t, ctx)
    save_fixture("ref_dit_moe", model.state_dict(),
                 {"in.x": x.numpy(), "in.t": t.numpy().astype(np.int32),
                  "in.ctx": ctx.numpy(), "out.v": out.numpy()},
                 {"cfg": cfg, "src": "flag_large_dit_moe.py:613-740"})


# ---------------------------------------------------------------------------
# 3. 1-D VAE (AutoencoderKL)
# ---------------------------------------------------------------------------

def gen_vae1d():
    from ldm.models.autoencoder1d import AutoencoderKL

    ddconfig = dict(double_z=True, in_channels=80, out_ch=80, z_channels=4,
                    kernel_size=5, ch=32, ch_mult=[1, 2], num_res_blocks=2,
                    attn_layers=[3], down_layers=[0], dropout=0.0)
    torch.manual_seed(0)
    model = AutoencoderKL(embed_dim=4, ddconfig=ddconfig,
                          lossconfig={"target": "torch.nn.Identity"}).eval()
    randomize_(model, seed=6)

    g = torch.Generator().manual_seed(7)
    x = torch.randn(2, 80, 64, generator=g)
    with torch.no_grad():
        posterior = model.encode(x)
        moments = posterior.parameters      # (B, 2*embed_dim, T/2)
        dec = model.decode(posterior.mode())
    save_fixture("ref_vae1d", model.state_dict(),
                 {"in.x": x.numpy(), "out.moments": moments.numpy(),
                  "out.dec": dec.numpy()},
                 {"ddconfig": ddconfig, "embed_dim": 4,
                  "src": "autoencoder1d.py:18-166"})


# ---------------------------------------------------------------------------
# 4. BigVGAN generator (weight-normed, alias-free snakebeta)
# ---------------------------------------------------------------------------

class _H(dict):
    __getattr__ = dict.__getitem__


def gen_bigvgan():
    from vocoder.bigvgan.models import BigVGAN

    h = _H(num_mels=80, upsample_rates=[4, 4, 2, 2],
           upsample_kernel_sizes=[8, 8, 4, 4], upsample_initial_channel=32,
           resblock="1", resblock_kernel_sizes=[3, 7, 11],
           resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
           activation="snakebeta", snake_logscale=True)
    torch.manual_seed(0)
    model = BigVGAN(h).eval()
    randomize_(model, seed=8)

    g = torch.Generator().manual_seed(9)
    mel = torch.randn(2, 80, 32, generator=g)
    with torch.no_grad():
        wav = model(mel)
    save_fixture("ref_bigvgan", model.state_dict(),
                 {"in.mel": mel.numpy(), "out.wav": wav.numpy()},
                 {"h": {k: v for k, v in h.items()},
                  "src": "vocoder/bigvgan/models.py:135-215"})


# ---------------------------------------------------------------------------
# 4b. Full T2A latent pipeline: 25-step CFG ODE -> /scale_factor -> VAE decode
#     (the BASELINE.md mel-MAE gate path: cfm1_audio.py:88-111 +
#      ddpm_audio.py:357-371 decode_first_stage)
# ---------------------------------------------------------------------------

def gen_pipeline():
    from ldm.modules.diffusionmodules.flag_large_dit import TxtFlagLargeDiT
    from ldm.models.autoencoder1d import AutoencoderKL

    dit_cfg = dict(in_channels=8, context_dim=24, hidden_size=64, depth=2,
                   num_heads=4, max_len=64)
    ddconfig = dict(double_z=True, in_channels=80, out_ch=80, z_channels=8,
                    kernel_size=5, ch=32, ch_mult=[1, 2], num_res_blocks=2,
                    attn_layers=[3], down_layers=[0], dropout=0.0)
    torch.manual_seed(0)
    dit = TxtFlagLargeDiT(**dit_cfg).eval()
    randomize_(dit, seed=11)
    vae = AutoencoderKL(embed_dim=8, ddconfig=ddconfig,
                        lossconfig={"target": "torch.nn.Identity"}).eval()
    randomize_(vae, seed=12)

    scale_factor = 0.6404  # arbitrary non-1 value to cover the rescale path
    g = torch.Generator().manual_seed(13)
    x0 = torch.randn(1, 8, 32, generator=g)
    c = torch.randn(1, 7, 24, generator=g)
    uc = torch.zeros_like(c)
    scale = 3.0
    t_span = torch.linspace(0, 1, 25)
    x = x0.clone()
    with torch.no_grad():
        for i in range(len(t_span) - 1):
            dt = t_span[i + 1] - t_span[i]
            x_in = torch.cat([x] * 2)
            t_in = torch.cat([torch.tensor([t_span[i] * 1000]).long()] * 2)
            e_uc, e_c = dit(x_in, t_in, torch.cat([uc, c])).chunk(2)
            x = x + dt * (e_uc + scale * (e_c - e_uc))
        mel = vae.decode(x / scale_factor)

    sd = {}
    sd.update({f"dit.{k}": v for k, v in dit.state_dict().items()})
    sd.update({f"vae.{k}": v for k, v in vae.state_dict().items()})
    save_fixture("ref_pipeline", sd,
                 {"in.x0": x0.numpy(), "in.c": c.numpy(), "in.uc": uc.numpy(),
                  "out.z": x.numpy(), "out.mel": mel.numpy()},
                 {"dit_cfg": dit_cfg, "ddconfig": ddconfig, "embed_dim": 8,
                  "scale_factor": scale_factor, "scale": scale, "steps": 25,
                  "src": "cfm1_audio.py:88-111 + ddpm_audio.py:357-371"})


# ---------------------------------------------------------------------------
# 5. Mel frontend (MelNet): torch.stft + log10 compression
# ---------------------------------------------------------------------------

def gen_mel():
    from preprocess.NAT_mel import MelNet

    hparams = dict(fft_size=1024, audio_num_mel_bins=80,
                   audio_sample_rate=16000, hop_size=256, win_size=1024,
                   fmin=0, fmax=8000)
    net = MelNet(hparams)
    g = torch.Generator().manual_seed(10)
    t_ax = torch.arange(16384 * 2, dtype=torch.float32) / 16000.0
    wav = (0.4 * torch.sin(2 * np.pi * 440 * t_ax)
           + 0.2 * torch.sin(2 * np.pi * 1333 * t_ax)
           + 0.1 * torch.randn(16384 * 2, generator=g)).clamp(-1, 1)
    wav = wav.unsqueeze(0)
    with torch.no_grad():
        mel = net(wav)
    save_fixture("ref_mel", {},
                 {"in.wav": wav.numpy(), "out.mel": mel.numpy()},
                 {"hparams": hparams, "src": "preprocess/NAT_mel.py:42-85",
                  "note": "fbank shared (librosa absent); verifies STFT+log"})


if __name__ == "__main__":
    install_stubs()
    print(f"generating reference fixtures from {REF} "
          f"(torch {torch.__version__}, cpu fp32)")
    gen_dit_text()
    gen_dit_moe()
    gen_vae1d()
    gen_bigvgan()
    gen_pipeline()
    gen_mel()
    print("done")
