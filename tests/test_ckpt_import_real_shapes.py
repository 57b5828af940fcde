"""Checkpoint-import rehearsal at the RELEASED model shapes, for all five
families (t2a M / XL / XXL, music, video-MoE).

The state_dicts are produced by the reference model classes themselves
(instantiated from /root/reference at the exact configs/*.yaml dims), plus
cond towers built from the real HF architectures (BertModel / T5EncoderModel
from local configs — no download) with the reference wrapper prefixes, plus
LitEma dot-stripped shadow names (ema.py:16-21) and the scale_factor buffer.
So the key sets match what a day-one real .ckpt will contain
(ddpm.py:187-203 prefixes; README.md:38-48 model table).

Single-core budget notes: weight-init math is skipped (params filled with a
constant — key names/shapes are what is being rehearsed), serialization is
bypassed (covered at toy size in test_full_ckpt_import.py), and forwards run
the un-jitted functions (lax.scan still compiles its body once; full-width
jit compiles per family would cost minutes on this 1-CPU host).

Asserts per family: MAA3System.from_config imports the ckpt, the imported
DiT pytree has exactly the structure of our init (so optimizer states /
TP specs / EMA remaps line up) with the expected full-size leaf shapes, EMA
shadow weights are preferred when present, and one velocity forward + VAE
decode run finite at the real width.
"""

import gc
import os
import sys
from contextlib import contextmanager

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import gen_reference_fixtures as ref_gen

from maa3_tpu import config as config_mod
from maa3_tpu.models.dit import DiTConfig, dit_init, dit_apply
from maa3_tpu.models.dit_moe import MoEDiTConfig, moe_dit_init, moe_dit_apply
from maa3_tpu.models.vae1d import vae_decode

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = {
    "m": "txt2audio-cfm-cfg.yaml",
    "xl": "txt2audio-cfm-cfg-XL.yaml",
    "xxl": "txt2audio-cfm-cfg-XXL.yaml",
    "music": "txt2music-cfm-cfg.yaml",
    "video": "video2audio-cfm-cfg-moe.yaml",
}

_cache: dict = {}


@contextmanager
def _no_init():
    """Neuter torch.nn.init during instantiation: init math over ~1B params
    costs minutes on one core and the values are irrelevant here."""
    import torch.nn.init as I
    names = ["xavier_uniform_", "xavier_normal_", "normal_", "constant_",
             "uniform_", "kaiming_uniform_", "kaiming_normal_",
             "trunc_normal_", "ones_", "zeros_"]
    saved = {n: getattr(I, n) for n in names}
    try:
        for n in names:
            setattr(I, n, lambda t, *a, **k: t)
        yield
    finally:
        for n, f in saved.items():
            setattr(I, n, f)


def _fill(module, value=1e-4):
    with torch.no_grad():
        for p in module.parameters():
            p.fill_(value)


def _stubs():
    if "stubs" not in _cache:
        ref_gen.install_stubs()
        _cache["stubs"] = True


def _vae_sd():
    """Reference AutoencoderKL at the real released ddconfig (shared by all
    five configs): ch=384, ch_mult (1,2,4), z=20, k=5."""
    if "vae" not in _cache:
        _stubs()
        from ldm.models.autoencoder1d import AutoencoderKL
        dd = dict(double_z=True, in_channels=80, out_ch=80, z_channels=20,
                  kernel_size=5, ch=384, ch_mult=[1, 2, 4], num_res_blocks=2,
                  attn_layers=[3], down_layers=[0], dropout=0.0)
        with _no_init():
            vae = AutoencoderKL(embed_dim=20, ddconfig=dd,
                                lossconfig={"target": "torch.nn.Identity"})
        _fill(vae, 1e-4)
        _cache["vae"] = {k: v for k, v in vae.state_dict().items()}
    return _cache["vae"]


def _cond_tower_shapes():
    """cond_stage_model key sets of FrozenCLAPFLANEmbedder (modules.py:132-191)
    and FrozenFLANEmbedder (modules.py:54-66) at real dims: caption_encoder.base
    (bert-base-uncased) + caption_encoder.projection + t5_transformer
    (t5-v1_1-large) — real HF architectures from local configs on the meta
    device, as ShapeDtypeStructs (no data)."""
    if "clap_flan" not in _cache:
        from transformers import BertConfig, BertModel, T5Config, T5EncoderModel
        with torch.device("meta"):
            bert = BertModel(BertConfig())  # bert-base-uncased dims
            t5 = T5EncoderModel(T5Config(d_model=1024, d_kv=64, d_ff=2816,
                                         num_layers=24, num_heads=16,
                                         feed_forward_proj="gated-gelu"))

        def shapes(m):
            return {k: jax.ShapeDtypeStruct(tuple(v.shape), jnp.float32)
                    for k, v in m.state_dict().items()}

        proj = {
            "projection.linear1.weight": jax.ShapeDtypeStruct((1024, 768),
                                                              jnp.float32),
            "projection.linear2.weight": jax.ShapeDtypeStruct((1024, 1024),
                                                              jnp.float32),
            "projection.layer_norm.weight": jax.ShapeDtypeStruct((1024,),
                                                                 jnp.float32),
            "projection.layer_norm.bias": jax.ShapeDtypeStruct((1024,),
                                                               jnp.float32),
        }
        sd = {}
        sd.update({f"caption_encoder.base.{k}": v
                   for k, v in shapes(bert).items()})
        sd.update({f"caption_encoder.{k}": v for k, v in proj.items()})
        t5_sh = shapes(t5)
        sd.update({f"t5_transformer.{k}": v for k, v in t5_sh.items()})
        _cache["clap_flan"] = sd
        _cache["flan"] = {f"transformer.{k}": v for k, v in t5_sh.items()}
    return _cache["clap_flan"], _cache["flan"]


def test_cond_tower_import_shapes():
    """CLAP-BERT + T5-v1_1-large / FLAN cond towers at real dims, shape-only
    (materializing 450M params costs ~2 min on this VM)."""
    from maa3_tpu.torch_import import clap_flan_from_torch
    from maa3_tpu.models.bert import BertConfig as OurBert
    from maa3_tpu.models.t5 import T5Config as OurT5, t5_from_torch
    from maa3_tpu.models import clap as clap_mod

    clap_sd, flan_sd = _cond_tower_shapes()
    imported = jax.eval_shape(
        lambda s: clap_flan_from_torch(s, OurBert(), OurT5()), clap_sd)
    # toy dims, REAL layer counts (list lengths are part of the structure)
    toy = clap_mod.clap_flan_init(jax.random.PRNGKey(0), clap_mod.CLAPFLANConfig(
        bert=OurBert(hidden_size=16, num_layers=12, num_heads=2,
                     intermediate_size=32),
        t5=OurT5(d_model=16, d_kv=8, d_ff=32, num_layers=24, num_heads=2),
        d_proj=8))
    assert jax.tree.structure(imported) == jax.tree.structure(toy)
    # real-dim spot checks ((in, out) after the on-device transpose)
    assert imported["bert"]["embeddings"]["word"].shape == (30522, 768)
    assert imported["bert"]["layers"][11]["ff_in"]["w"].shape == (768, 3072)
    assert imported["projection"]["linear1"]["w"].shape == (768, 1024)
    assert imported["t5"]["shared"].shape == (32128, 1024)
    assert imported["t5"]["layers"][23]["wi_0"]["w"].shape == (1024, 2816)
    assert imported["t5"]["layers"][23]["q"]["w"].shape == (1024, 1024)

    # music-family FrozenFLANEmbedder keys live under `transformer.`
    flan = jax.eval_shape(
        lambda s: {"t5": t5_from_torch(s, OurT5(), prefix="transformer.")},
        flan_sd)
    assert (jax.tree.structure(flan["t5"])
            == jax.tree.structure(toy["t5"]))


def _video_cond_sd():
    return {"embedder.0.weight": torch.full((768, 512), 0.01),
            "embedder.0.bias": torch.zeros(768)}


def _build_family_sd(family):
    """Assemble the full PL checkpoint state_dict for one family at real
    shapes (reference model classes give the exact key sets)."""
    _stubs()
    cfg_path = os.path.join(ROOT, "configs", CONFIGS[family])
    cfg = config_mod.load_config([cfg_path])
    unet = cfg["model"]["params"]["unet_config"]["params"]

    with _no_init():
        if family == "video":
            from ldm.modules.diffusionmodules.flag_large_dit_moe import (
                VideoFlagLargeDiT)
            dit = VideoFlagLargeDiT(**unet)
        else:
            from ldm.modules.diffusionmodules.flag_large_dit import (
                TxtFlagLargeImprovedDiTV2)
            dit = TxtFlagLargeImprovedDiTV2(**unet)
    _fill(dit, 1e-4)

    sd = {}
    dit_sd = dit.state_dict()
    sd.update({f"model.diffusion_model.{k}": v for k, v in dit_sd.items()})
    # LitEma shadow buffers: param names with dots REMOVED (ema.py:16-21),
    # over DiffusionWrapper's named_parameters ("diffusion_model." + name).
    # Offset +1e-4 so the test can prove EMA weights were preferred (small:
    # the forward below runs on these weights and must stay finite).
    # EMA shadow set + cond towers only where the import path differs —
    # every family repeating them would only re-copy gigabytes on one core.
    if family == "m":
        for k, v in dit.named_parameters():
            s_name = ("diffusion_model." + k).replace(".", "")
            sd[f"model_ema.{s_name}"] = v.detach() + 1e-4
        sd["model_ema.decay"] = torch.tensor(0.9999)
        sd["model_ema.num_updates"] = torch.tensor(1000, dtype=torch.int)
    sd.update({f"first_stage_model.{k}": v for k, v in _vae_sd().items()})
    # only the video cond tower is materialized (tiny); the 450M-param
    # CLAP-BERT/T5 towers are verified shape-only in test_cond_tower_import
    # (first-touch of ~2 GB costs ~50 s on this VM)
    if family == "video":
        sd.update({f"cond_stage_model.{k}": v
                   for k, v in _video_cond_sd().items()})
    sd["scale_factor"] = torch.tensor(0.3654)

    proj_in_w = dit_sd["proj_in.weight"].numpy().copy()
    del dit, dit_sd
    gc.collect()
    return cfg_path, sd, proj_in_w


def _spot_shape_checks(dit_params, spec, moe):
    """Full-size leaf shape checks shared by both test variants (leaves may
    be arrays or ShapeDtypeStructs)."""
    d = spec.dit
    blocks = dit_params["blocks"]
    ffn_h = d.multiple_of * -(-int(2 * 4 * d.hidden_size / 3) // d.multiple_of)
    assert dit_params["proj_in"]["w"].shape == (d.in_channels, d.hidden_size)
    assert blocks["attention"]["wq"]["w"].shape == (d.depth, d.hidden_size,
                                                    d.hidden_size)
    y_dim = d.hidden_size if moe else d.context_dim
    assert blocks["attention"]["wk_y"]["w"].shape == (d.depth, y_dim,
                                                      d.hidden_size)
    if moe:
        assert blocks["feed_forward"]["time_experts"]["w1"]["w"].shape == (
            d.depth, d.num_experts, d.hidden_size, ffn_h)
    else:
        assert blocks["feed_forward"]["w1"]["w"].shape == (d.depth,
                                                           d.hidden_size,
                                                           ffn_h)
    assert blocks["adaLN"]["w"].shape == (d.depth, d.hidden_size,
                                          6 * d.hidden_size)


def _toy_structure(spec, moe):
    """Init at toy dims with the same flags: pytree STRUCTURE is
    dim-independent, so this is the cheap structural reference."""
    if moe:
        return moe_dit_init(jax.random.PRNGKey(0), MoEDiTConfig(
            in_channels=4, context_dim=8, hidden_size=16, depth=2,
            num_heads=2, max_len=8, num_experts=spec.dit.num_experts))
    return dit_init(jax.random.PRNGKey(0), DiTConfig(
        in_channels=4, context_dim=8, hidden_size=16, depth=2,
        num_heads=2, max_len=8, qk_norm=spec.dit.qk_norm))


@pytest.mark.parametrize("family", ["xl", "xxl"])
def test_released_shape_import_shape_only(family):
    """XL/XXL differ from M only by dims (same class, same key template):
    verify the full import at real shapes via jax.eval_shape — materializing
    ~3-4.5 GB of parameters costs minutes on this VM (first-touch page
    faults at ~0.04 GB/s), while the shape-level import is free."""
    from maa3_tpu import torch_import

    _stubs()
    cfg_path = os.path.join(ROOT, "configs", CONFIGS[family])
    cfg = config_mod.load_config([cfg_path])
    unet = cfg["model"]["params"]["unet_config"]["params"]
    with torch.device("meta"), _no_init():
        from ldm.modules.diffusionmodules.flag_large_dit import (
            TxtFlagLargeImprovedDiTV2)
        dit = TxtFlagLargeImprovedDiTV2(**unet)
    sd_shapes = {k: jax.ShapeDtypeStruct(tuple(v.shape), jnp.float32)
                 for k, v in dit.state_dict().items()}
    del dit

    spec = config_mod.parse_model_config(cfg)
    imported = jax.eval_shape(
        lambda s: torch_import.dit_from_torch(s, depth=spec.dit.depth,
                                              qk_norm=spec.dit.qk_norm),
        sd_shapes)
    assert (jax.tree.structure(imported)
            == jax.tree.structure(_toy_structure(spec, moe=False)))
    _spot_shape_checks(imported, spec, moe=False)


@pytest.mark.parametrize("family", ["m", "music", "video"])
def test_released_shape_import(family, monkeypatch):
    from maa3_tpu.system import MAA3System
    from maa3_tpu import torch_import

    cfg_path, sd, proj_in_w = _build_family_sd(family)

    # skip serialization (multi-GB writes dominate test time on 1 core — the
    # torch.save/torch.load roundtrip is covered in test_full_ckpt_import.py):
    # feed the state_dict straight to the post-load import path.
    # .numpy() shares memory with the torch tensors (no copy).
    np_sd = {k: v.numpy() for k, v in sd.items()}
    monkeypatch.setattr(torch_import, "load_torch_checkpoint",
                        lambda path: np_sd)
    del sd

    system = MAA3System.from_config([cfg_path], ckpt_path="in-memory.ckpt",
                                    compute_dtype=jnp.float32,
                                    init_cond=family == "video")
    del np_sd
    gc.collect()
    assert abs(system.scale_factor - 0.3654) < 1e-6

    spec = system.spec
    moe = spec.backbone_kind == "video_moe_dit"

    # imported pytree must have exactly our init's STRUCTURE so
    # optimizers/TP specs line up, with the full-size leaf shapes
    assert (jax.tree.structure(system.params["dit"])
            == jax.tree.structure(_toy_structure(spec, moe)))
    _spot_shape_checks(system.params["dit"], spec, moe)
    d = spec.dit

    # EMA shadow weights preferred when present (offset in the ckpt)
    w = np.asarray(system.params["dit"]["proj_in"]["w"])
    expect = proj_in_w.T + (1e-4 if family == "m" else 0.0)
    np.testing.assert_allclose(w, expect, rtol=1e-6)

    # one velocity forward at the real width (eager: per-family full-width
    # jit compiles would dominate; lax.scan inside still compiles its body)
    x = jnp.full((1, d.in_channels, 8), 0.1, jnp.float32)
    t = jnp.array([500], jnp.int32)
    ctx = jnp.full((1, 4, d.context_dim), 0.1, jnp.float32)
    apply = moe_dit_apply if moe else dit_apply
    v = apply(system.params["dit"], d, x, t, ctx, compute_dtype=jnp.float32)
    assert v.shape == x.shape and v.dtype == jnp.float32
    assert np.isfinite(np.asarray(v)).all()

    if family == "video":
        # cond tower imported and runs; VAE decode at real width
        c = system.get_learned_conditioning(np.zeros((1, 8, 512), np.float32))
        assert c.shape == (1, 8, 768)
        mel = vae_decode(system.params["vae"], spec.vae,
                         jnp.full((1, spec.vae.embed_dim, 8), 0.1))
        assert mel.shape == (1, 80, 16)
        assert np.isfinite(np.asarray(mel)).all()

    del system
    gc.collect()
