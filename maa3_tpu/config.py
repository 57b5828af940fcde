"""YAML config surface — the reference's OmegaConf/`instantiate_from_config`
layer (ldm/util.py:110-125, main.py:604-613), backed by a typed registry.

The same YAML files that drive the reference (configs/txt2audio-cfm-cfg*.yaml,
video2audio-cfm-cfg-moe.yaml) parse here: `target:` strings are mapped to
this framework's constructors instead of python reflection. CLI dotlist
overrides (`key.sub=value`) merge on top, mirroring main.py's
OmegaConf.merge(*configs, cli).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import yaml

from maa3_tpu.models.dit import DiTConfig
from maa3_tpu.models.dit_moe import MoEDiTConfig
from maa3_tpu.models.vae1d import VAEConfig
from maa3_tpu.models.bigvgan import BigVGANConfig


# ---------------------------------------------------------------------------
# YAML load / merge / dotlist overrides
# ---------------------------------------------------------------------------

def _deep_merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _parse_value(s: str) -> Any:
    try:
        return yaml.safe_load(s)
    except Exception:
        return s


def load_config(paths: Sequence[str], overrides: Sequence[str] = ()) -> dict:
    """Merge YAML files left-to-right, then apply `a.b.c=value` overrides."""
    cfg: dict = {}
    for p in paths:
        with open(p) as f:
            cfg = _deep_merge(cfg, yaml.safe_load(f) or {})
    for ov in overrides:
        if "=" not in ov:
            continue
        key, val = ov.split("=", 1)
        node = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = _parse_value(val)
    return cfg


# ---------------------------------------------------------------------------
# target registry
# ---------------------------------------------------------------------------

TARGET_KINDS: Dict[str, str] = {
    # diffusion wrappers
    "ldm.models.diffusion.cfm1_audio.CFM": "cfm",
    "ldm.models.diffusion.cfm1_audio.CFM_inpaint": "cfm_inpaint",
    "ldm.models.diffusion.ddpm_audio.LatentDiffusion_audio": "ldm_audio",
    # backbones
    "ldm.modules.diffusionmodules.flag_large_dit.TxtFlagLargeDiT": "text_dit",
    "ldm.modules.diffusionmodules.flag_large_dit.TxtFlagLargeImprovedDiTV2": "text_dit",
    "ldm.modules.diffusionmodules.flag_large_dit_moe.VideoFlagLargeDiT": "video_moe_dit",
    # first stage
    "ldm.models.autoencoder1d.AutoencoderKL": "vae1d",
    "ldm.models.autoencoder.AutoencoderKL": "vae2d",
    "ldm.models.autoencoder.VQModel": "vq2d",
    "ldm.models.autoencoder.VQModelInterface": "vq2d",
    "ldm.models.autoencoder.IdentityFirstStage": "identity",
    # legacy 2-D UNet backbone
    "ldm.modules.diffusionmodules.openaimodel.UNetModel": "unet2d",
    # cond stage
    "ldm.modules.encoders.modules.FrozenCLAPFLANEmbedder": "clap_flan",
    "ldm.modules.encoders.modules.FrozenCLAPEmbedder": "clap",
    "ldm.modules.encoders.modules.FrozenFLANEmbedder": "flan",
    "ldm.modules.encoders.modules.Video_Feat_Encoder_NoPosembed": "video_feat",
    "ldm.modules.encoders.modules.Video_Feat_Encoder_NoPosembed_inpaint": "video_feat_inpaint",
    # vocoder
    "vocoder.bigvgan.models.VocoderBigVGAN": "bigvgan",
    # inert
    "torch.nn.Identity": "identity",
}


def kind_of(target: str) -> str:
    if target in TARGET_KINDS:
        return TARGET_KINDS[target]
    # tolerate maa3-native targets like "maa3_tpu:text_dit"
    if target.startswith("maa3_tpu:"):
        return target.split(":", 1)[1]
    raise KeyError(f"unknown config target: {target}")


# ---------------------------------------------------------------------------
# typed model spec
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ModelSpec:
    kind: str                       # cfm | cfm_inpaint | ldm_audio
    backbone_kind: str              # text_dit | video_moe_dit
    dit: Any                        # DiTConfig | MoEDiTConfig
    vae: VAEConfig
    cond_kind: str                  # clap_flan | clap | flan | video_feat | ...
    cond_params_cfg: dict
    conditioning_key: str = "crossattn"
    mel_dim: int = 20
    mel_length: int = 312
    channels: int = 0
    scale_by_std: bool = True
    scale_factor: float = 1.0
    timesteps: int = 1000
    cond_stage_trainable: bool = False
    base_learning_rate: float = 3.0e-6
    vae_ckpt: Optional[str] = None
    cond_weights_path: Optional[str] = None


def _dit_cfg_from(params: dict, backbone_kind: str):
    common = dict(
        in_channels=params.get("in_channels", 20),
        context_dim=params.get("context_dim", 1024),
        hidden_size=params.get("hidden_size", 768),
        depth=params.get("depth", 16),
        num_heads=params.get("num_heads", 32),
        max_len=params.get("max_len", 1000),
        n_kv_heads=params.get("n_kv_heads"),
        multiple_of=params.get("multiple_of", 256),
        ffn_dim_multiplier=params.get("ffn_dim_multiplier"),
        norm_eps=params.get("norm_eps", 1e-5),
        qk_norm=bool(params.get("qk_norm") or False),
        rope_scaling_factor=params.get("rope_scaling_factor", 1.0),
        ntk_factor=params.get("ntk_factor", 1.0),
        use_flash=params.get("use_flash"),
    )
    if backbone_kind == "video_moe_dit":
        return MoEDiTConfig(num_experts=params.get("num_experts", 4), **common)
    return DiTConfig(**common)


def _vae_cfg_from(params: dict) -> VAEConfig:
    dd = params.get("ddconfig", {})
    return VAEConfig(
        in_channels=dd.get("in_channels", 80),
        out_ch=dd.get("out_ch", 80),
        ch=dd.get("ch", 384),
        ch_mult=tuple(dd.get("ch_mult", (1, 2, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        attn_layers=tuple(dd.get("attn_layers", ())),
        down_layers=tuple(dd.get("down_layers", (0,))),
        kernel_size=dd.get("kernel_size", 5),
        z_channels=dd.get("z_channels", 20),
        double_z=dd.get("double_z", True),
        embed_dim=params.get("embed_dim", 20),
    )


def parse_model_config(cfg: dict) -> ModelSpec:
    """cfg: the full YAML dict (with `model:` subtree) or the subtree itself."""
    model = cfg.get("model", cfg)
    params = model.get("params", {})
    kind = kind_of(model["target"])

    unet = params["unet_config"]
    backbone_kind = kind_of(unet["target"])
    dit = _dit_cfg_from(unet.get("params", {}), backbone_kind)

    first = params["first_stage_config"]
    vae = _vae_cfg_from(first.get("params", {}))

    cond = params.get("cond_stage_config", {})
    cond_kind = kind_of(cond["target"]) if isinstance(cond, dict) else "none"
    cond_params = cond.get("params", {}) if isinstance(cond, dict) else {}

    return ModelSpec(
        kind=kind,
        backbone_kind=backbone_kind,
        dit=dit,
        vae=vae,
        cond_kind=cond_kind,
        cond_params_cfg=cond_params,
        conditioning_key=params.get("conditioning_key", "crossattn"),
        mel_dim=params.get("mel_dim", 20),
        mel_length=params.get("mel_length", 312),
        channels=params.get("channels", 0),
        scale_by_std=params.get("scale_by_std", False),
        scale_factor=params.get("scale_factor", 1.0),
        timesteps=params.get("timesteps", 1000),
        cond_stage_trainable=params.get("cond_stage_trainable", False),
        base_learning_rate=model.get("base_learning_rate", 3.0e-6),
        vae_ckpt=first.get("params", {}).get("ckpt_path"),
        cond_weights_path=cond_params.get("weights_path"),
    )
