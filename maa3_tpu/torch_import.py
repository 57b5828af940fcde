"""PyTorch -> JAX checkpoint importer for the released reference weights.

Maps PyTorch-Lightning state_dicts (SURVEY §5: prefixes `model.diffusion_model.*`,
`first_stage_model.*`, `cond_stage_model.*`, optional `model_ema.*`, plus the
`scale_factor` buffer) into this framework's pytrees:

- Linear weights transpose (out,in) -> (in,out);
- conv weights copy as-is (we store torch (out,in,k) / transposed (in,out,k));
- the DiT's per-block tensors are STACKED along a leading depth axis (our
  `lax.scan` layout);
- BigVGAN weight_norm (weight_g/weight_v) is folded: w = g * v / ||v||_dim0.

Works on plain dicts of numpy arrays, so `torch.load(..., map_location="cpu")`
output feeds straight in.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

Array = np.ndarray


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    if hasattr(x, "aval"):  # jax tracer: pass through so the importers can
        return x            # run under jax.eval_shape (shape-only imports)
    return np.asarray(x)


def strip_prefix(sd: Dict[str, Array], prefix: str) -> Dict[str, Array]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def split_lightning_ckpt(state_dict: Dict[str, Array]) -> Dict[str, Dict[str, Array]]:
    """Split a full PL checkpoint state_dict into component sub-dicts."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    return {
        "dit": strip_prefix(sd, "model.diffusion_model."),
        "vae": strip_prefix(sd, "first_stage_model."),
        "cond": strip_prefix(sd, "cond_stage_model."),
        "ema": strip_prefix(sd, "model_ema."),
        "scale_factor": sd.get("scale_factor", None),
    }


# ---------------------------------------------------------------------------
# DiT
# ---------------------------------------------------------------------------

def _lin(sd, name, bias=True):
    # Raw torch (out, in) layout kept on host; the (in, out) transpose happens
    # on-device in finalize_linear_tree. numpy's strided transpose-copy runs
    # at ~25 MB/s on this host (TLB-miss bound) vs GB/s for XLA's blocked
    # transpose — a full-size XL import dropped from ~3 min to seconds.
    p = {"w": _np(sd[name + ".weight"])}
    if bias and name + ".bias" in sd:
        p["b"] = _np(sd[name + ".bias"])
    return p


def finalize_linear_tree(params):
    """jnp-convert a host tree, transposing the last two dims of every dict
    leaf named "w" (linear weights stored torch-side as (..., out, in))."""
    import jax

    def conv(path, x):
        arr = jnp.asarray(x)
        if getattr(path[-1], "key", None) == "w" and arr.ndim >= 2:
            arr = jnp.swapaxes(arr, -1, -2)
        return arr

    return jax.tree_util.tree_map_with_path(conv, params)


def _norm_w(sd, name):
    return {"weight": _np(sd[name + ".weight"])}


def dit_from_torch(sd: Dict[str, Array], depth: int, qk_norm: bool = False,
                   moe: bool = False, num_experts: int = 4) -> dict:
    """Map TxtFlagLargeDiT / VideoFlagLargeDiT weights into dit/dit_moe pytrees."""
    import jax

    def block(i: int) -> dict:
        b = f"blocks.{i}."
        attn = {
            "wq": _lin(sd, b + "attention.wq", bias=False),
            "wk": _lin(sd, b + "attention.wk", bias=False),
            "wv": _lin(sd, b + "attention.wv", bias=False),
            "wo": _lin(sd, b + "attention.wo", bias=False),
            "wk_y": _lin(sd, b + "attention.wk_y", bias=False),
            "wv_y": _lin(sd, b + "attention.wv_y", bias=False),
            "gate": _np(sd[b + "attention.gate"]),
        }
        if qk_norm:
            for nm in ("q_norm", "k_norm", "ky_norm"):
                attn[nm] = {
                    "weight": _np(sd[b + f"attention.{nm}.weight"]),
                    "bias": _np(sd[b + f"attention.{nm}.bias"]),
                }
        if moe:
            ff = {
                "time_experts": [
                    {k: _lin(sd, b + f"feed_forward.time_experts.{e}.{k}", bias=False)
                     for k in ("w1", "w2", "w3")}
                    for e in range(num_experts)],
                "freq_experts": [
                    {k: _lin(sd, b + f"feed_forward.freq_experts.{e}.{k}", bias=False)
                     for k in ("w1", "w2", "w3")}
                    for e in range(num_experts)],
            }
            # stack experts on-device: (E, out, in)
            _st = lambda *xs: jnp.stack([jnp.asarray(x) for x in xs])
            ff = {"time_experts": jax.tree.map(_st, *ff["time_experts"]),
                  "freq_experts": jax.tree.map(_st, *ff["freq_experts"])}
        else:
            ff = {k: _lin(sd, b + f"feed_forward.{k}", bias=False)
                  for k in ("w1", "w2", "w3")}
        return {
            "attention": attn,
            "feed_forward": ff,
            "attention_norm": _norm_w(sd, b + "attention_norm"),
            "ffn_norm": _norm_w(sd, b + "ffn_norm"),
            "attention_y_norm": _norm_w(sd, b + "attention_y_norm"),
            "adaLN": _lin(sd, b + "adaLN_modulation.1"),
        }

    blocks = [block(i) for i in range(depth)]
    # stack on-device: XLA recycles arena buffers, and host np.stack pays
    # first-touch page-fault cost (~25 s/GB on firecracker VMs) per leaf
    stacked = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                           *blocks)

    params = {
        "proj_in": _lin(sd, "proj_in"),
        "t_embedder": {
            "mlp0": _lin(sd, "t_embedder.mlp.0"),
            "mlp2": _lin(sd, "t_embedder.mlp.2"),
        },
        "cap_embedder": {
            "norm": {"weight": _np(sd["cap_embedder.0.weight"]),
                     "bias": _np(sd["cap_embedder.0.bias"])},
            "linear": _lin(sd, "cap_embedder.1"),
        },
        "blocks": stacked,
        "final_layer": {
            "linear": _lin(sd, "final_layer.linear"),
            "adaLN": _lin(sd, "final_layer.adaLN_modulation.1"),
        },
    }
    if moe and "c_embedder.mlp.0.weight" in sd:
        params["c_embedder"] = {
            "mlp0": _lin(sd, "c_embedder.mlp.0"),
            "mlp2": _lin(sd, "c_embedder.mlp.2"),
            "ln": {"weight": _np(sd["c_embedder.mlp.3.weight"]),
                   "bias": _np(sd["c_embedder.mlp.3.bias"])},
        }
    return finalize_linear_tree(params)


# ---------------------------------------------------------------------------
# 1-D VAE
# ---------------------------------------------------------------------------

def _conv(sd, name):
    p = {"w": _np(sd[name + ".weight"])}
    if name + ".bias" in sd:
        p["b"] = _np(sd[name + ".bias"])
    return p


def _gn(sd, name):
    return {"weight": _np(sd[name + ".weight"]),
            "bias": _np(sd[name + ".bias"])}


def _resblock_t(sd, name):
    p = {
        "norm1": _gn(sd, name + ".norm1"),
        "conv1": _conv(sd, name + ".conv1"),
        "norm2": _gn(sd, name + ".norm2"),
        "conv2": _conv(sd, name + ".conv2"),
    }
    if name + ".nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _conv(sd, name + ".nin_shortcut")
    return p


def _attnblock_t(sd, name):
    return {
        "norm": _gn(sd, name + ".norm"),
        "q": _conv(sd, name + ".q"),
        "k": _conv(sd, name + ".k"),
        "v": _conv(sd, name + ".v"),
        "proj_out": _conv(sd, name + ".proj_out"),
    }


def vae_from_torch(sd: Dict[str, Array], cfg) -> dict:
    """Map AutoencoderKL (1-D) weights. cfg: VAEConfig."""
    enc = {"conv_in": _conv(sd, "encoder.conv_in")}
    down = []
    for lvl in range(cfg.num_layers):
        blocks = [_resblock_t(sd, f"encoder.down.{lvl}.block.{b}")
                  for b in range(cfg.num_res_blocks)]
        attns = []
        a = 0
        while f"encoder.down.{lvl}.attn.{a}.norm.weight" in sd:
            attns.append(_attnblock_t(sd, f"encoder.down.{lvl}.attn.{a}"))
            a += 1
        lp = {"block": blocks, "attn": attns}
        if f"encoder.down.{lvl}.downsample.conv.weight" in sd:
            lp["downsample"] = _conv(sd, f"encoder.down.{lvl}.downsample.conv")
        down.append(lp)
    enc["down"] = down
    enc["mid"] = {
        "block_1": _resblock_t(sd, "encoder.mid.block_1"),
        "attn_1": _attnblock_t(sd, "encoder.mid.attn_1"),
        "block_2": _resblock_t(sd, "encoder.mid.block_2"),
    }
    enc["norm_out"] = _gn(sd, "encoder.norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid"] = {
        "block_1": _resblock_t(sd, "decoder.mid.block_1"),
        "attn_1": _attnblock_t(sd, "decoder.mid.attn_1"),
        "block_2": _resblock_t(sd, "decoder.mid.block_2"),
    }
    up = [None] * cfg.num_layers
    for lvl in range(cfg.num_layers):
        blocks = [_resblock_t(sd, f"decoder.up.{lvl}.block.{b}")
                  for b in range(cfg.num_res_blocks + 1)]
        attns = []
        a = 0
        while f"decoder.up.{lvl}.attn.{a}.norm.weight" in sd:
            attns.append(_attnblock_t(sd, f"decoder.up.{lvl}.attn.{a}"))
            a += 1
        lp = {"block": blocks, "attn": attns}
        if f"decoder.up.{lvl}.upsample.conv.weight" in sd:
            lp["upsample"] = _conv(sd, f"decoder.up.{lvl}.upsample.conv")
        up[lvl] = lp
    dec["up"] = up
    dec["norm_out"] = _gn(sd, "decoder.norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    import jax
    return jax.tree.map(jnp.asarray, {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    })


# ---------------------------------------------------------------------------
# BigVGAN (weight-norm folding)
# ---------------------------------------------------------------------------

def fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """w = g * v / ||v||, norm over all dims except 0 (torch weight_norm dim=0)."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=axes, keepdims=True))
    return (g.astype(np.float64) * v.astype(np.float64) / norm).astype(np.float32)


def _wn_conv(sd, name):
    if name + ".weight_g" in sd:
        w = fold_weight_norm(_np(sd[name + ".weight_g"]),
                             _np(sd[name + ".weight_v"]))
    # new torch parametrize naming
    elif name + ".parametrizations.weight.original0" in sd:
        w = fold_weight_norm(_np(sd[name + ".parametrizations.weight.original0"]),
                             _np(sd[name + ".parametrizations.weight.original1"]))
    else:
        w = _np(sd[name + ".weight"])
    p = {"w": np.asarray(w)}
    if name + ".bias" in sd:
        p["b"] = _np(sd[name + ".bias"])
    return p


def bigvgan_from_torch(sd: Dict[str, Array], cfg) -> dict:
    """Map BigVGAN generator weights. cfg: BigVGANConfig."""
    p = {"conv_pre": _wn_conv(sd, "conv_pre")}
    ups = []
    for i in range(len(cfg.upsample_rates)):
        ups.append(_wn_conv(sd, f"ups.{i}.0"))
    p["ups"] = ups
    num_blocks = len(cfg.upsample_rates) * len(cfg.resblock_kernel_sizes)
    resblocks = []
    for n in range(num_blocks):
        base = f"resblocks.{n}."
        if cfg.resblock == "1":
            rb = {
                "convs1": [_wn_conv(sd, base + f"convs1.{j}") for j in range(3)],
                "convs2": [_wn_conv(sd, base + f"convs2.{j}") for j in range(3)],
                "acts": [],
            }
            n_acts = 6
        else:
            rb = {"convs": [_wn_conv(sd, base + f"convs.{j}") for j in range(2)],
                  "acts": []}
            n_acts = 2
        for j in range(n_acts):
            act = {"alpha": _np(sd[base + f"activations.{j}.act.alpha"])}
            if base + f"activations.{j}.act.beta" in sd:
                act["beta"] = _np(sd[base + f"activations.{j}.act.beta"])
            rb["acts"].append(act)
        resblocks.append(rb)
    p["resblocks"] = resblocks
    post = {"alpha": _np(sd["activation_post.act.alpha"])}
    if "activation_post.act.beta" in sd:
        post["beta"] = _np(sd["activation_post.act.beta"])
    p["activation_post"] = post
    p["conv_post"] = _wn_conv(sd, "conv_post")
    import jax
    return jax.tree.map(jnp.asarray, p)


def mpd_from_torch(sd: Dict[str, Array], n_discs: int = 5) -> dict:
    """MultiPeriodDiscriminator weights (vocoder/bigvgan/models.py:255-277):
    per-period DiscriminatorP = 5 weight-normed (k,1) Conv2d + conv_post."""
    import jax
    discs = []
    for i in range(n_discs):
        pre = f"discriminators.{i}."
        discs.append({"convs": [_wn_conv(sd, pre + f"convs.{j}")
                                for j in range(5)],
                      "post": _wn_conv(sd, pre + "conv_post")})
    return jax.tree.map(jnp.asarray, {"discs": discs})


def mrd_from_torch(sd: Dict[str, Array], n_discs: int = 3) -> dict:
    """MultiResolutionDiscriminator weights (models.py:281-357): per-
    resolution DiscriminatorR = 5 weight-normed Conv2d + conv_post (the STFT
    frontend is parameter-free)."""
    import jax
    discs = []
    for i in range(n_discs):
        pre = f"discriminators.{i}."
        discs.append({"convs": [_wn_conv(sd, pre + f"convs.{j}")
                                for j in range(5)],
                      "post": _wn_conv(sd, pre + "conv_post")})
    return jax.tree.map(jnp.asarray, {"discs": discs})


def lpaps_from_torch(sd: Dict[str, Array],
                     conv_layers=(64, 64, "MP", 128, 128, "MP",
                                  256, 256, 256, "MP", 512, 512, 512, "MP",
                                  512, 512, 512)) -> dict:
    """LPAPS weights (ldm/modules/losses_audio/lpaps.py:17-87): per-frequency
    ScalingLayer buffers, the bn-less VGGishish16 conv stack re-namespaced by
    torch slice (net.slice{1..5}.{global_feature_idx}), and the 5 NetLinLayer
    1x1 convs (lin{k}.model.1.weight, no bias)."""
    import jax
    # global nn.Sequential feature indices of each conv (MP=1 slot, conv=2:
    # Conv2d + ReLU) and the slice each index lives in (lpaps.py:96-107)
    bounds = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
    feats, idx = [], 0
    for v in conv_layers:
        if v == "MP":
            idx += 1
            continue
        s = next(i for i, (lo, hi) in enumerate(bounds) if lo <= idx < hi) + 1
        pre = f"net.slice{s}.{idx}."
        feats.append({"w": sd[pre + "weight"], "b": sd[pre + "bias"]})
        idx += 2
    return jax.tree.map(jnp.asarray, {
        "scaling": {"shift": sd["scaling_layer.shift"].reshape(-1),
                    "scale": sd["scaling_layer.scale"].reshape(-1)},
        "features": feats,
        "lins": [sd[f"lin{k}.model.1.weight"].reshape(-1) for k in range(5)],
    })


def nlayer_disc_from_torch(sd: Dict[str, Array], n_layers: int = 3) -> dict:
    """PatchGAN NLayerDiscriminator weights (ldm/modules/discriminator/
    model.py:98-148): Conv+LReLU, then n_layers Conv+BN+LReLU groups
    (bias-less convs; BN is train-mode so running stats are unused), then
    the 1-channel logits conv. Keys are `main.{i}.*` (strip any
    `discriminator.` prefix first)."""
    import jax
    layers = [{"conv": {"w": sd["main.0.weight"], "b": sd["main.0.bias"]},
               "bn": None}]
    idx = 2
    for _ in range(n_layers):
        layers.append({"conv": {"w": sd[f"main.{idx}.weight"]},
                       "bn": {"weight": sd[f"main.{idx + 1}.weight"],
                              "bias": sd[f"main.{idx + 1}.bias"]}})
        idx += 3
    layers.append({"conv": {"w": sd[f"main.{idx}.weight"],
                            "b": sd[f"main.{idx}.bias"]}, "bn": None})
    return jax.tree.map(jnp.asarray, {"layers": layers})


def melclf_from_torch(sd: Dict[str, Array], cfg=None) -> dict:
    """VGGishish eval-classifier weights (losses_audio/vggishish/model.py:
    7-54): the features Sequential (Conv2d [+BatchNorm2d] +ReLU per entry,
    MaxPool2d per 'MP') and the 3-Linear classifier head. BN running stats
    import as eval-mode constants (melclf._bn_batch)."""
    import jax
    from maa3_tpu.models.melclf import MelClfConfig
    cfg = cfg or MelClfConfig()
    feats, idx = [], 0
    for v in cfg.conv_layers:
        if v == "MP":
            idx += 1
            continue
        layer = {"w": sd[f"features.{idx}.weight"],
                 "b": sd[f"features.{idx}.bias"]}
        idx += 2
        if cfg.use_bn:
            pre = f"features.{idx - 1}."
            layer["bn"] = {"weight": sd[pre + "weight"],
                           "bias": sd[pre + "bias"],
                           "mean": sd[pre + "running_mean"],
                           "var": sd[pre + "running_var"]}
            idx += 1
        feats.append(layer)
    def _lin(i):
        return {"w": sd[f"classifier.{i}.weight"].T,
                "b": sd[f"classifier.{i}.bias"]}
    return jax.tree.map(jnp.asarray, {
        "features": feats, "fc1": _lin(0), "fc2": _lin(2), "fc3": _lin(4)})


def melception_from_torch(sd: Dict[str, Array]) -> dict:
    """Melception (vggishish/train_melception.py:20-34) — a torchvision
    Inception3 with a 1-channel stem and maxpools removed. The jax pytree
    (models/melception.py) mirrors torchvision's module names, so the
    import is a mechanical walk: `<path>.conv.weight` -> conv.w,
    `<path>.bn.{weight,bias,running_mean,running_var}` -> bn.{weight,bias,
    mean,var} (eval-mode constants), `fc.weight` transposed to (in, out)."""
    import jax
    ren = {"weight": "weight", "bias": "bias",
           "running_mean": "mean", "running_var": "var"}
    out: dict = {}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        leaf, parent = parts[-1], parts[-2] if len(parts) > 1 else ""
        node = out
        if parent in ("conv", "bn"):
            for p in parts[:-2]:
                node = node.setdefault(p, {})
            if parent == "conv":
                node.setdefault("conv", {})["w"] = v
            else:
                node.setdefault("bn", {})[ren[leaf]] = v
        elif parent == "fc" or leaf in ("weight", "bias"):
            # fc.weight / AuxLogits.fc.weight (Linear): transpose to (in, out)
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node["w" if leaf == "weight" else "b"] = (
                v.T if leaf == "weight" else v)
        else:
            raise KeyError(f"unrecognized melception key: {k}")
    return jax.tree.map(jnp.asarray, out)


# ---------------------------------------------------------------------------
# Cond stage (FrozenCLAPFLANEmbedder)
# ---------------------------------------------------------------------------

def clap_flan_from_torch(sd: Dict[str, Array], bert_cfg, t5_cfg) -> dict:
    """cond_stage_model.* -> {bert, projection, t5} pytrees."""
    from maa3_tpu.models.bert import bert_from_torch
    from maa3_tpu.models.t5 import t5_from_torch
    from maa3_tpu.models.clap import projection_from_torch
    return {
        "bert": bert_from_torch(sd, bert_cfg, prefix="caption_encoder.base."),
        "projection": projection_from_torch(sd, prefix="caption_encoder.projection."),
        "t5": t5_from_torch(sd, t5_cfg, prefix="t5_transformer."),
    }


def remap_ema_state(ema_sd: Dict[str, Array],
                    model_sd: Dict[str, Array],
                    prefix: str = "diffusion_model.") -> Dict[str, Array]:
    """LitEma stores shadow buffers under the param name with dots REMOVED
    (ldm/modules/ema.py:16-21: s_name = name.replace('.', '')). Rebuild a
    normally-named state_dict for the model part so the standard importers
    can consume EMA weights."""
    out = {}
    for k in model_sd:
        s_name = (prefix + k).replace(".", "")
        if s_name in ema_sd:
            out[k] = ema_sd[s_name]
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """torch.load a .ckpt/.pt file into numpy state_dict (CPU, lazy torch import)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("state_dict", "generator", "model"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    return {k: _np(v) for k, v in ckpt.items()}
