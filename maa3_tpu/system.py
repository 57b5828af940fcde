"""MAA3System — the runtime object gluing config, weights, conditioning,
sampling and decoding (the LatentDiffusion_audio + CFM role, minus torch).

Responsibilities mirrored from the reference:
- build from YAML config (scripts/txt2audio_for_2cap_flow.py:18-40
  load_model_from_config + configs/*.yaml)
- `get_learned_conditioning` (ddpm_audio.py:172-183) through the JAX
  CLAP⧺T5 / T5 / video-feature towers
- `sample` / `sample_cfg` (cfm1_audio.py:60-111) via the fused lax.scan ODE
- `decode_first_stage` with scale_factor (ddpm_audio.py:357-371)
- vocoder loading from a ckpt dir with config.json (models.py:394-552)
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from maa3_tpu import config as config_mod
from maa3_tpu.config import ModelSpec
from maa3_tpu.diffusion import cfm
from maa3_tpu.models.dit import DiTConfig, dit_apply, dit_init
from maa3_tpu.models.dit_moe import MoEDiTConfig, moe_dit_apply, moe_dit_init
from maa3_tpu.models.vae1d import (VAEConfig, gaussian_sample, vae_decode,
                                   vae_encode_moments, vae_init)
from maa3_tpu.models.bigvgan import BigVGANConfig, bigvgan_apply, bigvgan_init
from maa3_tpu.models.bert import BertConfig
from maa3_tpu.models.t5 import T5Config
from maa3_tpu.models import clap as clap_mod
from maa3_tpu.data.tokenizers import load_tokenizer
from maa3_tpu import torch_import

Array = jax.Array


def _parse_quant_mode(mode: str):
    """ "int8[:g<N>][,now2][,voc|,novoc][,smooth]" ->
    (group_size, skip_w2, quant_voc, smooth). Raises on anything else so
    typos fail at set_serving_quant time, not inside a compile. "voc" also
    w8a8-quantizes the wide BigVGAN resblock conv GEMMs
    (models/bigvgan.py::quantize_bigvgan) — default OFF: the round-4
    per-stage probes measured int8 LOSING to bf16 lax.conv on every wide
    vocoder stage at batch (tap-GEMM 39.5 vs 32.5 ms res0; unfold worse),
    so the mode is kept as an A/B lever, not a default. "smooth" applies
    SmoothQuant scale migration folded into the weights (zero runtime
    cost; needs a prior calibrate_smooth(...) call)."""
    base, _, opts = mode.partition(":")
    if base != "int8":
        raise ValueError(f"unknown serving quant mode: {mode!r}")
    group, skip_w2, quant_voc, smooth = 0, False, False, False
    for o in filter(None, opts.split(",")):
        if o.startswith("g") and o[1:].isdigit():
            group = int(o[1:])
        elif o == "now2":
            skip_w2 = True
        elif o == "voc":
            quant_voc = True
        elif o == "novoc":
            quant_voc = False
        elif o == "smooth":
            smooth = True
        else:
            raise ValueError(f"unknown int8 variant option: {o!r} in {mode!r}")
    return group, skip_w2, quant_voc, smooth


class MAA3System:
    def __init__(self, spec: ModelSpec, params: dict,
                 voc_cfg: Optional[BigVGANConfig] = None,
                 scale_factor: float = 1.0,
                 tokenizer_dir: Optional[str] = None,
                 compute_dtype=jnp.bfloat16,
                 clap_cfg: Optional[clap_mod.CLAPFLANConfig] = None):
        self.spec = spec
        self.params = params  # {dit, vae, cond?, vocoder?}
        self.voc_cfg = voc_cfg or BigVGANConfig()
        self.scale_factor = float(scale_factor)
        self.compute_dtype = compute_dtype
        self.clap_cfg = clap_cfg or clap_mod.CLAPFLANConfig()
        tk_root = tokenizer_dir or os.environ.get("MAA3_TOKENIZER_DIR")
        self.bert_tokenizer = load_tokenizer(
            os.path.join(tk_root, "bert") if tk_root else None, "bert")
        self.t5_tokenizer = load_tokenizer(
            os.path.join(tk_root, "t5") if tk_root else None, "t5")
        self._jit_cache: dict = {}
        self._serving_dit = None  # lazily fused/cast copy (see serving_dit)
        self._serving_src = None  # identity of params["dit"] the copy is from
        self._serving_voc = None  # lazily quantized vocoder (serving_vocoder)
        self._serving_voc_src = None
        self._smooth_stats = None  # SmoothQuant calibration (calibrate_smooth)
        self.serve_quant: Optional[str] = None  # None | "int8" (set_serving_quant)
        self._serving_mesh = None  # tensor-parallel serving (shard_serving)

    # -- construction ------------------------------------------------------

    @classmethod
    def from_config(cls, config_paths: Sequence[str],
                    overrides: Sequence[str] = (),
                    ckpt_path: Optional[str] = None,
                    vocoder_dir: Optional[str] = None,
                    seed: int = 0, compute_dtype=jnp.bfloat16,
                    init_cond: bool = True) -> "MAA3System":
        cfg = config_mod.load_config(config_paths, overrides)
        spec = config_mod.parse_model_config(cfg)
        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)

        params: dict = {}
        scale_factor = spec.scale_factor
        if ckpt_path and os.path.isdir(ckpt_path):
            # our own Orbax training checkpoint (train/loop.py save format)
            system = cls._from_orbax(spec, ckpt_path, seed, compute_dtype)
            if vocoder_dir:
                system._load_vocoder(vocoder_dir)
            return system
        if ckpt_path:
            sd = torch_import.load_torch_checkpoint(ckpt_path)
            parts = torch_import.split_lightning_ckpt(sd)
            moe = spec.backbone_kind == "video_moe_dit"
            dit_sd = parts["dit"]
            if parts["ema"]:
                ema_sd = torch_import.remap_ema_state(parts["ema"], dit_sd)
                if len(ema_sd) == len(dit_sd):
                    print("using EMA weights from checkpoint")
                    dit_sd = ema_sd
            params["dit"] = torch_import.dit_from_torch(
                dit_sd, depth=spec.dit.depth, qk_norm=spec.dit.qk_norm,
                moe=moe, num_experts=getattr(spec.dit, "num_experts", 4))
            params["vae"] = torch_import.vae_from_torch(parts["vae"], spec.vae)
            if spec.cond_kind == "clap_flan" and parts["cond"]:
                params["cond"] = torch_import.clap_flan_from_torch(
                    parts["cond"], BertConfig(), T5Config())
            elif spec.cond_kind == "flan" and parts["cond"]:
                # FrozenFLANEmbedder stores its T5 under `transformer.`
                # (modules.py:66), not `t5_transformer.`
                from maa3_tpu.models.t5 import t5_from_torch
                params["cond"] = {"t5": t5_from_torch(
                    parts["cond"], T5Config(), prefix="transformer.")}
            elif spec.cond_kind == "clap" and parts["cond"]:
                from maa3_tpu.models.bert import bert_from_torch
                from maa3_tpu.models.clap import projection_from_torch
                params["cond"] = {
                    "bert": bert_from_torch(parts["cond"], BertConfig(),
                                            prefix="caption_encoder.base."),
                    "projection": projection_from_torch(
                        parts["cond"], prefix="caption_encoder.projection.")}
            elif spec.cond_kind.startswith("video_feat") and parts["cond"]:
                params["cond"] = {"embedder": {
                    "w": jnp.asarray(parts["cond"]["embedder.0.weight"].T),
                    "b": jnp.asarray(parts["cond"]["embedder.0.bias"])}}
            if "cond" not in params and init_cond:
                # ckpt lacks the cond stage (strict=False partial load in the
                # reference, txt2audio_for_2cap_flow.py:18-40): random init
                if spec.cond_kind in ("clap_flan", "clap", "flan"):
                    params["cond"] = clap_mod.clap_flan_init(
                        k3, clap_mod.CLAPFLANConfig())
                elif spec.cond_kind.startswith("video_feat"):
                    params["cond"] = clap_mod.video_feat_encoder_init(
                        k3, 512, spec.dit.context_dim)
            if parts["scale_factor"] is not None:
                scale_factor = float(parts["scale_factor"])
        else:
            if spec.backbone_kind == "video_moe_dit":
                params["dit"] = moe_dit_init(k1, spec.dit)
            else:
                params["dit"] = dit_init(k1, spec.dit)
            params["vae"] = vae_init(k2, spec.vae)
            if init_cond:
                if spec.cond_kind in ("clap_flan", "clap", "flan"):
                    params["cond"] = clap_mod.clap_flan_init(
                        k3, clap_mod.CLAPFLANConfig())
                elif spec.cond_kind.startswith("video_feat"):
                    params["cond"] = clap_mod.video_feat_encoder_init(
                        k3, 512, spec.dit.context_dim)

        voc_cfg = BigVGANConfig()
        if vocoder_dir:
            cfg_json = os.path.join(vocoder_dir, "config.json")
            if os.path.exists(cfg_json):
                with open(cfg_json) as f:
                    voc_cfg = BigVGANConfig.from_dict(json.load(f))
            gen_path = None
            for name in ("generator.pt", "generator.pth", "g_02500000",
                         "g_02500000.pth", "bigvgan_generator.pt", "best_netG.pt"):
                p = os.path.join(vocoder_dir, name)
                if os.path.exists(p):
                    gen_path = p
                    break
            if gen_path:
                sd = torch_import.load_torch_checkpoint(gen_path)
                params["vocoder"] = torch_import.bigvgan_from_torch(sd, voc_cfg)
        if "vocoder" not in params:
            params["vocoder"] = bigvgan_init(k4, voc_cfg)

        return cls(spec, params, voc_cfg, scale_factor,
                   compute_dtype=compute_dtype)

    @classmethod
    def _from_orbax(cls, spec, ckpt_dir: str, seed: int,
                    compute_dtype, clap_cfg=None) -> "MAA3System":
        """Restore {params: {dit, cond?}, frozen: {vae}?, scale_factor, ...}
        saved by Trainer.save_checkpoint. Round-5 checkpoints carry the
        frozen VAE (restored here); older ones fall back to random init.
        The vocoder comes from random init or a separate load."""
        import orbax.checkpoint as ocp
        key = jax.random.PRNGKey(seed)
        _, k2, k3, k4 = jax.random.split(key, 4)
        with ocp.PyTreeCheckpointer() as ckptr:  # raw restore, no target
            restored = ckptr.restore(os.path.abspath(ckpt_dir))
        # prefer EMA weights when present (inference convention)
        trained = restored.get("ema_params") or restored["params"]
        frozen = restored.get("frozen") or {}
        vae_params = (jax.tree.map(jnp.asarray, frozen["vae"])
                      if "vae" in frozen else vae_init(k2, spec.vae))
        params = {"dit": jax.tree.map(jnp.asarray, trained["dit"]),
                  "vae": vae_params,
                  "vocoder": bigvgan_init(k4, BigVGANConfig())}
        if "cond" in trained:
            params["cond"] = jax.tree.map(jnp.asarray, trained["cond"])
        elif spec.cond_kind in ("clap_flan", "clap", "flan"):
            params["cond"] = clap_mod.clap_flan_init(
                k3, clap_cfg or clap_mod.CLAPFLANConfig())
        elif spec.cond_kind.startswith("video_feat"):
            params["cond"] = clap_mod.video_feat_encoder_init(
                k3, 512, spec.dit.context_dim)
        return cls(spec, params, BigVGANConfig(),
                   float(restored.get("scale_factor", spec.scale_factor)),
                   compute_dtype=compute_dtype, clap_cfg=clap_cfg)

    def _load_vocoder(self, vocoder_dir: str) -> None:
        cfg_json = os.path.join(vocoder_dir, "config.json")
        if os.path.exists(cfg_json):
            with open(cfg_json) as f:
                self.voc_cfg = BigVGANConfig.from_dict(json.load(f))
        for name in ("generator.pt", "generator.pth", "g_02500000",
                     "g_02500000.pth", "bigvgan_generator.pt", "best_netG.pt"):
            p = os.path.join(vocoder_dir, name)
            if os.path.exists(p):
                sd = torch_import.load_torch_checkpoint(p)
                self.params["vocoder"] = torch_import.bigvgan_from_torch(
                    sd, self.voc_cfg)
                return

    def cast_weights_bf16(self) -> None:
        """Inference speed mode: store DiT matmul weights in bf16 (halves the
        dominant weight-read HBM traffic per ODE step; norms/gates stay fp32).
        Use fp32 (default) for strict parity with the reference."""
        from maa3_tpu.utils.nprand import cast_matmul_weights
        self.params["dit"] = cast_matmul_weights(self.params["dit"],
                                                 jnp.bfloat16)
        self._serving_dit = None

    def serving_dit(self) -> dict:
        """DiT params as the samplers consume them. In bf16 mode this is a
        lazily-built fast copy: matmul weights cast to bf16 (halves weight
        HBM reads per ODE step) and wq/wk/wv + w1/w3 concatenated into single
        wide GEMMs (fuse_dit_gemms; numerics identical). `self.params["dit"]`
        stays canonical/unfused for checkpointing and inspection.

        The cache is keyed on the identity of `self.params["dit"]`, so ANY
        reassignment (ad-hoc checkpoint reload, Trainer.sync_system_params,
        cast_weights_bf16) invalidates it — no silent stale weights."""
        if (self._serving_dit is None
                or self._serving_src is not self.params["dit"]):
            p = self.params["dit"]
            self._serving_src = p
            # with tensor-parallel serving the fused wqkv/w13 concat axis
            # would span shard boundaries (GSPMD reshards at the split) —
            # keep the canonical unfused layout and let the column/row
            # specs shard each projection cleanly
            tp = (self._serving_mesh is not None
                  and self._serving_mesh.shape.get("model", 1) > 1)
            if self.serve_quant:
                # fuse (single-chip only) from fp32, quantize the hot
                # per-step GEMMs from fp32 (scales off the canonical
                # weights, not a bf16 recast), then cast the rest to bf16.
                from maa3_tpu.ops.quant import quantize_dit_serving
                from maa3_tpu.utils.nprand import (cast_matmul_weights,
                                                   fuse_dit_gemms)
                group, skip_w2, _, smooth = _parse_quant_mode(
                    self.serve_quant)
                if not tp and "wq" in p["blocks"]["attention"]:
                    p = fuse_dit_gemms(p)
                if smooth:
                    if self._smooth_stats is None:
                        raise RuntimeError(
                            "serve_quant 'int8:smooth' needs activation "
                            "stats — call system.calibrate_smooth(cond, "
                            "uncond) once before sampling")
                    from maa3_tpu.ops.quant import smooth_migrate_dit
                    p = smooth_migrate_dit(p, self._smooth_stats)
                p = quantize_dit_serving(p, group_size=group,
                                         skip_w2=skip_w2)
                p = cast_matmul_weights(p, jnp.bfloat16)
            elif self.compute_dtype == jnp.bfloat16:
                from maa3_tpu.utils.nprand import (cast_matmul_weights,
                                                   fuse_dit_gemms)
                p = cast_matmul_weights(p, jnp.bfloat16)
                if not tp and "wq" in p["blocks"]["attention"]:
                    p = fuse_dit_gemms(p)
            if self._serving_mesh is not None:
                from maa3_tpu.parallel.mesh import (add_ep_specs,
                                                    dit_param_specs,
                                                    shard_params)
                specs = dit_param_specs(p)
                n_exp = self._serving_mesh.shape.get("expert", 1)
                if n_exp > 1:  # expert-parallel video-MoE serving
                    specs = add_ep_specs(p, specs, n_exp)
                p = shard_params(p, self._serving_mesh, specs)
            self._serving_dit = p
        return self._serving_dit

    def shard_serving(self, mesh) -> None:
        """Tensor-parallel serving: shard the serving DiT over `mesh`'s
        'model' axis (Megatron column/row specs, parallel.mesh.dit_param_specs
        — XLA inserts the wo/w2 all-reduces from the shardings alone). The
        per-step GEMM weights and their HBM reads split model-ways, cutting
        small-batch ODE latency; pass None to return to single-chip serving.
        Composes with set_serving_quant("int8") (per-tensor quantization in
        the unfused layout). A mesh with an 'expert' axis (make_moe_mesh)
        additionally shards the video MoE's stacked-expert FFNs 1/E per chip
        (add_ep_specs — expert-parallel serving)."""
        self._serving_mesh = mesh
        self._serving_dit = None

    def set_serving_quant(self, mode: Optional[str]) -> None:
        """Select the serving quantization mode: None (bf16/fp32 per
        compute_dtype) or "int8" (w8a8 on the per-step DiT GEMMs — ~1.7x
        faster ODE steps on v5e, small extra drift; see ops/quant.py).
        Variant suffixes after ':' (comma-separated) trade speed for drift:
        "int8:g128" per-group-128 weight + per-(token,group) activation
        scales (single-chip only), "int8:now2" keeps the FFN down-projection
        bf16, "int8:g128,now2" both. Invalidates the cached serving copy."""
        if mode is not None:
            _parse_quant_mode(mode)  # validate eagerly
        self.serve_quant = mode
        self._serving_dit = None
        self._serving_voc = None

    def calibrate_smooth(self, cond: Array, uncond: Array,
                         key: Optional[Array] = None, timesteps: int = 25,
                         scale: float = 5.0, shape=None) -> None:
        """One-time SmoothQuant calibration for 'int8:smooth': runs the real
        CFG ODE once on `cond`/`uncond`, records per-(block, channel) amax of
        the quantized-GEMM inputs, and invalidates the serving copy so the
        next sample uses migrated weights (ops/quant.py::smooth_migrate_dit;
        zero runtime cost — everything folds into existing weights)."""
        if self.spec.backbone_kind == "video_moe_dit":
            raise NotImplementedError(
                "smooth migration targets the text DiT serving path")
        from maa3_tpu.ops.quant import calibrate_dit_smooth
        b = cond.shape[0]
        if shape is None:
            shape = (b, self.spec.mel_dim, self.spec.mel_length)
        x0 = jax.random.normal(key if key is not None else jax.random.PRNGKey(0),
                               shape, jnp.float32)
        self._smooth_stats = calibrate_dit_smooth(
            self.params["dit"], self._serving_dit_cfg(), x0, cond, uncond,
            guidance_scale=scale, steps=timesteps,
            compute_dtype=self.compute_dtype)
        self._serving_dit = None

    # -- conditioning ------------------------------------------------------

    def get_learned_conditioning(self, c) -> Array:
        """c: {'ori_caption': [...], 'struct_caption': [...]} or list[str]
        or video features (B, Lv, 512)."""
        if self.spec.cond_kind == "clap_flan":
            ori = c["ori_caption"] if isinstance(c, dict) else list(c)
            struct = c["struct_caption"] if isinstance(c, dict) else list(c)
            ori_ids, ori_mask = self.bert_tokenizer(ori)
            st_ids, st_mask = self.t5_tokenizer(struct)
            fn = self._jit("enc_clap_flan", partial(clap_mod.clap_flan_encode,
                                                    cfg=self.clap_cfg))
            return fn(self.params["cond"], ori_ids=jnp.asarray(ori_ids),
                      struct_ids=jnp.asarray(st_ids),
                      ori_mask=jnp.asarray(ori_mask),
                      struct_mask=jnp.asarray(st_mask))
        if self.spec.cond_kind == "clap":
            ids, mask = self.bert_tokenizer(list(c))
            fn = self._jit("enc_clap", partial(clap_mod.clap_encode,
                                               cfg=self.clap_cfg))
            return fn(self.params["cond"], ids=jnp.asarray(ids),
                      mask=jnp.asarray(mask))
        if self.spec.cond_kind == "flan":
            ids, mask = self.t5_tokenizer(list(c))
            fn = self._jit("enc_flan", partial(clap_mod.flan_encode,
                                               cfg=self.clap_cfg))
            return fn(self.params["cond"], ids=jnp.asarray(ids),
                      mask=jnp.asarray(mask))
        if self.spec.cond_kind.startswith("video_feat"):
            return clap_mod.video_feat_encoder_apply(self.params["cond"],
                                                     jnp.asarray(c))
        raise ValueError(f"no conditioning for kind {self.spec.cond_kind}")

    # -- velocity / sampling ----------------------------------------------

    def _velocity_fn(self, dit_params):
        spec = self.spec
        dtype = self.compute_dtype
        if spec.backbone_kind == "video_moe_dit":
            return lambda x, t, c: moe_dit_apply(dit_params, spec.dit, x, t, c,
                                                 compute_dtype=dtype)
        cfg = self._serving_dit_cfg()
        return lambda x, t, c: dit_apply(dit_params, cfg, x, t, c,
                                         compute_dtype=dtype)

    def _jit(self, name, fn):
        # params are explicit jit arguments — closing over them would bake
        # the weights into the program as constants (compile-time blowup).
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    def _serving_dit_cfg(self):
        """DiT config as the samplers consume it: in bf16 serving the
        residual stream is carried in fp32 (fp32_residual) — measured free
        on the v5e (p50 unchanged) and ~3x lower latent drift
        (scripts/measure_precision_drift.py). Text DiT only; the MoE config
        has no such knob (its serving mode mirrors the reference's)."""
        import dataclasses
        cfg = self.spec.dit
        if (self.compute_dtype == jnp.bfloat16
                and self.spec.backbone_kind != "video_moe_dit"):
            cfg = dataclasses.replace(cfg, fp32_residual=True)
        return cfg

    def sample_cfg(self, cond: Array, scale: float, uncond: Array,
                   key: Array, shape=None, timesteps: int = 25,
                   cond_mask: Optional[Array] = None,
                   uncond_mask: Optional[Array] = None,
                   x0: Optional[Array] = None) -> Array:
        """cond/uncond: (B, Ly, ctx); cond_mask/uncond_mask: optional (B, Ly)
        validity masks for padded context rows — threaded through the pooled
        caption feature AND the per-step cross-attention (the video MoE path
        has no padding concept and rejects masks). x0: optional pre-drawn
        initial noise (B, C, L) overriding `key`/`shape` — the serving
        daemon draws one row per request seed so a request's output is
        reproducible and independent of whatever it was co-batched with."""
        b = cond.shape[0]
        if shape is None:
            shape = (b, self.spec.mel_dim, self.spec.mel_length)
        if x0 is None:
            x0 = jax.random.normal(key, shape, jnp.float32)
        else:
            x0 = jnp.asarray(x0, jnp.float32)
        if (cond_mask is not None
                and self.spec.backbone_kind == "video_moe_dit"):
            raise ValueError("context masks are not supported for the video "
                             "MoE backbone (fixed-length features)")

        serving_cfg = self._serving_dit_cfg()

        def run_one(dit_params, x0, c, uc, s, c_mask, uc_mask):
            # planned path: per-step adaLN modulations + static context K/V
            # (and for the MoE: freq-expert slices + shared-t expert select)
            # hoisted out of the Euler scan; numerics identical to
            # cfm.sample_cfg (tests/test_dit.py, tests/test_moe.py)
            cfg = serving_cfg if self.spec.backbone_kind != "video_moe_dit" \
                else self.spec.dit
            dtype = self.compute_dtype
            ctx_in = jnp.concatenate([uc, c], axis=0)
            t_ints = cfm.planned_t_ints(
                timesteps, num_timesteps=self.spec.timesteps)
            if self.spec.backbone_kind == "video_moe_dit":
                from maa3_tpu.models.dit_moe import (moe_dit_apply_planned,
                                                     moe_dit_sample_plan)
                plan = moe_dit_sample_plan(dit_params, cfg, t_ints, ctx_in,
                                           compute_dtype=dtype)

                def step_vel(x_in, xs):
                    mods, final_mod, tidx = xs
                    return moe_dit_apply_planned(
                        dit_params, cfg, x_in, mods, final_mod, tidx,
                        plan["yk"], plan["yv"], plan["freq_sliced"],
                        compute_dtype=dtype)

                return cfm.sample_cfg_planned(
                    step_vel, x0, (plan["mods"], plan["final"], plan["tidx"]),
                    s, steps=timesteps)

            from maa3_tpu.models.dit import dit_apply_planned, dit_sample_plan
            if c_mask is not None:
                um = (uc_mask if uc_mask is not None
                      else jnp.ones(uc.shape[:2], bool))
                mask_in = jnp.concatenate([um, c_mask], axis=0)
            else:
                mask_in = None
            plan = dit_sample_plan(dit_params, cfg, t_ints, ctx_in,
                                   context_mask=mask_in, compute_dtype=dtype)

            def step_vel(x_in, xs):
                mods, final_mod = xs
                return dit_apply_planned(dit_params, cfg, x_in, mods,
                                         final_mod, plan["yk"], plan["yv"],
                                         y_mask=mask_in, compute_dtype=dtype)

            return cfm.sample_cfg_planned(
                step_vel, x0, (plan["mods"], plan["final"]), s,
                steps=timesteps)

        def run(dit_params, x0, c, uc, s, c_mask, uc_mask):
            # sequential chunk-sized sub-batches for big launches — past
            # chunk=8 XLA materializes attention/RoPE intermediates to HBM
            # and per-clip ODE cost rises 1.5x (PROBE_B32_TRACE_r05);
            # identical outputs, batch rows are independent
            from maa3_tpu.pipeline import _ode_chunk
            chunk = _ode_chunk()
            B = x0.shape[0]
            if not (chunk and B > chunk and B % chunk == 0):
                return run_one(dit_params, x0, c, uc, s, c_mask, uc_mask)
            nc = B // chunk

            def re(a):
                return a.reshape((nc, chunk) + a.shape[1:])

            ops = [re(x0), re(c), re(uc)]
            has_cm, has_um = c_mask is not None, uc_mask is not None
            if has_cm:
                ops.append(re(c_mask))
            if has_um:
                ops.append(re(uc_mask))

            def body(args):
                it = iter(args)
                x0c, cc, ucc = next(it), next(it), next(it)
                cm = next(it) if has_cm else None
                um = next(it) if has_um else None
                return run_one(dit_params, x0c, cc, ucc, s, cm, um)

            z = jax.lax.map(body, tuple(ops))
            return z.reshape((B,) + z.shape[2:])

        return self._jit(("sample_cfg", timesteps), run)(
            self.serving_dit(), x0, cond, uncond, jnp.float32(scale),
            cond_mask, uncond_mask)

    def sample(self, cond: Array, key: Array, shape=None,
               timesteps: int = 25) -> Array:
        b = cond.shape[0]
        if shape is None:
            shape = (b, self.spec.mel_dim, self.spec.mel_length)
        x0 = jax.random.normal(key, shape, jnp.float32)

        def run(dit_params, x0, c):
            return cfm.sample(self._velocity_fn(dit_params), x0, c,
                              steps=timesteps,
                              num_timesteps=self.spec.timesteps)

        return self._jit(("sample", timesteps), run)(self.serving_dit(), x0, cond)

    # -- first stage / vocoder --------------------------------------------

    def encode_first_stage(self, mel: Array, key: Optional[Array] = None) -> Array:
        sample = key is not None
        key = key if key is not None else jax.random.PRNGKey(0)

        def run(vae_params, mel, scale, key):
            moments = vae_encode_moments(vae_params, self.spec.vae, mel,
                                         compute_dtype=self.compute_dtype)
            return gaussian_sample(moments, key if sample else None,
                                   sample=sample) * scale

        return self._jit(("encode", sample), run)(
            self.params["vae"], mel, jnp.float32(self.scale_factor), key)

    def decode_first_stage(self, z: Array) -> Array:
        # fp32 decode even in bf16 serving: the bf16 decoder contributes
        # ~90% of the mel drift for ~6 ms (scripts/measure_precision_drift)
        def run(vae_params, z, scale):
            return vae_decode(vae_params, self.spec.vae, z / scale,
                              compute_dtype=jnp.float32)
        return self._jit("decode", run)(self.params["vae"], z,
                                        jnp.float32(self.scale_factor))

    def serving_vocoder(self) -> dict:
        """Vocoder params as `vocode` consumes them: with the opt-in
        ':voc' int8 variant the wide-stage resblock convs are w8a8-quantized
        (models/bigvgan.py::quantize_bigvgan). Cache keyed on the identity of
        params["vocoder"], mirroring serving_dit."""
        if not self.serve_quant or not _parse_quant_mode(self.serve_quant)[2]:
            return self.params["vocoder"]
        if (self._serving_voc is None
                or self._serving_voc_src is not self.params["vocoder"]):
            from maa3_tpu.models.bigvgan import quantize_bigvgan
            self._serving_voc_src = self.params["vocoder"]
            self._serving_voc = quantize_bigvgan(self.params["vocoder"],
                                                 self.voc_cfg)
        return self._serving_voc

    def vocode(self, mel: Array) -> np.ndarray:
        def run(voc_params, m):
            return bigvgan_apply(voc_params, self.voc_cfg, m,
                                 compute_dtype=self.compute_dtype)
        wav = self._jit("vocode", run)(self.serving_vocoder(), mel)
        return np.asarray(wav)
