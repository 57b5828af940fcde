"""End-to-end generation pipelines (the scripts/ layer's compute core).

Mirrors the reference inference call stack (scripts/txt2audio_for_2cap_flow.py
:151-217 + ldm/models/diffusion/cfm1_audio.py:88-111 + ddpm_audio.py:357-371):

    uc, c = encode(text);  x0 ~ N(0, (B, 20, T/2))
    z  = CFG Euler ODE (25 steps)          [one lax.scan, one jit]
    z /= scale_factor; mel = VAE.decode(z) [jit]
    wav = BigVGAN(mel)                     [jit]

The three stages are separately jitted so the ODE can be re-used across
decode variants; everything stays on device until the final wav fetch.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from maa3_tpu.diffusion import cfm
from maa3_tpu.models.dit import (DiTConfig, dit_apply, dit_apply_planned,
                                 dit_init, dit_sample_plan)
from maa3_tpu.models.vae1d import VAEConfig, vae_decode, vae_encode_moments, gaussian_sample, vae_init
from maa3_tpu.models.bigvgan import BigVGANConfig, bigvgan_apply, bigvgan_init

Array = jax.Array


def _ode_chunk() -> int:
    """ODE sub-batch size for large launches (0 disables). Default 8 on
    accelerators: the b8-shaped program is the measured per-clip optimum
    (PROBE_B32_TRACE_r05 / PROBE_B32_FIX_r05 — XLA materializes attention
    and RoPE intermediates to HBM past it). MAA3_ODE_CHUNK overrides."""
    import os
    env = os.environ.get("MAA3_ODE_CHUNK")
    if env is not None:
        return int(env)
    return 0 if jax.default_backend() == "cpu" else 8


def _dual_mask(context_mask, uncond_mask, uncond):
    """CFG dual-batch key mask [uncond_mask; context_mask] (or None when no
    mask is given). A missing uncond_mask means the unconditional (empty-
    caption) context is fully valid."""
    if context_mask is None:
        return None
    um = (uncond_mask if uncond_mask is not None
          else jnp.ones(uncond.shape[:2], bool))
    return jnp.concatenate([um, context_mask], axis=0)


@dataclasses.dataclass(eq=False)  # identity hash/eq: jit static self
class T2APipeline:
    """Text(/video)-to-audio generation pipeline.

    `params` is a dict with keys: dit, vae, vocoder (each a pytree).
    `scale_factor` is the latent std rescale (ddpm_audio.py:162-169).
    """

    dit_cfg: DiTConfig
    vae_cfg: VAEConfig
    voc_cfg: BigVGANConfig
    params: dict
    scale_factor: float = 1.0
    compute_dtype: object = jnp.bfloat16
    # hoist per-step ODE constants (adaLN mods, context K/V) out of the scan;
    # numerically equivalent to the plain path (tests/test_dit.py)
    planned: bool = True
    # VAE-decode compute dtype (default fp32 even in bf16 serving: the
    # decoder contributes ~90% of the bf16 mel drift and costs only ~6 ms of
    # 215 ms — measured in scripts/measure_precision_drift.py; the gate
    # metric is mel-space). Set to None to follow compute_dtype.
    decode_dtype: object = jnp.float32

    # -- construction ------------------------------------------------------

    @classmethod
    def random_init(cls, key: Array, dit_cfg: DiTConfig = DiTConfig(),
                    vae_cfg: VAEConfig = VAEConfig(),
                    voc_cfg: BigVGANConfig = BigVGANConfig(),
                    **kw) -> "T2APipeline":
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "dit": dit_init(k1, dit_cfg),
            "vae": vae_init(k2, vae_cfg),
            "vocoder": bigvgan_init(k3, voc_cfg),
        }
        return cls(dit_cfg, vae_cfg, voc_cfg, params, **kw)

    # -- jitted stages -----------------------------------------------------

    def velocity_fn(self, dit_params):
        cfg = self.dit_cfg
        dtype = self.compute_dtype

        def vel(x, t_int, context):
            return dit_apply(dit_params, cfg, x, t_int, context,
                             compute_dtype=dtype)

        return vel

    def _sample_planned(self, dit_params, x0, context, uncond,
                        guidance_scale, steps, context_mask=None,
                        uncond_mask=None):
        """CFG ODE with per-step constants hoisted out of the scan: the adaLN
        modulations for the whole (known) timestep grid and the static
        cross-attn context K/V are computed once, in batched GEMMs, instead
        of once per step — ~0.5 GB/step less HBM traffic on the XL.

        context_mask/uncond_mask: optional (B, Ly) validity masks for padded
        context rows — threaded through BOTH the pooled caption feature and
        the per-step cross-attention (y_mask), matching dit_apply."""
        cfg = self.dit_cfg
        dtype = self.compute_dtype
        ctx_in = jnp.concatenate([uncond, context], axis=0)
        mask_in = _dual_mask(context_mask, uncond_mask, uncond)
        plan = dit_sample_plan(dit_params, cfg, cfm.planned_t_ints(steps),
                               ctx_in, context_mask=mask_in,
                               compute_dtype=dtype)
        yk, yv = plan["yk"], plan["yv"]  # step-invariant

        def step_vel(x_in, xs):
            mods, final_mod = xs
            return dit_apply_planned(dit_params, cfg, x_in, mods, final_mod,
                                     yk, yv, y_mask=mask_in,
                                     compute_dtype=dtype)

        return cfm.sample_cfg_planned(step_vel, x0,
                                      (plan["mods"], plan["final"]),
                                      guidance_scale, steps=steps)

    # NOTE: params are explicit jit ARGUMENTS (donated weights live on
    # device); closing over them would bake multi-GB constants into the
    # compiled program and explode compile time.

    def _sample_latent_impl(self, params, x0: Array, context: Array,
                            uncond: Array, guidance_scale: Array, steps: int,
                            context_mask=None, uncond_mask=None) -> Array:
        # Large-batch ODE launches run as SEQUENTIAL chunk-sized sub-batches
        # (lax.map): the round-5 device trace (PROBE_B32_TRACE_r05) showed
        # XLA's fusion decisions degrade with batch — at b32 the attention
        # scores/probs, RoPE stacks and residual converts spill to HBM at
        # ~1/3 effective bandwidth, costing +58 ms/clip vs b8. Chunking
        # re-enters the b8-shaped program, whose per-clip cost is the
        # measured optimum; outputs are identical (rows are independent).
        chunk = _ode_chunk()
        B = x0.shape[0]
        if chunk and B > chunk and B % chunk == 0:
            nc = B // chunk

            def re(a):
                return a.reshape((nc, chunk) + a.shape[1:])

            ops = [re(x0), re(context), re(uncond)]
            has_cm, has_um = context_mask is not None, uncond_mask is not None
            if has_cm:
                ops.append(re(context_mask))
            if has_um:
                ops.append(re(uncond_mask))

            def body(args):
                it = iter(args)
                x0c, cc, ucc = next(it), next(it), next(it)
                cm = next(it) if has_cm else None
                um = next(it) if has_um else None
                return self._sample_latent_one(params, x0c, cc, ucc,
                                               guidance_scale, steps, cm, um)

            z = jax.lax.map(body, tuple(ops))
            return z.reshape((B,) + z.shape[2:])
        return self._sample_latent_one(params, x0, context, uncond,
                                       guidance_scale, steps,
                                       context_mask, uncond_mask)

    def _sample_latent_one(self, params, x0: Array, context: Array,
                           uncond: Array, guidance_scale: Array, steps: int,
                           context_mask=None, uncond_mask=None) -> Array:
        if self.planned:
            return self._sample_planned(params["dit"], x0, context, uncond,
                                        guidance_scale, steps,
                                        context_mask, uncond_mask)
        mask_in = _dual_mask(context_mask, uncond_mask, uncond)
        if mask_in is None:
            vel = self.velocity_fn(params["dit"])
        else:
            cfg, dtype = self.dit_cfg, self.compute_dtype

            def vel(x, t_int, ctx):
                return dit_apply(params["dit"], cfg, x, t_int, ctx,
                                 context_mask=mask_in, compute_dtype=dtype)

        return cfm.sample_cfg(vel, x0, context, uncond, guidance_scale,
                              steps=steps)

    @partial(jax.jit, static_argnames=("self", "steps"))
    def _sample_latent(self, params, x0: Array, context: Array, uncond: Array,
                       guidance_scale: Array, steps: int = 25,
                       context_mask=None, uncond_mask=None) -> Array:
        return self._sample_latent_impl(params, x0, context, uncond,
                                        guidance_scale, steps,
                                        context_mask, uncond_mask)

    @partial(jax.jit, static_argnames=("self",))
    def _decode_mel(self, params, z: Array) -> Array:
        z = z / self.scale_factor
        return vae_decode(params["vae"], self.vae_cfg, z,
                          compute_dtype=self.decode_dtype or self.compute_dtype)

    @partial(jax.jit, static_argnames=("self",))
    def _vocode(self, params, mel: Array) -> Array:
        return bigvgan_apply(params["vocoder"], self.voc_cfg, mel,
                             compute_dtype=self.compute_dtype)

    @partial(jax.jit, static_argnames=("self", "steps"))
    def _generate_fused(self, params, x0, context, uncond, guidance_scale,
                        steps=25, context_mask=None, uncond_mask=None):
        z = self._sample_latent_impl(params, x0, context, uncond,
                                     guidance_scale, steps,
                                     context_mask, uncond_mask)
        mel = vae_decode(params["vae"], self.vae_cfg, z / self.scale_factor,
                         compute_dtype=self.decode_dtype or self.compute_dtype)
        wav = bigvgan_apply(params["vocoder"], self.voc_cfg, mel,
                            compute_dtype=self.compute_dtype)
        return z, mel, wav

    # -- public API --------------------------------------------------------

    def generate(self, context: Array, uncond: Array, key: Array,
                 latent_len: int = 312, guidance_scale: float = 5.0,
                 steps: int = 25, fused: bool = True,
                 context_mask: Optional[Array] = None,
                 uncond_mask: Optional[Array] = None):
        """context/uncond: (B, Ly, ctx_dim) text embeddings; optional
        (B, Ly) validity masks for padded context rows.
        Returns (latent, mel, wav) device arrays.
        Default latent_len 312 == 10 s (625 mel frames / 2), guidance 5.0 and
        25 steps match scripts/txt2audio_for_2cap_flow.py:74,109.
        """
        b = context.shape[0]
        x0 = jax.random.normal(
            key, (b, self.dit_cfg.in_channels, latent_len), jnp.float32)
        scale = jnp.float32(guidance_scale)
        if fused:
            return self._generate_fused(self.params, x0, context, uncond,
                                        scale, steps, context_mask,
                                        uncond_mask)
        z = self._sample_latent(self.params, x0, context, uncond, scale,
                                steps, context_mask, uncond_mask)
        mel = self._decode_mel(self.params, z)
        wav = self._vocode(self.params, mel)
        return z, mel, wav
