"""DiT backbone shape/semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maa3_tpu.models.dit import DiTConfig, dit_init, dit_apply, dit_param_count
from maa3_tpu.diffusion import cfm


CFG_TINY = DiTConfig(in_channels=20, context_dim=64, hidden_size=128,
                     depth=2, num_heads=4, max_len=128)


def test_dit_forward_shape():
    key = jax.random.PRNGKey(0)
    params = dit_init(key, CFG_TINY)
    x = jax.random.normal(key, (2, 20, 32))
    t = jnp.array([10, 500])
    ctx = jax.random.normal(key, (2, 7, 64))
    out = dit_apply(params, CFG_TINY, x, t, ctx, compute_dtype=jnp.float32)
    assert out.shape == (2, 20, 32)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_dit_zero_init_output_is_zero():
    """Zero-init FinalLayer => velocity is exactly 0 at init
    (flag_large_dit.py:293-297 zero-inits the output linear + adaLN)."""
    key = jax.random.PRNGKey(1)
    params = dit_init(key, CFG_TINY)
    x = jax.random.normal(key, (2, 20, 32))
    out = dit_apply(params, CFG_TINY, x, jnp.array([3, 4]),
                    jax.random.normal(key, (2, 7, 64)), compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_dit_batch_independence():
    """Each batch row must be independent (no cross-batch leakage)."""
    key = jax.random.PRNGKey(2)
    params = dit_init(key, CFG_TINY)
    # make output nonzero
    params["final_layer"]["linear"]["w"] = (
        jax.random.normal(key, params["final_layer"]["linear"]["w"].shape) * 0.1)
    x = jax.random.normal(key, (2, 20, 16))
    ctx = jax.random.normal(key, (2, 7, 64))
    t = jnp.array([100, 100])
    full = dit_apply(params, CFG_TINY, x, t, ctx, compute_dtype=jnp.float32)
    single = dit_apply(params, CFG_TINY, x[:1], t[:1], ctx[:1],
                       compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(full[:1]), np.asarray(single),
                               rtol=1e-4, atol=1e-5)


def test_param_count_m_model():
    """M model (768 x 16L x 32H, ctx 1024). Analytic count of the reference
    architecture is 197,940,244 (attn 2.36M + cross-kv 1.57M + SwiGLU-2048
    4.72M + adaLN 3.54M per block, x16, + embedders/final). The README's
    "160M" is a rounded marketing figure; structural parity is what matters."""
    cfg = DiTConfig(in_channels=20, context_dim=1024, hidden_size=768,
                    depth=16, num_heads=32)
    params = dit_init(jax.random.PRNGKey(0), cfg)
    n = dit_param_count(params)
    assert n == 197_940_244, f"param count {n} != analytic 197,940,244"


def test_cfm_loss_and_interpolant():
    x1 = jnp.ones((2, 4, 8))
    x0 = jnp.zeros_like(x1)
    xt, ut = cfm.cfm_interpolate(x1, x0, jnp.array([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(xt[0]), 0.0, atol=1e-6)  # t=0 -> x0
    np.testing.assert_allclose(np.asarray(xt[1]), 1.0, atol=1e-6)  # t=1 -> x1
    np.testing.assert_allclose(np.asarray(ut), 1.0, atol=1e-6)

    def vel(x, t, c):
        return jnp.zeros_like(x)

    loss, aux = cfm.cfm_loss(vel, x1, jnp.zeros((2, 3, 5)), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_sample_cfg_euler_exact_linear_flow():
    """With v(x,t) = const c, Euler must return x0 + c exactly."""
    const = 0.5

    def vel(x, t, ctx):
        return jnp.full_like(x, const)

    x0 = jnp.zeros((2, 4, 8))
    out = cfm.sample_cfg(vel, x0, jnp.zeros((2, 1, 1)), jnp.zeros((2, 1, 1)),
                         guidance_scale=3.0, steps=25)
    np.testing.assert_allclose(np.asarray(out), const, rtol=1e-5)


def test_sample_cfg_guidance_combination():
    """velocity depends on context: check e_uc + s*(e_c - e_uc) combination."""
    def vel(x, t, ctx):
        # context scalar broadcast as velocity
        return jnp.broadcast_to(ctx[:, :1, :1, ], x.shape) * jnp.ones_like(x)

    x0 = jnp.zeros((1, 2, 2))
    c = jnp.full((1, 1, 1), 1.0)
    uc = jnp.full((1, 1, 1), 0.0)
    out = cfm.sample_cfg(vel, x0, c, uc, guidance_scale=3.0, steps=5)
    # e = 0 + 3*(1-0) = 3 constant velocity -> x = 3.0
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-5)


def test_planned_sampling_matches_plain():
    """The hoisted sampling path (dit_sample_plan + dit_apply_planned) must
    reproduce sample_cfg exactly — same math, precomputed out of the scan."""
    from maa3_tpu.models.dit import dit_sample_plan, dit_apply_planned

    cfg = DiTConfig(in_channels=6, context_dim=32, hidden_size=64, depth=3,
                    num_heads=4, max_len=64, qk_norm=True)
    key = jax.random.PRNGKey(7)
    params = dit_init(key, cfg)
    # break the zero-init so the velocity is non-trivial
    params["final_layer"]["linear"]["w"] = (
        0.02 * jax.random.normal(key, params["final_layer"]["linear"]["w"].shape))
    params["blocks"]["attention"]["gate"] = (
        0.5 * jnp.ones_like(params["blocks"]["attention"]["gate"]))

    b, tlen, steps = 2, 16, 6
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, 6, tlen))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 9, 32))
    uc = jnp.zeros_like(ctx)

    def vel(x, t_int, context):
        return dit_apply(params, cfg, x, t_int, context,
                         compute_dtype=jnp.float32)

    z_plain = cfm.sample_cfg(vel, x0, ctx, uc, 3.0, steps=steps)

    ctx_in = jnp.concatenate([uc, ctx], axis=0)
    plan = dit_sample_plan(params, cfg, cfm.planned_t_ints(steps), ctx_in,
                           compute_dtype=jnp.float32)

    def step_vel(x_in, xs):
        mods, final_mod = xs
        return dit_apply_planned(params, cfg, x_in, mods, final_mod,
                                 plan["yk"], plan["yv"],
                                 compute_dtype=jnp.float32)

    z_planned = cfm.sample_cfg_planned(step_vel, x0,
                                       (plan["mods"], plan["final"]),
                                       3.0, steps=steps)
    np.testing.assert_allclose(np.asarray(z_planned), np.asarray(z_plain),
                               rtol=2e-5, atol=2e-5)


def test_planned_pipeline_matches_unplanned():
    """T2APipeline(planned=True) == planned=False end-to-end on the latent."""
    import dataclasses as _dc
    from maa3_tpu.pipeline import T2APipeline
    from maa3_tpu.models.vae1d import VAEConfig
    from maa3_tpu.models.bigvgan import BigVGANConfig

    cfg = DiTConfig(in_channels=8, context_dim=16, hidden_size=64, depth=2,
                    num_heads=4, max_len=64)
    vae_cfg = VAEConfig(in_channels=16, out_ch=16, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, down_layers=(0,), kernel_size=3,
                        z_channels=8, embed_dim=8)
    voc = BigVGANConfig(num_mels=16, upsample_rates=(2, 2),
                        upsample_kernel_sizes=(4, 4),
                        upsample_initial_channel=8,
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 2),))
    pipe = T2APipeline.random_init(jax.random.PRNGKey(0), cfg, vae_cfg, voc,
                                   compute_dtype=jnp.float32)
    pipe.params["dit"]["final_layer"]["linear"]["w"] = (
        0.02 * jax.random.normal(jax.random.PRNGKey(3),
                                 pipe.params["dit"]["final_layer"]["linear"]["w"].shape))
    ctx = jax.random.normal(jax.random.PRNGKey(4), (1, 5, 16))
    uc = jnp.zeros_like(ctx)
    plain = _dc.replace(pipe, planned=False)

    z1, _, _ = pipe.generate(ctx, uc, jax.random.PRNGKey(5), latent_len=16,
                             steps=5)
    z0, _, _ = plain.generate(ctx, uc, jax.random.PRNGKey(5), latent_len=16,
                              steps=5)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0),
                               rtol=2e-5, atol=2e-5)


def _tiny_pipe():
    import dataclasses as _dc  # noqa: F401
    from maa3_tpu.pipeline import T2APipeline
    from maa3_tpu.models.vae1d import VAEConfig
    from maa3_tpu.models.bigvgan import BigVGANConfig

    cfg = DiTConfig(in_channels=8, context_dim=16, hidden_size=64, depth=2,
                    num_heads=4, max_len=64)
    vae_cfg = VAEConfig(in_channels=16, out_ch=16, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, down_layers=(0,), kernel_size=3,
                        z_channels=8, embed_dim=8)
    voc = BigVGANConfig(num_mels=16, upsample_rates=(2, 2),
                        upsample_kernel_sizes=(4, 4),
                        upsample_initial_channel=8,
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 2),))
    pipe = T2APipeline.random_init(jax.random.PRNGKey(0), cfg, vae_cfg, voc,
                                   compute_dtype=jnp.float32)
    pipe.params["dit"]["final_layer"]["linear"]["w"] = (
        0.02 * jax.random.normal(
            jax.random.PRNGKey(3),
            pipe.params["dit"]["final_layer"]["linear"]["w"].shape))
    pipe.params["dit"]["blocks"]["attention"]["gate"] = (
        0.5 * jnp.ones_like(pipe.params["dit"]["blocks"]["attention"]["gate"]))
    return pipe


def test_generate_context_mask_equals_truncated():
    """A padded context with a validity mask must generate EXACTLY what the
    truncated (unpadded) context generates — through the planned sampler
    (mask rides into dit_sample_plan's pooled feature AND the per-step
    cross-attention y_mask) and the plain sampler alike."""
    import dataclasses as _dc

    pipe = _tiny_pipe()
    k = jax.random.PRNGKey(5)
    ctx5 = jax.random.normal(jax.random.PRNGKey(4), (1, 5, 16))
    junk = 100.0 * jax.random.normal(jax.random.PRNGKey(6), (1, 2, 16))
    ctx7 = jnp.concatenate([ctx5, junk], axis=1)
    uc5, uc7 = jnp.zeros_like(ctx5), jnp.zeros_like(ctx7)
    mask = jnp.array([[True] * 5 + [False] * 2])

    z_trunc, _, _ = pipe.generate(ctx5, uc5, k, latent_len=16, steps=5)
    z_mask, _, _ = pipe.generate(ctx7, uc7, k, latent_len=16, steps=5,
                                 context_mask=mask, uncond_mask=mask)
    np.testing.assert_allclose(np.asarray(z_mask), np.asarray(z_trunc),
                               rtol=2e-5, atol=2e-5)

    plain = _dc.replace(pipe, planned=False)
    z_plain, _, _ = plain.generate(ctx7, uc7, k, latent_len=16, steps=5,
                                   context_mask=mask, uncond_mask=mask)
    np.testing.assert_allclose(np.asarray(z_mask), np.asarray(z_plain),
                               rtol=2e-5, atol=2e-5)


def test_fused_gemms_match_unfused():
    """fuse_dit_gemms (wqkv / w13 concatenation) must be numerically
    identical — each output column's dot product is unchanged."""
    from maa3_tpu.utils.nprand import fuse_dit_gemms

    cfg = DiTConfig(in_channels=6, context_dim=32, hidden_size=64, depth=2,
                    num_heads=4, max_len=64, qk_norm=True)
    key = jax.random.PRNGKey(11)
    params = dit_init(key, cfg)
    params["final_layer"]["linear"]["w"] = (
        0.02 * jax.random.normal(key, params["final_layer"]["linear"]["w"].shape))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    t = jnp.array([100, 700])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 32))

    out0 = dit_apply(params, cfg, x, t, ctx, compute_dtype=jnp.float32)
    fused = fuse_dit_gemms(params)
    out1 = dit_apply(fused, cfg, x, t, ctx, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-6, atol=1e-6)


def test_ode_chunking_matches_full_batch(monkeypatch):
    """MAA3_ODE_CHUNK: a b>chunk ODE launch runs as sequential chunk-sized
    sub-batches via lax.map (PROBE_B32_TRACE_r05 fix) — latents must match
    the unchunked launch (batch rows are independent), in both the plain
    and the planned serving path."""
    import dataclasses as _dc
    import os
    from maa3_tpu.pipeline import T2APipeline
    from maa3_tpu.models.vae1d import VAEConfig
    from maa3_tpu.models.bigvgan import BigVGANConfig

    cfg = DiTConfig(in_channels=8, context_dim=16, hidden_size=64, depth=2,
                    num_heads=4, max_len=64)
    vae_cfg = VAEConfig(in_channels=16, out_ch=16, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, down_layers=(0,), kernel_size=3,
                        z_channels=8, embed_dim=8)
    voc = BigVGANConfig(num_mels=16, upsample_rates=(2, 2),
                        upsample_kernel_sizes=(4, 4),
                        upsample_initial_channel=8,
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 2),))
    pipe = T2APipeline.random_init(jax.random.PRNGKey(0), cfg, vae_cfg, voc,
                                   compute_dtype=jnp.float32)
    pipe.params["dit"]["final_layer"]["linear"]["w"] = (
        0.02 * jax.random.normal(
            jax.random.PRNGKey(3),
            pipe.params["dit"]["final_layer"]["linear"]["w"].shape))
    ctx = jax.random.normal(jax.random.PRNGKey(4), (4, 5, 16))
    uc = jnp.zeros_like(ctx)
    for planned in (False, True):
        p = _dc.replace(pipe, planned=planned)
        monkeypatch.setenv("MAA3_ODE_CHUNK", "0")
        z_full, _, _ = p.generate(ctx, uc, jax.random.PRNGKey(5),
                                  latent_len=16, steps=4)
        monkeypatch.setenv("MAA3_ODE_CHUNK", "2")
        # new env -> new jit cache entry? _ode_chunk is read at TRACE time;
        # force a fresh trace by replacing self (dataclass) identity
        p2 = _dc.replace(p)
        z_chunk, _, _ = p2.generate(ctx, uc, jax.random.PRNGKey(5),
                                    latent_len=16, steps=4)
        np.testing.assert_allclose(np.asarray(z_chunk), np.asarray(z_full),
                                   rtol=2e-5, atol=2e-5)
