"""Real-TPU numerics: the actual serving configuration under test.

The CPU suite validates planned/fused equivalence in fp32 and the Pallas
kernels in interpret mode; here we assert (a) the bf16 planned sampler
matches the bf16 plain sampler on the MXU, and (b) the Mosaic-COMPILED
Pallas vocoder kernels match their interpret-mode oracles bit-for-bit on
small shapes (ADVICE r1 #4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _small_pipe(compute_dtype):
    from maa3_tpu.models.dit import DiTConfig
    from maa3_tpu.models.vae1d import VAEConfig
    from maa3_tpu.models.bigvgan import BigVGANConfig
    from maa3_tpu.pipeline import T2APipeline

    cfg = DiTConfig(in_channels=20, context_dim=64, hidden_size=256,
                    depth=4, num_heads=4, max_len=256)
    pipe = T2APipeline.random_init(
        jax.random.PRNGKey(0), cfg, VAEConfig(ch=32, ch_mult=(1, 2),
                                              num_res_blocks=1),
        BigVGANConfig(upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                      upsample_initial_channel=32,
                      resblock_kernel_sizes=(3,),
                      resblock_dilation_sizes=((1, 2),)),
        compute_dtype=compute_dtype)
    w = pipe.params["dit"]["final_layer"]["linear"]["w"]
    pipe.params["dit"]["final_layer"]["linear"]["w"] = (
        0.02 * jax.random.normal(jax.random.PRNGKey(9), w.shape))
    pipe.params["dit"]["blocks"]["attention"]["gate"] = (
        0.5 * jnp.ones_like(pipe.params["dit"]["blocks"]["attention"]["gate"]))
    return pipe


def test_bf16_planned_matches_plain_on_tpu():
    """The bf16 serving path (planned ODE, bf16 score storage, MXU matmuls)
    must agree with the bf16 plain sampler — same math, hoisted."""
    pipe = _small_pipe(jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 64), jnp.float32)
    uc = jnp.zeros_like(ctx)
    k = jax.random.PRNGKey(2)
    z_planned, _, _ = pipe.generate(ctx, uc, k, latent_len=64, steps=8)
    plain = dataclasses.replace(pipe, planned=False)
    z_plain, _, _ = plain.generate(ctx, uc, k, latent_len=64, steps=8)
    zp = np.asarray(z_planned, np.float32)
    zq = np.asarray(z_plain, np.float32)
    rms = float(np.sqrt((zp ** 2).mean()))
    assert float(np.abs(zp - zq).max()) / rms < 2e-2, (
        float(np.abs(zp - zq).max()), rms)


def test_fused_gemms_bf16_match_on_tpu():
    from maa3_tpu.utils.nprand import cast_matmul_weights, fuse_dit_gemms

    pipe = _small_pipe(jnp.bfloat16)
    p16 = cast_matmul_weights(pipe.params["dit"], jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 64), jnp.float32)
    uc = jnp.zeros_like(ctx)
    x0 = jax.random.normal(jax.random.PRNGKey(3), (1, 20, 64), jnp.float32)
    s = jnp.float32(3.0)
    za = np.asarray(pipe._sample_latent(
        {**pipe.params, "dit": p16}, x0, ctx, uc, s, 8), np.float32)
    zb = np.asarray(pipe._sample_latent(
        {**pipe.params, "dit": fuse_dit_gemms(p16)}, x0, ctx, uc, s, 8),
        np.float32)
    # same dot products, one wide GEMM: tiny tile-order accumulation jitter
    rms = float(np.sqrt((za ** 2).mean()))
    assert float(np.abs(za - zb).max()) / rms < 5e-3


def test_pallas_aa_snake_compiled_matches_interpret():
    from maa3_tpu.ops.pallas_aa_snake import aa_snake_fused

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 1024)).astype(np.float32))
    alpha = jnp.asarray(rng.normal(size=(8,)).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.normal(size=(8,)).astype(np.float32) * 0.1)
    y_compiled = np.asarray(aa_snake_fused(x, alpha, beta, interpret=False))
    y_interp = np.asarray(aa_snake_fused(x, alpha, beta, interpret=True))
    np.testing.assert_allclose(y_compiled, y_interp, rtol=1e-5, atol=1e-5)


def test_pallas_conv_snake_compiled_matches_interpret():
    from maa3_tpu.ops.pallas_amp import conv_snake_fused

    rng = np.random.default_rng(1)
    cin, cout, k = 8, 8, 3
    x = jnp.asarray(rng.normal(size=(1, cin, 768)).astype(np.float32))
    alpha = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.normal(size=(cout, cin, k)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32) * 0.1)
    for dil in (1, 3):
        yc = np.asarray(conv_snake_fused(x, alpha, beta, w, b, k=k,
                                         dilation=dil, interpret=False))
        yi = np.asarray(conv_snake_fused(x, alpha, beta, w, b, k=k,
                                         dilation=dil, interpret=True))
        np.testing.assert_allclose(yc, yi, rtol=2e-5, atol=2e-5,
                                   err_msg=f"dilation {dil}")


def test_int8_serving_close_to_bf16_on_tpu():
    """The w8a8 serving mode on the real int8 MXU path: trajectory stays
    within quantization-error distance of the bf16 mode (drift gate; the
    XL-scale numbers live in PARITY.md / probe_int8_serving)."""
    from maa3_tpu.ops.quant import quantize_dit_serving
    from maa3_tpu.utils.nprand import cast_matmul_weights, fuse_dit_gemms

    pipe = _small_pipe(jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 64), jnp.float32)
    uc = jnp.zeros_like(ctx)
    k = jax.random.PRNGKey(2)
    p16 = dict(pipe.params)
    p16["dit"] = fuse_dit_gemms(
        cast_matmul_weights(pipe.params["dit"], jnp.bfloat16))
    pipe16 = dataclasses.replace(pipe, params=p16)
    p8 = dict(pipe.params)
    p8["dit"] = cast_matmul_weights(
        quantize_dit_serving(fuse_dit_gemms(pipe.params["dit"])),
        jnp.bfloat16)
    pipe8 = dataclasses.replace(pipe, params=p8)
    z16 = np.asarray(pipe16.generate(ctx, uc, k, latent_len=64, steps=8)[0],
                     np.float32)
    z8 = np.asarray(pipe8.generate(ctx, uc, k, latent_len=64, steps=8)[0],
                    np.float32)
    rms = float(np.sqrt((z16 ** 2).mean()))
    assert np.isfinite(z8).all()
    assert float(np.abs(z8 - z16).mean()) / rms < 5e-2, (
        float(np.abs(z8 - z16).mean()), rms)


def test_fast_sin2_on_tpu_matches_fp64():
    """The poly sin^2 (bf16 serving default) evaluated by the real VPU vs a
    fp64 numpy oracle, incl. large args where range reduction matters."""
    from maa3_tpu.ops.resample import sin2_poly

    u = np.concatenate([np.linspace(-50, 50, 20001),
                        np.linspace(-0.01, 0.01, 501)]).astype(np.float32)
    got = np.asarray(jax.jit(sin2_poly)(jnp.asarray(u)))
    ref = np.sin(u.astype(np.float64)) ** 2
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_fast_sin2_generator_within_bf16_noise_on_tpu():
    """Full small BigVGAN in bf16: poly-sin vs exact-sin waveforms agree to
    bf16-roundoff scale on the real chip (the serving-mode A/B)."""
    from maa3_tpu.models.bigvgan import (BigVGANConfig, bigvgan_apply,
                                         bigvgan_init)

    cfg = BigVGANConfig(upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                        upsample_initial_channel=32,
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 2),))
    params = bigvgan_init(jax.random.PRNGKey(3), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(4), (1, 80, 64), jnp.float32)

    import os
    outs = {}
    old = os.environ.get("MAA3_FAST_SIN2")
    for fast in ("1", "0"):
        os.environ["MAA3_FAST_SIN2"] = fast
        try:
            f = jax.jit(lambda p, m: bigvgan_apply(p, cfg, m,
                                                   compute_dtype=jnp.bfloat16,
                                                   pallas_aa=False))
            outs[fast] = np.asarray(f(params, mel), np.float32)
        finally:
            if old is None:
                os.environ.pop("MAA3_FAST_SIN2", None)
            else:
                os.environ["MAA3_FAST_SIN2"] = old
    # tanh-bounded output in [-1, 1]: bf16 grid spacing ~0.004 there
    np.testing.assert_allclose(outs["1"], outs["0"], atol=0.02)


def test_flash_bwd_compiled_matches_interpret():
    """Mosaic-compiled flash fwd-with-lse + bwd kernels on the real TPU:
    the ground truth is the DENSE fp32 ('highest' matmul precision)
    gradient — compiled and interpret must both sit at the expected TPU
    default-precision level against it (~5e-3 max-rel of the grad scale;
    the kernels' dots run as bf16 MXU passes), and agree with each other
    in ABSOLUTE terms. (A per-element relative comparison between the two
    modes is meaningless at near-zero gradient entries: tiny ULP
    differences between Mosaic and XLA exp2 read as huge ratios — the
    r03-era rtol=2e-4 form of this test tripped on exactly that.)"""
    from maa3_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(2, 2, 160, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, 192, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 2, 192, 64)).astype(np.float32))
    mask = jnp.asarray(np.concatenate(
        [np.ones((2, 150), bool), np.zeros((2, 42), bool)], axis=1))

    def dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (1.0 / np.sqrt(64))
        s = jnp.where(mask[:, None, None, :], s, -1e30)
        p = jax.nn.softmax(s.astype(jnp.float32), -1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    def loss(interp):
        return lambda q, k, v: jnp.sum(flash_attention(
            q, k, v, mask=mask, interpret=interp) ** 2)

    with jax.default_matmul_precision("highest"):
        gd = jax.jit(jax.grad(
            lambda a, b, c: jnp.sum(dense(a, b, c) ** 2),
            argnums=(0, 1, 2)))(q, k, v)
    gc = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    gi = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    for a, b, d in zip(gc, gi, gd):
        scale = float(jnp.max(jnp.abs(d))) + 1e-9
        # compiled vs ground truth: TPU default-precision regime
        assert float(jnp.max(jnp.abs(a - d))) / scale < 2e-2
        # compiled vs interpret: absolute agreement
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-3)
