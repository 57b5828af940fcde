"""int8 (w8a8) vocoder conv GEMMs + batched wide-stage routing.

The serving-only quantized path (ops/conv.py::conv1d_unfold_w8a8,
models/bigvgan.py::quantize_bigvgan) halves im2col HBM bytes and doubles the
MXU rate on the wide BigVGAN stages (vocoder/bigvgan/models.py:135-215's
resblock convs). These tests pin its numerics and routing on CPU."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maa3_tpu.models.bigvgan import (BigVGANConfig, bigvgan_apply,
                                     bigvgan_init, quantize_bigvgan)
from maa3_tpu.ops.conv import (conv1d, conv1d_unfold_w8a8, quantize_conv_int8,
                               conv1d_init)


def _rel_err(a, b):
    return float(np.abs(a - b).mean() / (np.abs(b).mean() + 1e-12))


@pytest.mark.parametrize("k,d", [(3, 1), (7, 1), (11, 5)])
def test_w8a8_conv_close_to_fp32(k, d):
    key = jax.random.PRNGKey(0)
    p = conv1d_init(key, 16, 16, k)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 256), jnp.float32)
    pad = (k * d - d) // 2
    ref = conv1d(p, x, padding=pad, dilation=d)
    got = conv1d_unfold_w8a8(quantize_conv_int8(p), x, padding=pad,
                             dilation=d)
    assert got.shape == ref.shape
    # int8 weight+activation quantization: ~1e-2 relative is the expected
    # regime (two 127-level roundings in the contraction)
    assert _rel_err(np.asarray(got), np.asarray(ref)) < 2e-2


def test_w8a8_scale_invariance_per_window():
    """Per-(batch, t)-window activation scales: a 1000x outlier column must
    not destroy the quantization of other columns."""
    p = conv1d_init(jax.random.PRNGKey(0), 8, 8, 3)
    x = np.array(jax.random.normal(jax.random.PRNGKey(1), (1, 8, 128)))
    x[:, :, 64] *= 1000.0
    x = jnp.asarray(x)
    ref = conv1d(p, x, padding=1)
    got = conv1d_unfold_w8a8(quantize_conv_int8(p), x, padding=1)
    # columns far from the outlier (not sharing its window) stay accurate
    r = np.asarray(ref)[..., :60]
    g = np.asarray(got)[..., :60]
    assert _rel_err(g, r) < 2e-2


def _tiny_cfg():
    return BigVGANConfig(num_mels=8, upsample_rates=(4, 4),
                         upsample_kernel_sizes=(8, 8),
                         upsample_initial_channel=32,
                         resblock_kernel_sizes=(3,),
                         resblock_dilation_sizes=((1, 2),))


def test_quantize_bigvgan_structure_and_output():
    cfg = _tiny_cfg()
    params = bigvgan_init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_bigvgan(params, cfg, min_ch=16)
    # stage 0 (16 ch) quantized, stage 1 (8 ch) untouched
    assert "w_q" in qparams["resblocks"][0]["convs1"][0]
    assert qparams["resblocks"][0]["convs1"][0]["w_q"].dtype == jnp.int8
    assert "w" in qparams["resblocks"][1]["convs1"][0]
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 64), jnp.float32)
    ref = bigvgan_apply(params, cfg, mel)
    got = bigvgan_apply(qparams, cfg, mel)
    assert got.shape == ref.shape
    assert np.isfinite(np.asarray(got)).all()
    # vocoder output is bounded by tanh; quantizing only stage-0 convs keeps
    # the waveform close to float
    assert float(np.abs(np.asarray(got) - np.asarray(ref)).mean()) < 0.05


def test_wide_unfold_routing_equivalence():
    """MAA3_WIDE_UNFOLD=1 (the batched serving mix) must be numerically
    equivalent to the stock lowering — it is a pure re-lowering."""
    cfg = _tiny_cfg()
    params = bigvgan_init(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 64), jnp.float32)
    ref = bigvgan_apply(params, cfg, mel)
    old = os.environ.get("MAA3_WIDE_UNFOLD")
    os.environ["MAA3_WIDE_UNFOLD"] = "1"
    try:
        got = bigvgan_apply(params, cfg, mel)
    finally:
        if old is None:
            os.environ.pop("MAA3_WIDE_UNFOLD", None)
        else:
            os.environ["MAA3_WIDE_UNFOLD"] = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_system_serving_vocoder_cache():
    """set_serving_quant('int8') quantizes the vocoder lazily; ':novoc'
    keeps it float; cache invalidates on param reassignment."""
    from maa3_tpu.config import ModelSpec
    from maa3_tpu.models.dit import DiTConfig, dit_init
    from maa3_tpu.models.vae1d import VAEConfig
    from maa3_tpu.system import MAA3System

    cfg = DiTConfig(in_channels=4, context_dim=16, hidden_size=32, depth=2,
                    num_heads=2, max_len=32)
    spec = ModelSpec(kind="cfm", backbone_kind="text_dit", dit=cfg,
                     vae=VAEConfig(in_channels=8, out_ch=8, ch=32,
                                   ch_mult=(1, 2), num_res_blocks=1,
                                   down_layers=(0,), kernel_size=5,
                                   z_channels=4, embed_dim=4),
                     cond_kind="clap_flan", cond_params_cfg={},
                     mel_dim=4, mel_length=16)
    voc_cfg = _tiny_cfg()
    params = {"dit": dit_init(jax.random.PRNGKey(0), cfg),
              "vocoder": bigvgan_init(jax.random.PRNGKey(1), voc_cfg)}
    sys_ = MAA3System(spec, params, voc_cfg=voc_cfg,
                      compute_dtype=jnp.float32)
    assert sys_.serving_vocoder() is sys_.params["vocoder"]
    sys_.set_serving_quant("int8")  # voc quant is opt-in (round-4 probes)
    assert sys_.serving_vocoder() is sys_.params["vocoder"]
    os.environ["MAA3_VOC_QUANT_MIN_CH"] = "16"
    try:
        sys_.set_serving_quant("int8:voc")
        v1 = sys_.serving_vocoder()
        assert v1 is sys_.serving_vocoder()  # cached
        leaves = jax.tree.leaves(v1)
        assert any(l.dtype == jnp.int8 for l in leaves)
        sys_.params["vocoder"] = dict(sys_.params["vocoder"])
        assert sys_.serving_vocoder() is not v1  # identity-keyed invalidation
    finally:
        del os.environ["MAA3_VOC_QUANT_MIN_CH"]


def test_tapgemm_close_to_fp32_and_unfold():
    """The wide-channel tap-GEMM int8 lowering shares the weight layout with
    the unfold form but quantizes activations per COLUMN of x (one scale per
    (b, t) position, each tap dequantized with its shifted scale slice)
    instead of per unfold window — so the two agree statistically (both are
    ~1% int8 error around fp32), not bitwise."""
    from maa3_tpu.ops.conv import conv1d_tapgemm_w8a8

    p = conv1d_init(jax.random.PRNGKey(3), 16, 16, 7)
    q = quantize_conv_int8(p)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 200), jnp.float32)
    ref = conv1d(p, x, padding=3)
    b = conv1d_tapgemm_w8a8(q, x, padding=3)
    assert b.shape == ref.shape
    assert _rel_err(np.asarray(b), np.asarray(ref)) < 2e-2
    a = conv1d_unfold_w8a8(q, x, padding=3)
    assert _rel_err(np.asarray(b), np.asarray(a)) < 2e-2


def test_quantized_bigvgan_tapgemm_route():
    """Wide quantized stages route to tap-GEMM (env cutoff) and the full
    generator output stays close to float."""
    cfg = _tiny_cfg()
    params = bigvgan_init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_bigvgan(params, cfg, min_ch=16)
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 64), jnp.float32)
    ref = bigvgan_apply(params, cfg, mel)
    old = os.environ.get("MAA3_VOC_QUANT_TAPGEMM_MIN_CH")
    os.environ["MAA3_VOC_QUANT_TAPGEMM_MIN_CH"] = "16"  # force tap-GEMM
    try:
        got = bigvgan_apply(qparams, cfg, mel)
    finally:
        if old is None:
            os.environ.pop("MAA3_VOC_QUANT_TAPGEMM_MIN_CH", None)
        else:
            os.environ["MAA3_VOC_QUANT_TAPGEMM_MIN_CH"] = old
    assert got.shape == ref.shape
    assert float(np.abs(np.asarray(got) - np.asarray(ref)).mean()) < 0.05


def test_mxu_aa_matches_reference_fp32():
    """MXUActivation1d (banded-matmul FIRs) must equal the depthwise-conv
    Activation1d reference and the shift-add FusedActivation1d to fp32
    association error — including the replicate-clamp edges, at lengths
    that are NOT multiples of the 128 tile."""
    from maa3_tpu.ops.resample import (Activation1d, FusedActivation1d,
                                       MXUActivation1d)

    act = jnp.tanh
    for t in (64, 128, 200, 333):
        x = jax.random.normal(jax.random.PRNGKey(t), (2, 6, t), jnp.float32)
        ref = Activation1d(act)(x)
        fused = FusedActivation1d(act)(x)
        mxu = MXUActivation1d(act)(x)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(mxu), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_mxu_aa_in_generator():
    """Full generator with MAA3_AA_MXU=1 equals the shift-add default on
    CPU (pure re-lowering)."""
    cfg = _tiny_cfg()
    params = bigvgan_init(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 70), jnp.float32)
    ref = bigvgan_apply(params, cfg, mel)
    os.environ["MAA3_AA_MXU"] = "1"
    try:
        got = bigvgan_apply(params, cfg, mel)
    finally:
        del os.environ["MAA3_AA_MXU"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
