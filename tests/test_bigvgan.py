"""BigVGAN vocoder tests: alias-free resampling parity vs torch oracle,
snake activations, generator shape contract."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from maa3_tpu.ops.resample import (
    kaiser_sinc_filter1d, UpSample1d, DownSample1d, Activation1d)
from maa3_tpu.models.bigvgan import (
    BigVGANConfig, bigvgan_init, bigvgan_apply, snake, snake_beta)


def _torch_kaiser_sinc(cutoff, half_width, kernel_size):
    """Oracle following alias_free_torch/filter.py:28-60."""
    import math
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = torch.kaiser_window(kernel_size, beta=beta, periodic=False)
    if even:
        time = torch.arange(-half_size, half_size) + 0.5
    else:
        time = torch.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * torch.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt


def test_kaiser_filter_parity():
    for ratio in (2, 4):
        ours = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, 12)
        ref = _torch_kaiser_sinc(0.5 / ratio, 0.6 / ratio, 12).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_upsample_parity():
    """UpSample1d vs the torch implementation semantics
    (replicate pad -> conv_transpose by ratio -> crop)."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 40).astype(np.float32)
    up = UpSample1d(2, 12)
    out = up(jnp.asarray(x))

    filt = _torch_kaiser_sinc(0.25, 0.3, 12).view(1, 1, 12)
    xt = F.pad(torch.tensor(x), (up.pad, up.pad), mode="replicate")
    ref = 2 * F.conv_transpose1d(xt, filt.expand(3, -1, -1), stride=2, groups=3)
    ref = ref[..., up.pad_left:-up.pad_right]
    assert out.shape == tuple(ref.shape) == (2, 3, 80)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_downsample_parity():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 80).astype(np.float32)
    down = DownSample1d(2, 12)
    out = down(jnp.asarray(x))

    filt = _torch_kaiser_sinc(0.25, 0.3, 12).view(1, 1, 12)
    xt = F.pad(torch.tensor(x), (down.pad_left, down.pad_right), mode="replicate")
    ref = F.conv1d(xt, filt.expand(3, -1, -1), stride=2, groups=3)
    assert out.shape == tuple(ref.shape) == (2, 3, 40)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_up_down_roundtrip_preserves_signal():
    """2x up then 2x down of a band-limited signal ~ identity (mid region)."""
    t = np.arange(256) / 256
    x = np.sin(2 * np.pi * 8 * t).astype(np.float32)[None, None, :]
    act = Activation1d(lambda v: v)  # identity nonlinearity
    y = np.asarray(act(jnp.asarray(x)))
    assert y.shape == x.shape
    np.testing.assert_allclose(y[0, 0, 32:-32], x[0, 0, 32:-32], atol=5e-3)


def test_snake_activations():
    x = np.linspace(-3, 3, 64, dtype=np.float32).reshape(1, 4, 16)
    alpha = np.zeros(4, np.float32)  # logscale -> exp(0)=1
    out = snake(jnp.asarray(x), jnp.asarray(alpha), logscale=True)
    ref = x + np.sin(x) ** 2 / (1 + 1e-9)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)

    beta = np.log(2.0) * np.ones(4, np.float32)
    out_b = snake_beta(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta),
                       logscale=True)
    ref_b = x + np.sin(x) ** 2 / 2.0
    np.testing.assert_allclose(np.asarray(out_b), ref_b, rtol=1e-4, atol=1e-5)


def test_fast_sin2_poly_matches_exact(monkeypatch):
    """Poly sin^2 (the bf16-serving fast path) vs libm, over a wide u range
    incl. large |u| where the mod-2pi range reduction matters."""
    from maa3_tpu.models.bigvgan import _sin2_poly
    u = np.concatenate([np.linspace(-50, 50, 40001),
                        np.linspace(-0.01, 0.01, 1001)]).astype(np.float32)
    got = np.asarray(_sin2_poly(jnp.asarray(u)))
    ref = np.sin(u.astype(np.float64)) ** 2
    # abs err grows ~1e-7*|u| from fp32 rounding in the u/pi range reduction
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # forcing the fast path through snake_beta stays within fp32 noise
    x = np.linspace(-3, 3, 64, dtype=np.float32).reshape(1, 4, 16)
    alpha = np.zeros(4, np.float32)
    beta = np.log(2.0) * np.ones(4, np.float32)
    monkeypatch.setenv("MAA3_FAST_SIN2", "1")
    out = snake_beta(jnp.asarray(x), jnp.asarray(alpha),
                     jnp.asarray(beta), logscale=True)
    np.testing.assert_allclose(np.asarray(out), x + np.sin(x) ** 2 / 2.0,
                               rtol=1e-4, atol=1e-5)


def test_fast_sin2_engages_in_full_bf16_generator(monkeypatch):
    """Regression: the AA FIR taps promote the signal to fp32 before snake
    sees it, so dtype-sniffing inside snake_beta never fired in the full
    generator — the flag must be resolved from bigvgan_apply's compute_dtype
    (bench saw libm sin at 42 ms instead of the 27.6 ms poly path)."""
    from maa3_tpu.models import bigvgan as bv
    calls = {"n": 0}
    real = bv._sin2_poly

    def spy(u):
        calls["n"] += 1
        return real(u)

    monkeypatch.setattr(bv, "_sin2_poly", spy)
    cfg = bv.BigVGANConfig(upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                           upsample_initial_channel=32)
    p = bv.bigvgan_init(jax.random.PRNGKey(0), cfg)
    mel = jnp.zeros((1, 80, 16), jnp.float32)
    bv.bigvgan_apply(p, cfg, mel, compute_dtype=jnp.bfloat16, pallas_aa=False)
    assert calls["n"] > 0, "poly sin^2 not engaged in bf16 generator"
    calls["n"] = 0
    bv.bigvgan_apply(p, cfg, mel, compute_dtype=jnp.float32, pallas_aa=False)
    assert calls["n"] == 0, "poly sin^2 must stay off in fp32 parity mode"


def test_bigvgan_generator_shape():
    """Tiny config: wav length must be T * prod(upsample_rates)."""
    cfg = BigVGANConfig(num_mels=8, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 3, 5),))
    params = bigvgan_init(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 20))
    wav = bigvgan_apply(params, cfg, mel)
    assert wav.shape == (2, 20 * 8)
    arr = np.asarray(wav)
    assert np.isfinite(arr).all() and (np.abs(arr) <= 1.0).all()


def test_hifigan_lrelu_variant():
    """activation=lrelu selects the HiFiGAN family (AudioLDM's vocoder)."""
    cfg = BigVGANConfig(num_mels=8, upsample_rates=(4, 2),
                        upsample_kernel_sizes=(8, 4),
                        upsample_initial_channel=16,
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 3, 5),),
                        activation="lrelu")
    params = bigvgan_init(jax.random.PRNGKey(0), cfg)
    assert params["resblocks"][0]["acts"][0] == {}  # no snake params
    wav = bigvgan_apply(params, cfg, jax.random.normal(jax.random.PRNGKey(1),
                                                       (1, 8, 12)))
    assert wav.shape == (1, 12 * 8)
    assert np.isfinite(np.asarray(wav)).all()
