"""Numerical parity tests of core ops against torch reference semantics.

Torch here is only the *oracle* (library calls / textbook formulas) — the
framework itself is pure JAX.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from maa3_tpu.ops import basic, rope, ffn, conv


def test_rms_norm_parity():
    x = np.random.RandomState(0).randn(2, 5, 64).astype(np.float32)
    w = np.random.RandomState(1).rand(64).astype(np.float32)
    out = basic.rms_norm({"weight": jnp.asarray(w)}, jnp.asarray(x), eps=1e-5)
    xt = torch.tensor(x)
    ref = xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-5) * torch.tensor(w)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_rope_parity_vs_complex():
    """Our cos/sin pair rotation must equal the complex-multiplication form
    (torch.view_as_complex pairing), the formulation the checkpoints assume."""
    B, L, H, D = 2, 16, 4, 24
    rng = np.random.RandomState(0)
    q = rng.randn(B, L, H, D).astype(np.float32)
    k = rng.randn(B, L, H, D).astype(np.float32)

    cos, sin = rope.precompute_rope(D, L)
    q_out, k_out = rope.apply_rope(jnp.asarray(q), jnp.asarray(k), cos, sin)

    # complex oracle
    theta = 10000.0
    freqs = 1.0 / (theta ** (torch.arange(0, D, 2)[: D // 2].float() / D))
    t = torch.arange(L).float()
    angles = torch.outer(t, freqs)
    freqs_cis = torch.polar(torch.ones_like(angles), angles)  # (L, D/2)

    def torch_rot(x):
        xc = torch.view_as_complex(torch.tensor(x).reshape(B, L, H, D // 2, 2))
        fc = freqs_cis.view(1, L, 1, D // 2)
        return torch.view_as_real(xc * fc).flatten(3).numpy()

    np.testing.assert_allclose(np.asarray(q_out), torch_rot(q), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_out), torch_rot(k), rtol=1e-4, atol=1e-5)


def test_timestep_embedding_parity():
    import math
    t = np.array([0.0, 1.0, 41.0, 999.0], dtype=np.float32)
    out = basic.timestep_embedding(jnp.asarray(t), 256)
    half = 128
    freqs = torch.exp(-math.log(10000) * torch.arange(half).float() / half)
    args = torch.tensor(t)[:, None] * freqs[None]
    ref = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    # fp32 range reduction for cos/sin of large args (t up to 999 rad) differs
    # ~ulp(999) ~ 6e-5 between backends
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=2e-4)


def test_swiglu_hidden_dim():
    # 2/3 * 4 * 768 = 2048 exactly; 2/3 * 4 * 1152 = 3072; 1536 -> 4096
    assert ffn.swiglu_hidden_dim(768) == 2048
    assert ffn.swiglu_hidden_dim(1152) == 3072
    assert ffn.swiglu_hidden_dim(1536) == 4096


def test_conv1d_parity():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 32).astype(np.float32)
    w = rng.randn(16, 8, 5).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    out = conv.conv1d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                      jnp.asarray(x), padding=2)
    ref = F.conv1d(torch.tensor(x), torch.tensor(w), torch.tensor(b), padding=2)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_conv1d_unfold_parity():
    """unfold-GEMM lowering == torch conv1d for the BigVGAN resblock shapes
    (stride-1 dilated, symmetric pad) and the conv_post shape (C->1)."""
    rng = np.random.RandomState(3)
    for (cin, cout, k, d, t) in [(24, 24, 11, 5, 96), (48, 48, 7, 3, 64),
                                 (96, 96, 3, 1, 50), (24, 1, 7, 1, 40)]:
        pad = (k * d - d) // 2
        x = rng.randn(2, cin, t).astype(np.float32)
        w = rng.randn(cout, cin, k).astype(np.float32)
        b = rng.randn(cout).astype(np.float32)
        out = conv.conv1d_unfold({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                                 jnp.asarray(x), padding=pad, dilation=d)
        ref = F.conv1d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                       padding=pad, dilation=d)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   rtol=1e-4, atol=1e-4)


def test_bigvgan_unfold_routing_matches_default(monkeypatch):
    """Forcing MAA3_UNFOLD_CUTOFF through the full generator must reproduce
    the stock lax.conv path (same weights, same mel)."""
    from maa3_tpu.models import bigvgan as bv
    cfg = bv.BigVGANConfig(upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                           upsample_initial_channel=64)
    p = bv.bigvgan_init(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(np.random.RandomState(4).randn(1, 80, 16).astype(np.float32))
    base = bv.bigvgan_apply(p, cfg, mel, pallas_aa=False)
    monkeypatch.setenv("MAA3_UNFOLD_CUTOFF", "64")
    routed = bv.bigvgan_apply(p, cfg, mel, pallas_aa=False)
    np.testing.assert_allclose(np.asarray(routed), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_conv_site_batch_chunked_unfold(monkeypatch):
    """When the whole-batch im2col buffer exceeds _UNFOLD_MAX_BYTES but one
    sample's fits, _conv_site must lax.map over batch chunks and still equal
    the stock lax.conv path (the batched-serving vocoder route)."""
    from maa3_tpu.models import bigvgan as bv
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(8, 24, 64).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(24, 24, 11).astype(np.float32)),
         "b": jnp.asarray(rng.randn(24).astype(np.float32))}
    base = conv.conv1d(p, x, padding=25, dilation=5)
    # one sample's buffer = 11*24*64*4 = 67.6 kB; cap at 3 samples' worth
    monkeypatch.setattr(bv, "_UNFOLD_MAX_BYTES", 3 * 11 * 24 * 64 * 4)
    out = bv._conv_site(p, x, k=11, d=5, compute_dtype=None, unfold_cutoff=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-4, atol=1e-4)
    # cap below one sample -> falls back to lax.conv (still correct)
    monkeypatch.setattr(bv, "_UNFOLD_MAX_BYTES", 100)
    out2 = bv._conv_site(p, x, k=11, d=5, compute_dtype=None, unfold_cutoff=64)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(base),
                               rtol=1e-6, atol=1e-6)


def test_conv1d_unfold_gradients_match_conv1d():
    """Vocoder-GAN training on TPU can route through the unfold lowering —
    its autodiff grads must equal lax.conv's (w, b, and input grads)."""
    rng = np.random.RandomState(7)
    cin = cout = 8
    k, d, t = 5, 2, 32
    pad = (k * d - d) // 2
    x = jnp.asarray(rng.randn(2, cin, t).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(cout, cin, k).astype(np.float32)),
         "b": jnp.asarray(rng.randn(cout).astype(np.float32))}

    def loss_unfold(p_, x_):
        return jnp.sum(jnp.sin(conv.conv1d_unfold(p_, x_, padding=pad,
                                                  dilation=d)))

    def loss_conv(p_, x_):
        return jnp.sum(jnp.sin(conv.conv1d(p_, x_, padding=pad, dilation=d)))

    gu_p, gu_x = jax.grad(loss_unfold, argnums=(0, 1))(p, x)
    gc_p, gc_x = jax.grad(loss_conv, argnums=(0, 1))(p, x)
    # fp32 accumulation-order noise only (different contraction orders)
    np.testing.assert_allclose(np.asarray(gu_x), np.asarray(gc_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gu_p["w"]), np.asarray(gc_p["w"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gu_p["b"]), np.asarray(gc_p["b"]),
                               rtol=1e-4, atol=1e-4)


def test_conv1d_strided_asym_pad_parity():
    """Downsample1D pattern: pad (0,1) then stride-2 conv (autoencoder1d)."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 33).astype(np.float32)
    w = rng.randn(8, 8, 3).astype(np.float32)
    b = np.zeros(8, np.float32)
    xp = conv.pad_1d(jnp.asarray(x), 0, 1)
    out = conv.conv1d({"w": jnp.asarray(w), "b": jnp.asarray(b)}, xp, stride=2)
    ref = F.conv1d(F.pad(torch.tensor(x), (0, 1)), torch.tensor(w),
                   torch.tensor(b), stride=2)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_conv_transpose1d_parity():
    rng = np.random.RandomState(2)
    for (cin, cout, k, stride, pad) in [(8, 4, 8, 4, 2), (6, 3, 4, 2, 1),
                                        (4, 4, 16, 8, 4)]:
        x = rng.randn(2, cin, 20).astype(np.float32)
        w = rng.randn(cin, cout, k).astype(np.float32)
        b = rng.randn(cout).astype(np.float32)
        out = conv.conv_transpose1d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                                    jnp.asarray(x), stride=stride, padding=pad)
        ref = F.conv_transpose1d(torch.tensor(x), torch.tensor(w),
                                 torch.tensor(b), stride=stride, padding=pad)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4,
                                   atol=1e-4)


def test_conv_transpose1d_grouped_parity():
    """Depthwise transposed conv — the alias-free upsample path in BigVGAN."""
    rng = np.random.RandomState(3)
    C, k, stride = 6, 12, 2
    x = rng.randn(1, C, 25).astype(np.float32)
    w = rng.randn(C, 1, k).astype(np.float32)
    out = conv.conv_transpose1d({"w": jnp.asarray(w)}, jnp.asarray(x),
                                stride=stride, padding=0, groups=C)
    ref = F.conv_transpose1d(torch.tensor(x), torch.tensor(w), None,
                             stride=stride, groups=C)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_group_norm_parity():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 64, 17).astype(np.float32)
    w = rng.rand(64).astype(np.float32)
    b = rng.randn(64).astype(np.float32)
    out = basic.group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                           num_groups=32, eps=1e-6)
    ref = F.group_norm(torch.tensor(x), 32, torch.tensor(w), torch.tensor(b),
                       eps=1e-6)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_layer_norm_parity():
    rng = np.random.RandomState(5)
    x = rng.randn(2, 7, 48).astype(np.float32)
    w = rng.rand(48).astype(np.float32)
    b = rng.randn(48).astype(np.float32)
    out = basic.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-5)
    ref = F.layer_norm(torch.tensor(x), (48,), torch.tensor(w), torch.tensor(b), 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)
    # non-affine variant (FinalLayer)
    out2 = basic.layer_norm(jnp.asarray(x), eps=1e-6)
    ref2 = F.layer_norm(torch.tensor(x), (48,), eps=1e-6)
    np.testing.assert_allclose(np.asarray(out2), ref2.numpy(), rtol=1e-4, atol=1e-5)


def test_attention_parity_vs_torch_sdpa():
    """Self-attention (no RoPE contribution checked separately) vs torch SDPA."""
    from maa3_tpu.ops import attention as attn_mod
    B, L, H, Dh = 2, 10, 4, 16
    D = H * Dh
    rng = np.random.RandomState(6)
    q = rng.randn(B, L, H, Dh).astype(np.float32)
    k = rng.randn(B, L, H, Dh).astype(np.float32)
    v = rng.randn(B, L, H, Dh).astype(np.float32)
    out = attn_mod._sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         1.0 / np.sqrt(Dh), None)
    ref = F.scaled_dot_product_attention(
        torch.tensor(q).permute(0, 2, 1, 3), torch.tensor(k).permute(0, 2, 1, 3),
        torch.tensor(v).permute(0, 2, 1, 3)).permute(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)
