"""Fused act->conv kernel vs the XLA oracle (FusedActivation1d + conv1d).

The oracle pair is parity-tested against the reference torch pipeline
(tests/test_bigvgan.py), so matching it transitively matches
vocoder/bigvgan/models.py:60-75 AMPBlock1 act->conv sites.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maa3_tpu.models.bigvgan import snake, snake_beta
from maa3_tpu.ops.conv import conv1d
from maa3_tpu.ops.pallas_amp import conv_snake_fused
from maa3_tpu.ops.resample import FusedActivation1d


def _oracle(x, alpha, beta, w, b, k, dil, logscale, has_beta):
    if has_beta:
        act = FusedActivation1d(lambda v: snake_beta(v, alpha, beta, logscale))
    else:
        act = FusedActivation1d(lambda v: snake(v, alpha, logscale))
    return conv1d({"w": w, "b": b}, act(x), padding=(k * dil - dil) // 2,
                  dilation=dil)


@pytest.mark.parametrize("k,dil", [(3, 1), (7, 3), (11, 5)])
@pytest.mark.parametrize("shape,tile", [
    ((1, 8, 256), 128),     # multi-tile, exact division
    ((2, 16, 300), 128),    # ragged last tile, batch > 1
    ((1, 24, 640), 8192),   # single tile wider than T
])
def test_matches_act_conv_oracle(shape, tile, k, dil):
    B, C, T = shape
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(keys[0], shape, jnp.float32) * 3.0
    alpha = jax.random.normal(keys[1], (C,)) * 0.5
    beta = jax.random.normal(keys[2], (C,)) * 0.5
    w = jax.random.normal(keys[3], (C, C, k)) * 0.2
    b = jax.random.normal(keys[4], (C,)) * 0.1

    want = _oracle(x, alpha, beta, w, b, k, dil, True, True)
    got = conv_snake_fused(x, alpha, beta, w, b, k=k, dilation=dil,
                           tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_cout_ne_cin_and_snake_variant():
    """conv_post-style site: C_out != C_in, plain snake (no beta)."""
    B, C, T = 1, 16, 384
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    x = jax.random.normal(keys[0], (B, C, T), jnp.float32) * 2.0
    alpha = jax.random.normal(keys[1], (C,)) * 0.5
    w = jax.random.normal(keys[2], (1, C, 7)) * 0.2
    b = jax.random.normal(keys[3], (1,)) * 0.1
    want = _oracle(x, alpha, None, w, b, 7, 1, True, False)
    got = conv_snake_fused(x, alpha, None, w, b, k=7, dilation=1,
                           has_beta=False, tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_bfloat16_io():
    B, C, T = 1, 16, 256
    keys = jax.random.split(jax.random.PRNGKey(5), 5)
    x = (jax.random.normal(keys[0], (B, C, T), jnp.float32) * 3.0
         ).astype(jnp.bfloat16)
    alpha = jnp.linspace(-0.5, 0.5, C)
    beta = jnp.linspace(0.4, -0.4, C)
    w = jax.random.normal(keys[3], (C, C, 3)) * 0.2
    b = jnp.zeros((C,))
    want = conv1d({"w": w, "b": b},
                  FusedActivation1d(lambda v: snake_beta(v, alpha, beta, True))(x),
                  padding=1, dilation=1, compute_dtype=jnp.bfloat16)
    got = conv_snake_fused(x, alpha, beta, w, b, k=3, dilation=1,
                           tile=128, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.2, rtol=0.1)


def test_amp_block_wiring():
    """_amp1_apply(fused_cutoff=C) == the XLA path on a full AMP block."""
    import jax
    from maa3_tpu.models.bigvgan import BigVGANConfig, _amp1_init, _amp1_apply
    cfg = BigVGANConfig()
    C, T = 16, 300
    p = _amp1_init(jax.random.PRNGKey(0), C, 7, (1, 3, 5), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, C, T), jnp.float32)
    want = _amp1_apply(p, x, 7, (1, 3, 5), cfg, jnp.float32)
    got = _amp1_apply(p, x, 7, (1, 3, 5), cfg, jnp.float32, fused_cutoff=C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)
