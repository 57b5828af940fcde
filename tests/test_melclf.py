"""Mel classifier + FD/KL metric tests."""

import numpy as np
import jax
import jax.numpy as jnp

from maa3_tpu.models.melclf import (MelClfConfig, melclf_init, melclf_apply,
                                    frechet_distance, kl_divergence_softmax,
                                    _adaptive_avg_pool)

SMALL = MelClfConfig(conv_layers=(8, "MP", 16, "MP"), num_classes=5)


def test_melclf_shapes():
    params = melclf_init(jax.random.PRNGKey(0), SMALL)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 64))
    logits, emb = melclf_apply(params, SMALL, mel, return_embedding=True)
    assert logits.shape == (2, 5)
    assert emb.shape == (2, 4096)
    assert np.isfinite(np.asarray(logits)).all()


def test_adaptive_avg_pool_parity():
    import torch
    import torch.nn.functional as F
    x = np.random.RandomState(0).randn(1, 3, 13, 27).astype(np.float32)
    ours = _adaptive_avg_pool(jnp.asarray(x), (5, 10))
    ref = F.adaptive_avg_pool2d(torch.tensor(x), (5, 10))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5,
                               atol=1e-6)


def test_frechet_distance_properties():
    rng = np.random.RandomState(0)
    a = rng.randn(200, 8)
    assert frechet_distance(a, a) < 1e-6          # identical -> 0
    b = rng.randn(200, 8) + 3.0                    # shifted mean
    fd = frechet_distance(a, b)
    assert fd > 8 * 8.0 * 0.8                      # ~ d * shift^2
    c = rng.randn(200, 8) + 0.5
    assert frechet_distance(a, c) < fd             # closer -> smaller


def test_kl_divergence():
    logits = np.random.RandomState(0).randn(16, 5)
    assert kl_divergence_softmax(logits, logits) < 1e-10
    assert kl_divergence_softmax(logits + 2 * np.random.RandomState(1)
                                 .randn(16, 5), logits) > 0.01
