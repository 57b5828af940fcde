"""Noisy-latent classifier + guidance tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from maa3_tpu.diffusion.classifier_guidance import (
    NoisyClfConfig, noisy_clf_init, noisy_clf_apply, noisy_clf_loss,
    classifier_grad, guided_velocity)
from maa3_tpu.diffusion.schedules import DDPMSchedule


CFG = NoisyClfConfig(in_channels=4, hidden=32, num_blocks=2, num_classes=3)


def test_noisy_clf_trains():
    s = DDPMSchedule.create(1000, "linear")
    params = noisy_clf_init(jax.random.PRNGKey(0), CFG)
    # class-dependent latents
    rng = np.random.RandomState(0)
    x = np.stack([rng.randn(4, 16) + 3 * c for c in [0, 1, 2] * 4]).astype(np.float32)
    y = jnp.asarray([0, 1, 2] * 4)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: noisy_clf_loss(p, CFG, s, jnp.asarray(x), y, key),
            has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, aux

    for i in range(60):
        params, opt_state, aux = step(params, opt_state, jax.random.PRNGKey(i))
    assert float(aux["acc"]) > 0.6  # learns the class structure under noise


def test_classifier_grad_and_guided_velocity():
    params = noisy_clf_init(jax.random.PRNGKey(1), CFG)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 16))
    t = jnp.array([100, 500])
    y = jnp.array([0, 2])
    g = classifier_grad(params, CFG, x, t, y)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()

    base = lambda x, t, c: jnp.zeros_like(x)
    vel = guided_velocity(base, params, CFG, y, guidance_scale=2.0)
    v = vel(x, t, None)
    np.testing.assert_allclose(np.asarray(v), 2.0 * np.asarray(g), rtol=1e-5)
