"""Legacy DDPM schedule / DDIM / PLMS tests (with a tractable Gaussian toy)."""

import numpy as np
import jax
import jax.numpy as jnp

from maa3_tpu.diffusion.schedules import (DDPMSchedule, make_beta_schedule,
                                          make_ddim_timesteps)
from maa3_tpu.diffusion import ddim as ddim_mod


def test_beta_schedule_linear_parity():
    """linear schedule = sqrt-space linspace squared (util.py:21-28)."""
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.012)
    assert abs(betas[0] - 0.00085) < 1e-9
    assert abs(betas[-1] - 0.012) < 1e-9
    mid = (np.sqrt(0.00085) + (np.sqrt(0.012) - np.sqrt(0.00085)) * 500 / 999) ** 2
    assert abs(betas[500] - mid) < 1e-9


def test_schedule_buffers_consistency():
    s = DDPMSchedule.create(1000, "linear", 0.00085, 0.012)
    np.testing.assert_allclose(s.sqrt_alphas_cumprod ** 2
                               + s.sqrt_one_minus_alphas_cumprod ** 2,
                               1.0, rtol=1e-10)
    assert s.alphas_cumprod_prev[0] == 1.0
    assert (np.diff(s.alphas_cumprod) < 0).all()


def test_ddim_timesteps():
    ts = make_ddim_timesteps(50, 1000)
    assert len(ts) == 50 and ts[0] == 1 and ts[-1] == 981


def test_ddim_recovers_mean_of_gaussian():
    """For data ~ N(mu, I), the exact eps-predictor is
    eps*(x,t) = (x - sqrt(ac)*mu)/sqrt(1+ac*(1/ac - 1)) ... for unit-variance
    data the posterior-optimal eps is (x - sqrt(ac)*mu)/sqrt(1-ac+ac) — with
    deterministic DDIM (eta=0) starting from noise, sampling with the
    optimal eps for a point mass at mu must land on mu."""
    mu = 1.5
    s = DDPMSchedule.create(1000, "linear", 0.00085, 0.012)
    sa = jnp.asarray(s.sqrt_alphas_cumprod, jnp.float32)
    so = jnp.asarray(s.sqrt_one_minus_alphas_cumprod, jnp.float32)

    def eps_fn(x, t, c):
        # point mass at mu: x_t = sqrt(ac)*mu + sqrt(1-ac)*eps  =>  eps
        return (x - sa[t][:, None, None] * mu) / so[t][:, None, None]

    x_T = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8))
    out = ddim_mod.ddim_sample(eps_fn, x_T, jnp.zeros((2, 1, 1)), s, steps=50)
    # residual sqrt(alphas_cumprod[981]) * mu ~ 0.065 from the pure-noise start
    np.testing.assert_allclose(np.asarray(out), mu, rtol=0, atol=0.1)


def test_plms_recovers_mean_of_gaussian():
    mu = -0.7
    s = DDPMSchedule.create(1000, "linear", 0.00085, 0.012)
    sa = jnp.asarray(s.sqrt_alphas_cumprod, jnp.float32)
    so = jnp.asarray(s.sqrt_one_minus_alphas_cumprod, jnp.float32)

    def eps_fn(x, t, c):
        return (x - sa[t][:, None, None] * mu) / so[t][:, None, None]

    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8))
    out = ddim_mod.plms_sample(eps_fn, x_T, jnp.zeros((2, 1, 1)), s, steps=25)
    np.testing.assert_allclose(np.asarray(out), mu, rtol=0, atol=0.1)


def test_q_sample():
    s = DDPMSchedule.create(1000, "linear")
    x0 = jnp.ones((2, 3, 4))
    noise = jnp.ones_like(x0) * 2.0
    t = jnp.array([0, 999])
    xt = ddim_mod.q_sample(s, x0, t, noise)
    exp0 = s.sqrt_alphas_cumprod[0] * 1 + s.sqrt_one_minus_alphas_cumprod[0] * 2
    exp999 = s.sqrt_alphas_cumprod[999] * 1 + s.sqrt_one_minus_alphas_cumprod[999] * 2
    np.testing.assert_allclose(np.asarray(xt[0]), exp0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(xt[1]), exp999, rtol=1e-5)


def test_ddim_cfg_combination():
    """CFG: eps = e_uc + s*(e_c - e_uc) routing (ddim.py:176-201)."""
    calls = {}

    def eps_fn(x, t, c):
        calls["batch"] = x.shape[0]
        return jnp.broadcast_to(c[:, :1, :1], x.shape) * jnp.ones_like(x) * 0.01

    s = DDPMSchedule.create(1000, "linear")
    x_T = jnp.zeros((1, 2, 2))
    out = ddim_mod.ddim_sample(eps_fn, x_T, jnp.ones((1, 1, 1)), s, steps=5,
                               uncond=jnp.zeros((1, 1, 1)), guidance_scale=3.0)
    assert calls["batch"] == 2  # dual batch
    assert np.isfinite(np.asarray(out)).all()
