"""Cnn14 / CLAP-score tests: structure + torch-oracle parity of Cnn14."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from maa3_tpu.models.cnn14 import (Cnn14Config, cnn14_init, cnn14_apply,
                                   cnn14_from_torch, cnn14_logmel)
from maa3_tpu.diffusion import transport
from maa3_tpu.eval.clap_score import CLAPScorer


def test_cnn14_shapes():
    cfg = Cnn14Config(sample_rate=16000, window_size=512, hop_size=160,
                      mel_bins=64, fmin=50, fmax=8000, classes_num=10,
                      out_emb=2048)
    params = cnn14_init(jax.random.PRNGKey(0), cfg)
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 16000)) * 0.1
    out = cnn14_apply(params, cfg, wav)
    assert out["embedding"].shape == (2, 2048)
    assert out["clipwise_output"].shape == (2, 10)
    assert np.isfinite(np.asarray(out["embedding"])).all()


def test_cnn14_convblock_parity_vs_torch():
    """One ConvBlock (conv-bn-relu x2 + avgpool) against a torch oracle with
    identical weights via the importer mapping."""
    torch.manual_seed(0)
    conv1 = nn.Conv2d(1, 8, 3, padding=1, bias=False)
    conv2 = nn.Conv2d(8, 8, 3, padding=1, bias=False)
    bn1, bn2 = nn.BatchNorm2d(8).eval(), nn.BatchNorm2d(8).eval()
    with torch.no_grad():
        bn1.running_mean.normal_(0, 0.1)
        bn1.running_var.uniform_(0.5, 1.5)
        bn2.weight.uniform_(0.5, 1.5)

    sd = {
        "conv_block1.conv1.weight": conv1.weight.detach().numpy(),
        "conv_block1.conv2.weight": conv2.weight.detach().numpy(),
    }
    for name, bn in (("bn1", bn1), ("bn2", bn2)):
        sd[f"conv_block1.{name}.weight"] = bn.weight.detach().numpy()
        sd[f"conv_block1.{name}.bias"] = bn.bias.detach().numpy()
        sd[f"conv_block1.{name}.running_mean"] = bn.running_mean.numpy()
        sd[f"conv_block1.{name}.running_var"] = bn.running_var.numpy()

    from maa3_tpu.models.cnn14 import _conv_block
    params = {
        "conv1": {"w": jnp.asarray(sd["conv_block1.conv1.weight"])},
        "conv2": {"w": jnp.asarray(sd["conv_block1.conv2.weight"])},
        "bn1": {"weight": jnp.asarray(sd["conv_block1.bn1.weight"]),
                "bias": jnp.asarray(sd["conv_block1.bn1.bias"]),
                "mean": jnp.asarray(sd["conv_block1.bn1.running_mean"]),
                "var": jnp.asarray(sd["conv_block1.bn1.running_var"])},
        "bn2": {"weight": jnp.asarray(sd["conv_block1.bn2.weight"]),
                "bias": jnp.asarray(sd["conv_block1.bn2.bias"]),
                "mean": jnp.asarray(sd["conv_block1.bn2.running_mean"]),
                "var": jnp.asarray(sd["conv_block1.bn2.running_var"])},
    }
    x = np.random.RandomState(0).randn(2, 1, 16, 12).astype(np.float32)
    ours = _conv_block(params, jnp.asarray(x), (2, 2))
    with torch.no_grad():
        ref = F.avg_pool2d(
            F.relu(bn2(conv2(F.relu(bn1(conv1(torch.tensor(x))))))), 2)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_cnn14_logmel_matches_frame_count():
    cfg = Cnn14Config(sample_rate=16000, window_size=512, hop_size=160)
    wav = jnp.zeros((1, 16000))
    lm = cnn14_logmel(wav, cfg)
    assert lm.shape == (1, 1, 1 + 16000 // 160, 64)


def test_clap_scorer_end_to_end_random():
    scorer = CLAPScorer.random_init(jax.random.PRNGKey(0))
    scorer.duration = 1.0
    wavs = [np.random.RandomState(i).randn(16000).astype(np.float32) * 0.1
            for i in range(2)]
    scores = scorer.score(wavs, ["a dog barks", "rain falls"], sr=16000)
    assert scores.shape == (2,)
    assert (np.abs(scores) <= 1.0).all()


def test_transport_paths_and_ode():
    path = transport.Path("linear")
    x1 = jnp.ones((2, 3, 4))
    x0 = jnp.zeros_like(x1)
    xt, vt = path.interpolate(x1, x0, jnp.array([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(xt[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xt[1]), 1.0, atol=1e-6)

    # gvp endpoints
    gvp = transport.Path("gvp")
    xt2, _ = gvp.interpolate(x1, x0, jnp.array([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(xt2[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xt2[1]), 1.0, atol=1e-5)

    # constant-velocity ODE exactness (euler + heun)
    def vel(x, t, c):
        return jnp.full_like(x, 0.25)

    for method in ("euler", "heun"):
        out = transport.ode_sample(vel, x0, None, steps=9, method=method)
        np.testing.assert_allclose(np.asarray(out), 0.25, rtol=1e-5)

    # velocity_from(noise-model) roundtrip: if model predicts x0 exactly,
    # velocity must equal the analytic interpolant velocity
    def noise_model(x, t, c):
        return x0

    vfn = transport.velocity_from(noise_model, path, "noise")
    xt3, vt3 = path.interpolate(x1, x0, jnp.array([0.3, 0.7]))
    got = vfn(xt3, jnp.array([0.3, 0.7]), None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(vt3), rtol=1e-4,
                               atol=1e-5)


def test_transport_time_shifted_grid():
    # t/(t + s - s*t): endpoints fixed, interior pushed toward 0 for s>1
    g = jnp.linspace(0.0, 1.0, 9)
    gs = transport.shift_time_grid(g, 3.0)
    np.testing.assert_allclose(float(gs[0]), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(gs[-1]), 1.0, atol=1e-6)
    assert (np.asarray(gs[1:-1]) < np.asarray(g[1:-1])).all()
    # ode_sample accepts the factor and stays exact for constant velocity
    out = transport.ode_sample(lambda x, t, c: jnp.full_like(x, 0.25),
                               jnp.zeros((2, 3, 4)), None, steps=9,
                               method="euler", time_shifting_factor=3.0)
    np.testing.assert_allclose(np.asarray(out), 0.25, rtol=1e-5)


def test_dopri5_exact_linear_field():
    # dx/dt = a(t) x with a(t) = 1 + t: x(1) = x0 * exp(3/2)
    def vel(x, t, c):
        return (1.0 + t).reshape((-1,) + (1,) * (x.ndim - 1)) * x

    x0 = jnp.array(np.random.default_rng(0).normal(size=(3, 2, 5)),
                   jnp.float32)
    out, stats = transport.dopri5_sample(vel, x0, None, rtol=1e-6, atol=1e-8)
    expect = np.asarray(x0) * np.exp(1.5)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)
    assert int(stats["n_accepted"]) >= 1
    assert int(stats["n_evals"]) == 7 * (int(stats["n_accepted"])
                                         + int(stats["n_rejected"]))


def test_dopri5_matches_dense_euler_and_adapts():
    # nonlinear, stiff-ish field: adaptive solver must agree with a very
    # fine Euler reference and reject at least nothing pathological
    def vel(x, t, c):
        return jnp.tanh(3.0 * x) - x * t.reshape((-1,) + (1,) * (x.ndim - 1))

    x0 = jnp.array(np.random.default_rng(1).normal(size=(2, 4, 6)),
                   jnp.float32)
    ref = transport.ode_sample(vel, x0, None, steps=2001, method="euler")
    out, stats = transport.dopri5_sample(vel, x0, None, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # adaptivity: far fewer evals than the 2000-step Euler reference
    assert int(stats["n_evals"]) < 2000
    # tighter tolerance => more steps (1e-6 rel is the fp32 floor)
    _, stats_tight = transport.dopri5_sample(vel, x0, None, rtol=1e-6,
                                             atol=1e-8)
    assert int(stats_tight["n_accepted"]) > int(stats["n_accepted"])
