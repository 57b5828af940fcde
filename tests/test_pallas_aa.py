"""Pallas fused anti-aliased snake kernel vs the XLA shift-add oracle.

The oracle (ops/resample.py::FusedActivation1d) is itself parity-tested
against the reference's alias_free_torch pipeline (test_vocoder.py), so
matching it transitively matches vocoder/bigvgan/alias_free_torch/act.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maa3_tpu.models.bigvgan import snake, snake_beta
from maa3_tpu.ops.pallas_aa_snake import aa_snake_fused
from maa3_tpu.ops.resample import FusedActivation1d


def _oracle(x, alpha, beta, logscale, has_beta):
    if has_beta:
        act = FusedActivation1d(lambda v: snake_beta(v, alpha, beta, logscale))
    else:
        act = FusedActivation1d(lambda v: snake(v, alpha, logscale))
    return act(x)


@pytest.mark.parametrize("shape,tile", [
    ((1, 8, 256), 128),     # multi-tile, exact division
    ((2, 8, 300), 128),     # ragged last tile, batch > 1
    ((1, 24, 640), 8192),   # single tile wider than T
    ((1, 12, 384), 128),    # rows not a multiple of the row block
    ((1, 8, 258), 128),     # ragged tail < 5: falls back to a single tile
    ((1, 8, 261), 128),     # ragged tail == 5: smallest multi-tile tail
    ((1, 8, 516), 512),     # tile-shrink loop engages (516 % 512 == 4 -> 384)
])
@pytest.mark.parametrize("has_beta,logscale",
                         [(True, True), (False, True), (False, False)])
def test_matches_shift_add_oracle(shape, tile, has_beta, logscale):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    B, C, T = shape
    x = jax.random.normal(k1, shape, jnp.float32) * 3.0
    alpha = jax.random.normal(k2, (C,)) * 0.5
    beta = jax.random.normal(k3, (C,)) * 0.5 if has_beta else None

    want = _oracle(x, alpha, beta, logscale, has_beta)
    got = aa_snake_fused(x, alpha, beta, logscale=logscale,
                         has_beta=has_beta, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_bfloat16_io_fp32_snake():
    """bf16 storage, fp32 snake island — matches the oracle's bf16 path."""
    key = jax.random.PRNGKey(7)
    x = (jax.random.normal(key, (1, 16, 256), jnp.float32) * 3.0
         ).astype(jnp.bfloat16)
    alpha = jnp.linspace(-0.5, 0.5, 16)
    beta = jnp.linspace(0.4, -0.4, 16)
    want = _oracle(x, alpha, beta, True, True)
    got = aa_snake_fused(x, alpha, beta, logscale=True, has_beta=True,
                         tile=128, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.05, rtol=0.05)


def test_aa_snake_mxu_fir_matches_shift_add():
    """The banded-matmul FIR variant (_kernel_mxu, round 4) must match the
    shift-add kernel exactly in fp32 — same taps, same replicate-clamp
    edges, only the FIR summation order differs — across multi-tile grids
    and ragged tails."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from maa3_tpu.ops.pallas_aa_snake import _aa_snake_fused

    for t in (128, 200, 500):
        x = jax.random.normal(jax.random.PRNGKey(t), (2, 4, t), jnp.float32)
        al = jax.random.normal(jax.random.PRNGKey(1), (4,)) * 0.3
        be = jax.random.normal(jax.random.PRNGKey(2), (4,)) * 0.3
        ref = _aa_snake_fused(x, al, be, logscale=True, has_beta=True,
                              tile=128, interpret=True, fast_sin2=False,
                              mxu_fir=False)
        got = _aa_snake_fused(x, al, be, logscale=True, has_beta=True,
                              tile=128, interpret=True, fast_sin2=False,
                              mxu_fir=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-5, atol=3e-6)


def test_time_folded_matches_unfolded():
    """fold>1 reshapes (B, C, T) -> (B*C*fold rows, T/fold) with true
    cross-chunk halos and row-masked s-domain clamps (round 5): outputs
    must be BIT-EXACT vs fold=1 for both kernel variants, including ragged
    time tails and single-tile folds."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from maa3_tpu.ops.pallas_aa_snake import _aa_snake_fused

    for (b, c, t), folds in [((2, 6, 1024), (2, 4)), ((1, 4, 1560), (2,)),
                             ((2, 3, 4096), (8,))]:
        x = jax.random.normal(jax.random.PRNGKey(t), (b, c, t), jnp.float32)
        al = jax.random.normal(jax.random.PRNGKey(1), (c,)) * 0.3
        be = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.3
        for mxu in (False, True):
            ref = _aa_snake_fused(x, al, be, tile=512, interpret=True,
                                  mxu_fir=mxu, fold=1)
            for k in folds:
                got = _aa_snake_fused(x, al, be, tile=512, interpret=True,
                                      mxu_fir=mxu, fold=k)
                np.testing.assert_array_equal(np.asarray(got),
                                              np.asarray(ref))


def test_auto_fold_policy(monkeypatch):
    """auto_fold defaults OFF (round-5 probe: folding measured slower at
    every narrow b8 stage); MAA3_AA_FOLD opts in, clamped to the >=768-row
    / T/k >= 4096 regime and to divide T."""
    from maa3_tpu.ops.pallas_aa_snake import auto_fold

    monkeypatch.delenv("MAA3_AA_FOLD", raising=False)
    assert auto_fold(8, 48, 79872) == 1       # default: off
    monkeypatch.setenv("MAA3_AA_FOLD", "32")
    assert auto_fold(8, 768, 2496) == 1       # wide b8: already in regime
    assert auto_fold(8, 96, 39936) == 1       # res3 b8: 768 rows already
    assert auto_fold(8, 48, 79872) == 2       # res4 b8 -> res3 shape
    assert auto_fold(8, 24, 159744) == 4      # res5 b8 -> res3 shape
    assert auto_fold(1, 24, 159744) == 32     # res5 b1: deep fold
    assert auto_fold(1, 768, 2496) == 1
    # k must divide T; never fold below the 4096-col tile fill
    assert auto_fold(1, 1, 4096) == 1
    for (b, c, t) in [(8, 48, 79872), (1, 24, 159744), (3, 5, 7000)]:
        k = auto_fold(b, c, t)
        assert t % k == 0
