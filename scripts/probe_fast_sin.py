#!/usr/bin/env python
"""Is the b1 AA-snake activation sin-bound, and can a polynomial sin^2 beat
XLA's sin? Three variants of the fused AA act at BigVGAN tail shapes:

  exact  — snake_beta as shipped (fp32 jnp.sin)
  square — sin^2(ax) replaced by (ax)^2 (cheap stand-in; bounds the win)
  poly   — sin^2(u) = (1-cos(2u))/2 with round-based mod-2pi range reduction
           + even minimax poly for cos on [-pi, pi] (pure XLA, stays fusable)

Prints per-shape ms + poly max rel err vs exact. If square ~= exact, the act
is NOT sin-bound and the idea dies here.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()

from _probe_util import program_time
from _probe_util import chained as _chained
from maa3_tpu.ops.resample import FusedActivation1d

ITERS = int(os.environ.get("MAA3_ITERS", "16"))
DT = jnp.bfloat16

# cos(pi*t) on t in [-1, 1] as even poly in t^2: fit once here, fp64.
_t = np.linspace(-1.0, 1.0, 20001)
_C = np.polynomial.chebyshev.Chebyshev.fit(_t**2, np.cos(np.pi * _t), 7)
_COEF = np.polynomial.chebyshev.cheb2poly(_C.convert().coef)
print(json.dumps({"poly_fit_max_err": float(
    np.abs(np.polyval(_COEF[::-1], _t**2) - np.cos(np.pi * _t)).max())}),
    flush=True)
COEF = jnp.asarray(_COEF, jnp.float32)  # ascending powers of t^2


def sin2_fast(u):
    """sin^2(u) = (1 - cos(2u))/2, cos by range-reduce + even poly."""
    # 2u = 2*pi*(n + t/2), t in [-1, 1]: v = u/pi, n = round(v), t = v - n
    v = u * jnp.float32(1.0 / np.pi)
    t = v - jnp.round(v)          # [-0.5, 0.5] -> cos(2u) = cos(2*pi*t)
    w = (2.0 * t) * (2.0 * t)     # (2t)^2 in [0, 1]
    c = COEF[-1]
    for k in range(COEF.shape[0] - 2, -1, -1):
        c = c * w + COEF[k]
    return 0.5 * (1.0 - c)


def make_act(mode, a, b):
    def act(x):
        xf = x.astype(jnp.float32)
        u = xf * a
        if mode == "exact":
            s2 = jnp.square(jnp.sin(u))
        elif mode == "square":
            s2 = jnp.square(u)
        else:
            s2 = sin2_fast(u)
        return (xf + (1.0 / (b + 1e-9)) * s2).astype(x.dtype)
    return act


def main():
    key = jax.random.PRNGKey(0)
    out = {"iters": ITERS}
    for C, T in ((768, 2496), (192, 19968), (96, 39936), (24, 159744)):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, C), 3)
        # exp(N(0,1)) alphas as in trained logscale snake
        a = jnp.exp(jax.random.normal(k1, (1, C, 1), jnp.float32))
        b = jnp.exp(jax.random.normal(k2, (1, C, 1), jnp.float32))
        x = jax.random.normal(k3, (1, C, T), DT) * 3.0
        row = {}
        fns = {}
        for mode in ("exact", "square", "poly"):
            def aa(av, bv, z, mode=mode):
                return FusedActivation1d(make_act(mode, av, bv))(z)
            fns[mode] = aa
            row[f"{mode}_ms"] = round(
                program_time(_chained(aa, ITERS), (a, b, x)) / ITERS * 1e3, 3)
        e = np.asarray(fns["exact"](a, b, x), np.float32)
        p = np.asarray(fns["poly"](a, b, x), np.float32)
        row["poly_relerr"] = float(np.abs(p - e).max() / (np.abs(e).max() + 1e-9))
        out[f"C{C}_T{T}"] = row
        print(json.dumps({f"C{C}_T{T}": row}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
