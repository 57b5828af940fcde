#!/usr/bin/env python
"""Per-shape batch-1 A/B of the anti-aliased snake activation: XLA shift-add
(FusedActivation1d) vs the Pallas one-pass kernel (ops/pallas_aa_snake), at
the BigVGAN stage shapes. NOTE: the recorded 2026-08-17 run predates the
explicit fast flag below — it compared XLA/libm-sin vs Pallas/poly-sin, so
its per-arm numbers mix the sin variants (the routing conclusion, XLA wins
at narrow C, was later confirmed by the full-generator A/Bs). The earlier "Pallas loses at batch 1" call was made
on the full pipeline before the unfold-GEMM conv re-lowering changed the
fusion neighbourhood; this measures the activation alone, chained in a scan
to cancel the axon RPC.
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
from maa3_tpu.models.bigvgan import BigVGANConfig, _act_init, snake_beta
from maa3_tpu.ops.pallas_aa_snake import aa_snake_fused
from maa3_tpu.ops.resample import FusedActivation1d

ITERS = int(os.environ.get("MAA3_ITERS", "16"))
DT = jnp.bfloat16


def main():
    key = jax.random.PRNGKey(0)
    cfg = BigVGANConfig()
    out = {"iters": ITERS}

    for C, T in ((768, 2496), (384, 9984), (192, 19968), (96, 39936),
                 (48, 79872), (24, 159744)):
        act = _act_init(C, cfg)
        x = jax.random.normal(key, (1, C, T), DT)
        row = {}

        # identical fast flag on BOTH arms: otherwise the Pallas arm's
        # dtype-sniffing picks poly sin^2 on bf16 while the XLA arm (fp32-
        # promoted by the FIR taps) runs libm sin, and the A/B measures
        # poly-vs-libm instead of Pallas-vs-XLA
        fast = DT == jnp.bfloat16

        def xla_aa(p, z):
            return FusedActivation1d(
                lambda v: snake_beta(v, p["alpha"], p["beta"], True,
                                     fast=fast))(z)

        def pl_aa(p, z):
            return aa_snake_fused(z, p["alpha"], p["beta"], logscale=True,
                                  has_beta=True, fast_sin2=fast)

        row["xla_ms"] = round(program_time(_chained(xla_aa, ITERS), (act, x))
                              / ITERS * 1e3, 3)
        row["pallas_ms"] = round(program_time(_chained(pl_aa, ITERS), (act, x))
                                 / ITERS * 1e3, 3)
        a = np.asarray(xla_aa(act, x), np.float32)
        b = np.asarray(pl_aa(act, x), np.float32)
        row["relerr"] = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))
        out[f"C{C}_T{T}"] = row
        print(json.dumps({f"C{C}_T{T}": row}), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
