"""Sampler self-consistency at reduced depth (CPU); the committed
PARITY_XL.json artifact carries the same checks at the full XL shape
measured on the TPU (scripts/xl_consistency.py)."""

import json
import os

import pytest


def test_consistency_reduced_depth():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from xl_consistency import run_consistency

    res = run_consistency(hidden=128, depth=3, heads=4, latent_len=40,
                          ctx_len=10, ctx_dim=64, steps=8)
    # planned/fused paths are the SAME math re-ordered; on CPU (deterministic
    # same-order fp32 matmuls) the latent must agree to fp32 roundoff
    assert res["planned_vs_plain_fp32"]["rel_to_rms"] < 1e-5
    assert res["fused_vs_unfused_fp32"]["rel_to_rms"] < 1e-5
    assert res["planned_vs_plain_bf16"]["rel_to_rms"] < 2e-2
    # bf16 serving drift stays bounded at this depth
    assert res["bf16_vs_fp32_latent"]["rel_to_rms"] < 2e-2


def test_parity_xl_artifact_sane():
    """When the TPU-measured artifact is committed, hold it to the same
    bars at the real XL shape."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY_XL.json")
    if not os.path.exists(path):
        pytest.skip("PARITY_XL.json not generated yet")
    with open(path) as f:
        res = json.load(f)
    assert res["_meta"]["depth"] == 28 and res["_meta"]["hidden"] == 1152
    # measured on TPU (PARITY_XL.json): one Euler step is tight; the full
    # 25-step ODE on expansive random-weight dynamics amplifies fp32-matmul
    # reassociation noise ~1000x, so trajectory-level bars are loose by
    # design (the quality gate lives in mel space, not latent space)
    if "planned_vs_plain_fp32_1step" in res:
        assert res["planned_vs_plain_fp32_1step"]["rel_to_rms"] < 1e-4
        assert res["fused_vs_unfused_fp32_1step"]["rel_to_rms"] < 1e-4
    assert res["planned_vs_plain_fp32"]["rel_to_rms"] < 1e-2
    assert res["fused_vs_unfused_fp32"]["rel_to_rms"] < 1e-2
    assert res["planned_vs_plain_bf16"]["rel_to_rms"] < 5e-2
    assert res["bf16_vs_fp32_latent"]["rel_to_rms"] < 5e-2
