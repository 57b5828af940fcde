"""TPU-gated tests: run on the real chip (the main tests/ suite forces a
virtual CPU mesh; these assert properties only the Mosaic-compiled kernels
and the real bf16 MXU path exhibit). Skipped wholesale off-TPU.

Run: python -m pytest tests_tpu/ -q   (on the TPU VM)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import pytest

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="requires a TPU backend")
    for item in items:
        item.add_marker(skip)
