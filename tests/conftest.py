import os
import sys

# Tests run on a virtual 8-device CPU mesh — the TPU-world analogue of a fake
# cluster (multi-chip sharding is validated here; the real chip runs bench).
# NOTE: the axon sitecustomize force-registers the TPU backend and sets
# jax.config jax_platforms programmatically, so the env var alone is not
# enough — we must also jax.config.update after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA CPU's AllReducePromotion pass crashes ("Invalid binary instruction
# opcode copy") on the bf16 all-reduces shard_map emits (shardy puts a
# sharding_constraint inside the reducer body); CPU-only bug, CPU-only flag.
if "xla_disable_hlo_passes" not in flags:
    flags = (flags + " --xla_disable_hlo_passes=all-reduce-promotion").strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: no persistent compilation cache for CPU tests — the cached CPU AOT
# executables carry compile-machine feature sets that can mismatch the host
# (cpu_aot_loader warns about possible SIGILL). The TPU bench/CLIs do use the
# cache (maa3_tpu.utils.enable_compile_cache).
