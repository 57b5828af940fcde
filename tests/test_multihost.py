"""Multi-host training smoke: a REAL 2-process jax.distributed CPU cluster
(2 local devices each -> global 4-device 'data' mesh) drives 2 Trainer.fit
steps end-to-end.

This executes the path the reference scales with (multi-process DDP,
reference main.py:611): cluster bootstrap (scripts/train.py --distributed
wires the same jax.distributed.initialize), per-process batch shards
assembled into global Arrays by Trainer._to_global
(make_array_from_process_local_data), and cross-process gradient
all-reduces from the data-axis shardings. Both ranks must report the SAME
loss — the train step is one global SPMD computation.
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_fit():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    port = _free_port()

    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    if not any("all-reduce-promotion" in f for f in flags):
        flags.append("--xla_disable_hlo_passes=all-reduce-promotion")
    flags.append("--xla_force_host_platform_device_count=2")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_NUM_PROCESSES", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--coordinator", f"127.0.0.1:{port}",
             "--process_id", str(i), "--num_processes", "2", "--steps", "2"],
            cwd=root, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = {}
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} rc={p.returncode}:\n{out[-3000:]}"
        lines = [ln for ln in out.splitlines()
                 if ln.startswith("MULTIHOST_RESULT ")]
        assert lines, f"rank {i} printed no result:\n{out[-3000:]}"
        results[i] = json.loads(lines[-1].split(" ", 1)[1])

    for i, r in results.items():
        assert r["process_count"] == 2
        assert r["global_devices"] == 4
        assert r["local_devices"] == 2
        assert r["mesh"] == {"data": 4, "model": 1}
        assert r["steps"] == 2
        assert r["loss"] == r["loss"] and abs(r["loss"]) < 1e6  # finite

    # one global SPMD computation -> bitwise-identical loss on both ranks
    assert results[0]["loss"] == results[1]["loss"], results
