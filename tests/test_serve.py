"""Serving daemon tests: micro-batching HTTP server over a tiny system
(maa3_tpu/serving.py; the reference has no online serving path — this is
framework-added deployment surface, exercised end-to-end over real HTTP)."""

import base64
import io
import json
import threading
import urllib.request
import wave

import numpy as np
import jax
import pytest

from maa3_tpu.models.bigvgan import BigVGANConfig, bigvgan_init
from maa3_tpu.serving import AudioServer, ServeConfig, _bucket, wav_bytes
from tests.test_train import _tiny_system


VOC_CFG = BigVGANConfig(num_mels=8, upsample_rates=(4, 2),
                        upsample_kernel_sizes=(8, 4),
                        upsample_initial_channel=16,
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 3, 5),))


def _tiny_serving_system(tmp_path):
    system = _tiny_system(tmp_path)
    system.voc_cfg = VOC_CFG
    system.params["vocoder"] = bigvgan_init(jax.random.PRNGKey(7), VOC_CFG)
    return system


def _post(port, body, timeout=300):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def test_bucket_rounding():
    assert [_bucket(n, 8) for n in (1, 2, 3, 4, 5, 8, 9)] == \
        [1, 2, 4, 4, 8, 8, 8]


def test_wav_bytes_roundtrip():
    x = np.sin(np.linspace(0, 20, 400)).astype(np.float32) * 0.5
    data = wav_bytes(x, 16000)
    assert data[:4] == b"RIFF"
    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == 16000
        assert w.getnframes() == 400
        pcm = np.frombuffer(w.readframes(400), "<i2") / 32767.0
    np.testing.assert_allclose(pcm, x, atol=2e-4)


def test_server_end_to_end(tmp_path):
    system = _tiny_serving_system(tmp_path)
    server = AudioServer(system, ServeConfig(max_batch=4,
                                             batch_window_ms=150.0,
                                             default_steps=3, seed=1))
    server.start()
    try:
        # health before traffic
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/healthz", timeout=60) as r:
            h = json.loads(r.read())
        assert h["ok"] and h["served"] == 0

        # concurrent requests coalesce into one batched launch
        results = {}

        def hit(i):
            with _post(server.port, {"prompt": f"sound {i}", "steps": 3}) as r:
                results[i] = (r.status, r.headers["Content-Type"], r.read())

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert len(results) == 3
        for status, ctype, data in results.values():
            assert status == 200 and ctype == "audio/wav"
            assert data[:4] == b"RIFF"
            with wave.open(io.BytesIO(data)) as w:
                pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2")
            assert pcm.size == 16 * 2 * 8  # latent 16 -> mel 32 -> wav 256
            assert np.isfinite(pcm).all()

        # json format + explicit seed
        with _post(server.port, {"prompt": "rain", "steps": 3, "seed": 5,
                                 "format": "json"}) as r:
            out = json.loads(r.read())
        wav_b = base64.b64decode(out["wav_base64"])
        assert wav_b[:4] == b"RIFF" and out["latency_s"] > 0

        # stats reflect all 4 requests; batching actually happened
        # (3 concurrent requests against a 150 ms window on one worker)
        stats = server.batcher.stats()
        assert stats["served"] == 4 and stats["errors"] == 0
        assert stats["audio_seconds"] > 0
        assert sum(k * v for k, v in stats["batch_histogram"].items()) == 4

        # bad request -> 400, unknown path -> 404
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server.port, {"steps": 3})
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/nope", timeout=60)
        assert e.value.code == 404
    finally:
        server.shutdown()


def test_group_splitting(tmp_path):
    """Requests with different (steps, scale) never share a batch."""
    system = _tiny_serving_system(tmp_path)
    server = AudioServer(system, ServeConfig(max_batch=4,
                                             batch_window_ms=200.0,
                                             default_steps=3, seed=2))
    server.start()
    try:
        results = {}

        def hit(i, steps):
            with _post(server.port, {"prompt": f"p{i}", "steps": steps}) as r:
                results[i] = r.status

        threads = [threading.Thread(target=hit, args=(0, 3)),
                   threading.Thread(target=hit, args=(1, 4)),
                   threading.Thread(target=hit, args=(2, 3))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert list(results.values()) == [200, 200, 200]
        stats = server.batcher.stats()
        assert stats["served"] == 3 and stats["errors"] == 0
    finally:
        server.shutdown()


def test_warmup_compiles_buckets(tmp_path):
    system = _tiny_serving_system(tmp_path)
    server = AudioServer(system, ServeConfig(max_batch=4, default_steps=3))
    server.batcher.warmup((1, 4), steps=3)
    stats = server.batcher.stats()
    assert stats["served"] == 1 + 4
    server.httpd.server_close()


def test_seed_reproducible_and_batch_isolated(tmp_path):
    """A request's {prompt, seed} fully determines its audio: repeating it
    returns identical bytes, co-batched neighbors don't perturb it, and a
    malformed numeric field is a 400 (not a dropped connection)."""
    system = _tiny_serving_system(tmp_path)
    server = AudioServer(system, ServeConfig(max_batch=4, default_steps=3,
                                             batch_window_ms=60.0))
    server.start()
    try:
        solo = _post(server.port, {"prompt": "a dog", "seed": 7,
                                   "format": "json"})
        b1 = json.load(solo)["wav_base64"]

        # same request again, alone
        again = json.load(_post(server.port, {"prompt": "a dog", "seed": 7,
                                              "format": "json"}))
        assert json.loads(json.dumps(again))["wav_base64"] == b1

        # same request co-batched with a different-seed neighbor
        results = {}

        def go(name, body):
            results[name] = json.load(_post(server.port, body))

        t1 = threading.Thread(target=go, args=(
            "a", {"prompt": "a dog", "seed": 7, "format": "json"}))
        t2 = threading.Thread(target=go, args=(
            "b", {"prompt": "a cat", "seed": 8, "format": "json"}))
        t1.start(), t2.start(), t1.join(120), t2.join(120)
        assert results["a"]["wav_base64"] == b1
        assert results["b"]["wav_base64"] != b1

        # malformed numeric field -> clean 400
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server.port, {"prompt": "x", "steps": "fast"})
        assert ei.value.code == 400
    finally:
        server.shutdown()
