"""HTTP micro-batching serving daemon for text-to-audio.

The reference ships only offline CLIs (scripts/txt2audio_for_2cap_flow.py);
this module is the online deployment path a production user needs, designed
TPU-first:

- **one worker thread owns the device**: HTTP handler threads only enqueue
  requests and wait; the batcher coalesces whatever arrived inside a short
  window into ONE dual-batch CFG ODE launch (batch-8 sustains ~66
  s-audio/s/chip on a v5e vs ~50 at batch 1 — see bench.py stage 2);
- **static shapes everywhere**: tokenizers pad to fixed length, batches are
  padded up to a small set of power-of-two buckets, so the jit cache holds
  a handful of programs and no request shape ever triggers a recompile;
- **grouping by (steps, scale, latent_len)**: only requests that can share
  one XLA program are batched together; a mismatched request starts the
  next batch instead of poisoning the current one.

Stdlib-only HTTP (http.server) — no framework dependency to stub in this
image, and the handler does no device work so a threading server is safe.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
import wave
from collections import deque
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from queue import Empty, Queue
from typing import Optional

import numpy as np


@dataclass
class ServeConfig:
    max_batch: int = 8             # largest coalesced batch (bucket ceiling)
    batch_window_ms: float = 30.0  # how long the batcher waits for company
    default_steps: int = 25
    default_scale: float = 5.0
    request_timeout_s: float = 600.0  # covers a cold XL compile
    sample_rate: int = 16000
    seed: int = 0


@dataclass
class _Pending:
    prompt: str
    struct: str
    steps: int
    scale: float
    latent_len: int
    seed: Optional[int]
    event: threading.Event = field(default_factory=threading.Event)
    wav: Optional[np.ndarray] = None
    error: Optional[str] = None
    t_in: float = field(default_factory=time.perf_counter)
    latency_s: float = 0.0
    # set by the handler when the client stopped waiting (queue timeout):
    # the batcher drops abandoned requests instead of generating for nobody
    abandoned: bool = False

    def group_key(self):
        return (self.steps, round(self.scale, 6), self.latent_len)


def _bucket(n: int, ceiling: int) -> int:
    """Smallest power of two >= n, capped at ceiling (compile-count bound)."""
    b = 1
    while b < n and b < ceiling:
        b *= 2
    return min(b, ceiling)


def wav_bytes(wav: np.ndarray, sample_rate: int) -> bytes:
    """float waveform in [-1, 1] -> 16-bit PCM RIFF/WAVE bytes."""
    pcm = (np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
           * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class Batcher(threading.Thread):
    """The single device-owner thread: dequeue -> coalesce -> generate."""

    def __init__(self, system, cfg: ServeConfig):
        super().__init__(daemon=True, name="maa3-batcher")
        self.system = system
        self.cfg = cfg
        self.queue: "Queue[_Pending]" = Queue()
        self._stop = threading.Event()
        self._holdover: Optional[_Pending] = None
        self._counter = 0
        self._uc_cache: dict = {}       # bucket -> uncond conditioning
        # stats
        self.t_start = time.time()
        self.served = 0
        self.errors = 0
        self.audio_seconds = 0.0
        self.batch_hist: dict = {}
        self._latencies: deque = deque(maxlen=256)
        self._lock = threading.Lock()

    # -- public ------------------------------------------------------------

    def submit(self, req: _Pending) -> None:
        self.queue.put(req)

    def stop(self) -> None:
        self._stop.set()

    def stats(self) -> dict:
        with self._lock:
            lat = sorted(self._latencies)
            return {
                "uptime_s": round(time.time() - self.t_start, 1),
                "served": self.served,
                "errors": self.errors,
                "audio_seconds": round(self.audio_seconds, 1),
                "batch_histogram": dict(self.batch_hist),
                "latency_p50_s": round(lat[len(lat) // 2], 4) if lat else None,
                "latency_p95_s":
                    round(lat[int(len(lat) * 0.95)], 4) if lat else None,
            }

    def warmup(self, buckets=(1,), steps: Optional[int] = None) -> None:
        """Compile the given batch buckets before accepting traffic."""
        for b in buckets:
            batch = [_Pending(prompt="warmup", struct="<warmup& all>",
                              steps=steps or self.cfg.default_steps,
                              scale=self.cfg.default_scale,
                              latent_len=self.system.spec.mel_length,
                              seed=0)
                     for _ in range(min(b, self.cfg.max_batch))]
            self._process(batch)

    # -- worker loop ---------------------------------------------------------

    def run(self) -> None:
        while not self._stop.is_set():
            batch = self._collect()
            if batch:
                self._process(batch)

    def _collect(self):
        """One request blocks; then keep taking same-group requests until the
        window closes or the batch is full. A request from a different group
        is held over to seed the next batch. Abandoned requests (client's
        queue wait timed out -> 503 already sent) are dropped, not batched —
        under overload this is what lets the backlog drain instead of
        spending all device time generating for clients that gave up."""
        def next_req(timeout):
            while True:
                req = self.queue.get(timeout=timeout)
                if not req.abandoned:
                    return req

        if self._holdover is not None and not self._holdover.abandoned:
            first, self._holdover = self._holdover, None
        else:
            self._holdover = None
            try:
                first = next_req(0.2)
            except Empty:
                return []
        batch = [first]
        deadline = time.perf_counter() + self.cfg.batch_window_ms / 1e3
        while len(batch) < self.cfg.max_batch:
            rest = deadline - time.perf_counter()
            if rest <= 0:
                break
            try:
                req = next_req(rest)
            except Empty:
                break
            if req.group_key() == first.group_key():
                batch.append(req)
            else:
                self._holdover = req
                break
        return batch

    def _uncond(self, bucket: int):
        if bucket not in self._uc_cache:
            self._uc_cache[bucket] = self.system.get_learned_conditioning(
                {"ori_caption": [""] * bucket,
                 "struct_caption": [""] * bucket})
        return self._uc_cache[bucket]

    def _process(self, batch) -> None:
        import jax

        batch = [r for r in batch if not r.abandoned]
        if not batch:
            return
        try:
            first = batch[0]
            bucket = _bucket(len(batch), self.cfg.max_batch)
            prompts = [r.prompt for r in batch] + [""] * (bucket - len(batch))
            structs = [r.struct for r in batch] + [""] * (bucket - len(batch))
            c = self.system.get_learned_conditioning(
                {"ori_caption": prompts, "struct_caption": structs})
            uc = self._uncond(bucket)

            # per-request initial noise: row i depends only on request i's
            # seed (or a fresh server counter), so {prompt, seed} reproduces
            # its output and co-batched requests cannot perturb each other
            shape_row = (self.system.spec.mel_dim, first.latent_len)
            rows = []
            for r in batch:
                self._counter += 1
                rng = np.random.default_rng(
                    r.seed if r.seed is not None
                    else (self.cfg.seed, self._counter))
                rows.append(rng.standard_normal(shape_row).astype(np.float32))
            for _ in range(bucket - len(batch)):
                self._counter += 1
                rows.append(np.random.default_rng(
                    (self.cfg.seed, self._counter))
                    .standard_normal(shape_row).astype(np.float32))
            x0 = np.stack(rows)

            z = self.system.sample_cfg(
                c, first.scale, uc, jax.random.PRNGKey(0),
                shape=(bucket, self.system.spec.mel_dim, first.latent_len),
                timesteps=first.steps, x0=x0)
            mel = self.system.decode_first_stage(z)
            wavs = self.system.vocode(mel)

            now = time.perf_counter()
            with self._lock:
                self.served += len(batch)
                self.audio_seconds += (wavs.shape[-1] / self.cfg.sample_rate
                                       * len(batch))
                self.batch_hist[len(batch)] = (
                    self.batch_hist.get(len(batch), 0) + 1)
            for i, r in enumerate(batch):
                r.wav = np.asarray(wavs[i])
                r.latency_s = now - r.t_in
                with self._lock:
                    self._latencies.append(r.latency_s)
                r.event.set()
        except Exception as e:  # report to the waiting clients, keep serving
            with self._lock:
                self.errors += len(batch)
            for r in batch:
                r.error = repr(e)[:500]
                r.event.set()


def _make_handler(batcher: Batcher):
    cfg = batcher.cfg

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # stay quiet; /stats has counters
            pass

        def _send(self, code: int, body: bytes,
                  ctype: str = "application/json") -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj: dict) -> None:
            self._send(code, json.dumps(obj).encode())

        def do_GET(self):
            if self.path == "/healthz":
                import jax
                self._send_json(200, {"ok": True,
                                      "backend": jax.default_backend(),
                                      **batcher.stats()})
            elif self.path == "/stats":
                self._send_json(200, batcher.stats())
            else:
                self._send_json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._send_json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(n) or b"{}")
                prompt = body["prompt"]
                # parse numeric fields INSIDE the guard: a malformed
                # "steps": "fast" must be a 400, not a handler traceback
                req = _Pending(
                    prompt=str(prompt),
                    struct=str(body.get("struct_caption",
                                        f"<{prompt}& all>")),
                    steps=int(body.get("steps", cfg.default_steps)),
                    scale=float(body.get("scale", cfg.default_scale)),
                    latent_len=int(body.get("latent_len",
                                            batcher.system.spec.mel_length)),
                    seed=(int(body["seed"]) if "seed" in body else None),
                )
            except (ValueError, KeyError, TypeError) as e:
                self._send_json(400, {"error": f"bad request: {e!r}"})
                return

            batcher.submit(req)
            if not req.event.wait(cfg.request_timeout_s):
                req.abandoned = True  # batcher drops it instead of serving air
                self._send_json(503, {"error": "timed out in queue"})
                return
            if req.error is not None:
                self._send_json(500, {"error": req.error})
                return

            meta = {"latency_s": round(req.latency_s, 4),
                    "audio_seconds": req.wav.shape[-1] / cfg.sample_rate,
                    "sample_rate": cfg.sample_rate}
            if body.get("format") == "json":
                self._send_json(200, {
                    "wav_base64": base64.b64encode(
                        wav_bytes(req.wav, cfg.sample_rate)).decode(),
                    **meta})
            else:
                self.send_response(200)
                data = wav_bytes(req.wav, cfg.sample_rate)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(data)))
                self.send_header("X-Latency-S", str(meta["latency_s"]))
                self.end_headers()
                self.wfile.write(data)

    return Handler


class AudioServer:
    """Owns the HTTP server + batcher pair. `port=0` picks a free port."""

    def __init__(self, system, cfg: Optional[ServeConfig] = None,
                 host: str = "127.0.0.1", port: int = 0):
        self.cfg = cfg or ServeConfig()
        self.batcher = Batcher(system, self.cfg)
        self.httpd = ThreadingHTTPServer((host, port),
                                         _make_handler(self.batcher))
        self.port = self.httpd.server_address[1]
        self._http_thread: Optional[threading.Thread] = None

    def start(self) -> None:
        self.batcher.start()
        self._http_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True, name="maa3-http")
        self._http_thread.start()

    def serve_forever(self) -> None:
        self.batcher.start()
        self.httpd.serve_forever()

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        self.batcher.stop()
