"""Live caption-structurizer client vs a local OpenAI-compatible mock server.

The reference's n2s_by_openai.py (preprocess/n2s_by_openai.py:7-35) POSTs the
few-shot prompt to /v1/chat/completions at temperature 0. In this zero-egress
environment the client is exercised against an in-process stdlib HTTP server
that speaks the same protocol, asserting the request wire format (so a real
endpoint would accept it), the refusal fallback, retry-on-5xx behavior, and
the resumable TSV batch workflow.
"""

import csv
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from maa3_tpu.data.structurize import (N2S_FEWSHOT_PROMPT, OpenAIStructurizer,
                                       structurize_tsv)


class _MockChatCompletions(BaseHTTPRequestHandler):
    """Scriptable /chat/completions: pops the next behavior off the server's
    queue ('ok:<answer>' | '500' | 'sorry') and records each request body."""

    def log_message(self, *a):  # keep pytest output clean
        pass

    def do_POST(self):
        body = json.loads(self.rfile.read(
            int(self.headers["Content-Length"])).decode("utf-8"))
        self.server.requests.append(
            {"path": self.path, "body": body,
             "auth": self.headers.get("Authorization", "")})
        action = (self.server.script.pop(0) if self.server.script
                  else "ok:<mock& all>")
        if action == "500":
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b"upstream error")
            return
        answer = ("I'm sorry, I cannot help with that."
                  if action == "sorry" else action[len("ok:"):])
        payload = json.dumps({"choices": [
            {"message": {"role": "assistant", "content": answer}}]}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture()
def mock_server():
    srv = HTTPServer(("127.0.0.1", 0), _MockChatCompletions)
    srv.requests, srv.script = [], []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    t.join(timeout=5)


def _client(srv, **kw):
    kw.setdefault("retry_backoff_s", 0.01)
    return OpenAIStructurizer(
        api_key="test-key",
        base_url=f"http://127.0.0.1:{srv.server_address[1]}/v1", **kw)


def test_request_wire_format(mock_server):
    """The POST matches the reference's get_struct request: the few-shot
    prompt with the caption as the final Question, temperature 0.0, one user
    message, bearer auth."""
    mock_server.script = ["ok:<dog barking& all>@<car horn& end>"]
    out = _client(mock_server)("A dog barks, then a car horn")
    assert out == "<dog barking& all>@<car horn& end>"

    (req,) = mock_server.requests
    assert req["path"].endswith("/chat/completions")
    assert req["auth"] == "Bearer test-key"
    body = req["body"]
    assert body["temperature"] == 0.0
    assert body["model"] == "gpt-3.5-turbo"
    (msg,) = body["messages"]
    assert msg["role"] == "user"
    assert msg["content"] == N2S_FEWSHOT_PROMPT.format(
        caption="A dog barks, then a car horn")
    # the reference prompt's load-bearing pieces survived transcription
    for marker in ("<train passing& all>", "Question:", "Answer:",
                   "Start, mid, end"):
        assert marker in msg["content"]


def test_sorry_fallback(mock_server):
    """A refusal answer falls back to the single all-span event
    (n2s_by_openai.py:62)."""
    mock_server.script = ["sorry"]
    assert _client(mock_server)("Loud Thunder") == "<loud thunder& all>"


def test_retry_on_5xx(mock_server):
    """Transient 5xx responses are retried (the reference would crash);
    a persistent failure raises after max_retries."""
    mock_server.script = ["500", "ok:<rain& all>"]
    assert _client(mock_server)("rain") == "<rain& all>"
    assert len(mock_server.requests) == 2

    mock_server.requests.clear()
    mock_server.script = ["500", "500"]
    with pytest.raises(RuntimeError, match="after 2 attempts"):
        _client(mock_server, max_retries=2)("rain")


def test_structurize_tsv_resumable(mock_server, tmp_path):
    """TSV batch workflow (n2s_by_openai.py:44-81): per-row progress file,
    resume skips completed rows, output TSV gains struct_cap; a row whose
    request exhausts retries falls back offline instead of looping forever."""
    tsv = tmp_path / "caps.tsv"
    with open(tsv, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["name", "caption"])
        w.writerow(["a", "a dog barks"])
        w.writerow(["b", "rain falls"])
        w.writerow(["c", "wind blows"])

    # first run: row 0 ok, row 1 dies (2x500 > max_retries=1) -> offline
    # fallback, row 2 ok
    mock_server.script = ["ok:<dog barking& all>", "500", "ok:<wind& all>"]
    out = structurize_tsv(str(tsv), _client(mock_server, max_retries=1))
    with open(out, newline="") as f:
        rows = list(csv.DictReader(f, delimiter="\t"))
    assert [r["struct_cap"] for r in rows] == [
        "<dog barking& all>", "<rain falls& all>", "<wind& all>"]
    assert os.path.exists(tmp_path / "caps.txt")

    # resume: all rows already in the progress file -> zero new requests
    mock_server.requests.clear()
    out2 = structurize_tsv(str(tsv), _client(mock_server))
    assert out2 == out and not mock_server.requests


def test_cli_openai_mode(mock_server, tmp_path):
    """scripts/structurize_captions.py --openai drives the live path."""
    import subprocess
    import sys

    tsv = tmp_path / "caps.tsv"
    with open(tsv, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["name", "ori_cap"])
        w.writerow(["a", "a dog barks"])

    mock_server.script = ["ok:<dog barking& all>"]
    env = dict(os.environ, OPENAI_API_KEY="k", MAA3_PLATFORM="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "structurize_captions.py"),
         "--tsv_path", str(tsv), "--openai", "--base_url",
         f"http://127.0.0.1:{mock_server.server_address[1]}/v1"],
        capture_output=True, text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(tmp_path / "caps_struct.tsv", newline="") as f:
        (row,) = list(csv.DictReader(f, delimiter="\t"))
    assert row["struct_cap"] == "<dog barking& all>"
