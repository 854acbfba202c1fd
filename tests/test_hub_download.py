"""Hub downloader: parallel multi-file fetch + auto-download resolution.

Reference parity: SafeTensorSupport.java:368-610 downloads repo files in
parallel; --auto-download fetches on first use (ModelBaseCommand.java:29-40).
A local HTTP server stands in for the Hub (no egress in this environment).
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest


@pytest.fixture()
def fake_hub(monkeypatch, tmp_path):
    files = {
        "config.json": json.dumps({"model_type": "llama"}).encode(),
        "tokenizer.json": b"{}",
        "model-00001-of-00002.safetensors": b"A" * 4096,
        "model-00002-of-00002.safetensors": b"B" * 2048,
        "model.safetensors.index.json": b"{}",
        "README.md": b"ignored",
    }
    hits = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            hits.append(self.path)
            if self.path.startswith("/api/models/"):
                body = json.dumps(
                    [{"type": "file", "path": p} for p in files]
                ).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            name = self.path.rsplit("/", 1)[-1]
            if name not in files:
                self.send_response(404)
                self.end_headers()
                return
            data = files[name]
            rng = self.headers.get("Range")
            if rng:
                lo, hi = rng.split("=")[1].split("-")
                data = data[int(lo) : int(hi) + 1]
                self.send_response(206)
            else:
                self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    from jlama_tpu import hub

    monkeypatch.setattr(
        hub, "HF_BASE", f"http://127.0.0.1:{srv.server_address[1]}"
    )
    monkeypatch.setattr(
        hub, "default_model_home", lambda: tmp_path / "home"
    )
    yield files, hits, tmp_path
    srv.shutdown()


def test_download_model_parallel(fake_hub, tmp_path):
    files, hits, _ = fake_hub
    from jlama_tpu.hub import download_model

    out = download_model("acme/tiny", out_dir=tmp_path / "m", workers=4)
    for name, data in files.items():
        if name == "README.md":
            continue  # not a model file
        assert (out / name).read_bytes() == data, name
    assert not (out / "README.md").exists()


def test_maybe_download_model(fake_hub):
    files, hits, tmp_path = fake_hub
    from jlama_tpu.hub import maybe_download_model

    out = maybe_download_model("acme/tiny")
    assert (out / "config.json").exists()
    n_hits = len(hits)
    # second resolution finds the local copy: no further Hub traffic
    again = maybe_download_model("acme/tiny")
    assert again == out
    assert len(hits) == n_hits

    with pytest.raises(FileNotFoundError):
        maybe_download_model("not-a-repo-id")
