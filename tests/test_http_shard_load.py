"""Ranged-HTTP shard-local weight loading.

The reference's workers can pull only their shard of a remote checkpoint via
HTTP range requests (HTTPSafeTensorLoader.java:114-213). This spawns a local
HTTP server over a JQ4 checkpoint plus a 2-process jax.distributed cluster
whose `load_params_sharded` is given the URL, and asserts each process
fetches strictly less than the full payload while producing logits matching
a full local load.
"""

import os
import socket
import subprocess
import sys
import threading
from functools import partial
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")


class RangeHandler(SimpleHTTPRequestHandler):
    """SimpleHTTPRequestHandler with HTTP Range support (stdlib lacks it)."""

    def log_message(self, *a):  # quiet
        pass

    def send_head(self):
        path = self.translate_path(self.path)
        if not os.path.isfile(path):
            return super().send_head()
        rng = self.headers.get("Range")
        if not rng:
            return super().send_head()
        size = os.path.getsize(path)
        unit, _, spec = rng.partition("=")
        start_s, _, end_s = spec.partition("-")
        start = int(start_s)
        end = int(end_s) if end_s else size - 1
        end = min(end, size - 1)
        f = open(path, "rb")
        f.seek(start)
        self._range_len = end - start + 1
        self.send_response(206)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Range", f"bytes {start}-{end}/{size}")
        self.send_header("Content-Length", str(self._range_len))
        self.end_headers()
        return _Limited(f, self._range_len)


class _Limited:
    def __init__(self, f, n):
        self.f, self.n = f, n

    def read(self, k=-1):
        if self.n <= 0:
            return b""
        k = self.n if k < 0 else min(k, self.n)
        data = self.f.read(k)
        self.n -= len(data)
        return data

    def close(self):
        self.f.close()


WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]; url = sys.argv[3]
payload = int(sys.argv[4]); model_dir = sys.argv[5]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, r"%(repo)s")
from jlama_tpu.parallel import distributed
from jlama_tpu.parallel.mesh import make_mesh
from jlama_tpu.models.base import forward_logits
from jlama_tpu.models.loader import load_params

mesh = make_mesh(jax.devices(), dp=1, pp=2, tp=4)
with mesh:
    params, cfg = distributed.load_params_sharded(
        url, None, mesh, float_dtype=jnp.float32
    )
    fetched = distributed.LOAD_STATS["bytes_loaded"]
    assert fetched < 0.8 * payload, (fetched, payload)

    toks = jnp.asarray(np.array([[1, 5, 9, 42]], dtype=np.int32))
    pos = jnp.asarray(np.arange(4, dtype=np.int32)[None, :])
    logits, _ = forward_logits(params, cfg, toks, pos, dtype=jnp.float32)
    got = np.asarray(
        jax.experimental.multihost_utils.process_allgather(logits, tiled=True)
    )
    ref_params, _ = load_params(model_dir, cfg, float_dtype=jnp.float32)
    ref, _ = forward_logits(ref_params, cfg, toks, pos, dtype=jnp.float32)
    assert np.allclose(got, np.asarray(ref), atol=2e-3), (
        np.abs(got - np.asarray(ref)).max()
    )
print(f"proc {pid} OK fetched={fetched}/{payload}")
"""


def test_two_process_http_shard_fetch(tmp_path):
    from tests.helpers import make_tiny_llama
    from jlama_tpu.quant.quantizer import quantize_model

    model_dir, _ = make_tiny_llama(
        tmp_path / "src",
        config_overrides={
            "num_hidden_layers": 4,
            "hidden_size": 128,
            "intermediate_size": 256,
            "num_attention_heads": 8,
            "num_key_value_heads": 4,
        },
    )
    q4_dir = quantize_model(model_dir, out_dir=tmp_path / "q4")
    payload = sum(
        f.stat().st_size for f in Path(q4_dir).glob("*.safetensors")
    )

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), partial(RangeHandler, directory=str(q4_dir))
    )
    http_port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{http_port}"

    repo = str(Path(__file__).resolve().parent.parent)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord_port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": repo})
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    try:
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(i), str(coord_port), url,
                 str(payload), str(q4_dir)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            )
            for i in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=180)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("http shard fetch test timed out")
            outs.append(out.decode())
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
            assert f"proc {i} OK" in out
    finally:
        httpd.shutdown()


def test_http_index_single_file_roundtrip(tmp_path):
    """HTTPSafeTensorIndex over a single-file checkpoint: ranged row loads
    match the local mmap reads byte for byte."""
    from tests.helpers import make_tiny_llama
    from jlama_tpu.st import SafeTensorIndex
    from jlama_tpu.st.http_loader import HTTPSafeTensorIndex

    model_dir, _ = make_tiny_llama(tmp_path / "src")
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), partial(RangeHandler, directory=str(model_dir))
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        local = SafeTensorIndex(model_dir)
        remote = HTTPSafeTensorIndex(url)
        assert set(remote.names()) == set(local.names())
        name = "model.layers.0.self_attn.q_proj.weight"
        np.testing.assert_array_equal(
            remote.load(name, row_range=(16, 48)),
            local.load(name, row_range=(16, 48)),
        )
        np.testing.assert_array_equal(
            remote.load(name, col_range=(0, 32)),
            local.load(name, col_range=(0, 32)),
        )
        full = local.info(name).nbytes
        assert remote.bytes_loaded < full + 64 * local.info(name).shape[-1] * 4
    finally:
        httpd.shutdown()
