"""Shard-local multi-host weight loading.

The reference's workers read only their own byte ranges of the checkpoint
(Weights.java:99-117 sparse-row mmap; HTTPSafeTensorLoader.java:114-213
ranged fetch). This test spawns a 2-process jax.distributed cluster
(pp across processes, tp within) loading a real JQ4 checkpoint via
`load_params_sharded` and asserts:

- each process reads strictly less than the full checkpoint payload
  (instrumented via SafeTensorIndex.bytes_loaded);
- the assembled global params produce logits matching a full local load.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]; model_dir = sys.argv[3]
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

# pp spans the two processes (each owns half the layers), tp within a process
mesh = make_mesh(jax.devices(), dp=1, pp=2, tp=4)
with mesh:
    params, cfg = distributed.load_params_sharded(
        model_dir, None, mesh, float_dtype=jnp.float32
    )
    bytes_loaded = distributed.LOAD_STATS["bytes_loaded"]
    payload = sum(
        os.path.getsize(os.path.join(model_dir, f))
        for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    assert bytes_loaded < 0.8 * payload, (bytes_loaded, payload)

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
print(f"proc {pid} OK bytes={bytes_loaded}/{payload}")
"""


def test_two_process_shard_local_q4_load(tmp_path):
    from tests.helpers import make_tiny_llama
    from jlama_tpu.quant.quantizer import quantize_model

    # 4 layers (pp=2 x 2), dims divisible by tp=4 and 32-aligned for q4
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

    repo = str(Path(__file__).resolve().parent.parent)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": repo})
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), str(q4_dir)],
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
            pytest.fail("shard-local load test timed out")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out
