"""Multi-host (2-process loopback) distributed test.

The reference validates its cluster with coordinator + workers as threads in
one JVM (DistributedServiceTest.java:43-118). Here: two OS processes join a
jax.distributed cluster over loopback, build a global mesh spanning both
processes' virtual CPU devices, and run a TP-sharded forward — each process
computes only its shard and the psum crosses the process boundary.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np
import jax.numpy as jnp
sys.path.insert(0, r"%(repo)s")
from jlama_tpu.config import from_hf_config
from jlama_tpu.models.init import init_params
from jlama_tpu.models.base import forward_logits
from jlama_tpu.parallel.mesh import make_mesh, shard_params

cfg = from_hf_config({
    "model_type": "llama", "hidden_size": 64, "intermediate_size": 128,
    "num_attention_heads": 8, "num_key_value_heads": 4,
    "num_hidden_layers": 2, "rms_norm_eps": 1e-5, "vocab_size": 256,
    "max_position_embeddings": 64, "rope_theta": 10000.0,
    "bos_token_id": 1, "eos_token_id": 2, "hidden_act": "silu",
})
params = init_params(cfg, dtype=jnp.float32)  # same seed on both processes
mesh = make_mesh(jax.devices(), dp=1, pp=1, tp=8)  # tp spans both processes
with mesh:
    sp = shard_params(params, cfg, mesh)
    toks = jnp.asarray(np.array([[1, 5, 9, 42]], dtype=np.int32))
    pos = jnp.asarray(np.arange(4, dtype=np.int32)[None, :])
    logits, _ = forward_logits(sp, cfg, toks, pos, dtype=jnp.float32)
    # compare against the local single-device forward
    ref, _ = forward_logits(params, cfg, toks, pos, dtype=jnp.float32)
    got = np.asarray(jax.experimental.multihost_utils.process_allgather(logits, tiled=True))
    ref = np.asarray(ref)
    assert np.allclose(got, ref, atol=1e-4), "mismatch"
print(f"proc {pid} OK")
"""


def test_two_process_tp_forward(tmp_path):
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
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess test timed out")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK" in out
