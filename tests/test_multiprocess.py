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


SERVE_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]; step_port = int(sys.argv[3])
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, r"%(repo)s")
from jlama_tpu.config import from_hf_config
from jlama_tpu.models.init import init_params
from jlama_tpu.parallel.mesh import make_mesh
from jlama_tpu.runtime.coordination import StepChannel
from jlama_tpu.runtime.scheduler import BatchScheduler

cfg = from_hf_config({
    "model_type": "llama", "hidden_size": 64, "intermediate_size": 128,
    "num_attention_heads": 8, "num_key_value_heads": 8,
    "num_hidden_layers": 2, "rms_norm_eps": 1e-5, "vocab_size": 256,
    "max_position_embeddings": 64, "rope_theta": 10000.0,
    "bos_token_id": 1, "eos_token_id": 2, "hidden_act": "silu",
})
params = init_params(cfg, dtype=jnp.float32)  # same seed on both processes
mesh = make_mesh(jax.devices(), dp=1, pp=1, tp=8)  # tp spans both processes

if pid == 0:
    chan = StepChannel.serve(step_port, n_followers=1, host="127.0.0.1")
else:
    chan = StepChannel.connect("127.0.0.1", step_port)

sched = BatchScheduler(
    params, cfg, tokenizer=None, n_slots=2, n_pages=16, page_size=8,
    max_seq_len=64, compute_dtype=jnp.float32, mesh=mesh, decode_lag=2,
    step_channel=chan,
)
if pid == 0:
    # two requests through the shared decode batch, driven only by host 0 —
    # the follower replays the broadcast steps (Coordinator.java:147-226)
    r1 = sched.generate([1, 5, 9, 42], max_new_tokens=6, temperature=0.0)
    r2 = sched.generate([1, 7, 3], max_new_tokens=6, temperature=0.0)
    print("TOKENS1", ",".join(map(str, r1.token_ids)))
    print("TOKENS2", ",".join(map(str, r2.token_ids)))
    # session suspend/resume across hosts: the gather/park and the
    # restore/scatter are broadcast device steps (suspend to host RAM via
    # pinned_host shards, resume back into fresh pages)
    r3 = sched.generate([1, 11, 13], max_new_tokens=4, temperature=0.0,
                        session_id="sess")
    assert sched.suspend_session("sess"), "suspend failed"
    r4 = sched.generate([2, 17], max_new_tokens=4, temperature=0.0,
                        session_id="sess")
    print("TOKENS3", ",".join(map(str, r3.token_ids)))
    print("TOKENS4", ",".join(map(str, r4.token_ids)))
    # disk offload across hosts: each process saves only its own rank's
    # shard file ("mdisk" payload) and restores it on resume
    r5 = sched.generate([1, 19], max_new_tokens=3, temperature=0.0,
                        session_id="disk")
    off_dir = "/tmp/jlama_test_offload_" + sys.argv[3]
    assert sched.suspend_session("disk", to_dir=off_dir), "disk suspend"
    r6 = sched.generate([2, 23], max_new_tokens=3, temperature=0.0,
                        session_id="disk")
    print("TOKENS5", ",".join(map(str, r5.token_ids)))
    print("TOKENS6", ",".join(map(str, r6.token_ids)))
    chan.close()
else:
    sched.run_follower()
print(f"proc {pid} OK")
"""


def _launch_pair(tmp_path, src, extra_args=()):
    repo = str(Path(__file__).resolve().parent.parent)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(src % {"repo": repo})
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), *map(str, extra_args)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess test timed out")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out
    return outs


def test_two_process_serving_scheduler(tmp_path):
    """Multi-host serving loop: host 0 runs the scheduler, host 1 replays
    broadcast steps; generated tokens must match a single-process run."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        step_port = s.getsockname()[1]
    outs = _launch_pair(tmp_path, SERVE_WORKER, extra_args=(step_port,))

    # single-process reference with identical params/config/scheduler
    import jax.numpy as jnp

    from jlama_tpu.config import from_hf_config
    from jlama_tpu.models.init import init_params
    from jlama_tpu.runtime.scheduler import BatchScheduler

    cfg = from_hf_config({
        "model_type": "llama", "hidden_size": 64, "intermediate_size": 128,
        "num_attention_heads": 8, "num_key_value_heads": 8,
        "num_hidden_layers": 2, "rms_norm_eps": 1e-5, "vocab_size": 256,
        "max_position_embeddings": 64, "rope_theta": 10000.0,
        "bos_token_id": 1, "eos_token_id": 2, "hidden_act": "silu",
    })
    params = init_params(cfg, dtype=jnp.float32)
    sched = BatchScheduler(
        params, cfg, tokenizer=None, n_slots=2, n_pages=16, page_size=8,
        max_seq_len=64, compute_dtype=jnp.float32, decode_lag=2,
    )
    ref1 = sched.generate([1, 5, 9, 42], max_new_tokens=6, temperature=0.0)
    ref2 = sched.generate([1, 7, 3], max_new_tokens=6, temperature=0.0)
    ref3 = sched.generate([1, 11, 13], max_new_tokens=4, temperature=0.0,
                          session_id="sess")
    assert sched.suspend_session("sess")
    ref4 = sched.generate([2, 17], max_new_tokens=4, temperature=0.0,
                          session_id="sess")
    ref5 = sched.generate([1, 19], max_new_tokens=3, temperature=0.0,
                          session_id="disk")
    assert sched.suspend_session("disk", to_dir=str(tmp_path / "off"))
    ref6 = sched.generate([2, 23], max_new_tokens=3, temperature=0.0,
                          session_id="disk")
    got = {
        line.split(" ")[0]: line.split(" ")[1]
        for line in outs[0].splitlines()
        if line.startswith("TOKENS")
    }
    assert got["TOKENS1"] == ",".join(map(str, ref1.token_ids)), outs[0][-1500:]
    assert got["TOKENS2"] == ",".join(map(str, ref2.token_ids)), outs[0][-1500:]
    assert got["TOKENS3"] == ",".join(map(str, ref3.token_ids)), outs[0][-1500:]
    assert got["TOKENS4"] == ",".join(map(str, ref4.token_ids)), outs[0][-1500:]
    assert got["TOKENS5"] == ",".join(map(str, ref5.token_ids)), outs[0][-1500:]
    assert got["TOKENS6"] == ",".join(map(str, ref6.token_ids)), outs[0][-1500:]


HTTP_WORKER = r"""
import os, sys, json, threading, time, urllib.request
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
step_port = int(sys.argv[3]); http_port = int(sys.argv[4])
model_dir = sys.argv[5]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
import jax.numpy as jnp
sys.path.insert(0, r"%(repo)s")
from jlama_tpu.models.loader import load_params
from jlama_tpu.tokenizers import load_tokenizer
from jlama_tpu.parallel.mesh import make_mesh
from jlama_tpu.runtime.coordination import StepChannel
from jlama_tpu.runtime.scheduler import BatchScheduler
from jlama_tpu.server.openai_api import OpenAIServer

params, cfg = load_params(model_dir, float_dtype=jnp.float32)
tokenizer = load_tokenizer(model_dir)
mesh = make_mesh(jax.devices(), dp=1, pp=1, tp=8)  # tp spans both processes
if pid == 0:
    chan = StepChannel.serve(step_port, n_followers=1, host="127.0.0.1")
else:
    chan = StepChannel.connect("127.0.0.1", step_port)
sched = BatchScheduler(
    params, cfg, tokenizer, n_slots=2, n_pages=32, page_size=8,
    max_seq_len=96, kv_dtype=jnp.float32, compute_dtype=jnp.float32,
    mesh=mesh, step_channel=chan,
)
from jlama_tpu.runtime.engine import Engine
sched.embed_engine = Engine(
    sched.params, sched.cfg, tokenizer, max_seq_len=96, kv_dtype=jnp.float32,
    compute_dtype=jnp.float32, mesh=None, fuse=False, moe_ragged=False,
    step_channel=chan, input_mesh=mesh,
)
if pid == 1:
    sched.run_follower()
    print("proc 1 OK")
    sys.exit(0)

# --- host 0: real aiohttp server + an HTTP request through the mesh ---
import asyncio
from aiohttp import web
server = OpenAIServer(sched, tokenizer, model_name="tiny-multihost")
sched.start()

def _serve():
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    runner = web.AppRunner(server.app)
    loop.run_until_complete(runner.setup())
    site = web.TCPSite(runner, "127.0.0.1", http_port)
    loop.run_until_complete(site.start())
    loop.run_forever()

threading.Thread(target=_serve, daemon=True).start()
base = f"http://127.0.0.1:{http_port}"
for _ in range(100):
    try:
        urllib.request.urlopen(base + "/healthz", timeout=2)
        break
    except Exception:
        time.sleep(0.2)
body = json.dumps({
    "messages": [{"role": "user", "content": "Hello there"}],
    "max_tokens": 6, "temperature": 0,
}).encode()
req = urllib.request.Request(
    base + "/v1/chat/completions", data=body,
    headers={"Content-Type": "application/json"},
)
resp = json.load(urllib.request.urlopen(req, timeout=120))
print("HTTPTEXT", json.dumps(resp["choices"][0]["message"]["content"]))
# embeddings through the same tp-spanning mesh (broadcast embed step)
ereq = urllib.request.Request(
    base + "/v1/embeddings",
    data=json.dumps({"input": "Hello there"}).encode(),
    headers={"Content-Type": "application/json"},
)
eresp = json.load(urllib.request.urlopen(ereq, timeout=120))
print("HTTPEMB", json.dumps(eresp["data"][0]["embedding"][:4]))
sched.stop()
chan.close()
print("proc 0 OK")
"""


def test_two_process_http_serving(tmp_path):
    """An HTTP chat request to host 0 generates through a tp-spanning mesh
    (the reference's whole jlama-net raison d'etre: Coordinator + workers
    behind one REST endpoint). Response text must match single-process."""
    pytest.importorskip("torch")
    from tests.helpers import make_tiny_chat_model

    model_dir, _ = make_tiny_chat_model(
        tmp_path,
        config_overrides={
            "num_attention_heads": 8, "num_key_value_heads": 8,
        },
    )
    ports = []
    for _ in range(2):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            ports.append(s.getsockname()[1])
    outs = _launch_pair(
        tmp_path, HTTP_WORKER, extra_args=(ports[0], ports[1], str(model_dir))
    )
    import json as _json

    line = next(ln for ln in outs[0].splitlines() if ln.startswith("HTTPTEXT "))
    got_text = _json.loads(line[len("HTTPTEXT "):])

    # single-process reference through the same stack
    import jax.numpy as jnp

    from jlama_tpu.models.loader import load_params
    from jlama_tpu.prompt import PromptBuilder
    from jlama_tpu.runtime.scheduler import BatchScheduler
    from jlama_tpu.tokenizers import load_tokenizer

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)
    tokenizer = load_tokenizer(model_dir)
    sched = BatchScheduler(
        params, cfg, tokenizer, n_slots=2, n_pages=32, page_size=8,
        max_seq_len=96, kv_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    b = PromptBuilder(tokenizer.spec)
    b.add_user("Hello there")
    ids = tokenizer.encode(b.build().prompt)
    ref = sched.generate(ids, max_new_tokens=6, temperature=0.0)
    assert got_text == ref.response_text, (got_text, ref.response_text)

    # embeddings parity (leader broadcast + follower replay)
    from jlama_tpu.runtime.engine import Engine

    emb_line = next(
        ln for ln in outs[0].splitlines() if ln.startswith("HTTPEMB ")
    )
    got_emb = _json.loads(emb_line[len("HTTPEMB "):])
    eng = Engine(params, cfg, tokenizer, max_seq_len=96,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    ref_emb = eng.embed("Hello there")[:4]
    import numpy as _np

    assert _np.allclose(got_emb, ref_emb, atol=2e-3), (got_emb, ref_emb)


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


PP_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]; step_port = int(sys.argv[3])
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, r"%(repo)s")
from jlama_tpu.config import from_hf_config
from jlama_tpu.models.init import init_params
from jlama_tpu.parallel.mesh import make_mesh
from jlama_tpu.runtime.coordination import StepChannel
from jlama_tpu.runtime.pipelined import PipelinedScheduler

cfg = from_hf_config({
    "model_type": "llama", "hidden_size": 64, "intermediate_size": 128,
    "num_attention_heads": 4, "num_key_value_heads": 2,
    "num_hidden_layers": 2, "rms_norm_eps": 1e-5, "vocab_size": 256,
    "max_position_embeddings": 64, "rope_theta": 10000.0,
    "bos_token_id": 1, "eos_token_id": 2, "hidden_act": "silu",
})
params = init_params(cfg, dtype=jnp.float32)  # same seed on both processes
# pp=2 spans the two processes (each holds one stage), tp=2 within a process
mesh = make_mesh(jax.devices(), dp=1, pp=2, tp=2)
if pid == 0:
    chan = StepChannel.serve(step_port, n_followers=1, host="127.0.0.1")
else:
    chan = StepChannel.connect("127.0.0.1", step_port)
sched = PipelinedScheduler(
    params, cfg, tokenizer=None, mesh=mesh, n_slots=2, n_pages=16,
    page_size=8, max_seq_len=64, compute_dtype=jnp.float32, decode_lag=2,
    step_channel=chan,
)
if pid == 0:
    r1 = sched.generate([1, 5, 9, 42], max_new_tokens=6, temperature=0.0)
    r2 = sched.generate([1, 7, 3], max_new_tokens=5, temperature=0.0,
                        session_id="sess")
    r3 = sched.generate([2, 17], max_new_tokens=4, temperature=0.0,
                        session_id="sess")
    print("PTOKENS1", ",".join(map(str, r1.token_ids)))
    print("PTOKENS2", ",".join(map(str, r2.token_ids)))
    print("PTOKENS3", ",".join(map(str, r3.token_ids)))
    chan.close()
else:
    sched.run_follower()
print(f"proc {pid} OK")
"""


def test_two_process_pp_pipeline(tmp_path):
    """The pp ring spans two processes: tick windows broadcast over the
    step channel; tokens (incl. a session resume) match the single-process
    flat scheduler (VERDICT r4 #5 — the reference's ring spans processes by
    construction, JlamaService.proto:85-87)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        step_port = s.getsockname()[1]
    outs = _launch_pair(tmp_path, PP_WORKER, extra_args=(step_port,))

    import jax.numpy as jnp

    from jlama_tpu.config import from_hf_config
    from jlama_tpu.models.init import init_params
    from jlama_tpu.runtime.scheduler import BatchScheduler

    cfg = from_hf_config({
        "model_type": "llama", "hidden_size": 64, "intermediate_size": 128,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "num_hidden_layers": 2, "rms_norm_eps": 1e-5, "vocab_size": 256,
        "max_position_embeddings": 64, "rope_theta": 10000.0,
        "bos_token_id": 1, "eos_token_id": 2, "hidden_act": "silu",
    })
    params = init_params(cfg, dtype=jnp.float32)
    sched = BatchScheduler(
        params, cfg, tokenizer=None, n_slots=2, n_pages=16, page_size=8,
        max_seq_len=64, compute_dtype=jnp.float32, decode_lag=2,
    )
    ref1 = sched.generate([1, 5, 9, 42], max_new_tokens=6, temperature=0.0)
    ref2 = sched.generate([1, 7, 3], max_new_tokens=5, temperature=0.0,
                          session_id="sess")
    ref3 = sched.generate([2, 17], max_new_tokens=4, temperature=0.0,
                          session_id="sess")
    got = {}
    for ln in outs[0].splitlines():
        if ln.startswith("PTOKENS"):
            k, v = ln.split(" ", 1)
            got[k] = v
    assert got["PTOKENS1"] == ",".join(map(str, ref1.token_ids)), outs[0][-1500:]
    assert got["PTOKENS2"] == ",".join(map(str, ref2.token_ids)), outs[0][-1500:]
    assert got["PTOKENS3"] == ",".join(map(str, ref3.token_ids)), outs[0][-1500:]
