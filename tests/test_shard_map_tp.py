"""shard_map tensor-parallel forward (VERDICT r4 #1).

Under a tp mesh the scheduler's forward runs inside jax.shard_map, so each
device's kernels see only their local weight/KV shard (the reference worker
computes only its head/hidden segment, net/Worker.java:202-219). These tests
assert BOTH token parity with the unsharded scheduler AND that the traced
per-device operand shapes really are 1/tp of the global weights.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.helpers import make_tiny_llama

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tiny_llama_sm")
    model_dir, _ = make_tiny_llama(tmp)
    from jlama_tpu.models.loader import load_params

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)
    return params, cfg


def _quantize_layers(params):
    from jlama_tpu.nn.qarray import quantize_q4

    qlayers = {}
    for k, v in params["layers"].items():
        if k in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
            qlayers[k] = quantize_q4(np.asarray(v, dtype=np.float32))
        else:
            qlayers[k] = v
    out = dict(params)
    out["layers"] = qlayers
    return out


def _mk_sched(params, cfg, mesh=None, **kw):
    from jlama_tpu.runtime.scheduler import BatchScheduler
    from jlama_tpu.parallel.mesh import shard_params

    if mesh is not None:
        params = shard_params(params, cfg, mesh)
    kw.setdefault("kv_dtype", jnp.float32)
    kw.setdefault("n_slots", 2)
    return BatchScheduler(
        params, cfg, n_pages=32, page_size=8, max_seq_len=48,
        compute_dtype=jnp.float32, mesh=mesh, **kw
    )


def test_shard_map_active_and_parity_float(tiny):
    params, cfg = tiny
    from jlama_tpu.parallel.mesh import make_mesh
    from jlama_tpu.parallel import tp_forward

    ref = _mk_sched(params, cfg).generate(
        [1, 5, 9, 42], max_new_tokens=6, temperature=0.0
    )

    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    sched = _mk_sched(params, cfg, mesh=mesh)
    assert sched._sm is not None, "shard_map path should engage on a tp mesh"
    got = sched.generate([1, 5, 9, 42], max_new_tokens=6, temperature=0.0)
    assert got.token_ids == ref.token_ids

    # traced per-device shapes: fused qkv rows and wo input cols are 1/tp
    shapes = tp_forward.TRACE_SHAPES
    qdim = cfg.n_heads * cfg.head_size
    kvdim = cfg.n_kv_heads * cfg.head_size
    assert shapes["wqkv"][-2] == (qdim + 2 * kvdim) // 2
    assert shapes["wo"][-1] == qdim // 2
    assert shapes["w13"][-2] == 2 * cfg.hidden_length // 2
    assert shapes["w2"][-1] == cfg.hidden_length // 2
    # vocab-sharded embedding/lm_head
    assert shapes["embed"][0] == cfg.vocab_size // 2
    assert shapes["lm_head"][0] == cfg.vocab_size // 2


def test_shard_map_q4k_kernel_parity(tiny, monkeypatch):
    """The q4k Pallas kernel runs per-shard inside shard_map (interpret mode
    on CPU) and matches the same kernel unsharded token-for-token."""
    monkeypatch.setenv("JLAMA_PALLAS_INTERPRET", "1")
    params, cfg = tiny
    qparams = _quantize_layers(params)
    from jlama_tpu.parallel.mesh import make_mesh
    from jlama_tpu.parallel import tp_forward

    ref = _mk_sched(qparams, cfg, weight_format="q4k").generate(
        [1, 5, 9, 42, 3], max_new_tokens=6, temperature=0.0
    )

    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    sched = _mk_sched(qparams, cfg, mesh=mesh, weight_format="q4k")
    assert sched._sm is not None
    got = sched.generate([1, 5, 9, 42, 3], max_new_tokens=6, temperature=0.0)
    assert got.token_ids == ref.token_ids

    # the packed q4k payload the kernel streams is row-sharded: weight bytes
    # per chip are exactly half the global packed bytes
    shapes = tp_forward.TRACE_SHAPES
    qdim = cfg.n_heads * cfg.head_size
    kvdim = cfg.n_kv_heads * cfg.head_size
    assert shapes["wqkv"] == (
        cfg.n_layers, (qdim + 2 * kvdim) // 2, cfg.embedding_length // 2
    )
    assert shapes["wo"] == (
        cfg.n_layers, cfg.embedding_length, qdim // 2 // 2
    )


def test_shard_map_q8_kv_paged_kernel(tiny, monkeypatch):
    """q8 KV pool + the in-tree paged decode kernel under shard_map: the
    pool's KV-head axis is tp-sharded and parity holds."""
    monkeypatch.setenv("JLAMA_PALLAS_INTERPRET", "1")
    params, cfg = tiny
    from jlama_tpu.parallel.mesh import make_mesh

    ref = _mk_sched(params, cfg, kv_dtype="q8").generate(
        [1, 5, 9, 42], max_new_tokens=6, temperature=0.0
    )
    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    sched = _mk_sched(params, cfg, mesh=mesh, kv_dtype="q8")
    assert sched._sm is not None
    got = sched.generate([1, 5, 9, 42], max_new_tokens=6, temperature=0.0)
    assert got.token_ids == ref.token_ids


def test_shard_map_sampling_and_sessions(tiny):
    """Seeded sampling + session resume run identically through shard_map."""
    params, cfg = tiny
    from jlama_tpu.parallel.mesh import make_mesh

    def run(mesh):
        s = _mk_sched(params, cfg, mesh=mesh)
        r1 = s.generate([1, 5, 9], max_new_tokens=4, temperature=0.8,
                        seed=7, session_id="sess")
        r2 = s.generate([42, 3], max_new_tokens=4, temperature=0.8,
                        seed=11, session_id="sess")
        return r1.token_ids, r2.token_ids

    ref = run(None)
    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    assert run(mesh) == ref


def test_shard_map_env_off(tiny, monkeypatch):
    monkeypatch.setenv("JLAMA_SHARD_MAP", "0")
    params, cfg = tiny
    from jlama_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    sched = _mk_sched(params, cfg, mesh=mesh)
    assert sched._sm is None  # GSPMD fallback
    ref = _mk_sched(params, cfg).generate(
        [1, 5, 9, 42], max_new_tokens=4, temperature=0.0
    )
    got = sched.generate([1, 5, 9, 42], max_new_tokens=4, temperature=0.0)
    assert got.token_ids == ref.token_ids


def test_outside_consumer_of_shard_map_tree(tiny, monkeypatch):
    """A non-shard_map consumer (the shared embed/classify Engine, cli.py
    serve) computes correctly on the scheduler's interleave-fused +
    chunk-repacked q4k tree via the cfg.fused_tp marker."""
    monkeypatch.setenv("JLAMA_PALLAS_INTERPRET", "1")
    params, cfg = tiny
    qparams = _quantize_layers(params)
    from jlama_tpu.parallel.mesh import make_mesh
    from jlama_tpu.models.base import forward_logits

    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    sched = _mk_sched(qparams, cfg, mesh=mesh, weight_format="q4k")
    assert sched.cfg.fused_tp == 2

    plain = _mk_sched(qparams, cfg, weight_format="q4k")
    toks = jnp.asarray(np.array([[1, 5, 9, 42]], dtype=np.int32))
    pos = jnp.asarray(np.arange(4, dtype=np.int32)[None, :])
    ref, _ = forward_logits(
        plain.params, plain.cfg, toks, pos, dtype=jnp.float32
    )
    got, _ = forward_logits(
        sched.params, sched.cfg, toks, pos, dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_dp_sharded_batch_parity(tiny):
    """dp>1: batch slots and the KV page pool shard over the dp axis —
    each dp shard decodes only its own rows/pages (capability the reference
    lacks entirely, SURVEY §2.6 'DP — NO'). Token parity with dp=1."""
    params, cfg = tiny
    from jlama_tpu.parallel.mesh import make_mesh
    from jlama_tpu.parallel import tp_forward
    from jlama_tpu.runtime.scheduler import GenRequest

    def run(mesh, n_slots=4):
        s = _mk_sched(params, cfg, mesh=mesh, n_slots=n_slots)
        reqs = [
            GenRequest(prompt_ids=[1 + i, 5, 9 + i], max_new_tokens=5,
                       temperature=0.0)
            for i in range(4)
        ]
        for r in reqs:
            s.submit(r)
        while any(r.state.value != "DONE" for r in reqs):
            s.step()
        return [r.out_ids for r in reqs], s

    ref, _ = run(None)
    mesh = make_mesh(jax.devices()[:2], dp=2, pp=1, tp=1)
    got, sched = run(mesh)
    assert sched._sm is not None and sched._sm.dp_axis == "dp"
    assert got == ref
    # each dp shard ran half the batch against half the page pool
    assert tp_forward.TRACE_SHAPES["__rows__"] == 2
    assert tp_forward.TRACE_SHAPES["__pool__"][2] == sched.kv.n_pages // 2


def test_dp_tp_combined_q4k(tiny, monkeypatch):
    """dp=2 x tp=2 on 4 devices with q4k kernel weights: rows AND weights
    both sharded; parity with the unsharded scheduler."""
    monkeypatch.setenv("JLAMA_PALLAS_INTERPRET", "1")
    params, cfg = tiny
    qparams = _quantize_layers(params)
    from jlama_tpu.parallel.mesh import make_mesh
    from jlama_tpu.parallel import tp_forward

    ref_s = _mk_sched(qparams, cfg, weight_format="q4k", n_slots=4)
    ref = [
        ref_s.generate([1, 5, 9 + i], max_new_tokens=4, temperature=0.0).token_ids
        for i in range(2)
    ]
    mesh = make_mesh(jax.devices()[:4], dp=2, pp=1, tp=2)
    s = _mk_sched(qparams, cfg, mesh=mesh, weight_format="q4k", n_slots=4)
    assert s._sm is not None and s._sm.dp_axis == "dp"
    got = [
        s.generate([1, 5, 9 + i], max_new_tokens=4, temperature=0.0).token_ids
        for i in range(2)
    ]
    assert got == ref
    assert tp_forward.TRACE_SHAPES["__rows__"] == 2  # 4 slots / dp=2
    assert tp_forward.TRACE_SHAPES["__pool__"][1] == cfg.n_kv_heads // 2


def test_dp_sessions_pinned_to_group(tiny):
    """A session's pages live in one dp group; resumed requests land on a
    slot of that group and continue correctly."""
    params, cfg = tiny
    from jlama_tpu.parallel.mesh import make_mesh

    def run(mesh):
        s = _mk_sched(params, cfg, mesh=mesh, n_slots=4)
        r1 = s.generate([1, 5, 9], max_new_tokens=3, temperature=0.0,
                        session_id="s1")
        r2 = s.generate([2, 6], max_new_tokens=3, temperature=0.0,
                        session_id="s2")
        # resume both sessions
        r3 = s.generate([7], max_new_tokens=3, temperature=0.0,
                        session_id="s1")
        r4 = s.generate([8], max_new_tokens=3, temperature=0.0,
                        session_id="s2")
        return [r.token_ids for r in (r1, r2, r3, r4)]

    ref = run(None)
    mesh = make_mesh(jax.devices()[:2], dp=2, pp=1, tp=1)
    assert run(mesh) == ref


def test_pre_permuted_q4k_refuses_shard_map(tiny, monkeypatch):
    """Weights already in the GLOBAL q4k permutation (e.g. pre-repacked
    outside the scheduler) must NOT take the shard_map path — a tp block
    slice of the global column permutation would contract mismatched
    features. The scheduler falls back to GSPMD and stays correct."""
    monkeypatch.setenv("JLAMA_PALLAS_INTERPRET", "1")
    params, cfg = tiny
    qparams = _quantize_layers(params)
    from jlama_tpu.ops.pallas_q4 import prepare_params_for_pallas
    from jlama_tpu.parallel.mesh import make_mesh

    pre = prepare_params_for_pallas(qparams)  # GLOBAL kernel layout
    ref = _mk_sched(pre, cfg).generate(
        [1, 5, 9, 42], max_new_tokens=5, temperature=0.0
    )
    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    sched = _mk_sched(pre, cfg, mesh=mesh)
    assert sched._sm is None, "pre-permuted q4k must use the GSPMD fallback"
    got = sched.generate([1, 5, 9, 42], max_new_tokens=5, temperature=0.0)
    assert got.token_ids == ref.token_ids


def test_interleaved_fuse_matches_plain_globally(tiny):
    """tp-interleaved fusion is a pure row permutation: dequantized global
    weights contain the same rows, and per-shard block i equals
    [wq_i; wk_i; wv_i]."""
    params, cfg = tiny
    from jlama_tpu.models.base import fuse_params

    tp = 2
    plain = fuse_params(params)["layers"]["wqkv"]
    inter = fuse_params(params, tp=tp)["layers"]["wqkv"]
    wq, wk, wv = (params["layers"][k] for k in ("wq", "wk", "wv"))
    rows = inter.shape[-2]
    blk = rows // tp
    for i in range(tp):
        local = np.asarray(inter)[:, i * blk : (i + 1) * blk]
        expect = np.concatenate(
            [
                np.asarray(w)[
                    :, i * (w.shape[-2] // tp) : (i + 1) * (w.shape[-2] // tp)
                ]
                for w in (wq, wk, wv)
            ],
            axis=-2,
        )
        np.testing.assert_array_equal(local, expect)
    # same multiset of rows overall
    np.testing.assert_array_equal(
        np.sort(np.asarray(plain).reshape(-1, plain.shape[-1]), axis=0),
        np.sort(np.asarray(inter).reshape(-1, inter.shape[-1]), axis=0),
    )


def _tiny_mixtral():
    from jlama_tpu.config import from_hf_config
    from jlama_tpu.models.init import init_params

    cfg = from_hf_config(
        {
            "model_type": "mixtral", "hidden_size": 64,
            "intermediate_size": 128, "num_attention_heads": 4,
            "num_key_value_heads": 2, "num_hidden_layers": 2,
            "rms_norm_eps": 1e-5, "vocab_size": 256,
            "max_position_embeddings": 128, "rope_theta": 10000.0,
            "bos_token_id": 1, "eos_token_id": 2, "hidden_act": "silu",
            "num_local_experts": 4, "num_experts_per_tok": 2,
        }
    )
    return init_params(cfg, dtype=jnp.float32), cfg


def test_moe_expert_parallel_shard_map(tiny):
    """MoE under shard_map: experts shard over tp (EP), routing stays
    global, local contributions psum — dedicated EP the reference lacks
    (SURVEY §2.6 'EP — NO'). Token parity with the unsharded scheduler
    through prefill (ragged) and decode."""
    params, cfg = _tiny_mixtral()
    from jlama_tpu.parallel.mesh import make_mesh
    from jlama_tpu.parallel import tp_forward

    ref = _mk_sched(params, cfg).generate(
        [1, 5, 9, 42, 7], max_new_tokens=6, temperature=0.0
    )
    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    sched = _mk_sched(params, cfg, mesh=mesh)
    assert sched._sm is not None, "EP shard_map should engage for MoE"
    got = sched.generate([1, 5, 9, 42, 7], max_new_tokens=6, temperature=0.0)
    assert got.token_ids == ref.token_ids
    # each device held half the expert stacks
    shapes = tp_forward.TRACE_SHAPES
    key = next(k for k in shapes if k.startswith("experts.w1"))
    assert shapes[key][1] == cfg.n_experts // 2, shapes[key]


def test_moe_ep_quantized_gathered(tiny, monkeypatch):
    """Quantized MoE experts under EP: the decode-sized gathered path
    computes only selections routed to the local expert range and psums."""
    monkeypatch.setenv("JLAMA_PALLAS_INTERPRET", "1")
    params, cfg = _tiny_mixtral()
    from jlama_tpu.nn.qarray import quantize_q4
    from jlama_tpu.parallel.mesh import make_mesh

    layers = dict(params["layers"])
    for k in ("experts.w1", "experts.w2", "experts.w3",
              "wq", "wk", "wv", "wo"):
        layers[k] = quantize_q4(np.asarray(layers[k], dtype=np.float32))
    qparams = dict(params)
    qparams["layers"] = layers

    ref = _mk_sched(qparams, cfg, moe_ragged=False).generate(
        [1, 5, 9], max_new_tokens=5, temperature=0.0
    )
    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    sched = _mk_sched(qparams, cfg, mesh=mesh, moe_ragged=False)
    assert sched._sm is not None
    got = sched.generate([1, 5, 9], max_new_tokens=5, temperature=0.0)
    assert got.token_ids == ref.token_ids
