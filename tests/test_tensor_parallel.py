"""Tensor-parallel inference on the virtual 8-device CPU mesh.

The reference's DistributedServiceTest pattern (multi-"node" on one host,
SURVEY.md §4) — here the mesh replaces the gRPC cluster entirely.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.helpers import make_tiny_llama

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tiny_llama_tp")
    model_dir, _ = make_tiny_llama(tmp)
    from jlama_tpu.models.loader import load_params

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)
    return params, cfg


def test_tp_decode_matches_single_device(tiny):
    params, cfg = tiny
    from jlama_tpu.runtime.engine import Engine
    from jlama_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"

    ref_eng = Engine(params, cfg, max_seq_len=64, kv_dtype=jnp.float32,
                     compute_dtype=jnp.float32)
    ref = ref_eng.generate_tokens([1, 5, 9, 42, 7], max_new_tokens=8,
                                  temperature=0.0)

    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    tp_eng = Engine(params, cfg, max_seq_len=64, kv_dtype=jnp.float32,
                    compute_dtype=jnp.float32, mesh=mesh)
    got = tp_eng.generate_tokens([1, 5, 9, 42, 7], max_new_tokens=8,
                                 temperature=0.0)
    assert got.token_ids == ref.token_ids


def test_tp_dp_mesh_decode(tiny):
    params, cfg = tiny
    from jlama_tpu.runtime.engine import Engine
    from jlama_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:4], dp=1, pp=2, tp=2)
    eng = Engine(params, cfg, max_seq_len=64, kv_dtype=jnp.float32,
                 compute_dtype=jnp.float32, mesh=mesh)
    resp = eng.generate_tokens([1, 5, 9], max_new_tokens=5, temperature=0.0)

    ref_eng = Engine(params, cfg, max_seq_len=64, kv_dtype=jnp.float32,
                     compute_dtype=jnp.float32)
    ref = ref_eng.generate_tokens([1, 5, 9], max_new_tokens=5, temperature=0.0)
    assert resp.token_ids == ref.token_ids


def test_quantized_tp_sharding(tiny):
    """QArray weights shard consistently (scales follow data)."""
    params, cfg = tiny
    from jlama_tpu.nn.qarray import quantize_q4
    from jlama_tpu.parallel.mesh import make_mesh, shard_params
    from jlama_tpu.models.base import forward_logits

    qlayers = {}
    for k, v in params["layers"].items():
        if k in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
            qlayers[k] = quantize_q4(np.asarray(v, dtype=np.float32))
        else:
            qlayers[k] = v
    qparams = dict(params)
    qparams["layers"] = qlayers

    toks = jnp.asarray(np.array([[1, 5, 9, 42]], dtype=np.int32))
    pos = jnp.asarray(np.arange(4, dtype=np.int32)[None, :])
    ref, _ = forward_logits(qparams, cfg, toks, pos, dtype=jnp.float32)

    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    with mesh:
        sq = shard_params(qparams, cfg, mesh)
        got, _ = forward_logits(sq, cfg, toks, pos, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_scheduler_with_mesh(tiny):
    """Continuous batching over a TP mesh matches unsharded scheduling."""
    params, cfg = tiny
    from jlama_tpu.runtime.scheduler import BatchScheduler
    from jlama_tpu.parallel.mesh import make_mesh, shard_params

    plain = BatchScheduler(params, cfg, n_slots=2, n_pages=32, page_size=8,
                           max_seq_len=48, kv_dtype=jnp.float32,
                           compute_dtype=jnp.float32)
    ref = plain.generate([1, 5, 9, 42], max_new_tokens=6, temperature=0.0)

    mesh = make_mesh(jax.devices()[:2], dp=1, pp=1, tp=2)
    sp = shard_params(params, cfg, mesh)
    tp = BatchScheduler(sp, cfg, n_slots=2, n_pages=32, page_size=8,
                        max_seq_len=48, kv_dtype=jnp.float32,
                        compute_dtype=jnp.float32, mesh=mesh)
    got = tp.generate([1, 5, 9, 42], max_new_tokens=6, temperature=0.0)
    assert got.token_ids == ref.token_ids
