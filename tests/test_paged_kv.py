"""Paged KV cache: equivalence with the dense cache path."""

import numpy as np
import pytest
import jax.numpy as jnp

from tests.helpers import make_tiny_llama

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tiny_llama_paged")
    model_dir, _ = make_tiny_llama(tmp)
    from jlama_tpu.models.loader import load_params

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)
    return params, cfg


def test_paged_matches_dense(tiny):
    params, cfg = tiny
    from jlama_tpu.models.base import forward_logits, KVCache
    from jlama_tpu.kv.paged import PagedKVCache

    tokens = np.array([[1, 5, 9, 42, 7, 13]], dtype=np.int32)
    T = tokens.shape[1]
    pos = np.arange(T, dtype=np.int32)[None, :]

    dense = KVCache.init(cfg, 1, 16, jnp.float32)
    dlog, dense = forward_logits(
        params, cfg, jnp.asarray(tokens[:, :4]), jnp.asarray(pos[:, :4]), dense,
        dtype=jnp.float32,
    )

    paged = PagedKVCache(cfg, n_pages=8, page_size=4, max_pages_per_seq=4,
                         dtype=jnp.float32)
    paged.alloc.ensure_capacity("s1", 4, 4)
    pt = jnp.asarray(paged.page_table(["s1"]))
    plog, pstate = forward_logits(
        params, cfg, jnp.asarray(tokens[:, :4]), jnp.asarray(pos[:, :4]),
        (paged.state, pt), dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(plog), np.asarray(dlog), rtol=1e-4, atol=1e-4
    )
    paged.state = pstate[0]

    # decode two more tokens, crossing a page boundary (page_size=4)
    for t in range(4, 6):
        dl, dense = forward_logits(
            params, cfg, jnp.asarray(tokens[:, t:t+1]), jnp.asarray(pos[:, t:t+1]),
            dense, dtype=jnp.float32,
        )
        paged.alloc.ensure_capacity("s1", t + 1, 4)
        pt = jnp.asarray(paged.page_table(["s1"]))
        plg, pstate = forward_logits(
            params, cfg, jnp.asarray(tokens[:, t:t+1]), jnp.asarray(pos[:, t:t+1]),
            (paged.state, pt), dtype=jnp.float32,
        )
        paged.state = pstate[0]
        np.testing.assert_allclose(
            np.asarray(plg), np.asarray(dl), rtol=1e-4, atol=1e-4
        )


def test_paged_batch_isolation(tiny):
    """Two sequences with separate page tables must not interfere."""
    params, cfg = tiny
    from jlama_tpu.models.base import forward_logits
    from jlama_tpu.kv.paged import PagedKVCache

    paged = PagedKVCache(cfg, n_pages=16, page_size=4, max_pages_per_seq=4,
                         dtype=jnp.float32)
    paged.alloc.ensure_capacity("a", 3, 4)
    paged.alloc.ensure_capacity("b", 3, 4)
    toks = jnp.asarray(np.array([[1, 5, 9], [1, 7, 30]], dtype=np.int32))
    pos = jnp.asarray(np.array([[0, 1, 2], [0, 1, 2]], dtype=np.int32))
    pt = jnp.asarray(paged.page_table(["a", "b"]))
    l2, pstate = forward_logits(
        params, cfg, toks, pos, (paged.state, pt), dtype=jnp.float32
    )

    single = PagedKVCache(cfg, n_pages=16, page_size=4, max_pages_per_seq=4,
                          dtype=jnp.float32)
    single.alloc.ensure_capacity("a", 3, 4)
    pt1 = jnp.asarray(single.page_table(["a"]))
    l1, _ = forward_logits(
        params, cfg, toks[:1], pos[:1], (single.state, pt1), dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(l2[0]), np.asarray(l1[0]),
                               rtol=1e-4, atol=1e-4)


def test_allocator_reuse():
    from jlama_tpu.kv.paged import PageAllocator

    a = PageAllocator(8)
    assert a.n_free == 7  # page 0 reserved
    p1 = a.ensure_capacity("x", 10, 4)  # 3 pages
    assert len(p1) == 3
    a.release("x")
    assert a.n_free == 7
    p2 = a.ensure_capacity("y", 4, 4)
    assert len(p2) == 1
    with pytest.raises(MemoryError):
        a.ensure_capacity("z", 1000, 4)


@pytest.fixture(scope="module")
def tiny_hd32(tmp_path_factory):
    """head_size 32 so the q8 KV cache's block-32 quantization axis fits."""
    tmp = tmp_path_factory.mktemp("tiny_llama_hd32")
    model_dir, _ = make_tiny_llama(
        tmp, config_overrides={"hidden_size": 128, "num_attention_heads": 4,
                               "num_key_value_heads": 2}
    )
    from jlama_tpu.models.loader import load_params

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)
    assert cfg.head_size == 32
    return params, cfg


def test_q8_kv_pool_matches_bf16_within_tolerance(tiny_hd32):
    """Quantized KV pages (--kv-dtype q8) stay close to the float path
    (cf. reference cache-dtype writes, CausalSelfAttention.java:212-229)."""
    params, cfg = tiny_hd32
    from jlama_tpu.models.base import forward_logits
    from jlama_tpu.kv.paged import PagedKVCache
    from jlama_tpu.nn.qarray import QArray

    toks = np.array([[1, 5, 9, 42, 7, 13, 2, 8]], dtype=np.int32)
    pos = np.arange(8, dtype=np.int32)[None, :]

    ref = PagedKVCache(cfg, n_pages=8, page_size=4, max_pages_per_seq=4,
                       dtype=jnp.float32)
    ref.alloc.ensure_capacity("s", 8, 4)
    pt = jnp.asarray(ref.page_table(["s"]))
    rlog, _ = forward_logits(
        params, cfg, jnp.asarray(toks), jnp.asarray(pos), (ref.state, pt),
        dtype=jnp.float32,
    )

    q8 = PagedKVCache(cfg, n_pages=8, page_size=4, max_pages_per_seq=4,
                      dtype="q8")
    assert isinstance(q8.state.k_pool, QArray)
    # q8 pool HBM bytes = half of a bf16 pool of the same token capacity
    bf16 = PagedKVCache(cfg, n_pages=8, page_size=4, max_pages_per_seq=4)
    q8_bytes = q8.state.k_pool.data.nbytes + q8.state.k_pool.scales.nbytes
    assert q8_bytes < bf16.state.k_pool.nbytes * 0.6 + 1
    q8.alloc.ensure_capacity("s", 8, 4)
    pt = jnp.asarray(q8.page_table(["s"]))
    qlog, qstate = forward_logits(
        params, cfg, jnp.asarray(toks), jnp.asarray(pos), (q8.state, pt),
        dtype=jnp.float32,
    )
    assert isinstance(qstate[0].k_pool, QArray)
    r = np.asarray(rlog)
    q = np.asarray(qlog)
    assert np.max(np.abs(r - q)) / (np.max(np.abs(r)) + 1e-9) < 0.02


def test_q8_kv_decode_steps(tiny_hd32):
    """q8 pool through prefill + per-token decode keeps argmax agreement."""
    params, cfg = tiny_hd32
    from jlama_tpu.models.base import forward_logits
    from jlama_tpu.kv.paged import PagedKVCache

    toks = np.array([[1, 5, 9, 42, 7, 13]], dtype=np.int32)
    pos = np.arange(6, dtype=np.int32)[None, :]

    outs = {}
    for name, dt in (("f32", jnp.float32), ("q8", "q8")):
        c = PagedKVCache(cfg, n_pages=8, page_size=4, max_pages_per_seq=4,
                         dtype=dt)
        c.alloc.ensure_capacity("s", 4, 4)
        pt = jnp.asarray(c.page_table(["s"]))
        _, st = forward_logits(
            params, cfg, jnp.asarray(toks[:, :4]), jnp.asarray(pos[:, :4]),
            (c.state, pt), dtype=jnp.float32,
        )
        c.state = st[0]
        logs = []
        for t in range(4, 6):
            c.alloc.ensure_capacity("s", t + 1, 4)
            pt = jnp.asarray(c.page_table(["s"]))
            lg, st = forward_logits(
                params, cfg, jnp.asarray(toks[:, t:t+1]),
                jnp.asarray(pos[:, t:t+1]), (c.state, pt), dtype=jnp.float32,
            )
            c.state = st[0]
            logs.append(np.asarray(lg)[0, -1])
        outs[name] = logs
    for a, b in zip(outs["f32"], outs["q8"]):
        assert np.argmax(a) == np.argmax(b)
        assert np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9) < 0.02
