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
