"""Microbatched pipeline parallelism: equivalence with the plain forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.helpers import make_tiny_llama

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tiny_llama_pipe")
    model_dir, _ = make_tiny_llama(tmp, {"num_hidden_layers": 4})
    from jlama_tpu.models.loader import load_params

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)
    return params, cfg


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (2, 4), (4, 2)])
def test_pipelined_forward_matches(tiny, pp, n_micro):
    params, cfg = tiny
    from jlama_tpu.models.base import forward_hidden
    from jlama_tpu.parallel.mesh import make_mesh
    from jlama_tpu.parallel.pipeline import make_pipelined_forward

    B, T = n_micro * 2, 6
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 256, (B, T)), dtype=jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))

    ref, _ = forward_hidden(params, cfg, tokens, positions, None,
                            dtype=jnp.float32)

    mesh = make_mesh(jax.devices()[:pp], dp=1, pp=pp, tp=1)
    fwd = make_pipelined_forward(cfg, mesh, n_microbatches=n_micro)
    with mesh:
        got = fwd(params, tokens, positions, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("pp,tp", [(2, 1), (2, 2), (4, 1)])
def test_pipelined_decode_matches_single_device(tiny, pp, tp):
    """Pipelined decode with per-stage KV (Worker.java ring parity) produces
    the same greedy tokens as an unsharded decode loop."""
    params, cfg = tiny
    from jlama_tpu.models.base import KVCache, forward_logits
    from jlama_tpu.parallel.mesh import make_mesh, shard_params
    from jlama_tpu.parallel.pipeline import make_pipelined_decode

    rng = np.random.default_rng(1)
    S = 32
    n_steps = 8
    prompts = [[1, 7, 23], [2, 11, 5, 9]]  # one prompt per microbatch (b=1)
    M = pp
    while len(prompts) < M:
        prompts.append(list(rng.integers(1, 200, 3)))
    prompts = prompts[:M]

    # reference: single-device greedy decode per sequence
    refs = []
    for p in prompts:
        cache = KVCache.init(cfg, batch=1, max_len=S, dtype=jnp.float32)
        toks = list(p)
        out = []
        for i in range(len(p) + n_steps - 1):
            t = jnp.asarray([[toks[i]]], jnp.int32)
            pos = jnp.asarray([[i]], jnp.int32)
            logits, cache = forward_logits(
                params, cfg, t, pos, cache, dtype=jnp.float32
            )
            if i >= len(p) - 1:
                nxt = int(jnp.argmax(logits[0, -1]))
                out.append(nxt)
                if len(toks) <= i + 1:
                    toks.append(nxt)
        refs.append(out[:n_steps])

    mesh = make_mesh(jax.devices()[: pp * tp], dp=1, pp=pp, tp=tp)
    with mesh:
        sp = shard_params(params, cfg, mesh)
        tick, M2 = make_pipelined_decode(cfg, mesh)
        assert M2 == M
        b = 1
        D = cfg.embedding_length
        k = jnp.zeros((cfg.n_layers, M * b, cfg.n_kv_heads, S, cfg.head_size),
                      jnp.float32)
        v = jnp.zeros_like(k)
        inflight = jnp.zeros((pp, b, 1, D), jnp.float32)
        # per-microbatch token feeds: prompt first, then greedy continuations
        feeds = [list(p) for p in prompts]
        outs = [[] for _ in range(M)]
        fed = [0] * M
        tokens = np.zeros((M, b), np.int32)
        positions = np.zeros((M, b), np.int32)
        for mb in range(M):
            tokens[mb, 0] = feeds[mb][0]
            fed[mb] = 1
        total_ticks = M * (max(len(p) for p in prompts) + n_steps + pp)
        for t in range(total_ticks):
            mb_in = t % M
            k, v, inflight, logits = tick(
                sp, k, v, inflight, jnp.asarray(tokens),
                jnp.asarray(positions), jnp.asarray(t, jnp.int32),
            )
            mb_done = (t - pp + 1) % M
            if t >= pp - 1:
                nxt = int(np.argmax(np.asarray(logits)[0]))
                # the emitted token continues mb_done's sequence
                if fed[mb_done] >= len(feeds[mb_done]) and len(outs[mb_done]) < n_steps:
                    outs[mb_done].append(nxt)
                    feeds[mb_done].append(nxt)
                # feed mb_done its next token at its upcoming entry tick
                if fed[mb_done] < len(feeds[mb_done]):
                    tokens[mb_done, 0] = feeds[mb_done][fed[mb_done]]
                    positions[mb_done, 0] = fed[mb_done]
                    fed[mb_done] += 1
            if all(len(o) >= n_steps for o in outs):
                break
    for mb in range(M):
        assert outs[mb][:n_steps] == refs[mb], (mb, outs[mb], refs[mb])
