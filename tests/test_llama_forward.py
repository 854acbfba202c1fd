"""Golden test: our llama forward vs transformers torch reference."""

import numpy as np
import pytest
import jax.numpy as jnp

from tests.helpers import make_tiny_llama

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tiny_llama")
    return make_tiny_llama(tmp)


def test_logits_match_transformers(tiny):
    model_dir, hf_model = tiny
    from jlama_tpu.models.loader import load_params
    from jlama_tpu.models.base import forward_logits

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)
    assert cfg.n_heads == 4 and cfg.n_layers == 2

    tokens = np.array([[1, 5, 9, 42, 7]], dtype=np.int32)
    positions = np.arange(5, dtype=np.int32)[None, :]

    with torch.no_grad():
        ref = hf_model(torch.tensor(tokens, dtype=torch.long)).logits.numpy()

    logits, _ = forward_logits(
        params, cfg, jnp.asarray(tokens), jnp.asarray(positions), dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_kv_cache_decode_matches_full_forward(tiny):
    model_dir, _ = tiny
    from jlama_tpu.models.loader import load_params
    from jlama_tpu.models.base import forward_logits, KVCache

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)
    tokens = np.array([[1, 5, 9, 42, 7, 13]], dtype=np.int32)
    T = tokens.shape[1]
    positions = np.arange(T, dtype=np.int32)[None, :]

    # full forward, no cache
    full_logits, _ = forward_logits(
        params, cfg, jnp.asarray(tokens), jnp.asarray(positions), dtype=jnp.float32
    )

    # prefill 4 tokens then decode 2 with cache
    cache = KVCache.init(cfg, batch=1, max_len=16, dtype=jnp.float32)
    l1, cache = forward_logits(
        params, cfg, jnp.asarray(tokens[:, :4]),
        jnp.asarray(positions[:, :4]), cache, dtype=jnp.float32,
    )
    for t in range(4, 6):
        lt, cache = forward_logits(
            params, cfg, jnp.asarray(tokens[:, t : t + 1]),
            jnp.asarray(positions[:, t : t + 1]), cache, dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(lt[:, 0]), np.asarray(full_logits[:, t]), rtol=2e-3, atol=2e-3
        )
    np.testing.assert_allclose(
        np.asarray(l1[:, -1]), np.asarray(full_logits[:, 3]), rtol=2e-3, atol=2e-3
    )


def test_batch_padding_invariance(tiny):
    """Rows with different lengths/positions must not affect each other."""
    model_dir, _ = tiny
    from jlama_tpu.models.loader import load_params
    from jlama_tpu.models.base import forward_logits, KVCache

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)

    cache = KVCache.init(cfg, batch=2, max_len=8, dtype=jnp.float32)
    toks = jnp.asarray(np.array([[1, 5, 9], [1, 7, 0]], dtype=np.int32))
    pos = jnp.asarray(np.array([[0, 1, 2], [0, 1, 2]], dtype=np.int32))
    l2, _ = forward_logits(params, cfg, toks, pos, cache, dtype=jnp.float32)

    cache1 = KVCache.init(cfg, batch=1, max_len=8, dtype=jnp.float32)
    l1, _ = forward_logits(
        params, cfg, toks[:1], pos[:1], cache1, dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(l2[0]), np.asarray(l1[0]), rtol=1e-4, atol=1e-4)


def test_partial_load_roles(tiny):
    """InferenceType-style partial loading (layer range / no head / no embed)."""
    model_dir, _ = tiny
    from jlama_tpu.models.loader import load_params

    mid, cfg = load_params(model_dir, float_dtype=jnp.float32,
                           layer_range=(1, 2), include_embeddings=False,
                           include_head=False)
    assert "embed" not in mid and "lm_head" not in mid
    assert "final_norm.weight" not in mid
    assert mid["layers"]["wq"].shape[0] == 1

    head_only, _ = load_params(model_dir, float_dtype=jnp.float32,
                               layer_range=(0, 0))
    assert "embed" in head_only
    assert head_only["layers"] == {}

    # partial layers match the full model's corresponding slice
    full, _ = load_params(model_dir, float_dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(mid["layers"]["wq"][0]), np.asarray(full["layers"]["wq"][1])
    )


def test_fused_qkv_w13_matches_unfused(tiny):
    model_dir, _ = tiny
    from jlama_tpu.models.loader import load_params
    from jlama_tpu.models.base import forward_logits, fuse_params

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)
    tokens = np.array([[1, 5, 9, 42, 7]], dtype=np.int32)
    positions = np.arange(5, dtype=np.int32)[None, :]

    base, _ = forward_logits(
        params, cfg, jnp.asarray(tokens), jnp.asarray(positions), dtype=jnp.float32
    )
    fused = fuse_params(params)
    assert "wqkv" in fused["layers"] and "w13" in fused["layers"]
    assert "wq" not in fused["layers"] and "w1" not in fused["layers"]
    got, _ = forward_logits(
        fused, cfg, jnp.asarray(tokens), jnp.asarray(positions), dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), rtol=1e-5, atol=1e-5)


def test_fused_quantized_matches_unfused(tiny):
    model_dir, _ = tiny
    import jax
    from jlama_tpu.models.loader import load_params
    from jlama_tpu.models.base import forward_logits, fuse_params
    from jlama_tpu.nn.qarray import QArray, quantize_q4

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)

    def q(leaf):
        return quantize_q4(np.asarray(leaf))

    layers = {
        k: (q(v) if k in ("wq", "wk", "wv", "wo", "w1", "w2", "w3") else v)
        for k, v in params["layers"].items()
    }
    qparams = dict(params, layers=layers)
    tokens = np.array([[1, 5, 9, 42, 7]], dtype=np.int32)
    positions = np.arange(5, dtype=np.int32)[None, :]
    base, _ = forward_logits(
        qparams, cfg, jnp.asarray(tokens), jnp.asarray(positions), dtype=jnp.float32
    )
    fused = fuse_params(qparams)
    assert isinstance(fused["layers"]["wqkv"], QArray)
    got, _ = forward_logits(
        fused, cfg, jnp.asarray(tokens), jnp.asarray(positions), dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), rtol=1e-5, atol=1e-5)
