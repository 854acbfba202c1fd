"""Pallas attention kernels vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jlama_tpu.nn.layers import attention_scores_mask, multi_head_attention
from jlama_tpu.ops.pallas_attention import flash_prefill, paged_decode


def ref_attention(q, k, v, pos0, scale, causal=True, softcap=None,
                  window=None, kv_len=None):
    """q [B,H,T,hd], k/v [B,n_kv,S,hd] -> [B,H,T,hd] via the XLA path."""
    B, H, T, hd = q.shape
    S = k.shape[2]
    positions = pos0[:, None] + jnp.arange(T)[None, :]
    mask = attention_scores_mask(positions, S, causal, window)
    if kv_len is not None:
        mask = mask & (jnp.arange(S)[None, None, :] < kv_len[:, None, None])
    out = multi_head_attention(
        q.transpose(0, 2, 1, 3), k, v, mask, scale, softcap
    )
    return out.transpose(0, 2, 1, 3)


@pytest.mark.parametrize("T,S,pos0_v", [(8, 16, 0), (8, 32, 10), (16, 16, 0)])
def test_flash_prefill_matches_xla(T, S, pos0_v):
    B, H, n_kv, hd = 2, 4, 2, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, T, hd), jnp.float32)
    k = jax.random.normal(kk, (B, n_kv, S, hd), jnp.float32)
    v = jax.random.normal(kv, (B, n_kv, S, hd), jnp.float32)
    pos0 = jnp.asarray([pos0_v, pos0_v + 3], jnp.int32)
    scale = hd**-0.5

    got = flash_prefill(q, k, v, pos0, scale, block_t=8, block_s=8,
                        interpret=True)
    ref = ref_attention(q, k, v, pos0, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_prefill_softcap_and_window():
    B, H, n_kv, hd, T, S = 1, 2, 1, 64, 8, 24
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, T, hd), jnp.float32)
    k = jax.random.normal(kk, (B, n_kv, S, hd), jnp.float32)
    v = jax.random.normal(kv, (B, n_kv, S, hd), jnp.float32)
    pos0 = jnp.asarray([12], jnp.int32)
    got = flash_prefill(q, k, v, pos0, 0.125, softcap=30.0, window=9,
                        block_t=8, block_s=8, interpret=True)
    ref = ref_attention(q, k, v, pos0, 0.125, softcap=30.0, window=9)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def _mk_pools(key, n_kv, n_pages, ps, hd, quantized):
    kk, kv = jax.random.split(key)
    k = jax.random.normal(kk, (n_kv, n_pages, ps, hd), jnp.float32)
    v = jax.random.normal(kv, (n_kv, n_pages, ps, hd), jnp.float32)
    if not quantized:
        return (k, v), (k, v)
    from jlama_tpu.quant.blockq import q8_quantize

    kq, ks = q8_quantize(k)
    vq, vs = q8_quantize(v)
    kd = (kq.reshape(n_kv, n_pages, ps, hd // 32, 32).astype(jnp.float32)
          * ks[..., None]).reshape(k.shape)
    vd = (vq.reshape(n_kv, n_pages, ps, hd // 32, 32).astype(jnp.float32)
          * vs[..., None]).reshape(v.shape)
    return ((kq, ks), (vq, vs)), (kd, vd)


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_decode_matches_xla(quantized):
    B, H, n_kv, hd = 2, 4, 2, 64
    ps, n_pages, P = 8, 9, 3
    key = jax.random.PRNGKey(2)
    kq, kp = jax.random.split(key)
    q = jax.random.normal(kq, (B, H, hd), jnp.float32)
    (k_pool, v_pool), (k_deq, v_deq) = _mk_pools(
        kp, n_kv, n_pages, ps, hd, quantized
    )
    page_tables = jnp.asarray([[1, 2, 3], [4, 5, 0]], jnp.int32)
    lengths = jnp.asarray([19, 12], jnp.int32)
    scale = hd**-0.5

    got = paged_decode(q, k_pool, v_pool, page_tables, lengths, scale,
                       interpret=True)

    # reference: gather each row's pages, mask positions >= length
    kg = k_deq[:, page_tables]  # [n_kv, B, P, ps, hd]
    vg = v_deq[:, page_tables]
    kg = kg.transpose(1, 0, 2, 3, 4).reshape(B, n_kv, P * ps, hd)
    vg = vg.transpose(1, 0, 2, 3, 4).reshape(B, n_kv, P * ps, hd)
    ref = ref_attention(
        q[:, :, None], kg, vg, lengths - 1, scale, causal=False,
        kv_len=lengths,
    )[:, :, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-3 if quantized else 2e-5,
                               atol=3e-3 if quantized else 2e-5)


def test_kernels_on_forward_path_interpret(monkeypatch):
    """Force the TPU kernel flags with Pallas interpret mode and check the
    full forward (flash prefill + q8 paged decode) against the XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    from jlama_tpu.config import from_hf_config
    from jlama_tpu.kv.paged import PagedKVCache
    from jlama_tpu.models.base import forward_logits
    from jlama_tpu.models.init import init_params
    from jlama_tpu.ops import flags

    cfg = from_hf_config(
        {
            "model_type": "llama",
            "hidden_size": 1024,
            "intermediate_size": 128,
            "num_attention_heads": 8,
            "num_key_value_heads": 2,
            "num_hidden_layers": 2,
            "rms_norm_eps": 1e-5,
            "vocab_size": 512,
            "max_position_embeddings": 64,
            "rope_theta": 10000.0,
            "hidden_act": "silu",
        }
    )
    assert cfg.head_size == 128
    params = init_params(cfg, dtype=jnp.float32)
    toks = jnp.asarray([[1, 5, 9, 42, 7, 3, 2, 8]], jnp.int32)
    pos = jnp.arange(8, dtype=jnp.int32)[None, :]
    dtok = jnp.asarray([[4]], jnp.int32)
    dpos = jnp.asarray([[8]], jnp.int32)

    def run():
        kv = PagedKVCache(cfg, n_pages=8, page_size=8, dtype="q8")
        kv.alloc.ensure_capacity("s", 16, 8)
        pt = jnp.asarray(kv.page_table(["s"]))
        _, cache = forward_logits(
            params, cfg, toks, pos, (kv.state, pt), dtype=jnp.float32
        )
        logits, _ = forward_logits(
            params, cfg, dtok, dpos, (cache[0], pt), dtype=jnp.float32
        )
        return np.asarray(logits[0, -1])

    monkeypatch.setattr(flags, "USE_FLASH_PREFILL", False)
    monkeypatch.setattr(flags, "USE_PAGED_ATTENTION_KERNEL", False)
    ref = run()

    monkeypatch.setattr(flags, "USE_FLASH_PREFILL", True)
    monkeypatch.setattr(flags, "USE_PAGED_ATTENTION_KERNEL", True)
    with pltpu.force_tpu_interpret_mode():
        got = run()
    # the kernel dequantizes q8 pages to bf16 before the MXU dots (the TPU
    # compute dtype); the XLA reference keeps f32 here
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_kv_write_dense1_matches_at_set():
    """In-place dense KV write kernel (ops/pallas_kv.py) == .at[].set.

    (Measured SLOWER than the fused dus on the 1B decode loop — kept as a
    documented probe; this pins its correctness either way.)"""
    import numpy as np

    from jlama_tpu.ops.pallas_kv import kv_write_dense1

    rng = np.random.default_rng(3)
    pool = jnp.asarray(rng.normal(size=(1, 4, 32, 64)).astype(np.float32))
    new = jnp.asarray(rng.normal(size=(1, 4, 1, 64)).astype(np.float32))
    for pos in (0, 7, 8, 31):
        got = kv_write_dense1(pool, new, jnp.int32(pos), interpret=True)
        ref = pool.at[:, :, pos : pos + 1, :].set(new)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref))
