"""Headline benchmark: single-chip decode throughput on Llama-3.2-1B shapes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is the fraction of weight-bandwidth speed-of-light achieved
(BASELINE.md: per-chip HBM bandwidth / active bytes per decoded token).
"""

from __future__ import annotations

import json
import os
import time

import jax

from jlama_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp

from jlama_tpu.models.init import llama_1b_config
from jlama_tpu.models.base import KVCache, forward_hidden, lm_logits
from jlama_tpu.nn.sampling import sample_token
from jlama_tpu.nn.qarray import QArray

# v5e (TPU v5 lite) per-chip HBM bandwidth, bytes/s
HBM_BW = float(os.environ.get("JLAMA_BENCH_HBM_BW", 819e9))

DECODE_TOKENS = int(os.environ.get("JLAMA_BENCH_TOKENS", 128))
QUANT = os.environ.get("JLAMA_BENCH_QUANT", "bf16")  # bf16 | q4
UNROLL = os.environ.get("JLAMA_BENCH_UNROLL", "0") == "1"
MODEL = os.environ.get("JLAMA_BENCH_MODEL", "1b")  # 1b | 8b


def init_params_device(cfg, dtype=jnp.bfloat16, quant: str = "bf16"):
    """Fast on-device random init (shapes only matter for bench)."""
    key = jax.random.PRNGKey(0)
    D, H, V, L = cfg.embedding_length, cfg.hidden_length, cfg.vocab_size, cfg.n_layers
    qdim, kvdim = cfg.n_heads * cfg.head_size, cfg.n_kv_heads * cfg.head_size

    def w(k, *shape):
        return jax.random.normal(k, shape, dtype) * 0.02

    def lin(k, *shape):
        if quant == "q4":
            # random packed nibbles directly in kernel layout ("q4k")
            data = jax.random.randint(
                k, (*shape[:-1], shape[-1] // 2), 0, 256, jnp.int32
            ).astype(jnp.uint8)
            scales = jnp.full((*shape[:-1], shape[-1] // 32), 0.01, jnp.float32)
            return QArray(data, scales, "q4k")
        return w(k, *shape)

    ks = jax.random.split(key, 16)
    layers = {
        "wq": lin(ks[0], L, qdim, D),
        "wk": lin(ks[1], L, kvdim, D),
        "wv": lin(ks[2], L, kvdim, D),
        "wo": lin(ks[3], L, D, qdim),
        "w1": lin(ks[4], L, H, D),
        "w2": lin(ks[5], L, D, H),
        "w3": lin(ks[6], L, H, D),
        "attn_norm.weight": jnp.ones((L, D), jnp.float32),
        "ff_norm.weight": jnp.ones((L, D), jnp.float32),
    }
    params = {
        # quantize the embedding/lm_head too (tied): at 1B shapes the bf16
        # table alone is 525 MB/step of the decode's HBM traffic. The embed
        # copy stays canonical q4 (positional gather); lm_head gets the
        # kernel layout for the fused matmul.
        "embed": lin(ks[7], V, D),
        "layers": layers,
        "final_norm.weight": jnp.ones((D,), jnp.float32),
    }
    if quant == "q4":
        params["embed"] = QArray(params["embed"].data, params["embed"].scales, "q4")
        params["lm_head"] = lin(ks[8], V, D)
    return params


def active_bytes_per_token(cfg, quant: str) -> float:
    """Weights touched per decoded token (the speed-of-light denominator)."""
    D, H, L = cfg.embedding_length, cfg.hidden_length, cfg.n_layers
    qdim, kvdim = cfg.n_heads * cfg.head_size, cfg.n_kv_heads * cfg.head_size
    per_layer = qdim * D + 2 * kvdim * D + D * qdim + 3 * H * D
    total = L * per_layer + cfg.vocab_size * D  # + lm_head (tied = embed read)
    bytes_per = {"bf16": 2.0, "q4": 0.5 + 4.0 / 32}[quant]
    return total * bytes_per


def main():
    if MODEL == "8b":
        from jlama_tpu.models.init import llama_8b_config

        cfg = llama_8b_config()
    else:
        cfg = llama_1b_config()
    params = init_params_device(cfg, quant=QUANT)
    max_len = 2048
    cache = KVCache.init(cfg, 1, max_len, jnp.bfloat16)
    if UNROLL:
        from jlama_tpu.models.base import unstack_params, unstack_cache

        params = unstack_params(params, cfg)
        cache = unstack_cache(cache)

    from functools import partial

    @partial(jax.jit, donate_argnums=(1,))
    def decode_step(params, cache, token, position, key):
        hidden, cache = forward_hidden(
            params, cfg, token, position, cache, dtype=jnp.bfloat16
        )
        logits = lm_logits(params, cfg, hidden[:, -1:, :])[:, 0]
        tok = sample_token(logits, key, 0.0)
        return tok[:, None], cache

    import numpy as np

    key = jax.random.PRNGKey(0)
    t = jnp.asarray([[1]], jnp.int32)

    # warmup/compile; np.asarray forces a REAL device sync (on the axon
    # remote platform block_until_ready returns before execution completes).
    # The measured section uses per-step async dispatches (the serving
    # pattern) with one final hard sync, so the remote tunnel's ~40 ms
    # round-trip latency is pipelined away rather than multiplied in.
    t, cache = decode_step(params, cache, t, jnp.asarray([[0]], jnp.int32), key)
    np.asarray(t)

    start = time.perf_counter()
    for i in range(1, DECODE_TOKENS + 1):
        t, cache = decode_step(
            params, cache, t, jnp.asarray([[i]], jnp.int32), key
        )
    np.asarray(t)
    dt = time.perf_counter() - start

    toks_per_s = DECODE_TOKENS / dt
    sol = HBM_BW / active_bytes_per_token(cfg, QUANT)
    print(
        json.dumps(
            {
                "metric": f"decode_tokens_per_sec_per_chip_llama{MODEL}_{QUANT}",
                "value": round(toks_per_s, 2),
                "unit": "tokens/s",
                "vs_baseline": round(toks_per_s / sol, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
