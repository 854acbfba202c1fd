"""Headline benchmark: single-chip JQ4 decode throughput + TTFT.

North-star config (BASELINE.md): Llama-3.1-8B-JQ4 decode tokens/s/chip and
p50 TTFT on one TPU chip. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "ttft_ms_p50", ...}.
`vs_baseline` is the fraction of weight-bandwidth speed-of-light achieved
(per-chip HBM bandwidth / active quantized bytes per decoded token).

Env knobs: JLAMA_BENCH_MODEL=8b|1b, JLAMA_BENCH_QUANT=q4|bf16,
JLAMA_BENCH_UNROLL=1|0 (default 1: per-layer weight arrays — no per-step
dynamic-slice copies of the stacked [L, ...] arrays under scan),
JLAMA_BENCH_TOKENS, JLAMA_BENCH_PROMPT.
"""

from __future__ import annotations

import json
import os
import time

import jax

from jlama_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp

from jlama_tpu.models.base import (
    KVCache,
    forward_hidden,
    fuse_params,
    lm_logits,
    unstack_cache,
    unstack_params,
)
from jlama_tpu.nn.qarray import QArray
from jlama_tpu.nn.sampling import sample_token

# v5e (TPU v5 lite) per-chip HBM bandwidth, bytes/s
HBM_BW = float(os.environ.get("JLAMA_BENCH_HBM_BW", 819e9))

DECODE_TOKENS = int(os.environ.get("JLAMA_BENCH_TOKENS", 128))
PROMPT_TOKENS = int(os.environ.get("JLAMA_BENCH_PROMPT", 512))
QUANT = os.environ.get("JLAMA_BENCH_QUANT", "q4")  # q4 | bf16
UNROLL = os.environ.get("JLAMA_BENCH_UNROLL", "1") == "1"
MODEL = os.environ.get("JLAMA_BENCH_MODEL", "8b")  # 1b | 8b


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
            scales = jnp.full(
                (*shape[:-1], shape[-1] // 32), 0.01, jnp.bfloat16
            )
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
    # q4k scales are bf16 (ops/pallas_q4.to_kernel_layout): 4.0625 effective
    # bits/weight (payload 4 + scale 2*8/32)
    bytes_per = {"bf16": 2.0, "q4": 0.5 + 2.0 / 32}[quant]
    return total * bytes_per


def main():
    import numpy as np

    if MODEL == "8b":
        from jlama_tpu.models.init import llama_8b_config

        cfg = llama_8b_config()
    else:
        from jlama_tpu.models.init import llama_1b_config

        cfg = llama_1b_config()
    params = fuse_params(init_params_device(cfg, quant=QUANT))
    max_len = 2048
    cache = KVCache.init(cfg, 1, max_len, jnp.bfloat16)
    if UNROLL:
        params = unstack_params(params, cfg)
        cache = unstack_cache(cache)

    from functools import partial

    @partial(jax.jit, donate_argnums=(1,))
    def prefill_step(params, cache, tokens, positions):
        hidden, cache = forward_hidden(
            params, cfg, tokens, positions, cache, dtype=jnp.bfloat16
        )
        logits = lm_logits(params, cfg, hidden[:, -1:, :])[:, 0]
        tok = sample_token(logits, jax.random.PRNGKey(0), 0.0)
        return tok[:, None], cache

    key = jax.random.PRNGKey(0)
    t = jnp.asarray([[1]], jnp.int32)

    # ---- TTFT: prefill PROMPT_TOKENS then sample the first token ----
    ptoks = jnp.ones((1, PROMPT_TOKENS), jnp.int32)
    ppos = jnp.arange(PROMPT_TOKENS, dtype=jnp.int32)[None, :]
    # warmup/compile; np.asarray forces a REAL device sync (on the axon
    # remote platform block_until_ready returns before execution completes)
    t, cache = prefill_step(params, cache, ptoks, ppos)
    np.asarray(t)
    ttfts = []
    for _ in range(3):
        t0 = time.perf_counter()
        t, cache = prefill_step(params, cache, ptoks, ppos)
        np.asarray(t)
        ttfts.append((time.perf_counter() - t0) * 1000)
    ttft_p50 = sorted(ttfts)[len(ttfts) // 2]

    # ---- decode: two framework modes, measured per model ----
    # "loop": ONE dispatch for all DECODE_TOKENS steps (on-device
    #   lax.while_loop, runtime/device_loop.py — kills per-step dispatch,
    #   what Engine.generate uses);
    # "chain": per-step async dispatches with one final sync (the
    #   scheduler's pattern; measured faster at 8B, where XLA's
    #   copy-insertion around the while-carry KV costs ~1 ms/step).
    # chain (per-step async dispatch, donated cache) beats the on-device
    # while-loop at BOTH sizes after the r5 copy-insertion fixes: the loop
    # still pays carry copies the donated per-call state avoids
    # (1B measured 491.8 chain vs 476.7 loop, best-of on a quiet chip)
    MODE = os.environ.get("JLAMA_BENCH_MODE") or "chain"
    # sized so every timed window's decode positions stay inside the
    # allocated window: warmup + 2 passes x REPS(=3) windows (ADVICE r4)
    win = min(PROMPT_TOKENS + 7 * DECODE_TOKENS, max_len)

    if MODE == "loop":
        from jlama_tpu.runtime.device_loop import make_decode_loop, pad_stop_ids

        loop = make_decode_loop(cfg, jnp.bfloat16)
        stop_arr = pad_stop_ids([])  # no stop ids: run all steps

        def run_window(cache, key, pos0):
            out, nval, key, cache = loop(
                params, cache, t, jnp.asarray([[pos0]], jnp.int32), key,
                jnp.float32(0.0), jnp.int32(0), jnp.float32(1.0), stop_arr,
                DECODE_TOKENS, win, True, True,
            )
            return out, cache, key
    else:
        @partial(jax.jit, donate_argnums=(1,), static_argnums=(4,))
        def decode_step(params, cache, token, position, attn_window):
            hidden, cache = forward_hidden(
                params, cfg, token, position, cache, dtype=jnp.bfloat16,
                attn_window=attn_window,
            )
            logits = lm_logits(params, cfg, hidden[:, -1:, :])[:, 0]
            tok = sample_token(logits, jax.random.PRNGKey(0), 0.0)
            return tok[:, None], cache

        def run_window(cache, key, pos0):
            tok = t
            for i in range(DECODE_TOKENS):
                tok, cache = decode_step(
                    params, cache, tok,
                    jnp.asarray([[pos0 + i]], jnp.int32), win,
                )
            return tok, cache, key

    out, cache, key = run_window(cache, key, PROMPT_TOKENS)  # compile+warm
    np.asarray(out)
    best = None
    pos = PROMPT_TOKENS + DECODE_TOKENS
    # time REPS windows back-to-back with ONE final sync: the axon relay's
    # fixed dispatch+fetch round trip is ~25 ms per np.asarray, which at 1B
    # step times (~2.7 ms) would inflate a single 128-token window by ~7%.
    # Serving never pays this per window (token fetches are double-buffered
    # behind the next window's dispatch), so it is a measurement artifact.
    REPS = 3
    for _ in range(2):
        start = time.perf_counter()
        for _ in range(REPS):
            out, cache, key = run_window(cache, key, pos)
            pos += DECODE_TOKENS
        np.asarray(out)
        dt = (time.perf_counter() - start) / REPS
        best = dt if best is None else min(best, dt)
    dt = best

    toks_per_s = DECODE_TOKENS / dt
    sol = HBM_BW / active_bytes_per_token(cfg, QUANT)
    out = {
        "metric": f"decode_tokens_per_sec_per_chip_llama{MODEL}_{QUANT}",
        "value": round(toks_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(toks_per_s / sol, 4),
        "ttft_ms_p50": round(ttft_p50, 1),
        "prompt_tokens": PROMPT_TOKENS,
        "sol_tokens_per_s": round(sol, 1),
    }
    # the committed serving-path artifacts (scripts/bench_serving*.py measure
    # the scheduler under concurrency; single-stream above is the raw loop)
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        curve_file = (
            "BENCH_SERVING_CURVE_1B_r05.json"
            if MODEL == "1b"
            else "BENCH_SERVING_CURVE_r05.json"
        )
        with open(os.path.join(here, curve_file)) as f:
            curve = json.load(f)
        out["serving_curve_levels"] = curve["levels"]
        out["serving_curve_tokens_per_s"] = curve["decode_tokens_per_s"]
        out["serving_knee_tokens_per_s"] = curve["knee_tokens_per_s"]
        out["serving_ttft_ms_p50"] = curve["ttft_ms_p50"]
        out["serving_artifact"] = curve_file
    except Exception:  # noqa: BLE001
        try:
            with open(os.path.join(here, "BENCH_SERVING_r03.json")) as f:
                serving = json.load(f)
            out["serving_4way_tokens_per_s"] = serving["value"]
            out["serving_ttft_ms_p50"] = serving["ttft_ms_p50"]
            out["serving_artifact"] = "BENCH_SERVING_r03.json"
        except Exception:  # noqa: BLE001
            pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
