"""Per-config throughput benches beyond the 1B/8B headline.

BASELINE.json's config list names more than the llama pair; this measures
the rest on one chip and writes BENCH_CONFIGS_r04.json:

  gpt2  GPT-2-124M bf16 single-stream decode tok/s (configs[1]; fused
        c_attn split + learned positions go through models/loader.py)
  bert  BERT-base embeddings throughput, batch 32 x 128 tokens ->
        sequences/s and tokens/s (configs[1]; Engine._hidden_nocache)
  moe   Mixtral-style JQ4 MoE decode tok/s + fraction of the ACTIVE-bytes
        speed-of-light (configs[3]). Mixtral-8x7B itself is 27 GB at JQ4 —
        bigger than a v5e's 16 GB HBM — so the measured config keeps the
        8-expert/top-2 routing and Mixtral's layer count at half width
        (D=4096 H=3584 L=32): 13.4B params, 7.6 GB packed. The SOL
        denominator counts only streamed bytes: attention + top-2 of 8
        experts per step (the expert gather path).

Random weights throughout (shapes are what the chip streams; values don't
matter for throughput). Usage: python scripts/bench_configs.py [gpt2 bert moe]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jlama_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

HBM_BW = float(os.environ.get("JLAMA_BENCH_HBM_BW", 819e9))
DECODE_TOKENS = 64
REPS = 3


def _time_windows(run_window, state):
    """Best-of-2 of REPS windows per device sync (cf. bench.py)."""
    state = run_window(state)  # compile + warm
    np.asarray(state[0]).ravel()[:1]
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(REPS):
            state = run_window(state)
        np.asarray(state[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / REPS
        best = dt if best is None else min(best, dt)
    return best


# ---------------------------------------------------------------------- gpt2
def bench_gpt2() -> dict:
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    from jlama_tpu.models.base import KVCache, forward_hidden, lm_logits
    from jlama_tpu.models.loader import load_params

    with tempfile.TemporaryDirectory() as td:
        cfg_d = dict(
            model_type="gpt2", n_embd=768, n_head=12, n_layer=12,
            n_positions=1024, vocab_size=50257, layer_norm_epsilon=1e-5,
            activation_function="gelu_new",
        )
        torch.manual_seed(0)
        m = GPT2LMHeadModel(
            GPT2Config(**{k: v for k, v in cfg_d.items() if k != "model_type"})
        ).eval()
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from pathlib import Path

        from helpers import save_torch_model

        save_torch_model(m, Path(td), cfg_d)
        # load INSIDE the tempdir's lifetime (weights may mmap lazily)
        params, cfg = load_params(td, float_dtype=jnp.bfloat16)
        params = jax.tree.map(jnp.asarray, params)

    cache = KVCache.init(cfg, 1, 512, jnp.bfloat16)

    @partial(jax.jit, donate_argnums=(1,))
    def decode_step(params, cache, token, position):
        hidden, cache = forward_hidden(
            params, cfg, token, position, cache, dtype=jnp.bfloat16
        )
        logits = lm_logits(params, cfg, hidden[:, -1:, :])[:, 0]
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], cache

    pos = [64]

    def run_window(state):
        tok, cache = state
        for _ in range(DECODE_TOKENS):
            tok, cache = decode_step(
                params, cache, tok, jnp.asarray([[pos[0]]], jnp.int32)
            )
            pos[0] += 1
        return tok, cache

    dt = _time_windows(run_window, (jnp.asarray([[1]], jnp.int32), cache))
    n_params = 124e6
    sol = HBM_BW / (n_params * 2)  # bf16
    return {
        "decode_tokens_per_s": round(DECODE_TOKENS / dt, 2),
        "vs_sol": round(DECODE_TOKENS / dt / sol, 4),
        "sol_tokens_per_s": round(sol, 1),
        "dtype": "bf16",
    }


# ---------------------------------------------------------------------- bert
def bench_bert() -> dict:
    import torch
    from transformers import BertConfig, BertModel

    from jlama_tpu.runtime.engine import Engine
    from jlama_tpu.models.loader import load_params

    with tempfile.TemporaryDirectory() as td:
        cfg_d = dict(
            model_type="bert", hidden_size=768, num_attention_heads=12,
            num_hidden_layers=12, intermediate_size=3072, vocab_size=30522,
            max_position_embeddings=512, type_vocab_size=2,
            layer_norm_eps=1e-12, hidden_act="gelu",
        )
        torch.manual_seed(0)
        m = BertModel(
            BertConfig(**{k: v for k, v in cfg_d.items() if k != "model_type"})
        ).eval()
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from pathlib import Path

        from helpers import save_torch_model

        save_torch_model(m, Path(td), cfg_d)
        params, cfg = load_params(td, float_dtype=jnp.bfloat16)
        params = jax.tree.map(jnp.asarray, params)

    eng = Engine(params, cfg, None, max_seq_len=512,
                 compute_dtype=jnp.bfloat16)
    B, T = 32, 128
    toks = np.ones((B, T), np.int32)
    pos = np.tile(np.arange(T, dtype=np.int32), (B, 1))
    tt = np.zeros((B, T), np.int32)

    def run_window(state):
        return (eng.run_embed_hidden(toks, pos, tt),)

    dt = _time_windows(run_window, (None,))
    return {
        "batch": B, "seq_len": T,
        "sequences_per_s": round(B / dt, 1),
        "tokens_per_s": round(B * T / dt, 1),
        "dtype": "bf16",
    }


# ----------------------------------------------------------------------- moe
def bench_moe() -> dict:
    from jlama_tpu.config import from_hf_config
    from jlama_tpu.models.base import KVCache, forward_hidden, lm_logits
    from jlama_tpu.nn.qarray import QArray

    D, H, L, E, K, V = 4096, 3584, 32, 8, 2, 32000
    cfg = from_hf_config({
        "model_type": "mixtral", "hidden_size": D, "intermediate_size": H,
        "num_attention_heads": 32, "num_key_value_heads": 8,
        "num_hidden_layers": L, "num_local_experts": E,
        "num_experts_per_tok": K, "rms_norm_eps": 1e-5, "vocab_size": V,
        "max_position_embeddings": 4096, "rope_theta": 1e6,
        "bos_token_id": 1, "eos_token_id": 2, "hidden_act": "silu",
    })

    key = jax.random.PRNGKey(0)

    def q4k(k, *shape):
        # random packed nibbles DIRECTLY in the kernel layout: the usual
        # init -> fuse -> repack -> unstack chain makes 3 transient copies
        # of the 7.9 GB tree and OOMs the 16 GB HBM
        data = jax.random.randint(
            k, (*shape[:-1], shape[-1] // 2), 0, 256, jnp.int32
        ).astype(jnp.uint8)
        scales = jnp.full((*shape[:-1], shape[-1] // 32), 0.01, jnp.float32)
        return QArray(data, scales, "q4k")

    qdim, kvdim = cfg.n_heads * cfg.head_size, cfg.n_kv_heads * cfg.head_size
    # per-layer dicts (unrolled mode): a scan would dynamic-slice the
    # stacked [L, E, ...] expert arrays each step — copying all E experts
    # and erasing the top-K gather's bandwidth win
    layers = []
    for li in range(L):
        k = jax.random.fold_in(key, li)
        ks = jax.random.split(k, 8)
        layers.append({
            "wqkv": q4k(ks[0], qdim + 2 * kvdim, D),
            "wo": q4k(ks[1], D, qdim),
            "router": jax.random.normal(ks[2], (E, D), jnp.bfloat16) * 0.02,
            "experts.w1": q4k(ks[3], E, H, D),
            "experts.w2": q4k(ks[4], E, D, H),
            "experts.w3": q4k(ks[5], E, H, D),
            "attn_norm.weight": jnp.ones((D,), jnp.float32),
            "ff_norm.weight": jnp.ones((D,), jnp.float32),
        })
    ks = jax.random.split(jax.random.fold_in(key, 999), 2)
    embed = q4k(ks[0], V, D)
    params = {
        "embed": QArray(embed.data, embed.scales, "q4"),
        "lm_head": q4k(ks[1], V, D),
        "layers": layers,
        "final_norm.weight": jnp.ones((D,), jnp.float32),
    }
    from jlama_tpu.models.base import unstack_cache

    cache = unstack_cache(KVCache.init(cfg, 1, 1024, jnp.bfloat16))

    @partial(jax.jit, donate_argnums=(1,))
    def decode_step(params, cache, token, position):
        hidden, cache = forward_hidden(
            params, cfg, token, position, cache, dtype=jnp.bfloat16,
            attn_window=1024,
        )
        logits = lm_logits(params, cfg, hidden[:, -1:, :])[:, 0]
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], cache

    pos = [64]

    def run_window(state):
        tok, cache = state
        for _ in range(DECODE_TOKENS):
            tok, cache = decode_step(
                params, cache, tok, jnp.asarray([[pos[0]]], jnp.int32)
            )
            pos[0] += 1
        return tok, cache

    dt = _time_windows(run_window, (jnp.asarray([[1]], jnp.int32), cache))
    q4_bytes = 0.5 + 4.0 / 32  # bits/weight at block-32 f32 scales
    attn = L * (qdim * D + 2 * kvdim * D + D * qdim)
    experts_active = L * K * 3 * H * D  # top-K of E experts stream per step
    router = L * E * D * 2
    head = 2 * V * D  # embed row + tied lm_head read
    active = (attn + experts_active + head) * q4_bytes + router
    total = (attn + L * E * 3 * H * D + head) * q4_bytes + router
    sol = HBM_BW / active
    return {
        "decode_tokens_per_s": round(DECODE_TOKENS / dt, 2),
        "vs_active_sol": round(DECODE_TOKENS / dt / sol, 4),
        "sol_tokens_per_s": round(sol, 1),
        "params_b": round(total / q4_bytes / 1e9, 2),
        "active_frac": round(active / total, 3),
        "config": f"D={D} H={H} L={L} E={E} top{K} (half-width Mixtral; "
                  "8x7B = 27 GB JQ4 exceeds 16 GB v5e HBM)",
        "dtype": "q4",
    }


def main():
    which = sys.argv[1:] or ["gpt2", "bert", "moe"]
    out = {"protocol": f"{DECODE_TOKENS}-token decode windows, {REPS} windows "
                       "per sync, random weights, single v5e via axon relay"}
    for name in which:
        print(f"--- {name} ---", flush=True)
        out[name] = {"gpt2": bench_gpt2, "bert": bench_bert, "moe": bench_moe}[name]()
        print(json.dumps(out[name]), flush=True)
    path = os.environ.get("JLAMA_BENCH_OUT")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
