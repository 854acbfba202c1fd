"""Random parameter initialization (for benchmarks, dry runs, and tests).

Produces the same stacked param-tree layout as models.loader.load_params so
any config can run without a checkpoint on disk.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..nn.qarray import QArray


def init_params(
    cfg: ModelConfig,
    seed: int = 0,
    dtype=jnp.bfloat16,
    quantize: str | None = None,  # None | "q4"
) -> dict:
    """Random-normal params (std 0.02) in the loader's layout."""
    rng = np.random.default_rng(seed)
    D, H, V = cfg.embedding_length, cfg.hidden_length, cfg.vocab_size
    L = cfg.n_layers
    qdim = cfg.n_heads * cfg.head_size
    kvdim = cfg.n_kv_heads * cfg.head_size

    def w(*shape):
        a = rng.standard_normal(shape, dtype=np.float32)
        a *= np.float32(0.02)
        return a

    def linear_leaf(*shape):
        a = w(*shape)
        if quantize == "q4":
            from ..quant import blockq

            packed, scales = blockq.q4_quantize_np(a)
            return QArray(jnp.asarray(packed), jnp.asarray(scales), "q4")
        return jnp.asarray(a, dtype=dtype)

    layers: dict = {
        "wq": linear_leaf(L, qdim, D),
        "wk": linear_leaf(L, kvdim, D),
        "wv": linear_leaf(L, kvdim, D),
        "wo": linear_leaf(L, D, qdim),
        "attn_norm.weight": jnp.ones((L, D), jnp.float32),
        "ff_norm.weight": jnp.ones((L, D), jnp.float32),
    }
    if cfg.n_experts:
        layers["router"] = jnp.asarray(w(L, cfg.n_experts, D), dtype=dtype)
        layers["experts.w1"] = linear_leaf(L, cfg.n_experts, H, D)
        layers["experts.w2"] = linear_leaf(L, cfg.n_experts, D, H)
        layers["experts.w3"] = linear_leaf(L, cfg.n_experts, H, D)
    else:
        layers["w1"] = linear_leaf(L, H, D)
        layers["w2"] = linear_leaf(L, D, H)
        layers["w3"] = linear_leaf(L, H, D)
    if cfg.post_attn_norm:
        layers["post_attn_norm.weight"] = jnp.ones((L, D), jnp.float32)
    if cfg.post_ff_norm:
        layers["post_ff_norm.weight"] = jnp.ones((L, D), jnp.float32)
    if cfg.attn_qkv_bias:
        layers["wq.bias"] = jnp.zeros((L, qdim), jnp.float32)
        layers["wk.bias"] = jnp.zeros((L, kvdim), jnp.float32)
        layers["wv.bias"] = jnp.zeros((L, kvdim), jnp.float32)

    params: dict = {
        "embed": jnp.asarray(w(V, D), dtype=dtype),
        "layers": layers,
        "final_norm.weight": jnp.ones((D,), jnp.float32),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(w(V, D), dtype=dtype)
    return params


def llama_1b_config() -> ModelConfig:
    """Llama-3.2-1B-Instruct shapes (the flagship single-chip config)."""
    from ..config import from_hf_config

    return from_hf_config(
        {
            "model_type": "llama",
            "hidden_size": 2048,
            "intermediate_size": 8192,
            "num_attention_heads": 32,
            "num_key_value_heads": 8,
            "num_hidden_layers": 16,
            "head_dim": 64,
            "rms_norm_eps": 1e-5,
            "vocab_size": 128256,
            "max_position_embeddings": 131072,
            "rope_theta": 500000.0,
            "rope_scaling": {
                "rope_type": "llama3",
                "factor": 32.0,
                "low_freq_factor": 1.0,
                "high_freq_factor": 4.0,
                "original_max_position_embeddings": 8192,
            },
            "bos_token_id": 128000,
            "eos_token_id": [128001, 128008, 128009],
            "hidden_act": "silu",
            "tie_word_embeddings": True,
        }
    )


def llama_8b_config() -> ModelConfig:
    """Llama-3.1-8B shapes (the north-star serving config)."""
    from ..config import from_hf_config

    return from_hf_config(
        {
            "model_type": "llama",
            "hidden_size": 4096,
            "intermediate_size": 14336,
            "num_attention_heads": 32,
            "num_key_value_heads": 8,
            "num_hidden_layers": 32,
            "rms_norm_eps": 1e-5,
            "vocab_size": 128256,
            "max_position_embeddings": 131072,
            "rope_theta": 500000.0,
            "bos_token_id": 128000,
            "eos_token_id": 128009,
            "hidden_act": "silu",
            "tie_word_embeddings": False,
        }
    )
