"""Test helpers: build tiny random HF-format checkpoints on disk.

Mirrors the reference's Mocks.java approach (tiny dims, no real weights) but
with real serialized checkpoints so the full load path is exercised.
"""

import json
from pathlib import Path

import numpy as np


def save_torch_model(model, tmp: Path, config: dict):
    """Save a torch model's state_dict as safetensors + config.json."""
    from safetensors.torch import save_file

    tmp.mkdir(parents=True, exist_ok=True)
    sd = model.state_dict()
    sd = {k: v.contiguous() for k, v in sd.items() if "rotary_emb.inv_freq" not in k}
    # drop duplicated tied tensors (real HF checkpoints omit the tied lm_head)
    seen: dict[int, str] = {}
    out = {}
    for k, v in sd.items():
        ptr = v.data_ptr()
        if ptr in seen and v.shape == sd[seen[ptr]].shape:
            continue
        seen.setdefault(ptr, k)
        out[k] = v
    save_file(out, tmp / "model.safetensors")
    (tmp / "config.json").write_text(json.dumps(config))


TINY_LLAMA_CONFIG = {
    "model_type": "llama",
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "num_hidden_layers": 2,
    "rms_norm_eps": 1e-5,
    "vocab_size": 256,
    "max_position_embeddings": 128,
    "rope_theta": 10000.0,
    "bos_token_id": 1,
    "eos_token_id": 2,
    "hidden_act": "silu",
    "tie_word_embeddings": False,
}


def make_tiny_llama(tmp: Path, config_overrides: dict | None = None, seed: int = 0):
    """Create a tiny random HF llama checkpoint; returns (dir, hf_model)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = dict(TINY_LLAMA_CONFIG)
    if config_overrides:
        cfg.update(config_overrides)
    torch.manual_seed(seed)
    hf_cfg = LlamaConfig(**{k: v for k, v in cfg.items() if k != "model_type"})
    model = LlamaForCausalLM(hf_cfg).eval()
    save_torch_model(model, tmp, cfg)
    return tmp, model
