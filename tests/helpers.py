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


CHAT_TEMPLATE = (
    "{% for message in messages %}<|{{ message['role'] }}|>"
    "{{ message['content'] }}</s>{% endfor %}"
    "{% if add_generation_prompt %}<|assistant|>{% endif %}"
)


def make_tiny_chat_model(tmp: Path, seed: int = 0,
                         config_overrides: dict | None = None):
    """Tiny llama + trained BPE tokenizer + chat template: full serving stack."""
    from tokenizers import Tokenizer as HFTok
    from tokenizers.models import BPE
    from tokenizers.trainers import BpeTrainer
    from tokenizers import pre_tokenizers, decoders

    tok = HFTok(BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = BpeTrainer(
        vocab_size=384,
        special_tokens=["<s>", "</s>", "<|user|>", "<|assistant|>", "<|system|>"],
        show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    corpus = [
        "Hello there, how are you today?",
        "The weather is nice. Tell me a story about a fox.",
        "What is the answer to life, the universe and everything?",
    ]
    tok.train_from_iterator(corpus * 10, trainer)
    vocab_size = tok.get_vocab_size()

    model_dir, hf = make_tiny_llama(
        tmp,
        config_overrides={
            "vocab_size": vocab_size,
            "bos_token_id": 0,
            "eos_token_id": 1,
            **(config_overrides or {}),
        },
        seed=seed,
    )
    tok.save(str(tmp / "tokenizer.json"))
    (tmp / "tokenizer_config.json").write_text(
        json.dumps(
            {
                "chat_template": CHAT_TEMPLATE,
                "bos_token": "<s>",
                "eos_token": "</s>",
                "add_bos_token": False,
            }
        )
    )
    return model_dir, hf


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
