"""Quantization quality on TRAINED weights (VERDICT r4 missing #2).

Random-weight ppl deltas would pass even with a broken quantizer as long as
dequant is self-consistent; this trains a tiny llama on a deterministic
synthetic Markov corpus until the loss clearly drops, then asserts the
BASELINE.md budget (JQ4 within 0.1 ppl of fp32) on the trained weights.
The committed full-size artifact is PPL_TRAINED_r05.json
(scripts/ppl_trained.py).
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


@pytest.mark.slow
def test_trained_weights_q4_ppl_budget():
    import ppl_trained as T

    from jlama_tpu.config import from_hf_config
    from jlama_tpu.eval.ppl import score_tokens
    from jlama_tpu.models.init import init_params

    cfg = from_hf_config(
        {
            "model_type": "llama", "hidden_size": 128,
            "intermediate_size": 384, "num_attention_heads": 4,
            "num_key_value_heads": 2, "num_hidden_layers": 2,
            "rms_norm_eps": 1e-5, "vocab_size": 256,
            "max_position_embeddings": 512, "rope_theta": 10000.0,
            "bos_token_id": 0, "eos_token_id": 0, "hidden_act": "silu",
        }
    )
    corpus = T.markov_corpus(256, 60_000, seed=1)
    held_out = T.markov_corpus(256, 3_000, seed=2)
    params = init_params(cfg, dtype=jnp.float32)
    params, trace = T.adam_train(
        params, cfg, corpus, steps=150, batch=16, seq=129, log_every=150
    )
    loss0, lossN = trace[0][1], trace[-1][1]
    assert lossN < loss0 - 1.0, f"no convergence: {loss0} -> {lossN}"

    ppl_fp = score_tokens(params, cfg, held_out, seq_len=512, stride=256)
    qp = T.quantize_layers(params, "q4")
    ppl_q4 = score_tokens(qp, cfg, held_out, seq_len=512, stride=256)
    # trained model must actually have learned the structure
    assert ppl_fp < np.exp(2.2), ppl_fp
    assert abs(ppl_q4 - ppl_fp) <= 0.1, (ppl_fp, ppl_q4)
