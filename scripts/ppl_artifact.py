"""Commit-able perplexity artifact (tiny-model protocol).

The environment has no model weights or WikiText-2 download, so the
committed quality artifact is the tiny-model delta (random weights, random
text, fixed seeds — fully reproducible) for each weight format. For a real
checkpoint the exact command is:

    python -m jlama_tpu.cli quantize <model_dir> --quantize-to q4
    python - <<'PY'
    import numpy as np, jax.numpy as jnp
    from jlama_tpu.models.loader import load_params
    from jlama_tpu.tokenizers import load_tokenizer
    from jlama_tpu.eval.ppl import score_tokens
    d = "<model_dir>"          # or the -JQ4 dir for the quantized run
    text = open("wikitext-2-raw/wiki.test.raw").read()
    params, cfg = load_params(d)
    ids = np.asarray(load_tokenizer(d).encode(text), np.int32)
    print(score_tokens(params, cfg, ids, seq_len=1024, stride=512))
    PY

Gate (BASELINE.md): JQ4 within 0.1 ppl of FP16; q4s (the w8a8 kernel
format) within 0.1 of JQ4.

Writes PPL_TINY.json at the repo root.
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main():
    import tempfile

    from helpers import make_tiny_llama

    from jlama_tpu.eval.ppl import score_tokens
    from jlama_tpu.models.loader import load_params
    from jlama_tpu.nn.qarray import quantize_q4
    from jlama_tpu.ops.pallas_w8a8 import q4s_dequantize_np, to_q4s
    from jlama_tpu.quant.blockq import q4_dequantize_np

    tmp = Path(tempfile.mkdtemp())
    model_dir, _ = make_tiny_llama(
        tmp,
        {
            "hidden_size": 256,
            "intermediate_size": 512,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "num_hidden_layers": 2,
        },
    )
    params, cfg = load_params(model_dir, float_dtype=jnp.float32)

    def weights(kind):
        out = dict(params)
        layers = {}
        for k, v in params["layers"].items():
            if k not in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
                layers[k] = v
                continue
            if kind == "fp32":
                layers[k] = v
                continue
            per = []
            for l in range(v.shape[0]):
                q4 = quantize_q4(np.asarray(v[l], np.float32))
                if kind == "q4":
                    per.append(
                        q4_dequantize_np(np.asarray(q4.data), np.asarray(q4.scales))
                    )
                else:
                    per.append(q4s_dequantize_np(to_q4s(q4)))
            layers[k] = jnp.asarray(np.stack(per))
        out["layers"] = layers
        return out

    rng = np.random.default_rng(5)
    ids = rng.integers(0, 256, 192).astype(np.int32)
    result = {
        "protocol": "tiny-llama(256d/2L) random weights, 192 random tokens, "
        "seq_len=96 stride=48 (WikiText-2 sliding-window protocol)",
        "seeds": {"weights": "tests/helpers.py make_tiny_llama", "text": 5},
    }
    for kind in ("fp32", "q4", "q4s"):
        result[f"ppl_{kind}"] = round(
            float(score_tokens(weights(kind), cfg, ids, seq_len=96, stride=48)),
            4,
        )
    result["delta_q4_vs_fp32"] = round(result["ppl_q4"] - result["ppl_fp32"], 4)
    result["delta_q4s_vs_q4"] = round(result["ppl_q4s"] - result["ppl_q4"], 4)
    out = REPO / "PPL_TINY.json"
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
