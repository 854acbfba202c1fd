"""Embeddings THROUGH THE API: B=32 batched /v1/embeddings vs the raw bench.

VERDICT r4 weak #6: /v1/embeddings ran one forward per input, so the raw
B=32 BERT throughput (613.8 seq/s, BENCH_CONFIGS_r04) was unreachable via
the API. With Engine.embed_batch the endpoint batches; this measures
end-to-end HTTP seq/s with 32-input requests and writes
BENCH_EMBED_API_r05.json. Done bar: within ~2x of the raw bench.

Usage: python scripts/bench_embed_api.py  (real chip; BERT-base shapes,
random weights, tiny trained-wordpiece tokenizer)
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from jlama_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

B, T_TOK = 32, 128  # mirror the raw bench: 32 inputs x ~128 tokens
N_REQS = 8


def main():
    import torch
    from transformers import BertConfig, BertModel

    from helpers import save_torch_model

    from jlama_tpu.models.loader import load_params
    from jlama_tpu.runtime.engine import Engine

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
        save_torch_model(m, Path(td), cfg_d)
        params, cfg = load_params(td, float_dtype=jnp.bfloat16)
        params = jax.tree.map(jnp.asarray, params)

    # a tokenizer whose encode() yields ~T_TOK ids per input
    class _Tok:
        def encode(self, text):
            rng = np.random.default_rng(abs(hash(text)) % (2**31))
            n = T_TOK + int(rng.integers(-16, 1))  # <=128: same 128-bucket
            return rng.integers(5, cfg.vocab_size - 5, n).tolist()

        def decode(self, ids, skip_special=True):
            return " ".join(map(str, ids))

    eng = Engine(params, cfg, _Tok(), max_seq_len=512,
                 compute_dtype=jnp.bfloat16)

    # minimal scheduler shim: the API only needs .embed_engine for this path
    class _SchedShim:
        embed_engine = eng
        tokenizer = _Tok()
        degraded = None

    from aiohttp import web

    from jlama_tpu.server.openai_api import OpenAIServer

    server = OpenAIServer(_SchedShim(), _Tok(), model_name="bert-bench")

    import asyncio

    def _serve(loop_holder):
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        runner = web.AppRunner(server.app)
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", 18100)
        loop.run_until_complete(site.start())
        loop_holder.append(loop)
        loop.run_forever()

    holder: list = []
    threading.Thread(target=_serve, args=(holder,), daemon=True).start()
    import urllib.request

    for _ in range(100):
        try:
            urllib.request.urlopen("http://127.0.0.1:18100/v1/models",
                                   timeout=2)
            break
        except Exception:
            time.sleep(0.2)

    inputs = [f"document number {i} about topic {i % 7}" for i in range(B)]
    body = json.dumps({"input": inputs}).encode()

    def one_request():
        req = urllib.request.Request(
            "http://127.0.0.1:18100/v1/embeddings", data=body,
            headers={"Content-Type": "application/json"},
        )
        resp = json.load(urllib.request.urlopen(req, timeout=600))
        assert len(resp["data"]) == B
        return resp

    one_request()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(N_REQS):
        one_request()
    dt = (time.perf_counter() - t0) / N_REQS
    seq_s = B / dt
    out = {
        "metric": "embeddings_api_sequences_per_s",
        "value": round(seq_s, 1),
        "unit": "seq/s",
        "batch": B,
        "tokens_per_input": T_TOK,
        "requests_timed": N_REQS,
        "raw_bench_seq_per_s": 613.8,  # BENCH_CONFIGS_r04 (B=32, T=128)
        "vs_raw_bench": round(seq_s / 613.8, 3),
        "tokens_per_s": round(seq_s * T_TOK, 1),
    }
    here = Path(__file__).resolve().parent.parent
    (here / "BENCH_EMBED_API_r05.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
