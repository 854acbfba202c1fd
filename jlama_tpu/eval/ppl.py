"""Perplexity evaluation (WikiText-2 protocol).

Measures the quality budget from BASELINE.md: quantized (JQ4) perplexity must
stay within 0.1 of the same model at full precision. Standard sliding-window
protocol: concatenate the corpus, score it in windows of `seq_len` with a
`stride` overlap, count only the last `stride` tokens of each window.

The corpus is any local text file (WikiText-2 test split when available —
this environment has no network egress, so the dataset path is an argument).
"""

from __future__ import annotations

import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.base import forward_logits


def score_tokens(
    params: dict,
    cfg: ModelConfig,
    token_ids: np.ndarray,
    seq_len: int = 1024,
    stride: int = 512,
    dtype=jnp.float32,
    progress=None,
) -> float:
    """Return perplexity over token_ids using the sliding-window protocol."""

    @jax.jit
    def window_nll(params, tokens, count_from):
        positions = jnp.arange(tokens.shape[1], dtype=jnp.int32)[None, :]
        logits, _ = forward_logits(params, cfg, tokens, positions, dtype=dtype)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        idx = jnp.arange(nll.shape[1])
        mask = idx >= count_from
        return jnp.sum(nll * mask), jnp.sum(mask)

    # HF protocol: windows of seq_len advancing by `stride`; each window
    # counts only its last `stride` targets (overlap = context only), so
    # every target token is scored exactly once.
    n = len(token_ids)
    total_nll = 0.0
    total_cnt = 0
    start = 0
    while start + 1 < n:
        end = min(start + seq_len, n)
        count_from = 0 if start == 0 else (seq_len - stride - 1)
        real = end - start
        if real - 1 <= count_from:
            break  # tail fully covered by the previous window
        if real < seq_len:  # final partial window: score un-jitted
            total_nll += _exact_tail_nll(
                params, cfg, token_ids[start:end], count_from, dtype
            )
            total_cnt += (real - 1) - count_from
            break
        window = np.asarray(token_ids[start:end], dtype=np.int32)[None, :]
        nll, cnt = window_nll(params, jnp.asarray(window), count_from)
        total_nll += float(nll)
        total_cnt += int(cnt)
        if progress:
            progress(end, n)
        if end == n:
            break
        start += stride
    return math.exp(total_nll / max(total_cnt, 1))


def _exact_tail_nll(params, cfg, ids, count_from, dtype) -> float:
    tokens = jnp.asarray(np.asarray(ids, dtype=np.int32)[None, :])
    positions = jnp.arange(tokens.shape[1], dtype=jnp.int32)[None, :]
    logits, _ = forward_logits(params, cfg, tokens, positions, dtype=dtype)
    logp = jax.nn.log_softmax(np.asarray(logits)[0, :-1].astype(np.float32), axis=-1)
    tgt = np.asarray(ids[1:])
    nll = -logp[np.arange(len(tgt)), tgt]
    return float(nll[count_from:].sum())


def evaluate_file(
    model_dir: str | Path,
    text_path: str | Path,
    tokenizer=None,
    seq_len: int = 1024,
    stride: int = 512,
    max_tokens: int | None = None,
    dtype=jnp.float32,
) -> float:
    from ..models.loader import load_params
    from ..tokenizers import load_tokenizer

    params, cfg = load_params(model_dir, float_dtype=dtype)
    tok = tokenizer or load_tokenizer(model_dir)
    text = Path(text_path).read_text(encoding="utf-8")
    ids = np.asarray(tok.encode(text), dtype=np.int32)
    if max_tokens:
        ids = ids[:max_tokens]
    return score_tokens(params, cfg, ids, seq_len, stride, dtype)
