"""On-device token sampling.

cf. AbstractModel.sample (/root/reference/jlama-core/.../model/
AbstractModel.java:443-491): greedy when temperature == 0, otherwise
temperature-scaled categorical sampling. Extended beyond the reference with
top-k / top-p (nucleus) filtering, computed entirely on device so the decode
loop never round-trips logits to the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_token(
    logits: jnp.ndarray,  # [B, V] f32
    key: jax.Array,
    temperature: float | jnp.ndarray = 0.0,
    top_k: int = 0,
    top_p: float | jnp.ndarray = 1.0,
    keys: jax.Array | None = None,  # optional per-row keys [B, ...]
) -> jnp.ndarray:
    """Sample one token per row. Returns [B] int32.

    temperature/top_p/top_k may be traced scalars OR per-row [B] arrays (for
    continuous batching where each sequence carries its own sampling
    params); temperature 0 → greedy (argmax) for that row; top_k <= 0 for a
    row keeps all tokens. Passing the STATIC int 0 for top_k (resp. a static
    top_p >= 1.0) skips the full-vocab sort entirely — changing top_k/top_p
    VALUES never recompiles the decode step. When `keys` is given each row
    draws from its own PRNG stream (per-request `seed` reproducibility under
    continuous batching); `key` is ignored.
    """
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # static fast path: pure greedy needs no sort/categorical at all — a
    # full-vocab sort costs tens of ms per step on TPU, so it must only run
    # when a filter is actually requested
    static_greedy = isinstance(temperature, (int, float)) and temperature == 0.0
    if static_greedy:
        return greedy

    temperature = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), (logits.shape[0],)
    )
    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / temp

    static_no_top_k = isinstance(top_k, int) and top_k <= 0
    if not static_no_top_k:
        V = logits.shape[-1]
        top_k_arr = jnp.broadcast_to(
            jnp.asarray(top_k, jnp.int32), (logits.shape[0],)
        )
        sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
        k_eff = jnp.clip(top_k_arr, 1, V)
        kth = jnp.take_along_axis(sorted_desc, (k_eff - 1)[:, None], axis=-1)
        keep_all = ((top_k_arr <= 0) | (top_k_arr >= V))[:, None]
        scaled = jnp.where((scaled >= kth) | keep_all, scaled, -jnp.inf)

    static_no_top_p = isinstance(top_p, (int, float)) and top_p >= 1.0
    if not static_no_top_p:
        # nucleus filtering (per-row p; rows with p >= 1 keep everything)
        top_p = jnp.broadcast_to(
            jnp.asarray(top_p, jnp.float32), (logits.shape[0],)
        )
        sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_mask = cum - probs > top_p[:, None]  # always keeps first token
        cutoff = jnp.where(cutoff_mask, -jnp.inf, sorted_logits)
        threshold = jnp.min(
            jnp.where(jnp.isfinite(cutoff), cutoff, jnp.inf),
            axis=-1,
            keepdims=True,
        )
        scaled = jnp.where(scaled < threshold, -jnp.inf, scaled)

    if keys is not None:
        sampled = jax.vmap(jax.random.categorical)(keys, scaled).astype(jnp.int32)
    else:
        sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(temperature == 0.0, greedy, sampled)
