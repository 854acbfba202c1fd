"""On-device multi-token decode loop.

The reference's decode loop lives on the host (AbstractModel.java:590-621 —
one forward + sample per Java loop iteration), which is fine when the "device"
is the same CPU. On TPU every host-driven step pays a dispatch + transfer
round-trip (~ms over a relay), which dominates small-model decode: the 1B-JQ4
step computes in <1.5 ms but a host loop cannot issue them faster than the
dispatch path allows.

TPU-native redesign: the whole decode loop is ONE jitted program — a
`lax.while_loop` that forwards, samples, feeds the token back, and early-exits
when every row has hit a stop id. The host dispatches once per N tokens and
reads back a token buffer + per-row counts. Sampling reproduces the host
loop's PRNG stream (split per step from the same seed), so tokens are
bit-identical to the step-by-step path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models.base import forward_hidden, lm_logits
from ..nn.sampling import sample_token

# fixed-size stop-id buffer (pad with -1, which no vocab id matches)
MAX_STOP_IDS = 8


def pad_stop_ids(stop_ids) -> jnp.ndarray:
    """Fixed-width stop-id buffer (pad -1, never a vocab id). Sets larger
    than MAX_STOP_IDS keep their exact (power-of-two-padded) size — a new
    width is just another compile variant."""
    ids = sorted(set(int(t) for t in stop_ids))
    width = MAX_STOP_IDS
    while width < len(ids):
        width *= 2
    return jnp.asarray(ids + [-1] * (width - len(ids)), jnp.int32)


def make_decode_loop(cfg: ModelConfig, compute_dtype=jnp.bfloat16):
    """Build the jitted N-token decode loop.

    Returns fn(params, cache, token[B,1], position[B,1], key, temperature,
    top_k, top_p, stop_ids[>=MAX_STOP_IDS], n_steps, attn_window,
    no_top_k, no_top_p) -> (out[B, n_steps] int32, n_valid[B] int32,
    key', cache) — key' is the PRNG key advanced one split per executed step
    so chunked calls continue the exact stream of the per-step host loop.

    Rows emit into `out` until their first stop id (inclusive); `n_valid`
    counts emitted tokens per row. The loop exits as soon as every row is
    done, so a B=1 early stop costs nothing beyond the stop step itself.
    """

    @partial(jax.jit, donate_argnums=(1,), static_argnums=(9, 10, 11, 12))
    def decode_loop(params, cache, token, position, key, temperature, top_k,
                    top_p, stop_ids, n_steps, attn_window, no_top_k,
                    no_top_p):
        B = token.shape[0]
        out0 = jnp.zeros((B, n_steps), jnp.int32)
        done0 = jnp.zeros((B,), bool)
        nval0 = jnp.zeros((B,), jnp.int32)

        def cond(carry):
            i, _, _, _, _, _, done, _ = carry
            return (i < n_steps) & ~jnp.all(done)

        def body(carry):
            i, token, position, cache, key, out, done, nval = carry
            hidden, cache = forward_hidden(
                params, cfg, token, position, cache, dtype=compute_dtype,
                attn_window=attn_window,
            )
            logits = lm_logits(params, cfg, hidden[:, -1:, :])[:, 0]
            key, sub = jax.random.split(key)
            nxt = sample_token(
                logits, sub, temperature, top_k=0 if no_top_k else top_k,
                top_p=1.0 if no_top_p else top_p,
            ).astype(jnp.int32)
            active = ~done
            out = out.at[:, i].set(jnp.where(active, nxt, 0))
            nval = nval + active.astype(jnp.int32)
            done = done | (active & jnp.any(nxt[:, None] == stop_ids, axis=1))
            return (i + 1, nxt[:, None], position + 1, cache, key, out, done,
                    nval)

        _, _, _, cache, key, out, _, nval = jax.lax.while_loop(
            cond, body, (0, token, position, cache, key, out0, done0, nval0)
        )
        return out, nval, key, cache

    return decode_loop
