"""1B decode-step decomposition on the real chip.

347 tok/s (0.33 SOL) has ~1.4 ms/step of non-weight-stream time; this
ablates the step to locate it. Variants (each one compile of the 128-token
device loop on random 1B weights):

  full        the bench.py decode loop
  no_lmhead   sample from a fixed hidden slice (lm_head matmul removed —
              isolates the 138 MB vocab matmul + 128k argmax)

Usage: python scripts/diag_1b.py [variants...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jlama_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

import bench as headline
from jlama_tpu.models.init import llama_1b_config
from jlama_tpu.models.base import (
    KVCache, forward_hidden, fuse_params, lm_logits, unstack_cache,
    unstack_params,
)

DECODE = 128
PROMPT = 512


def build(variant: str):
    opts = set(variant.split("+"))
    cfg = llama_1b_config()
    params = fuse_params(headline.init_params_device(cfg, quant="q4"))
    params = unstack_params(params, cfg)
    cache = unstack_cache(KVCache.init(cfg, 1, 2048, jnp.bfloat16))
    win = 256 if "win256" in opts else 1024
    if "fullwin" in opts:
        # no k_att/v_att prefix slice: attention reads the FULL cache with
        # masking. Tests whether the slice+update aliasing of the carried
        # cache is what forces XLA's copy insertion (~0.87 ms/step measured
        # via no_kv_write).
        win = None

    # ablation monkeypatches (trace-time): each removes one non-matmul
    # component while keeping every weight stream intact
    from jlama_tpu.nn import layers as L

    if "attn_identity" in opts:
        # remove score/softmax/V math AND the KV reads (the gathered k/v
        # become dead code); QKV/wo matmuls + cache writes stay
        L.multi_head_attention = (
            lambda q, k, v, mask, scale, softcap=None: q
        )
    if "no_kv_write" in opts:
        L._update_cache = lambda cache, new, pos0: cache
    if "kvkern" in opts:
        # Pallas in-place write: only one bs-row block of the cache moves
        from jlama_tpu.ops.pallas_kv import kv_write_dense1

        def updk(cache, new, pos0):
            return kv_write_dense1(cache, new, pos0[0])

        L._update_cache = updk
    if "dus1" in opts:
        # B=1: plain dynamic_update_slice with scalar start instead of the
        # vmap'd per-row form (vmap(dus) lowers via scatter; a direct dus
        # may take XLA's in-place path)
        def upd1(cache, new, pos0):
            return jax.lax.dynamic_update_slice(
                cache, new.astype(cache.dtype), (0, 0, pos0[0], 0)
            )

        L._update_cache = upd1
    if "barrier" in opts:
        # optimization_barrier after the cache scatter: stops XLA fusing the
        # dynamic-update-slice into its consumers (a fused dus+read
        # rematerializes the whole buffer — suspected source of the
        # 0.35 ms/step write cost under fullwin)
        orig_update = L._update_cache

        def upd(cache, new, pos0):
            return jax.lax.optimization_barrier(orig_update(cache, new, pos0))

        L._update_cache = upd
    if "no_norms" in opts:
        L.rms_norm = lambda x, w, eps, weight_offset=0.0: x
    if "no_rope" in opts:
        import jlama_tpu.nn.rope as R

        L.apply_rope = lambda x, cos, sin: x
        R.apply_rope = L.apply_rope
    if "rope_wide" in opts:
        # wide-table roll formulation: cos/sin widened to full head_size
        # ONCE per step (outside the layer loop), sign folded into the sin
        # table, rotate_half via jnp.roll — 2 mul + 1 add + 1 roll per
        # apply instead of slice/concat
        import jlama_tpu.models.base as MBm

        def wide_cos_sin(positions, inv_freq):
            angles = positions[..., None].astype(jnp.float32) * inv_freq
            c, s = jnp.cos(angles), jnp.sin(angles)
            return (jnp.concatenate([c, c], -1),
                    jnp.concatenate([-s, s], -1))

        def apply_wide(x, cw, sw):
            half = x.shape[-1] // 2
            rot = jnp.roll(x, half, axis=-1)
            return (
                x.astype(jnp.float32) * cw[..., None, :]
                + rot.astype(jnp.float32) * sw[..., None, :]
            ).astype(x.dtype)

        MBm.rope_cos_sin = wide_cos_sin
        L.apply_rope = apply_wide

    def step_fn(params, cache, token, position):
        hidden, cache = forward_hidden(
            params, cfg, token, position, cache, dtype=jnp.bfloat16,
            attn_window=win,
        )
        if "no_lmhead" in opts:
            tok = jnp.argmax(hidden[:, -1, :128], axis=-1).astype(jnp.int32)
        else:
            logits = lm_logits(params, cfg, hidden[:, -1:, :])[:, 0]
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return tok, cache

    from functools import partial

    @partial(jax.jit, donate_argnums=(1,))
    def loop(params, cache, token, position):
        def body(carry):
            i, tok, cache = carry
            nxt, cache = step_fn(params, cache, tok, position + i)
            return (i + 1, nxt[:, None], cache)

        def cond(carry):
            return carry[0] < DECODE

        _, tok, cache = jax.lax.while_loop(
            cond, body, (0, token, cache)
        )
        return tok, cache

    return params, cache, loop


def main():
    variants = sys.argv[1:] or ["full", "no_lmhead"]
    for v in variants:
        params, cache, loop = build(v)
        t = jnp.asarray([[1]], jnp.int32)
        pos = jnp.asarray([[PROMPT]], jnp.int32)
        out, cache = loop(params, cache, t, pos)
        np.asarray(out)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            out, cache = loop(params, cache, t, pos)
            np.asarray(out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{v}: {best / DECODE * 1e3:.3f} ms/step "
              f"({DECODE / best:.1f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
