"""In-tree Pallas attention kernels: flash prefill + paged decode (bf16/q8).

TPU-native replacements for the reference's per-head attention loop
(/root/reference/jlama-core/.../model/CausalSelfAttention.java:314-356, which
iterates KV pages for any T and reads the cache's storage dtype directly,
:212-229):

- `flash_prefill`: T>1 attention with online softmax over S-tiles — no
  [B, H, T, S] score materialization (the XLA fallback's TTFT bound).
  Offset-causal masking (chunked prefill: query token i of a chunk starting
  at absolute position pos0 attends to kv < pos0 + i + 1), optional logit
  softcap (gemma2) and sliding window.

- `paged_decode`: T==1 attention reading the paged KV pool directly via
  scalar-prefetched page tables (one (kv_head, page) block per grid step —
  only each sequence's live pages are streamed). Quantized (q8) pools are
  dequantized in VMEM after the page DMA, so the q8 KV cache composes with
  the kernel instead of disabling it.

Both accumulate the softmax in f32 and run in interpret mode on CPU for the
equivalence tests (SURVEY.md §4 tier 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# flash prefill
# ---------------------------------------------------------------------------


def _flash_kernel(pos0_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale, softcap, causal, window, bt, bs, kv_len):
    b = pl.program_id(0)
    t_idx = pl.program_id(2)
    s_idx = pl.program_id(3)
    n_s = pl.num_programs(3)

    @pl.when(s_idx == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    pos0 = pos0_ref[b]
    q_pos = pos0 + t_idx * bt + jax.lax.broadcasted_iota(
        jnp.int32, (bt, bs), 0
    )
    k_pos = s_idx * bs + jax.lax.broadcasted_iota(jnp.int32, (bt, bs), 1)

    # skip S-tiles entirely above this T-tile's causal bound
    tile_live = jnp.logical_or(
        jnp.logical_not(causal), s_idx * bs <= pos0 + t_idx * bt + bt - 1
    )

    @pl.when(tile_live)
    def _():
        q = q_ref[0, 0]  # [bt, hd]
        k = k_ref[0, 0]  # [bs, hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap
        mask = k_pos < kv_len
        if causal:
            mask &= k_pos <= q_pos
        if window is not None:
            mask &= k_pos > q_pos - window
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[...]  # [bt, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [bt, bs]
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = m_new

    @pl.when(s_idx == n_s - 1)
    def _():
        l = l_ref[...]
        o_ref[0, 0] = (acc_ref[...] / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype
        )


def _env_interpret(flag: bool) -> bool:
    """Resolve the interpret flag OUTSIDE jit so JLAMA_PALLAS_INTERPRET=1
    (CPU-mesh tests driving the real kernel paths) never poisons the jit
    cache for a later non-interpret call."""
    import os

    return flag or os.environ.get("JLAMA_PALLAS_INTERPRET") == "1"


def flash_prefill(q, k, v, pos0, scale, softcap=None, causal=True,
                  window=None, block_t=256, block_s=512, interpret=False):
    return _flash_prefill_jit(q, k, v, pos0, scale, softcap, causal, window,
                              block_t, block_s, _env_interpret(interpret))


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "causal", "window", "block_t",
                     "block_s", "interpret"),
)
def _flash_prefill_jit(
    q: jnp.ndarray,  # [B, H, T, hd]
    k: jnp.ndarray,  # [B, n_kv, S, hd]
    v: jnp.ndarray,
    pos0: jnp.ndarray,  # [B] absolute position of each row's first query
    scale: float,
    softcap: float | None = None,
    causal: bool = True,
    window: int | None = None,
    block_t: int = 256,
    block_s: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, H, T, hd]. T and S are padded by the caller's bucketing;
    out-of-range KV columns are masked with the kv_len bound (= S here; pass
    pre-sliced K/V)."""
    B, H, T, hd = q.shape
    n_kv, S = k.shape[1], k.shape[2]
    g = H // n_kv
    bt = min(block_t, T)
    while T % bt:
        bt //= 2
    bs = min(block_s, S)
    while S % bs:
        bs //= 2

    grid = (B, H, T // bt, S // bs)
    kern = functools.partial(
        _flash_kernel, scale=scale, softcap=softcap, causal=causal,
        window=window, bt=bt, bs=bs, kv_len=S,
    )
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            # index maps receive the scalar-prefetch ref as a trailing arg
            in_specs=[
                pl.BlockSpec((1, 1, bt, hd), lambda b, h, t, s, *_: (b, h, t, 0)),
                pl.BlockSpec(
                    (1, 1, bs, hd), lambda b, h, t, s, *_: (b, h // g, s, 0)
                ),
                pl.BlockSpec(
                    (1, 1, bs, hd), lambda b, h, t, s, *_: (b, h // g, s, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bt, hd), lambda b, h, t, s, *_: (b, h, t, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((bt, 1), jnp.float32),
                pltpu.VMEM((bt, 1), jnp.float32),
                pltpu.VMEM((bt, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(pos0.astype(jnp.int32), q, k, v)


# ---------------------------------------------------------------------------
# paged decode
# ---------------------------------------------------------------------------


def _paged_decode_kernel(pt_ref, lengths_ref, q_ref, k_ref, v_ref, ks_ref,
                         vs_ref, o_ref, m_ref, l_ref, acc_ref,
                         *, scale, softcap, ps, quantized, blk, window):
    b = pl.program_id(0)
    p_idx = pl.program_id(2)
    n_p = pl.num_programs(2)

    @pl.when(p_idx == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    length = lengths_ref[b]
    page_live = p_idx * ps < length
    if window is not None:
        # sliding window (gemma2 alternating layers,
        # CausalSelfAttention.java:334-342): only keys with
        # k_pos >= length - window attend; pages entirely below it skip
        page_live = page_live & ((p_idx + 1) * ps > length - window)

    @pl.when(page_live)
    def _():
        if quantized:
            # block-32 dequant: per-block scale columns broadcast over their
            # 32-element slices (pltpu.repeat TILES, so slice instead)
            def deq(d_ref, s_ref):
                d = d_ref[0, 0].astype(jnp.float32)  # [ps, hd] int8 -> f32
                s = s_ref[0, 0].astype(jnp.float32)  # [ps, hd/blk]
                nb = s.shape[1]
                parts = [
                    d[:, i * blk : (i + 1) * blk] * s[:, i : i + 1]
                    for i in range(nb)
                ]
                out = parts[0] if nb == 1 else jnp.concatenate(parts, axis=1)
                return out.astype(jnp.bfloat16)

            k = deq(k_ref, ks_ref)
            v = deq(v_ref, vs_ref)
        else:
            k = k_ref[0, 0]  # [ps, hd]
            v = v_ref[0, 0]
        q = q_ref[0, 0]  # [g, hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [g, ps]
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap
        k_pos = p_idx * ps + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        s = jnp.where(k_pos < length, s, NEG_INF)
        if window is not None:
            s = jnp.where(k_pos >= length - window, s, NEG_INF)

        m_prev = m_ref[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = m_new

    @pl.when(p_idx == n_p - 1)
    def _():
        l = l_ref[...]
        o_ref[0, 0] = (acc_ref[...] / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype
        )


def paged_decode(q, k_pool, v_pool, page_tables, lengths, scale,
                 softcap=None, window=None, interpret=False):
    return _paged_decode_jit(q, k_pool, v_pool, page_tables, lengths, scale,
                             softcap, window, _env_interpret(interpret))


@functools.partial(
    jax.jit, static_argnames=("scale", "softcap", "window", "interpret")
)
def _paged_decode_jit(
    q: jnp.ndarray,  # [B, H, hd] (T == 1)
    k_pool,  # [n_kv, n_pages, ps, hd] array, or QArray-style (data, scales)
    v_pool,
    page_tables: jnp.ndarray,  # [B, P] int32
    lengths: jnp.ndarray,  # [B] live context per row
    scale: float,
    softcap: float | None = None,
    window: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, H, hd]. Streams only the page-table pages of each row;
    quantized pools pass (data int8, scales f32) tuples and are dequantized
    in VMEM after the page DMA (CausalSelfAttention.java:212-229 parity)."""
    quantized = isinstance(k_pool, tuple)
    if quantized:
        k_data, k_scales = k_pool
        v_data, v_scales = v_pool
    else:
        k_data, k_scales = k_pool, None
        v_data, v_scales = v_pool, None
    B, H, hd = q.shape
    n_kv, n_pages, ps, _ = k_data.shape
    g = H // n_kv
    P = page_tables.shape[1]
    blk = hd // (k_scales.shape[-1] if quantized else 1)

    qg = q.reshape(B, n_kv, g, hd)
    grid = (B, n_kv, P)

    def kmap(b, h, p, pt, ln):
        return (h, pt[b, p], 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, g, hd), lambda b, h, p, pt, ln: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, ps, hd), kmap),
        pl.BlockSpec((1, 1, ps, hd), kmap),
    ]
    args = [qg, k_data, v_data]
    if quantized:
        sb = k_scales.shape[-1]
        in_specs += [
            pl.BlockSpec((1, 1, ps, sb), kmap),
            pl.BlockSpec((1, 1, ps, sb), kmap),
        ]
        args += [k_scales, v_scales]
    else:
        # dummy scalar operands keep the kernel arity fixed
        in_specs += [
            pl.BlockSpec((1, 1, 1, 1), lambda b, h, p, pt, ln: (0, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1), lambda b, h, p, pt, ln: (0, 0, 0, 0)),
        ]
        dummy = jnp.zeros((1, 1, 1, 1), jnp.float32)
        args += [dummy, dummy]

    kern = functools.partial(
        _paged_decode_kernel, scale=scale, softcap=softcap, ps=ps,
        quantized=quantized, blk=blk, window=window,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, g, hd), lambda b, h, p, pt, ln: (b, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((g, 1), jnp.float32),
                pltpu.VMEM((g, 1), jnp.float32),
                pltpu.VMEM((g, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_kv, g, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_tables.astype(jnp.int32), lengths.astype(jnp.int32), *args)
    return out.reshape(B, H, hd)
