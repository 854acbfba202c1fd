"""Functional transformer layers (pure functions over param pytrees).

TPU-first re-design of the reference's model layer
(/root/reference/jlama-core/.../model/{TransformerBlock,CausalSelfAttention,
MLPBlock,MoEBlock,LayerNorm,RMSNorm}.java): instead of mutable buffers and
per-head thread loops, every layer is a pure function suitable for jit/scan,
with f32 accumulation where the reference accumulates f32.

Conventions:
- activations: [B, T, D] (B=batch/sequences, T=tokens)
- attention KV cache per layer: k,v [B, n_kv, S, head_size]
- weights: [out, in] (HF Linear layout) — see ops.linear
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.linear import linear
from ..utils.debug import debug
from .rope import apply_rope


def _split_fused(y: jnp.ndarray, sizes: tuple[int, ...], fused_tp: int):
    """Split a fused projection's output columns into its sections.

    fused_tp > 1: the fused rows were interleaved per tp shard
    (models.base.fuse_params) so the output column order is
    [s0: a0,b0,..., s1: a1,b1,...]; regroup each section's shard slices
    back into contiguous columns (a pure reshape/slice on the activation,
    original within-section order preserved)."""
    if fused_tp == 1:
        out, off = [], 0
        for s in sizes:
            out.append(y[..., off : off + s])
            off += s
        return out
    tot = y.shape[-1]
    yr = y.reshape(*y.shape[:-1], fused_tp, tot // fused_tp)
    out, off = [], 0
    for s in sizes:
        sl = s // fused_tp
        part = yr[..., off : off + sl]
        out.append(part.reshape(*y.shape[:-1], s))
        off += sl
    return out


def _row_parallel_linear(x, w, bias, fused_tp: int = 1):
    """Row-parallel (input-sharded) projection: inside a shard_map region
    the partial products are psum'd over tp BEFORE the bias — the
    reference's tensorReducer/combine point (CausalSelfAttention.java:
    363-381, MLPBlock.java:144-163). Outside shard_map this is linear().

    fused_tp > 1 outside shard_map (cfg.fused_tp, e.g. the embed Engine
    sharing a shard_map scheduler's weight tree): a q4k weight here is in
    the CHUNKED kernel layout (ops.pallas_q4.to_kernel_layout chunks=tp),
    so the contraction runs per input chunk and sums — numerically the same
    reduction, tp kernel calls instead of one (fine off the decode path)."""
    from ..nn.qarray import QArray
    from ..parallel.tp_forward import current, tp_reduce

    if fused_tp > 1 and current() is None and isinstance(w, QArray) and w.fmt == "q4k":
        kl = x.shape[-1] // fused_tp
        dl = w.data.shape[-1] // fused_tp
        sl = w.scales.shape[-1] // fused_tp
        y = None
        for i in range(fused_tp):
            wi = QArray(
                w.data[..., i * dl : (i + 1) * dl],
                w.scales[..., i * sl : (i + 1) * sl],
                "q4k",
            )
            yi = linear(x[..., i * kl : (i + 1) * kl], wi)
            y = yi if y is None else y + yi
    else:
        y = tp_reduce(linear(x, w))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Norms (cf. RMSNorm.java:34, LayerNorm.java:41)
# ---------------------------------------------------------------------------


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float, weight_offset: float = 0.0) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if weight_offset:
        w = w + weight_offset  # gemma's (1+w)
    return (normed * w).astype(x.dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )


def norm(x, params: dict, cfg: ModelConfig, prefix: str) -> jnp.ndarray:
    w = params[f"{prefix}.weight"]
    if cfg.norm_type == "rmsnorm":
        return rms_norm(x, w, cfg.norm_eps, cfg.rmsnorm_weight_offset)
    return layer_norm(x, w, params[f"{prefix}.bias"], cfg.norm_eps)


# ---------------------------------------------------------------------------
# Activations (cf. ActivationFunction.java:30-36)
# ---------------------------------------------------------------------------


def activation(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind in ("silu", "swish"):
        return jax.nn.silu(x)
    if kind in ("gelu", "gelu_new", "gelu_fast", "gelu_pytorch_tanh"):
        # the reference uses the tanh approximation for all GELU variants
        return jax.nn.gelu(x, approximate=kind != "gelu")
    if kind == "tanh":
        return jnp.tanh(x)
    raise ValueError(f"unknown activation {kind!r}")


# ---------------------------------------------------------------------------
# Attention (cf. CausalSelfAttention.java:145-381)
# ---------------------------------------------------------------------------


class KVLayerCache(NamedTuple):
    k: jnp.ndarray  # [B, n_kv, S, hd]
    v: jnp.ndarray  # [B, n_kv, S, hd]


class PagedLayerCache(NamedTuple):
    """One layer's slice of the paged pool + the batch's page tables."""

    k_pool: jnp.ndarray  # [n_pages, ps, n_kv, hd]
    v_pool: jnp.ndarray
    page_tables: jnp.ndarray  # [B, P] int32


def attention_scores_mask(
    q_positions: jnp.ndarray,  # [B, T] absolute positions of the query tokens
    kv_len: int,
    causal: bool,
    sliding_window: int | None,
    seq_lengths: jnp.ndarray | None = None,  # [B] valid tokens per row
) -> jnp.ndarray:
    """Boolean mask [B, T, S]: True = attendable.

    seq_lengths masks PAD key positions (batched variable-length encoder
    inputs, e.g. the batched embeddings path): key s of row b is attendable
    only when s < seq_lengths[b]. The reference never batches unequal
    sequences (AbstractModel.embed is single-sequence); this enables the
    multi-sequence embed_batch beyond it."""
    kv_pos = jnp.arange(kv_len)[None, None, :]
    qp = q_positions[:, :, None]
    if causal:
        mask = kv_pos <= qp
    else:
        mask = jnp.ones(qp.shape[:2] + (kv_len,), dtype=bool)
    if sliding_window is not None:
        mask = mask & (kv_pos > qp - sliding_window)
    if seq_lengths is not None:
        mask = mask & (kv_pos < seq_lengths[:, None, None])
    return mask


def multi_head_attention(
    q: jnp.ndarray,  # [B, T, n_heads, hd]
    k: jnp.ndarray,  # [B, S, n_kv, hd] or cache layout [B, n_kv, S, hd]
    v: jnp.ndarray,
    mask: jnp.ndarray,  # [B, T, S] bool
    scale: float,
    softcap: float | None = None,
) -> jnp.ndarray:
    """Dense (XLA-fused) attention with GQA head-group mapping.

    Returns [B, T, n_heads, hd]. f32 softmax accumulation.
    """
    B, T, n_heads, hd = q.shape
    n_kv = k.shape[1]
    g = n_heads // n_kv
    qg = q.reshape(B, T, n_kv, g, hd)
    # scores: [B, n_kv, g, T, S]
    scores = jnp.einsum(
        "btkgh,bksh->bkgts", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if softcap is not None:
        scores = jnp.tanh(scores / softcap) * softcap
    m = mask[:, None, None, :, :]
    scores = jnp.where(m, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgts,bksh->btkgh", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, T, n_heads, hd).astype(q.dtype)


def self_attention_block(
    x: jnp.ndarray,  # [B, T, D] (already normed)
    params: dict,
    cfg: ModelConfig,
    positions: jnp.ndarray,  # [B, T]
    cache: KVLayerCache | None,
    cos: jnp.ndarray | None,
    sin: jnp.ndarray | None,
    sliding_window: int | None,
    attn_window: int | None = None,
    seq_lengths: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, KVLayerCache | None]:
    """QKV projections, RoPE, cache update, attention, output projection.

    attn_window: static upper bound on the live context (bucketed by the
    caller). The XLA attention path then gathers/masks only that many cache
    slots instead of the full padded window — the reference analog is
    iterating pages only up to the current position
    (CausalSelfAttention.java:314-356).
    """
    B, T, D = x.shape
    hd = cfg.head_size

    if "wqkv" in params:
        # fused QKV projection (see models.base.fuse_params)
        qdim = cfg.n_heads * hd
        kvdim = cfg.n_kv_heads * hd
        qkv = linear(x, params["wqkv"], params.get("wqkv.bias"))
        q, k, v = _split_fused(qkv, (qdim, kvdim, kvdim), cfg.fused_tp)
    else:
        q = linear(x, params["wq"], params.get("wq.bias"))
        k = linear(x, params["wk"], params.get("wk.bias"))
        v = linear(x, params["wv"], params.get("wv.bias"))
    # cf. reference debug points (CausalSelfAttention.java:194-196)
    debug("query", q)
    debug("key", k)
    debug("value", v)
    q = q.reshape(B, T, cfg.n_heads, hd)
    k = k.reshape(B, T, cfg.n_kv_heads, hd)
    v = v.reshape(B, T, cfg.n_kv_heads, hd)

    if cos is not None:
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    if isinstance(cache, PagedLayerCache):
        from ..kv.paged import write_kv_layer, gather_kv_layer
        from ..ops import flags

        k_pool, v_pool = write_kv_layer(
            cache.k_pool, cache.v_pool, k, v, cache.page_tables, positions
        )
        cache = PagedLayerCache(k_pool, v_pool, cache.page_tables)
        # static live-context bound: gather only the page-table columns that
        # can hold tokens < attn_window
        ps = (
            k_pool.data if hasattr(k_pool, "data") else k_pool
        ).shape[2]
        page_tables = cache.page_tables
        if attn_window is not None:
            live_p = min(-(-attn_window // ps), page_tables.shape[1])
            page_tables = page_tables[:, :live_p]

        if cfg.attention_multiplier is not None:
            scale = cfg.attention_multiplier
        elif cfg.query_pre_attn_scalar is not None:
            scale = cfg.query_pre_attn_scalar**-0.5
        else:
            scale = hd**-0.5

        from ..nn.qarray import QArray

        kernel_ok = (
            flags.USE_PAGED_ATTENTION_KERNEL
            and T == 1
            and cfg.causal
            # per-layer STATIC windows (gemma2 alternating layers in the
            # unrolled path — each layer's window is a Python int there,
            # models/base.py) dispatch to the in-tree kernel; only traced
            # window scalars (scan path) fall back to the XLA mask
            and (sliding_window is None or isinstance(sliding_window, int))
            # Mosaic block-shape constraints: tiny test models (head_size 16,
            # 4 heads) fail lowering — fall back to the XLA gather path
            and cfg.head_size % 64 == 0
            and cfg.n_heads % 8 == 0
        )
        if kernel_ok and (
            isinstance(k_pool, QArray)
            or sliding_window is not None
            # the library paged_attention kernel's output block is
            # (.., head_size): Mosaic requires the last dim % 128, so
            # head_size-64 models (llama-1B) take the in-tree kernel
            or cfg.head_size % 128 != 0
        ):
            # in-tree paged decode kernel: streams only the live pages and
            # dequantizes the q8 pages in VMEM after the DMA, so quantized
            # KV composes with the kernel (CausalSelfAttention.java:212-229)
            from ..ops.pallas_attention import paged_decode

            kp = (k_pool.data, k_pool.scales) if isinstance(
                k_pool, QArray
            ) else k_pool
            vp = (v_pool.data, v_pool.scales) if isinstance(
                v_pool, QArray
            ) else v_pool
            out = paged_decode(
                q[:, 0].reshape(B, cfg.n_heads, hd),
                kp,
                vp,
                page_tables,
                positions[:, 0] + 1,
                scale,
                softcap=cfg.attn_logit_softcap,
                window=sliding_window,
            )
            out = out[:, None].astype(x.dtype)
        elif kernel_ok:
            # Pallas paged-attention decode kernel (double-buffered per-page
            # DMA, online softmax); reads only each sequence's live pages
            # instead of gathering the whole padded window
            from jax.experimental.pallas.ops.tpu.paged_attention import (
                paged_attention,
            )

            P = page_tables.shape[1]
            ppcb = 1
            for c in (8, 4, 2, 1):
                if P % c == 0:
                    ppcb = c
                    break
            out = paged_attention(
                (q[:, 0] * scale).astype(k_pool.dtype),
                k_pool,
                v_pool,
                lengths=positions[:, 0] + 1,
                page_indices=page_tables,
                pages_per_compute_block=ppcb,
                attn_logits_soft_cap=cfg.attn_logit_softcap,
            )  # [B, n_heads, hd]
            out = out[:, None].astype(x.dtype)
        elif (
            flags.USE_FLASH_PREFILL
            and T > 1
            and T % 8 == 0
            and cfg.causal
            and cfg.head_size % 128 == 0
            and (sliding_window is None or isinstance(sliding_window, int))
        ):
            # flash prefill over the gathered live window: online softmax,
            # no [B, H, T, S] score materialization
            from ..ops.pallas_attention import flash_prefill

            k_gath, v_gath = gather_kv_layer(
                k_pool, v_pool, page_tables, dtype=x.dtype
            )
            out = flash_prefill(
                q.transpose(0, 2, 1, 3),
                k_gath.transpose(0, 2, 1, 3),
                v_gath.transpose(0, 2, 1, 3),
                positions[:, 0],
                scale,
                softcap=cfg.attn_logit_softcap,
                window=sliding_window,
            ).transpose(0, 2, 1, 3)
        else:
            k_gath, v_gath = gather_kv_layer(
                k_pool, v_pool, page_tables, dtype=x.dtype
            )
            k_att = k_gath.transpose(0, 2, 1, 3)  # [B, n_kv, S, hd]
            v_att = v_gath.transpose(0, 2, 1, 3)
            kv_len = k_att.shape[2]
            mask = attention_scores_mask(
                positions, kv_len, cfg.causal, sliding_window
            )
            out = multi_head_attention(
                q, k_att, v_att, mask, scale, cfg.attn_logit_softcap
            )
        out = out.reshape(B, T, cfg.n_heads * hd)
        out = _row_parallel_linear(out, params["wo"], params.get("wo.bias"),
                                   cfg.fused_tp)
        return out, cache

    # dense cache layout [B, n_kv, S, hd]
    k_new = k.transpose(0, 2, 1, 3)
    v_new = v.transpose(0, 2, 1, 3)
    if cache is not None:
        # scatter the T new positions into the cache at their absolute pos
        # (positions are per-sequence for continuous batching)
        S = cache.k.shape[2]
        pos0 = positions[:, 0]
        k_cache = _update_cache(cache.k, k_new, pos0)
        v_cache = _update_cache(cache.v, v_new, pos0)
        cache = KVLayerCache(k_cache, v_cache)
        k_att, v_att = k_cache, v_cache
        kv_len = S
        if attn_window is not None and attn_window < S // 2:
            # static slice: attention reads only the live context prefix.
            # Only pays when it at least HALVES the bytes: slicing a cache
            # that is also updated in the same (loop-carried) program makes
            # XLA insert a window-sized defensive copy — measured 0.52
            # ms/step on the 1B decode loop (scripts/diag_1b.py fullwin),
            # more than the full-window read it saves at win >= S/2
            k_att = k_cache[:, :, :attn_window]
            v_att = v_cache[:, :, :attn_window]
            kv_len = attn_window
    else:
        k_att, v_att = k_new, v_new
        kv_len = T

    if cfg.attention_multiplier is not None:  # granite
        scale = cfg.attention_multiplier
    elif cfg.query_pre_attn_scalar is not None:  # gemma2
        scale = cfg.query_pre_attn_scalar ** -0.5
    else:
        scale = hd**-0.5

    from ..ops import flags

    if (
        flags.USE_FLASH_PREFILL
        and T > 1
        and T % 8 == 0
        and cfg.causal
        and cfg.head_size % 128 == 0
        and (sliding_window is None or isinstance(sliding_window, int))
        and seq_lengths is None
    ):
        from ..ops.pallas_attention import flash_prefill

        out = flash_prefill(
            q.transpose(0, 2, 1, 3),
            k_att.astype(q.dtype),
            v_att.astype(q.dtype),
            positions[:, 0],
            scale,
            softcap=cfg.attn_logit_softcap,
            window=sliding_window,
        ).transpose(0, 2, 1, 3)
    else:
        mask = attention_scores_mask(
            positions, kv_len, cfg.causal, sliding_window, seq_lengths
        )
        out = multi_head_attention(
            q, k_att, v_att, mask, scale, cfg.attn_logit_softcap
        )
    out = out.reshape(B, T, cfg.n_heads * hd)
    out = _row_parallel_linear(out, params["wo"], params.get("wo.bias"),
                               cfg.fused_tp)
    return out, cache


def _update_cache(cache: jnp.ndarray, new: jnp.ndarray, pos0: jnp.ndarray) -> jnp.ndarray:
    """Insert new [B, n_kv, T, hd] into cache [B, n_kv, S, hd] at per-row pos0."""
    if cache.shape[0] == 1:
        # single row: a direct dynamic_update_slice (the vmap'd form lowers
        # through scatter, measured ~0.07 ms/step slower on the 1B decode
        # loop — scripts/diag_1b.py dus1)
        return jax.lax.dynamic_update_slice(
            cache, new.astype(cache.dtype), (0, 0, pos0[0], 0)
        )

    def upd(c, n, p):
        return jax.lax.dynamic_update_slice(c, n.astype(c.dtype), (0, p, 0))

    return jax.vmap(upd)(cache, new, pos0)


# ---------------------------------------------------------------------------
# MLP (cf. MLPBlock.java:106-165)
# ---------------------------------------------------------------------------


def mlp_block(x: jnp.ndarray, params: dict, cfg: ModelConfig) -> jnp.ndarray:
    if "w13" in params:  # fused gate+up (see models.base.fuse_params)
        h = linear(x, params["w13"])
        half = h.shape[-1] // 2
        g, u = _split_fused(h, (half, half), cfg.fused_tp)
        gate = activation(g, cfg.activation)
        return _row_parallel_linear(gate * u, params["w2"], None, cfg.fused_tp)
    if "w3" in params:  # gated (llama family): w2(act(w1(x)) * w3(x))
        gate = activation(linear(x, params["w1"]), cfg.activation)
        up = linear(x, params["w3"])
        return _row_parallel_linear(gate * up, params["w2"], None, cfg.fused_tp)
    # classic 2-layer MLP with biases (gpt2/bert)
    h = activation(
        linear(x, params["w1"], params.get("w1.bias")), cfg.activation
    )
    return _row_parallel_linear(h, params["w2"], params.get("w2.bias"),
                                cfg.fused_tp)


# ---------------------------------------------------------------------------
# MoE (cf. MoEBlock.java:80-168)
# ---------------------------------------------------------------------------


def moe_block(x: jnp.ndarray, params: dict, cfg: ModelConfig) -> jnp.ndarray:
    """Mixture-of-experts FFN with top-k routing.

    Two formulations (cf. reference MoEBlock.java:80-168, which loops over
    the selected experts per token):

    - ragged (preferred, float experts prepared via
      models.base.prepare_moe_ragged): tokens are sorted by expert and run
      through `jax.lax.ragged_dot` grouped matmuls, so only each expert's
      assigned tokens touch its weights;
    - dense fallback: every expert computes, outputs are combined with
      routing weights (used for quantized experts, whose block-quantization
      axis would not survive the ragged layout's transpose).
    """
    B, T, D = x.shape
    E, K = cfg.n_experts, cfg.n_experts_per_token
    router_logits = linear(x, params["router"], out_dtype=jnp.float32)  # [B,T,E]
    topk_w, topk_idx = jax.lax.top_k(router_logits, K)
    topk_w = jax.nn.softmax(topk_w, axis=-1)  # softmax over the selected k

    # EXPERT PARALLELISM inside shard_map: the expert stacks are sharded
    # over tp (specs map experts.* row 0 to 'tp'), so each device holds
    # E/tp experts, routes over the GLOBAL expert set (router replicated),
    # computes only its local experts' contributions, and psums — the
    # dedicated EP the reference lacks (SURVEY §2.6 "EP — NO").
    from ..parallel.tp_forward import current as _sm_current

    ctx = _sm_current()
    w1ref = params.get("experts.w1_t", params.get("experts.w1"))
    n_local = (
        w1ref.data if hasattr(w1ref, "data") else w1ref
    ).shape[0]
    ep = ctx is not None and ctx.tp_axis is not None and n_local < E
    lo = jax.lax.axis_index(ctx.tp_axis) * n_local if ep else 0
    tp_ax = ctx.tp_axis if ep else None

    if "experts.w1_t" in params:
        return _moe_ragged(x, params, cfg, topk_w, topk_idx, lo=lo,
                           n_local=n_local, tp_axis=tp_ax)

    from .qarray import QArray

    if isinstance(params["experts.w1"], QArray):
        if B * T * K <= 8:
            # quantized experts, decode-sized batch: gather ONLY the
            # selected experts' packed payloads (top-k of E) instead of
            # computing every expert — E/K fewer weight bytes per step, the
            # configs where bandwidth matters most (cf. MoEBlock.java:
            # 101-144, which also touches only the selected experts)
            return _moe_gathered(x, params, cfg, topk_w, topk_idx, lo=lo,
                                 n_local=n_local, tp_axis=tp_ax)
        # quantized experts, prefill-sized batch: dequantize once for this
        # call and take the grouped ragged path — FLOPs drop from
        # every-expert-every-token (the old dense fallback) to top-k per
        # token, while the dequant reads each expert's bytes once, which a
        # full prefill does anyway (VERDICT r3 weak #7). Only the LOCAL
        # experts dequantize under EP.
        deq = {
            k + "_t": jnp.swapaxes(
                params[k].dequantize(jnp.bfloat16), -1, -2
            )
            for k in ("experts.w1", "experts.w2", "experts.w3")
        }
        return _moe_ragged(x, deq, cfg, topk_w, topk_idx, lo=lo,
                           n_local=n_local, tp_axis=tp_ax)

    # combine weights as dense [B,T,E]
    combine = jnp.zeros((B, T, E), router_logits.dtype).at[
        jnp.arange(B)[:, None, None],
        jnp.arange(T)[None, :, None],
        topk_idx,
    ].add(topk_w)
    if ep:  # this shard combines only its local experts' columns
        combine = jax.lax.dynamic_slice_in_dim(combine, lo, n_local, axis=2)

    # experts: stacked weights [E(_local), h, D] / [E(_local), D, h]
    def expert_fn(w1, w2, w3):
        gate = activation(linear(x, w1), cfg.activation)
        up = linear(x, w3)
        return linear(gate * up, w2)  # [B, T, D]

    outs = jax.vmap(expert_fn)(params["experts.w1"], params["experts.w2"], params["experts.w3"])
    # outs: [E(_local), B, T, D] -> weighted sum
    y = jnp.einsum("ebtd,bte->btd", outs.astype(jnp.float32), combine)
    if ep:
        y = jax.lax.psum(y, tp_ax)
    return y.astype(x.dtype)


def _moe_gathered(x, params, cfg, topk_w, topk_idx, lo=0, n_local=None,
                  tp_axis=None):
    """Per-token expert gather for quantized experts at decode batch sizes:
    each (token, k) selection dynamically indexes one expert's QArray slice,
    so only the chosen experts' weights stream from HBM. Under EP
    (tp_axis set) each shard computes only selections that route to its
    local expert range and the partials psum."""
    B, T, D = x.shape
    K = cfg.n_experts_per_token
    N = B * T
    xf = x.reshape(N, D)
    w1 = params["experts.w1"]
    w2 = params["experts.w2"]
    w3 = params["experts.w3"]
    idxf = topk_idx.reshape(N, K)
    wf = topk_w.reshape(N, K)
    ep = tp_axis is not None
    ys = []
    for t in range(N):  # static, small (<= 8)
        xi = xf[t : t + 1]
        acc = jnp.zeros((D,), jnp.float32)
        for j in range(K):
            e = idxf[t, j]
            if ep:
                el = e - lo
                valid = ((el >= 0) & (el < n_local)).astype(jnp.float32)
                e = jnp.clip(el, 0, n_local - 1)
            gate = activation(linear(xi, w1[e]), cfg.activation)
            up = linear(xi, w3[e])
            y = linear(gate * up, w2[e], out_dtype=jnp.float32)
            wgt = wf[t, j].astype(jnp.float32)
            if ep:
                wgt = wgt * valid
            acc = acc + wgt * y[0]
        ys.append(acc)
    out = jnp.stack(ys).reshape(B, T, D)
    if ep:
        out = jax.lax.psum(out, tp_axis)
    return out.astype(x.dtype)


def _moe_ragged(x, params, cfg, topk_w, topk_idx, lo=0, n_local=None,
                tp_axis=None):
    """Grouped expert matmul: sort token-assignments by expert, ragged_dot
    through w1/w3/w2, unsort, weighted-combine.

    Under EP (tp_axis set) the expert stacks are this shard's E/tp slice:
    the globally-sorted assignment rows for the local expert range form one
    contiguous segment starting at the cumulative size of the lower
    shards' groups — roll it to row 0, run ragged_dot with the LOCAL group
    sizes, roll back, mask foreign rows, psum."""
    B, T, D = x.shape
    E, K = cfg.n_experts, cfg.n_experts_per_token
    N = B * T
    xf = x.reshape(N, D)

    flat_expert = topk_idx.reshape(N * K)
    order = jnp.argsort(flat_expert)  # stable: groups tokens by expert
    xs = jnp.repeat(xf, K, axis=0)[order]
    group_sizes = jnp.bincount(flat_expert, length=E)

    ep = tp_axis is not None
    if ep:
        gs = jax.lax.dynamic_slice(group_sizes, (lo,), (n_local,))
        off = jnp.sum(
            jnp.where(jnp.arange(E) < lo, group_sizes, 0)
        ).astype(jnp.int32)
        xs = jnp.roll(xs, -off, axis=0)
    else:
        gs = group_sizes

    w1t, w2t, w3t = params["experts.w1_t"], params["experts.w2_t"], params["experts.w3_t"]
    gate = activation(
        jax.lax.ragged_dot(xs, w1t.astype(xs.dtype), gs,
                           preferred_element_type=jnp.float32).astype(xs.dtype),
        cfg.activation,
    )
    up = jax.lax.ragged_dot(xs, w3t.astype(xs.dtype), gs,
                            preferred_element_type=jnp.float32).astype(xs.dtype)
    y = jax.lax.ragged_dot(gate * up, w2t.astype(xs.dtype), gs,
                           preferred_element_type=jnp.float32)  # [N*K, D] f32

    if ep:
        n_loc = jnp.sum(gs)
        y = jnp.roll(y, off, axis=0)
        ridx = jnp.arange(y.shape[0])
        y = jnp.where(
            ((ridx >= off) & (ridx < off + n_loc))[:, None], y, 0.0
        )

    inv = jnp.argsort(order)
    y = y[inv] * topk_w.reshape(N * K, 1)
    out = y.reshape(N, K, D).sum(axis=1).reshape(B, T, D)
    if ep:
        out = jax.lax.psum(out, tp_axis)
    return out.astype(x.dtype)
