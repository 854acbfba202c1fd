"""Transformer forward pass: scan over stacked layers, jit-friendly.

TPU-first redesign of the reference's AbstractModel/TransformerBlock
(/root/reference/jlama-core/.../model/AbstractModel.java:267-491,
TransformerBlock.java:158-205): layers are STACKED along a leading axis and
driven by `lax.scan` (one trace, one compile, layer dim shardable for
pipeline parallelism), the KV cache is a dense on-device buffer pytree
threaded through the scan, and sampling happens on device.

Param tree layout (all leaves jnp arrays or QArray):
  params = {
    "embed": [V, D],                     # token embeddings
    "wpe": [P, D],                       # learned positions (gpt2/bert)
    "token_type_embed": [2, D],          # bert
    "embed_norm.weight/.bias": [D],      # bert embedding LayerNorm
    "layers": { key: [L, ...] stacked }, # per-layer weights
    "final_norm.weight" (+ .bias): [D],
    "lm_head": [V, D],                   # absent when tied
    ...heads (pooler/classifier) per arch
  }
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..nn import layers as L
from ..nn.rope import rope_cos_sin, rope_frequencies
from ..ops.linear import linear


class KVCache(NamedTuple):
    """Dense stacked KV cache: k,v [n_layers, B, n_kv_heads, S, head_size]."""

    k: jnp.ndarray
    v: jnp.ndarray

    @staticmethod
    def init(cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.n_layers, batch, cfg.n_kv_heads, max_len, cfg.head_size)
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def _embed(params: dict, cfg: ModelConfig, tokens: jnp.ndarray, positions: jnp.ndarray,
           token_types: jnp.ndarray | None, dtype) -> jnp.ndarray:
    from ..parallel import tp_forward

    emb = params["embed"]
    ctx = tp_forward.current()
    if ctx is not None and ctx.embed_vocab_sharded:
        # inside shard_map with a vocab-row-sharded table: masked local
        # gather + psum assembles the embedding from the owning shard
        x = tp_forward.sharded_vocab_gather(emb, tokens, ctx.tp_axis)
    elif hasattr(emb, "dequantize"):
        # gather the rows FIRST, then dequantize only those (a full-table
        # dequant would stream the whole vocab every step)
        x = emb[tokens].dequantize(jnp.float32)
    else:
        x = emb[tokens].astype(jnp.float32)
    if cfg.embedding_scale is not None:
        x = x * cfg.embedding_scale
    if cfg.learned_pos_embeddings:
        x = x + params["wpe"][positions].astype(jnp.float32)
    if cfg.type_vocab_size and "token_type_embed" in params:
        tt = token_types if token_types is not None else jnp.zeros_like(tokens)
        x = x + params["token_type_embed"][tt].astype(jnp.float32)
    x = x.astype(dtype)
    if "embed_norm.weight" in params:  # bert
        x = L.layer_norm(
            x, params["embed_norm.weight"], params["embed_norm.bias"], cfg.norm_eps
        )
    return x


def _block(x, layer_params: dict, cfg: ModelConfig, positions, cache, cos, sin,
           sliding_window, attn_window=None, seq_lengths=None):
    """One transformer block (pre-norm or post-norm per cfg)."""
    rm = cfg.residual_multiplier if cfg.residual_multiplier is not None else 1.0

    if cfg.model_type == "bert":
        # post-norm encoder block
        attn_out, cache = L.self_attention_block(
            x, layer_params, cfg, positions, cache, cos, sin, sliding_window,
            attn_window, seq_lengths,
        )
        x = L.norm(x + attn_out, layer_params, cfg, "attn_norm")
        ff = L.mlp_block(x, layer_params, cfg)
        x = L.norm(x + ff, layer_params, cfg, "ff_norm")
        return x, cache

    h = L.norm(x, layer_params, cfg, "attn_norm")
    attn_out, cache = L.self_attention_block(
        h, layer_params, cfg, positions, cache, cos, sin, sliding_window,
        attn_window, seq_lengths,
    )
    if cfg.post_attn_norm:
        attn_out = L.norm(attn_out, layer_params, cfg, "post_attn_norm")
    x = x + rm * attn_out

    h = L.norm(x, layer_params, cfg, "ff_norm")
    if cfg.n_experts:
        ff = L.moe_block(h, layer_params, cfg)
    else:
        ff = L.mlp_block(h, layer_params, cfg)
    if cfg.post_ff_norm:
        ff = L.norm(ff, layer_params, cfg, "post_ff_norm")
    x = x + rm * ff
    return x, cache


def forward_hidden(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T]
    positions: jnp.ndarray,  # [B, T] absolute positions
    kv_cache: KVCache | None,
    token_types: jnp.ndarray | None = None,
    dtype=jnp.bfloat16,
    layer_range: tuple[int, int] | None = None,
    hidden_sharding=None,
    attn_window: int | None = None,
    seq_lengths: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, KVCache | None]:
    """Run embedding + all transformer layers. Returns (hidden [B,T,D], cache).

    layer_range mirrors the reference's DistributedContext.layerStart/End
    (pipeline sharding); None = all layers. hidden_sharding (a NamedSharding
    or PartitionSpec) enables sequence parallelism: constraining [B, T, D]
    activations to e.g. P('dp', 'tp', None) makes GSPMD keep the token axis
    sharded through norms/elementwise sections and gather only for attention.
    """
    x = _embed(params, cfg, tokens, positions, token_types, dtype)
    if hidden_sharding is not None:
        x = jax.lax.with_sharding_constraint(x, hidden_sharding)

    if cfg.rope_theta:
        inv_freq = jnp.asarray(rope_frequencies(cfg))
        cos, sin = rope_cos_sin(positions, inv_freq)
    else:
        cos = sin = None

    # per-layer static flags (gemma2 alternates sliding/global attention)
    sliding = np.zeros(cfg.n_layers, dtype=np.int32)
    if cfg.sliding_window is not None and cfg.model_type == "gemma2":
        sliding[::2] = cfg.sliding_window  # even layers slide (HF convention)
    elif cfg.sliding_window is not None and cfg.model_type == "mistral":
        sliding[:] = 0  # reference ignores mistral sliding window

    stacked = params["layers"]

    paged = isinstance(kv_cache, tuple) and len(kv_cache) == 2 and hasattr(
        kv_cache[0], "k_pool"
    )
    page_tables = kv_cache[1] if paged else None

    if isinstance(stacked, (list, tuple)):
        # UNROLLED path: params["layers"] is a per-layer list of dicts.
        # Each weight is its own array, so matmuls/Pallas kernels read
        # weights straight from HBM — no per-step dynamic-slice copy of the
        # stacked [L, ...] array (which costs ~2x HBM traffic under scan).
        # The KV cache is likewise a per-layer list of KVLayerCache (dense)
        # or PagedLayerCache pools, updated in place.
        lo, hi = layer_range if layer_range is not None else (0, cfg.n_layers)
        cache_is_list = isinstance(kv_cache, list)
        new_cache_list = list(kv_cache) if cache_is_list else None
        for l in range(lo, hi):
            cache_l = kv_cache[l] if cache_is_list else None
            sw = int(sliding[l]) if sliding[l] > 0 else None
            x, cache_l = _block(
                x, stacked[l], cfg, positions, cache_l, cos, sin, sw,
                attn_window, seq_lengths,
            )
            if cache_is_list:
                new_cache_list[l] = cache_l
        return x, new_cache_list

    def scan_body(x, per_layer):
        layer_params, kc, vc, slide = per_layer
        if paged:
            cache = L.PagedLayerCache(kc, vc, page_tables)
        elif kv_cache is not None:
            cache = L.KVLayerCache(kc, vc)
        else:
            cache = None
        # models with no sliding layers get a static None (the flash-prefill
        # kernel needs a static window); alternating-window models (gemma2)
        # trace the per-layer scalar, which only the XLA mask path accepts
        if not bool(np.any(sliding > 0)):
            sw = None
        else:
            sw = jnp.where(slide > 0, slide, jnp.iinfo(jnp.int32).max)
        x, cache = _block(x, layer_params, cfg, positions, cache, cos, sin, sw,
                          attn_window, seq_lengths)
        if paged:
            return x, (cache.k_pool, cache.v_pool)
        if cache is not None:
            return x, (cache.k, cache.v)
        return x, (jnp.zeros((), dtype), jnp.zeros((), dtype))

    if paged:
        pools = kv_cache[0]
        kc, vc = pools.k_pool, pools.v_pool
    elif kv_cache is not None:
        kc, vc = kv_cache.k, kv_cache.v
    else:
        kc = vc = jnp.zeros((cfg.n_layers,))

    if layer_range is not None:
        lo, hi = layer_range
        stacked = jax.tree.map(lambda a: a[lo:hi], stacked)
        if kv_cache is not None:
            kc, vc = kc[lo:hi], vc[lo:hi]
        else:
            kc = vc = jnp.zeros((hi - lo,))
        slide = jnp.asarray(sliding[lo:hi])
    else:
        slide = jnp.asarray(sliding)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (stacked, kc, vc, slide))

    new_cache = None
    if kv_cache is not None:
        if layer_range is not None:
            lo, hi = layer_range
            full_k, full_v = (
                (kv_cache[0].k_pool, kv_cache[0].v_pool)
                if paged
                else (kv_cache.k, kv_cache.v)
            )
            # tree-mapped so quantized (QArray) pools update data+scales
            upd = lambda f, n: jax.lax.dynamic_update_slice_in_dim(f, n, lo, 0)  # noqa: E731
            new_k = jax.tree.map(upd, full_k, new_k)
            new_v = jax.tree.map(upd, full_v, new_v)
        if paged:
            from ..kv.paged import PagedKVState

            new_cache = (PagedKVState(new_k, new_v), page_tables)
        else:
            new_cache = KVCache(new_k, new_v)
    return x, new_cache


def _interleave_concat(arrs, axis: int, tp: int):
    """Concatenate along `axis` with shard interleaving: the result's rows,
    viewed in tp equal blocks, give block i = [a0_shard_i; a1_shard_i; ...].
    With tp=1 this is a plain concat. Required so a shard_map/GSPMD block
    partition of the fused rows hands each tp shard exactly its own
    (q_i, k_i, v_i) / (gate_i, up_i) segments (parallel/tp_forward.py)."""
    if tp == 1:
        return jnp.concatenate(arrs, axis=axis)
    axis = axis % arrs[0].ndim
    parts = [
        a.reshape(*a.shape[:axis], tp, a.shape[axis] // tp, *a.shape[axis + 1:])
        for a in arrs
    ]
    cat = jnp.concatenate(parts, axis=axis + 1)
    return cat.reshape(*cat.shape[:axis], -1, *cat.shape[axis + 2:])


def _concat_rows(ws, tp: int = 1):
    """Concatenate weights along the output-row axis (works for [*, out, in]
    jnp arrays and QArrays of any fmt — q4/q8/q4k packing and block scales are
    all per-row along the input axis, so row concat never crosses a block).

    tp > 1 interleaves the rows per tp shard (see _interleave_concat)."""
    from ..nn.qarray import QArray

    if isinstance(ws[0], QArray):
        axis = ws[0].data.ndim - 2
        return QArray(
            _interleave_concat([w.data for w in ws], axis, tp),
            _interleave_concat([w.scales for w in ws], axis, tp),
            ws[0].fmt,
        )
    return _interleave_concat(ws, ws[0].ndim - 2, tp)


def _fuse_layer_dict(d: dict, tp: int = 1) -> dict:
    from ..nn.qarray import QArray

    out = dict(d)
    qkv = [d.get("wq"), d.get("wk"), d.get("wv")]
    fmts = {w.fmt if isinstance(w, QArray) else None for w in qkv if w is not None}
    biases = [d.get("wq.bias"), d.get("wk.bias"), d.get("wv.bias")]
    n_bias = sum(b is not None for b in biases)
    # bias presence must be uniform (all three or none): fusing weights while
    # dropping a partial bias set would silently change the model's outputs
    if all(w is not None for w in qkv) and len(fmts) == 1 and n_bias in (0, 3):
        out["wqkv"] = _concat_rows(qkv, tp)
        if n_bias == 3:
            out["wqkv.bias"] = _interleave_concat(biases, -1, tp)
        for k in ("wq", "wk", "wv", "wq.bias", "wk.bias", "wv.bias"):
            out.pop(k, None)
    if (
        "w1" in d
        and "w3" in d
        and "w1.bias" not in d
        and (
            isinstance(d["w1"], QArray) == isinstance(d["w3"], QArray)
            and (
                not isinstance(d["w1"], QArray)
                or d["w1"].fmt == d["w3"].fmt
            )
        )
    ):
        out["w13"] = _concat_rows([d["w1"], d["w3"]], tp)
        for k in ("w1", "w3"):
            out.pop(k, None)
    return out


def fuse_params(params: dict, tp: int = 1) -> dict:
    """Fuse QKV into one [qdim+2*kvdim, D] matmul and gate/up into one
    [2H, D] matmul (one-time concat; numerics unchanged — the same rows hit
    the same reduction).

    TPU-first replacement for the reference's per-projection GEMM calls
    (CausalSelfAttention.java:176-192, MLPBlock.java:116-127): decode (M=1)
    is launch- and bandwidth-bound, so fewer, larger kernels win. The forward
    path uses the fused keys when present (see nn.layers).

    tp > 1 (the shard_map tensor-parallel path) interleaves the fused rows
    so tp shard i's contiguous row block is [wq_i; wk_i; wv_i] — the local
    qkv split inside shard_map then lands on head boundaries. The plain
    (tp=1) layout stays the GSPMD/single-device format.
    """
    stacked = params.get("layers")
    out = dict(params)
    if isinstance(stacked, (list, tuple)):
        out["layers"] = [_fuse_layer_dict(d, tp) for d in stacked]
    elif isinstance(stacked, dict):
        out["layers"] = _fuse_layer_dict(stacked, tp)
    return out


def prepare_moe_ragged(params: dict) -> dict:
    """One-time transpose of float MoE expert weights into the ragged_dot
    layout ([L, E, in, out]); enables the grouped-matmul MoE path.

    Quantized experts are left dense (their block-32 quantization axis is the
    input dim, which the transpose would move off the last axis)."""
    import numpy as _np

    from ..nn.qarray import QArray

    stacked = params.get("layers")
    if not isinstance(stacked, dict) or "experts.w1" not in stacked:
        return params
    if isinstance(stacked["experts.w1"], QArray):
        return params
    layers = dict(stacked)
    for k in ("experts.w1", "experts.w2", "experts.w3"):
        w = layers[k]  # [L, E, out, in]
        layers[k + "_t"] = jnp.swapaxes(w, -1, -2)  # [L, E, in, out]
    for k in ("experts.w1", "experts.w2", "experts.w3"):
        del layers[k]
    out = dict(params)
    out["layers"] = layers
    return out


def effective_layer_mode(cfg: ModelConfig, layer_mode: str) -> str:
    """Resolve the requested layer mode against the model's constraints:
    alternating static sliding windows (gemma2) cannot ride the scan — the
    traced per-layer window scalar forces the XLA mask path — so such
    models auto-select the unrolled path where each layer's window is a
    Python int that dispatches to the windowed paged-decode kernel."""
    if (
        layer_mode == "scan"
        and cfg.sliding_window is not None
        and cfg.model_type == "gemma2"
    ):
        return "unrolled"
    return layer_mode


def unstack_params(params: dict, cfg: ModelConfig) -> dict:
    """Convert stacked layer params to a per-layer list (one-time copy).

    The unrolled forward path then reads each weight directly from its own
    HBM buffer instead of dynamic-slicing the stacked array every step.
    """
    stacked = params["layers"]
    if isinstance(stacked, (list, tuple)):
        return params
    layers = []
    for l in range(cfg.n_layers):
        layers.append({k: v[l] for k, v in stacked.items()})
    out = dict(params)
    out["layers"] = layers
    return out


def unstack_cache(cache: KVCache) -> list:
    """Stacked KVCache → per-layer list of KVLayerCache."""
    from ..nn.layers import KVLayerCache

    return [
        KVLayerCache(cache.k[l], cache.v[l]) for l in range(cache.k.shape[0])
    ]


def final_hidden(params: dict, cfg: ModelConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """Apply the output norm (cf. SampleOutput.getOutputLayerNorm)."""
    return L.norm(hidden, params, cfg, "final_norm")


def lm_logits(params: dict, cfg: ModelConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """Project to vocab logits with softcap/multiplier semantics.

    cf. AbstractModel.sample (AbstractModel.java:443-491): logit multiplier
    (granite divides by logits_scaling) then final softcapping (gemma2).
    """
    from ..parallel import tp_forward

    h = final_hidden(params, cfg, hidden)
    w = params.get("lm_head", params["embed"])
    logits = linear(h, w, out_dtype=jnp.float32)
    ctx = tp_forward.current()
    if ctx is not None and ctx.lm_head_vocab_sharded:
        # inside shard_map: each shard computed its vocab-column slice;
        # concatenate into the full logits (sampling runs replicated)
        logits = tp_forward.gather_vocab_logits(logits, ctx.tp_axis)
    if cfg.logit_multiplier is not None:
        logits = logits / cfg.logit_multiplier
    if cfg.final_logit_softcap is not None:
        logits = jnp.tanh(logits / cfg.final_logit_softcap) * cfg.final_logit_softcap
    return logits


def forward_logits(
    params, cfg, tokens, positions, kv_cache=None, token_types=None, dtype=jnp.bfloat16
):
    hidden, cache = forward_hidden(
        params, cfg, tokens, positions, kv_cache, token_types, dtype
    )
    return lm_logits(params, cfg, hidden), cache
