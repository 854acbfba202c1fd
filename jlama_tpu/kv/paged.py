"""Paged KV cache: fixed on-device page pool + per-sequence page tables.

TPU-native redesign of the reference's KvBufferCache
(/root/reference/jlama-core/.../tensor/KvBufferCache.java:48-354): instead of
lazily-allocated host pages (8 MiB mmap files), a fixed page pool lives in
HBM and dynamic allocation becomes host-side page-table bookkeeping — the
device program sees only static shapes (pool + int32 page tables), which is
what jit requires.

Layout (head-major — matches the Pallas paged-attention kernel's
[num_kv_heads, total_pages, page_size, head_dim] and lets the head axis ride
the tp mesh axis):
  k_pool, v_pool: [n_layers, n_kv_heads, n_pages, page_size, head_size]
  page table row: [max_pages_per_seq] int32 page ids

Page 0 is reserved as a scratch/garbage page so unallocated table entries can
point somewhere harmless.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..nn.qarray import QArray


class PagedKVState(NamedTuple):
    """Device-side state (a pytree; donated through jitted steps).

    Pools are plain arrays (bf16/f32) or QArrays (fmt "q8": int8 payload +
    block-32 scales along head_size) when the cache dtype is quantized —
    the TPU equivalent of the reference writing K/V quantized to a cache
    dtype distinct from compute (CausalSelfAttention.java:212-229,
    KvBufferCache.java:102). q8 gives 2x the context per HBM byte vs bf16.
    """

    k_pool: jnp.ndarray | QArray  # [L, n_kv, n_pages, page_size, hd]
    v_pool: jnp.ndarray | QArray


@dataclass
class PageAllocator:
    """Host-side page bookkeeping (the reference's lazy page allocation).

    groups > 1 (data-parallel serving, parallel/tp_forward.py): the page id
    space is partitioned into `groups` equal ranges, one per dp shard; a
    sequence allocates only from its group's range so its pages live in the
    dp shard that owns its batch rows. Page g*(n_pages//groups) of each
    range is that group's scratch page (the target for unallocated
    page-table entries; group 0's is the classic page 0)."""

    n_pages: int
    groups: int = 1
    free: list[list[int]] = field(default_factory=list)
    by_seq: dict[str, list[int]] = field(default_factory=dict)
    group_of: dict[str, int] = field(default_factory=dict)

    def __post_init__(self):
        per = self.n_pages // self.groups
        # first page of each group's range reserved as its scratch target
        self.free = [
            list(range((g + 1) * per - 1, g * per, -1))
            for g in range(self.groups)
        ]

    def scratch(self, group: int = 0) -> int:
        return group * (self.n_pages // self.groups)

    def pages_for(self, seq_id: str) -> list[int]:
        return self.by_seq.setdefault(seq_id, [])

    def ensure_capacity(
        self, seq_id: str, n_tokens: int, page_size: int, group: int = 0
    ) -> list[int]:
        pages = self.pages_for(seq_id)
        if pages:
            group = self.group_of.get(seq_id, group)
        needed = -(-n_tokens // page_size)
        free = self.free[group]
        while len(pages) < needed:
            if not free:
                raise MemoryError("KV page pool exhausted")
            pages.append(free.pop())
            self.group_of[seq_id] = group
        return pages

    def release(self, seq_id: str) -> None:
        pages = self.by_seq.pop(seq_id, [])
        g = self.group_of.pop(seq_id, 0)
        self.free[g].extend(reversed(pages))

    @property
    def n_free(self) -> int:
        return sum(len(f) for f in self.free)


class PagedKVCache:
    """Pool + allocator + padded page-table assembly."""

    def __init__(
        self,
        cfg: ModelConfig,
        n_pages: int,
        page_size: int = 64,
        max_pages_per_seq: int | None = None,
        dtype=jnp.bfloat16,
        groups: int = 1,
    ):
        """dtype: a jnp float dtype, or the string "q8" for a quantized pool
        (int8 payload + block-32 f32 scales along head_size — half the HBM
        per cached token of bf16, so 2x context headroom per chip)."""
        self.cfg = cfg
        self.page_size = page_size
        self.n_pages = n_pages
        self.max_pages_per_seq = max_pages_per_seq or (
            -(-cfg.context_length // page_size)
        )
        shape = (cfg.n_layers, cfg.n_kv_heads, n_pages, page_size, cfg.head_size)
        if dtype == "q8":
            # reference block-32 layout when it divides head_size; else one
            # scale per head row (covers head_size 16/80-style models)
            blk = 32 if cfg.head_size % 32 == 0 else cfg.head_size
            sshape = shape[:-1] + (cfg.head_size // blk,)

            def qpool():
                return QArray(
                    jnp.zeros(shape, jnp.int8), jnp.zeros(sshape, jnp.float32), "q8"
                )

            self.state = PagedKVState(qpool(), qpool())
        else:
            self.state = PagedKVState(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        self.alloc = PageAllocator(n_pages, groups=groups)

    def page_table(
        self, seq_ids: list[str], groups: list[int] | None = None
    ) -> np.ndarray:
        """Padded page tables [B, max_pages_per_seq]; unallocated entries
        point at the row's group scratch page (page 0 for group 0)."""
        P = self.max_pages_per_seq
        out = np.zeros((len(seq_ids), P), dtype=np.int32)
        for i, sid in enumerate(seq_ids):
            g = groups[i] if groups else self.alloc.group_of.get(sid, 0)
            if g:
                out[i, :] = self.alloc.scratch(g)
            pages = self.alloc.pages_for(sid)
            out[i, : len(pages)] = pages
        return out


# ---------------------------------------------------------------------------
# device-side ops (pure, jit-friendly)
# ---------------------------------------------------------------------------


def write_kv_layer(
    k_pool,  # [n_kv, n_pages, ps, hd] (single layer) — jnp array or QArray
    v_pool,
    k_new: jnp.ndarray,  # [B, T, n_kv, hd]
    v_new: jnp.ndarray,
    page_tables: jnp.ndarray,  # [B, P] int32
    positions: jnp.ndarray,  # [B, T] absolute token positions
):
    """Scatter new K/V rows into the pool at their (page, offset) slots.

    Quantized (QArray "q8") pools quantize each new row per block-32 along
    head_size before the scatter (cf. CausalSelfAttention.java:212-229
    writing K/V in the cache's dtype, not the compute dtype).
    """
    ps = (k_pool.data if isinstance(k_pool, QArray) else k_pool).shape[2]
    B, T = positions.shape
    page_idx = jnp.take_along_axis(
        page_tables, positions // ps, axis=1
    )  # [B, T]
    offs = positions % ps
    flat_pages = page_idx.reshape(-1)
    flat_offs = offs.reshape(-1)
    # [B*T, n_kv, hd] -> [n_kv, B*T, hd] to match head-major pools
    kf = k_new.reshape(B * T, -1, k_new.shape[-1]).transpose(1, 0, 2)
    vf = v_new.reshape(B * T, -1, v_new.shape[-1]).transpose(1, 0, 2)
    if isinstance(k_pool, QArray):
        from ..quant.blockq import q8_quantize

        blk = k_pool.data.shape[-1] // k_pool.scales.shape[-1]
        kq, ks = q8_quantize(kf, block=blk)
        vq, vs = q8_quantize(vf, block=blk)
        k_pool = QArray(
            k_pool.data.at[:, flat_pages, flat_offs].set(kq),
            k_pool.scales.at[:, flat_pages, flat_offs].set(ks),
            "q8",
        )
        v_pool = QArray(
            v_pool.data.at[:, flat_pages, flat_offs].set(vq),
            v_pool.scales.at[:, flat_pages, flat_offs].set(vs),
            "q8",
        )
        return k_pool, v_pool
    k_pool = k_pool.at[:, flat_pages, flat_offs].set(kf.astype(k_pool.dtype))
    v_pool = v_pool.at[:, flat_pages, flat_offs].set(vf.astype(v_pool.dtype))
    return k_pool, v_pool


def _gather_one(pool, page_tables, dtype):
    if isinstance(pool, QArray):
        blk = pool.data.shape[-1] // pool.scales.shape[-1]
        d = pool.data[:, page_tables]  # [n_kv, B, P, ps, hd] int8
        s = pool.scales[:, page_tables]  # [n_kv, B, P, ps, hd/blk]
        x = d.reshape(*d.shape[:-1], d.shape[-1] // blk, blk).astype(jnp.float32)
        x = (x * s[..., None]).reshape(d.shape).astype(dtype)
    else:
        x = pool[:, page_tables]
    n_kv, B, P, ps, hd = x.shape
    return x.transpose(1, 2, 3, 0, 4).reshape(B, P * ps, n_kv, hd)


def gather_kv_layer(
    k_pool,
    v_pool,
    page_tables: jnp.ndarray,  # [B, P]
    dtype=jnp.bfloat16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Materialize each sequence's KV window [B, P*ps, n_kv, hd] (XLA path).

    The Pallas paged-attention kernel reads pages directly from HBM instead;
    this gather is the portable reference path (CPU tests, prefill, and
    quantized pools, which it dequantizes after gathering only the live
    pages).
    """
    return (
        _gather_one(k_pool, page_tables, dtype),
        _gather_one(v_pool, page_tables, dtype),
    )
