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


class PagedKVState(NamedTuple):
    """Device-side state (a pytree; donated through jitted steps)."""

    k_pool: jnp.ndarray  # [L, n_pages, page_size, n_kv, hd]
    v_pool: jnp.ndarray


@dataclass
class PageAllocator:
    """Host-side page bookkeeping (the reference's lazy page allocation)."""

    n_pages: int
    free: list[int] = field(default_factory=list)
    by_seq: dict[str, list[int]] = field(default_factory=dict)

    def __post_init__(self):
        # page 0 reserved as scratch target for unallocated entries
        self.free = list(range(self.n_pages - 1, 0, -1))

    def pages_for(self, seq_id: str) -> list[int]:
        return self.by_seq.setdefault(seq_id, [])

    def ensure_capacity(self, seq_id: str, n_tokens: int, page_size: int) -> list[int]:
        pages = self.pages_for(seq_id)
        needed = -(-n_tokens // page_size)
        while len(pages) < needed:
            if not self.free:
                raise MemoryError("KV page pool exhausted")
            pages.append(self.free.pop())
        return pages

    def release(self, seq_id: str) -> None:
        pages = self.by_seq.pop(seq_id, [])
        self.free.extend(reversed(pages))

    @property
    def n_free(self) -> int:
        return len(self.free)


class PagedKVCache:
    """Pool + allocator + padded page-table assembly."""

    def __init__(
        self,
        cfg: ModelConfig,
        n_pages: int,
        page_size: int = 64,
        max_pages_per_seq: int | None = None,
        dtype=jnp.bfloat16,
    ):
        self.cfg = cfg
        self.page_size = page_size
        self.n_pages = n_pages
        self.max_pages_per_seq = max_pages_per_seq or (
            -(-cfg.context_length // page_size)
        )
        shape = (cfg.n_layers, cfg.n_kv_heads, n_pages, page_size, cfg.head_size)
        self.state = PagedKVState(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        self.alloc = PageAllocator(n_pages)

    def page_table(self, seq_ids: list[str]) -> np.ndarray:
        """Padded page tables [B, max_pages_per_seq]; unallocated → 0 (scratch)."""
        P = self.max_pages_per_seq
        out = np.zeros((len(seq_ids), P), dtype=np.int32)
        for i, sid in enumerate(seq_ids):
            pages = self.alloc.pages_for(sid)
            out[i, : len(pages)] = pages
        return out


# ---------------------------------------------------------------------------
# device-side ops (pure, jit-friendly)
# ---------------------------------------------------------------------------


def write_kv_layer(
    k_pool: jnp.ndarray,  # [n_kv, n_pages, ps, hd] (single layer)
    v_pool: jnp.ndarray,
    k_new: jnp.ndarray,  # [B, T, n_kv, hd]
    v_new: jnp.ndarray,
    page_tables: jnp.ndarray,  # [B, P] int32
    positions: jnp.ndarray,  # [B, T] absolute token positions
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter new K/V rows into the pool at their (page, offset) slots."""
    ps = k_pool.shape[2]
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
    k_pool = k_pool.at[:, flat_pages, flat_offs].set(kf.astype(k_pool.dtype))
    v_pool = v_pool.at[:, flat_pages, flat_offs].set(vf.astype(v_pool.dtype))
    return k_pool, v_pool


def gather_kv_layer(
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    page_tables: jnp.ndarray,  # [B, P]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Materialize each sequence's KV window [B, P*ps, n_kv, hd] (XLA path).

    The Pallas paged-attention kernel reads pages directly from HBM instead;
    this gather is the portable reference path (CPU tests, prefill).
    """
    k = k_pool[:, page_tables]  # [n_kv, B, P, ps, hd]
    v = v_pool[:, page_tables]
    n_kv, B, P, ps, hd = k.shape
    return (
        k.transpose(1, 2, 3, 0, 4).reshape(B, P * ps, n_kv, hd),
        v.transpose(1, 2, 3, 0, 4).reshape(B, P * ps, n_kv, hd),
    )
