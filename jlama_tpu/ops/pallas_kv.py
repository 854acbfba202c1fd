"""Pallas in-place KV cache write (dense layout).

The XLA lowering of a decode step's cache update (`dynamic_update_slice`
into the [B, n_kv, S, hd] buffer) gets fused with its consumers inside the
device decode loop and rematerializes the whole buffer — measured ~0.35
ms/step at 1B (scripts/diag_1b.py fullwin vs fullwin+no_kv_write), i.e. the
2 MB-per-layer cache is rewritten per step to store a 1 KB row. This kernel
updates ONE bs-row block in place via `input_output_aliases` (the rest of
the buffer is untouched aliased memory), so the write costs bs rows of
traffic instead of S.

cf. the reference writing K/V rows directly into its paged buffers
(CausalSelfAttention.java:199-243) — mutation is trivial on the JVM heap;
on TPU it takes an aliased custom call to express.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kv_write_kernel(pos_ref, new_ref, blk_ref, o_ref, *, bs):
    off = pos_ref[0] % bs
    rows = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 1)
    o_ref[...] = jnp.where(rows == off, new_ref[...], blk_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_dense1(
    pool: jnp.ndarray,  # [1, n_kv, S, hd]
    new: jnp.ndarray,  # [1, n_kv, 1, hd]
    pos: jnp.ndarray,  # [] or [1] int32 absolute position
    interpret: bool = False,
) -> jnp.ndarray:
    """Write one token's K or V rows into the dense cache in place (B==1)."""
    _, n_kv, S, hd = pool.shape
    bs = 8  # minimal sublane-aligned row block (f32; bf16 pools would need
    # >=16 rows on real hardware — this is a measured-slower PROBE, see
    # module docstring, not a production path)
    if S % bs or pool.shape[0] != 1:
        raise ValueError(f"kv_write_dense1 needs B==1 and S%{bs}==0")
    pool3 = pool.reshape(n_kv, S, hd)
    new3 = new.astype(pool.dtype).reshape(n_kv, 1, hd)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n_kv, 1, hd), lambda i, p: (0, 0, 0)),
            pl.BlockSpec((n_kv, bs, hd), lambda i, p: (0, p[0] // bs, 0)),
        ],
        out_specs=pl.BlockSpec((n_kv, bs, hd), lambda i, p: (0, p[0] // bs, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kv_write_kernel, bs=bs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pool3.shape, pool3.dtype),
        input_output_aliases={2: 0},  # pool (3rd input incl. prefetch) -> out
        interpret=interpret,
    )(pos_arr, new3, pool3)
    return out.reshape(pool.shape)
