"""Pallas TPU kernel: fused Q4 dequant + matmul.

TPU-native equivalent of the reference's native GEMM library
(/root/reference/jlama-native/src/main/c/simd/vector_simd.c: gemm_f32_q4 /
gemm_q8_q4): weights stream from HBM as packed 4-bit nibbles (+block scales),
are dequantized on the VPU inside VMEM, and hit the MXU as bf16 — so decode
stays weight-bandwidth-bound at ~4.5 bits/weight instead of 16.

Design notes (all shaped by Mosaic's layout rules):

- "q4k" column order: checkpoint JQ4 packs byte j of 32-block b at column
  b*16+j (elements b*32+j lo-nibble / b*32+16+j hi-nibble).
  `to_kernel_layout` permutes byte columns ONCE at load to c = j*nb + b
  (nb = K/32). Then the per-block scale of any packed column c is
  scales[c mod nb] — exactly the tiling `pltpu.repeat` produces — and every
  kernel step is a pure 2-D op (Mosaic rejects 3-D reshapes).
- The activation's contraction axis is permuted to match OUTSIDE the kernel
  (cheap: x is M×K; weights are N×K), leaving the dot product unchanged.
- VPU economy: nibbles stay UNSIGNED [0,15] (Mosaic cannot subtract in int8,
  and the -8 shift is instead folded into a rank-1 correction
  y -= 8 * (block_sums(x) @ scales.T), a tiny extra MXU dot); the two nibble
  planes feed two separate dots (no concat copy); scales are bf16 so the
  dequant multiply runs at bf16 lane width.
- Native int4 storage was probed and is DEAD on this toolchain
  (scripts/probe_int4.py, 2026-08-20): Mosaic rejects u4->bf16 converts
  ("Unsupported cast") and u8->2xu4 bitcasts ("Changing bitwidths not
  supported") in-kernel, and the relay cannot even hold an XLA s4 array
  (transfer recursion). The &0xF / >>4 extraction below is therefore the
  only packed-load path; its measured cost is ~130 GB/s of stream rate
  (dot2 diagnostic, STATUS.md) and the kernel sits at the bf16-dequant
  design's VPU floor (~500 GB/s) until the toolchain gains 8-bit or 4-bit
  vector arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.qarray import QArray


def kernel_column_perm(k: int) -> np.ndarray:
    """Byte-column permutation: new column c takes old column (c%nb)*16+c//nb."""
    nb = k // 32
    c = np.arange(k // 2)
    return (c % nb) * 16 + c // nb


def to_kernel_layout(w: QArray, chunks: int = 1) -> QArray:
    """One-time repack of a canonical q4 QArray into kernel column order.

    chunks > 1 (the shard_map tensor-parallel path): the input/contraction
    dim is split into `chunks` contiguous block-aligned slices and each
    slice gets its OWN kernel column order. A tp block-partition of the
    packed axis then hands shard i packed columns that are exactly the q4k
    layout for K/chunks — required for row-parallel (input-sharded) weights
    (wo/w2), whose global q4k permutation would otherwise interleave every
    shard's input features (parallel/tp_forward.py). The block-32 scales
    need no repack: chunk i's scale columns are already the contiguous
    slice [i*nb/chunks, (i+1)*nb/chunks)."""
    if w.fmt != "q4":
        raise ValueError(f"expected fmt q4, got {w.fmt}")
    k = w.data.shape[-1] * 2
    # q4k scales are stored bf16: the kernel dequantizes at bf16 lane width
    # anyway (numerics identical), and keeping the master f32 scales would
    # cost a [N, K/32] f32->bf16 conversion pass EVERY matmul call (~70 MB
    # of extra traffic per 1B decode step) plus 2x the scale bytes in the
    # weight stream (4.5 -> 4.0625 bits/weight effective)
    scales = w.scales.astype(jnp.bfloat16)
    if chunks == 1:
        return QArray(w.data[..., kernel_column_perm(k)], scales, "q4k")
    if k % (32 * chunks):
        raise ValueError(f"k={k} not block-divisible into {chunks} chunks")
    kl = k // chunks
    perm = kernel_column_perm(kl)
    d = w.data.reshape(*w.data.shape[:-1], chunks, kl // 2)
    d = d[..., perm].reshape(w.data.shape)
    return QArray(d, scales, "q4k")


def from_kernel_layout(w: QArray) -> QArray:
    if w.fmt != "q4k":
        raise ValueError(f"expected fmt q4k, got {w.fmt}")
    k = w.data.shape[-1] * 2
    inv = np.argsort(kernel_column_perm(k))
    return QArray(w.data[..., inv], w.scales.astype(jnp.float32), "q4")


def split_x(x: jnp.ndarray):
    """Split/permute x's contraction axis to match the q4k nibble planes.

    Returns (x_lo, x_hi, x_block_sums): lo/hi are [M, K/2] with column
    j*nb+b ↦ element b*32+j (resp. +16); block_sums is [M, K/32].
    """
    m, k = x.shape
    nb = k // 32
    xb = x.reshape(m, nb, 32)
    lo = xb[:, :, :16].transpose(0, 2, 1).reshape(m, 16 * nb)
    hi = xb[:, :, 16:].transpose(0, 2, 1).reshape(m, 16 * nb)
    # block sums stay f32: y = d - 8*corr cancels two large terms, so any
    # rounding of the sums (unlike the consistently-rounded bf16 scales) is
    # amplified by |8*corr|/|y|
    bsum = xb.sum(axis=-1, dtype=jnp.float32)
    return lo, hi, bsum


def _q4_matmul_kernel(xl_ref, xh_ref, xb_ref, wp_ref, s_ref, o_ref, *, out_dtype):
    """One output tile: o[M, TN] = x @ deq(wp, s).T via unsigned nibbles."""
    w32 = wp_ref[...].astype(jnp.int32)  # [TN, K/2] kernel column order
    lo = (w32 & 0x0F).astype(jnp.bfloat16)
    hi = (w32 >> 4).astype(jnp.bfloat16)
    s = s_ref[...]  # bf16 [TN, nb]
    srep = pltpu.repeat(s, 16, axis=1)  # tiles: column c ↦ s[c mod nb]
    d = jax.lax.dot_general(
        xl_ref[...], lo * srep, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d += jax.lax.dot_general(
        xh_ref[...], hi * srep, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    corr = jax.lax.dot_general(
        xb_ref[...], s.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (d - 8.0 * corr).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_n", "interpret"))
def q4k_matmul_2d(
    x: jnp.ndarray,  # [M, K]
    packed: jnp.ndarray,  # [N, K/2] uint8, kernel column order
    scales: jnp.ndarray,  # [N, K/32]
    out_dtype=jnp.bfloat16,
    block_n: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    m, k = x.shape
    n = packed.shape[0]
    # Large M (prefill) tiles the row axis too, else the [M, K/2] activation
    # planes + [bn, K/2] dequant intermediates blow the ~16 MB VMEM budget
    # (k=14336 at bm=256/bn=256 measured 17.75M scoped > 16M limit).
    # m is the OUTER grid axis so the weight stream (the big operand in
    # decode; the reused one in prefill) is sequential per m-tile.
    import os

    env_bm = os.environ.get("JLAMA_Q4_BLOCK_M")
    bm = min(int(env_bm) if env_bm else (256 if k <= 8192 else 128), m)
    pad_m = (-m) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
        m_p = m + pad_m
    else:
        m_p = m
    if block_n is None:
        # VMEM-safe block height by contraction size (measured on v5e, r4
        # block_n sweep: bn=512 beats 1024 at k=4096 on few-tile shapes —
        # 439 vs 417 GB/s at n=4096 — and ties elsewhere; k=14336 OOMs
        # beyond 256 yet still streams ~480 GB/s — VPU-bound, not DMA-bound)
        env_bn = os.environ.get("JLAMA_Q4_BLOCK_N")
        if env_bn and k <= 8192:  # k>8192 needs <=256 to fit VMEM
            block_n = int(env_bn)
        else:
            block_n = 512 if k <= 8192 else 256
    # batched prefill at k>8192 needs bn<=128: at bm=128/bn=256/k=14336 the
    # in-kernel int32+bf16 dequant intermediates hit 18.86M scoped VMEM > 16M
    # (measured: 8-request x 256-token chunks = 2048 rows OOM'd serving)
    bn = min(block_n if m <= 32 else (256 if k <= 8192 else 128), n)
    while n % bn:
        bn //= 2
    xl, xh, xb = split_x(x.astype(jnp.bfloat16))
    out = pl.pallas_call(
        functools.partial(_q4_matmul_kernel, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((m_p, n), out_dtype),
        grid=(m_p // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k // 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k // 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k // 32), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k // 2), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k // 32), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n * k,
            bytes_accessed=n * k // 2 + n * k // 32 * 2 + m_p * k * 2 + m_p * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xl, xh, xb, packed, scales.astype(jnp.bfloat16))
    return out[:m] if pad_m else out


def q4_matmul(x: jnp.ndarray, w: QArray, out_dtype=jnp.bfloat16, interpret=False):
    """y = x @ dequant(w).T for arbitrary leading dims of x.

    Accepts fmt "q4k" (preferred: repacked once at load via
    prepare_params_for_pallas) or canonical "q4" (repacked on the fly —
    correct but wasteful inside a decode loop).
    """
    if w.fmt == "q4":
        w = QArray(
            w.data[..., kernel_column_perm(w.data.shape[-1] * 2)], w.scales, "q4k"
        )
    import os

    interpret = interpret or os.environ.get("JLAMA_PALLAS_INTERPRET") == "1"
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    y = q4k_matmul_2d(x2, w.data, w.scales, out_dtype=out_dtype, interpret=interpret)
    return y.reshape(*lead, -1)


# layer weights whose INPUT dim is tp-sharded in the shard_map forward (the
# psum/combine-point projections): these repack per-shard (chunked)
_ROW_PARALLEL_KEYS = ("wo", "w2")


def prepare_params_for_pallas(params, row_chunks: int = 1):
    """Convert q4 QArray leaves to kernel layout (one-time).

    The embedding table stays canonical "q4": token lookup gathers rows and
    dequantizes positionally, which the permuted q4k columns would corrupt.
    For tied-embedding models a separate q4k copy is installed as "lm_head"
    so the output projection still gets the fused kernel.

    row_chunks: the shard_map tp degree — row-parallel weights (wo/w2) get
    the per-shard chunked kernel layout (see to_kernel_layout).
    """

    def conv(leaf, chunks=1):
        if isinstance(leaf, QArray) and leaf.fmt == "q4":
            return to_kernel_layout(leaf, chunks)
        return leaf

    def conv_layer_dict(d: dict) -> dict:
        return {
            k: conv(v, row_chunks if k in _ROW_PARALLEL_KEYS else 1)
            for k, v in d.items()
        }

    out = dict(params)
    embed = out.get("embed")
    if isinstance(embed, QArray) and embed.fmt == "q4" and "lm_head" not in out:
        out["lm_head"] = to_kernel_layout(embed)
    for k, v in out.items():
        if k in ("embed", "layers"):
            continue
        out[k] = jax.tree.map(conv, v, is_leaf=lambda x: isinstance(x, QArray))
    lay = out.get("layers")
    if isinstance(lay, dict):
        out["layers"] = conv_layer_dict(lay)
    elif isinstance(lay, (list, tuple)):
        out["layers"] = [conv_layer_dict(d) for d in lay]
    return out
