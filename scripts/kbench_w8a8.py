"""Microbench: w8a8 (Q8-activation x Q4-weight) kernel candidates.

The reference's primary hot path is gemm_q8_q4 (vector_simd.c:186-480):
per-32-block int8 dot products, combined with the product of the
activation-block scale and the weight-block scale, f32 accumulate. On TPU the
open question is how to keep the per-32-block scale structure while feeding
the int8 MXU. Candidates measured here (GB/s on the 4-bit weight bytes):

- xb8 : XLA batched int8 dot, weights stored int8 [nb, 32, n] (2x HBM bytes —
        pure MXU-speed probe, not a product layout)
- xb4 : XLA batched dot, weights stored native int4 [nb, 32, n] (4-bit HBM!)
        XLA widens int4->int8 in the fused loop.
- xb4f: same int4 storage, but dequant to bf16 + single full-K dot (XLA fuses)
- pb8 : Pallas kernel: packed u8 [nb, 16, n] blocks, in-kernel unpack to two
        int8 planes, batched dot_general over nb blocks of K=16 each plane,
        per-block scale combine on the VPU.
- pbK : Pallas kernel: int8 full-K dot per K-TILE of 512 with scales folded
        into the activation... (only exact when weight scale constant per
        tile; measured for speed reference only)

All candidates are checked against the exact f32 reference
(per-block scale-product accumulation) with rel tol 2e-2 unless marked.
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jlama_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

from jlama_tpu.quant.blockq import q4_unpack_np, q8_quantize
from kbench_q4 import bench  # noqa: E402

BS = 32


def ref_w8a8(xq, xs, vals, scales):
    """Exact reference: per-block int32 dots x scale products, f32 accum.

    xq [m,k] i8, xs [m,nb] f32, vals [n,k] i8 (already -8..7), scales [n,nb].
    """
    m, k = xq.shape
    n = vals.shape[0]
    nb = k // BS
    a = xq.astype(np.int32).reshape(m, nb, BS)
    w = np.asarray(vals).astype(np.int32).reshape(n, nb, BS)
    d = np.einsum("mbj,nbj->mnb", a, w).astype(np.float32)
    return np.einsum("mnb,mb,nb->mn", d, np.asarray(xs), np.asarray(scales))


# ---- xb8: XLA batched int8 (weights int8 in HBM: 2x bytes, speed probe) ----

def _prep_xb8(packed, scales):
    vals = q4_unpack_np(np.asarray(packed))  # [n, k] i8
    n, k = vals.shape
    nb = k // BS
    w3 = vals.reshape(n, nb, BS).transpose(1, 2, 0)  # [nb, 32, n]
    s2 = np.asarray(scales).T  # [nb, n]
    return jnp.asarray(w3), jnp.asarray(s2, jnp.float32)


@jax.jit
def xb8(x, w3, s2):
    m, k = x.shape
    nb = k // BS
    xq, xs = q8_quantize(x)  # [m,k] i8, [m,nb] f32
    a3 = xq.reshape(m, nb, BS).transpose(1, 0, 2)  # [nb, m, 32]
    d = jax.lax.dot_general(
        a3, w3, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32
    )  # [nb, m, n]
    d = d.astype(jnp.float32) * xs.T[:, :, None] * s2[:, None, :]
    return jnp.sum(d, axis=0).astype(jnp.bfloat16)


# ---- xb4: XLA batched, int4 HBM storage --------------------------------------

def _prep_xb4(packed, scales):
    vals = q4_unpack_np(np.asarray(packed))
    n, k = vals.shape
    nb = k // BS
    w3 = vals.reshape(n, nb, BS).transpose(1, 2, 0)
    s2 = np.asarray(scales).T
    return jnp.asarray(w3).astype(jnp.int4), jnp.asarray(s2, jnp.float32)


@jax.jit
def xb4(x, w4, s2):
    m, k = x.shape
    nb = k // BS
    xq, xs = q8_quantize(x)
    a3 = xq.reshape(m, nb, BS).transpose(1, 0, 2)
    d = jax.lax.dot_general(
        a3, w4.astype(jnp.int8), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    d = d.astype(jnp.float32) * xs.T[:, :, None] * s2[:, None, :]
    return jnp.sum(d, axis=0).astype(jnp.bfloat16)


# ---- xb4f: int4 HBM storage, bf16 dequant full-K dot (XLA-fused) -------------

def _prep_xb4f(packed, scales):
    vals = q4_unpack_np(np.asarray(packed))  # [n,k]
    return jnp.asarray(vals).astype(jnp.int4), jnp.asarray(scales, jnp.bfloat16)


@jax.jit
def xb4f(x, w4, ws):
    n, k = w4.shape
    nb = k // BS
    wf = w4.astype(jnp.bfloat16).reshape(n, nb, BS) * ws[:, :, None]
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), wf.reshape(n, k), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


# ---- xb4K: int4 storage, full-K int8 dot + per-token scale (NOT exact w.r.t.
# per-block weight scales; speed probe for the int8 MXU at full K) -------------

def _prep_xb4K(packed, scales):
    vals = q4_unpack_np(np.asarray(packed))
    return jnp.asarray(vals).astype(jnp.int4), jnp.asarray(scales, jnp.float32)


@jax.jit
def xb4K(x, w4, ws):
    xq, xs = q8_quantize(x)
    d = jax.lax.dot_general(
        xq, w4.astype(jnp.int8), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (d.astype(jnp.float32) * ws[:, 0][None, :]).astype(jnp.bfloat16)


# ---- pb8: Pallas batched int8 with in-kernel unpack --------------------------
# HBM layout: packed3 [nb, 16, n] uint8 — element j of block b of row n is the
# lo nibble, element j+16 the hi nibble. scales3 [nb, n] f32.

def _prep_pb8(packed, scales):
    vals = q4_unpack_np(np.asarray(packed))  # [n, k]
    n, k = vals.shape
    nb = k // BS
    v3 = vals.reshape(n, nb, BS)
    lo = (v3[:, :, :16] + 8).astype(np.uint8)
    hi = (v3[:, :, 16:] + 8).astype(np.uint8)
    p3 = (lo | (hi << 4)).transpose(1, 2, 0)  # [nb, 16, n]
    s2 = np.asarray(scales).T  # [nb, n]
    return jnp.asarray(p3), jnp.asarray(s2, jnp.float32)


def _k_pb8(a3_ref, xs_ref, p3_ref, s2_ref, o_ref, acc_ref, *, m):
    w = p3_ref[...]  # [nb, 16, bn] u8
    lo = (w & jnp.uint8(0x0F)).astype(jnp.int8)
    hi = (w >> jnp.uint8(4)).astype(jnp.int8)
    a3 = a3_ref[...]  # [nb, m, 32] i8
    d = jax.lax.dot_general(
        a3[:, :, :16], lo, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    d += jax.lax.dot_general(
        a3[:, :, 16:], hi, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [nb, m, bn] of sum (A*(w4+8)) = D + 8*sum(A)
    asum = jnp.sum(a3, axis=2, dtype=jnp.int32)  # [nb, m]
    df = (d - asum[:, :, None]* 8).astype(jnp.float32)
    comb = df * xs_ref[...][:, :, None] * s2_ref[...][:, None, :]
    o_ref[...] = jnp.sum(comb, axis=0).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("block_n",))
def pb8(x, p3, s2, block_n=512):
    m, k = x.shape
    nb, _, n = p3.shape
    bn = min(block_n, n)
    while n % bn:
        bn //= 2
    xq, xs = q8_quantize(x)
    a3 = xq.reshape(m, nb, BS).transpose(1, 0, 2)  # [nb, m, 32]
    xs3 = xs.T  # [nb, m]
    return pl.pallas_call(
        functools.partial(_k_pb8, m=m),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((nb, m, BS), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 16, bn), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(a3, xs3, p3, s2)


# ---- pgb: grid over k-blocks, per-step output scale-mul-accumulate ---------
# HBM layout: packed3 [nb, 16, n] u8 (same as pb8), scales2 [nb, n] f32.
# Each grid step b: unpack block b's two nibble planes, dot [m,16]x[16,bn]
# twice (i8 on the MXU, or bf16), then acc += (d*xs_b - corr_b) * s_b — the
# per-32-block scale product is applied ONCE PER BLOCK on the [m,bn] output
# instead of once per weight element. ~0.3 VPU f32 ops/byte + unpack.

def _k_pgb(a_ref, xs_ref, xa_ref, p_ref, s_ref, o_ref, acc_ref, *, dom):
    b = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(b == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = p_ref[0]  # [16, bn] u8
    if dom == "i8":
        lo = (w & jnp.uint8(0x0F)).astype(jnp.int8)
        hi = (w >> jnp.uint8(4)).astype(jnp.int8)
        al = a_ref[0, :, :16]  # [m, 16] i8
        ah = a_ref[0, :, 16:]
        d = jax.lax.dot_general(
            al, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        d += jax.lax.dot_general(
            ah, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        df = d.astype(jnp.float32)
    else:
        w32 = w.astype(jnp.int32)
        lo = (w32 & 0x0F).astype(jnp.bfloat16)
        hi = (w32 >> 4).astype(jnp.bfloat16)
        al = a_ref[0, :, :16].astype(jnp.bfloat16)
        ah = a_ref[0, :, 16:].astype(jnp.bfloat16)
        df = jax.lax.dot_general(
            al, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        df += jax.lax.dot_general(
            ah, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    # d counts the +8 offset: true = d - 8*sum(a); xa = 8*asum*xs precomputed
    xs = xs_ref[0, 0]  # [m]
    xa = xa_ref[0, 0]
    acc_ref[...] += (df * xs[:, None] - xa[:, None]) * s_ref[0, 0][None, :]

    @pl.when(b == nb - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "dom"))
def pgb(x, p3, s2, block_n=None, dom="i8"):
    m, k = x.shape
    nb, _, n = p3.shape
    if block_n is None:
        block_n = n if m * n * 4 <= 4 << 20 else max(512, (4 << 20) // (m * 4))
    bn = min(block_n, n)
    while n % bn:
        bn //= 2
    if dom == "i8":
        xq, xs = q8_quantize(x)
        a3 = xq.reshape(m, nb, BS).transpose(1, 0, 2)  # [nb, m, 32] i8
        asum = jnp.sum(
            xq.reshape(m, nb, BS).astype(jnp.int32), axis=2
        ).T.astype(jnp.float32)  # [nb, m]
        xs3 = xs.T  # [nb, m]
    else:
        xf = x.astype(jnp.bfloat16)
        a3 = xf.reshape(m, nb, BS).transpose(1, 0, 2)
        asum = jnp.sum(
            xf.reshape(m, nb, BS).astype(jnp.float32), axis=2
        ).T
        xs3 = jnp.ones((nb, m), jnp.float32)
    xa3 = 8.0 * asum * xs3
    xs3 = xs3[:, None, :]  # [nb, 1, m] — singleton middle dim keeps the
    xa3 = xa3[:, None, :]  # last-two block dims equal to the array dims
    s3 = s2[:, None, :]  # [nb, 1, n]
    return pl.pallas_call(
        functools.partial(_k_pgb, dom=dom),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        grid=(n // bn, nb),
        in_specs=[
            pl.BlockSpec((1, m, BS), lambda j, b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda j, b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda j, b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, bn), lambda j, b: (b, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda j, b: (b, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j, b: (0, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n * nb * BS,
            bytes_accessed=nb * 16 * n + nb * n * 4 + m * k + m * n * 2,
            transcendentals=0,
        ),
    )(a3, xs3, xa3, p3, s3)


# ---- speed-only probes for the int8-MXU pipeline ---------------------------
# di8b: full-K int8 dot, weights stored int8 [n, k] (2x bytes): pure ingest.

def _prep_di8b(packed, scales):
    vals = q4_unpack_np(np.asarray(packed))
    return (jnp.asarray(vals), jnp.asarray(scales, jnp.float32))


def _k_di8b(xq_ref, w_ref, s_ref, o_ref):
    d = jax.lax.dot_general(
        xq_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (d.astype(jnp.float32) * s_ref[...][:, 0][None, :]).astype(
        jnp.bfloat16
    )


@functools.partial(jax.jit, static_argnames=("block_n",))
def di8b(x, w, s, block_n=512):
    m, k = x.shape
    n = w.shape[0]
    bn = min(block_n, n)
    while n % bn:
        bn //= 2
    xq, _ = q8_quantize(x)
    return pl.pallas_call(
        _k_di8b,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(xq, w, s)


# pk4: packed 4-bit in HBM, in-kernel unpack to two i8 planes, ONE int8 dot
# per plane per K-GROUP (group = 256 original elements = 128 packed columns,
# so each dot contracts K=128 = native MXU depth), f32 per-group combine.
# Speed probe (scale semantics of the q4s format; correctness checked later).

def _k_pk4(xl_ref, xh_ref, wp_ref, sg_ref, o_ref, acc_ref, *, ngrp):
    gi = pl.program_id(1)

    @pl.when(gi == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = wp_ref[0]  # [bn, 128] u8 — one K-group's packed columns
    # nibbles stay UNSIGNED u8: converting u8->i8 before a dot hangs this
    # Mosaic version, but mixed i8 x u8 dot_general lowers fine (probed)
    lo = w & jnp.uint8(0x0F)
    hi = w >> jnp.uint8(4)
    d = jax.lax.dot_general(
        xl_ref[...], lo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    d += jax.lax.dot_general(
        xh_ref[...], hi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_ref[...] += d.astype(jnp.float32) * sg_ref[0][:, 0][None, :]

    @pl.when(gi == ngrp - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n",))
def pk4(x, packed3, sg3, block_n=1024):
    m, k = x.shape
    ngrp, n, _ = packed3.shape
    bn = min(block_n, n)
    while n % bn:
        bn //= 2
    xq, _ = q8_quantize(x)
    # split planes: group g's packed columns hold elements (lo) and (hi);
    # activation permutation is a speed no-op here (values random anyway)
    xl = xq[:, : k // 2]
    xh = xq[:, k // 2 :]
    return pl.pallas_call(
        functools.partial(_k_pk4, ngrp=ngrp),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        grid=(n // bn, ngrp),
        in_specs=[
            pl.BlockSpec((m, 128), lambda j, g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 128), lambda j, g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, 128), lambda j, g: (g, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, 1), lambda j, g: (g, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j, g: (0, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(xl, xh, packed3, sg3)


def _prep_pk4(packed, scales):
    n, kh = packed.shape
    ngrp = kh // 128
    # group-major layout: [ngrp, n, 128] so each (n-tile, group) block is a
    # single contiguous DMA
    p3 = np.asarray(packed).reshape(n, ngrp, 128).transpose(1, 0, 2)
    sg3 = (
        np.random.default_rng(1).uniform(0, 0.02, (ngrp, n, 1)).astype(np.float32)
    )
    return jnp.asarray(p3), jnp.asarray(sg3)


def ref_pk4(x, p3, sg3):
    """Exact semantics of the pk4 probe: per-256-element-group int dots of
    the unsigned nibble planes, scaled by sg per (group, n)."""
    xq, _ = q8_quantize(x)
    xq = np.asarray(xq).astype(np.int32)
    m, k = xq.shape
    ngrp, n, _ = p3.shape
    xl = xq[:, : k // 2].reshape(m, ngrp, 128)
    xh = xq[:, k // 2 :].reshape(m, ngrp, 128)
    p = np.asarray(p3).astype(np.int32)
    lo = p & 0x0F  # [ngrp, n, 128]
    hi = p >> 4
    d = np.einsum("mgc,gnc->mgn", xl, lo) + np.einsum("mgc,gnc->mgn", xh, hi)
    return np.einsum("mgn,gn->mn", d.astype(np.float64),
                     np.asarray(sg3)[:, :, 0].astype(np.float64))


# ---- q4s: the PRODUCT kernel (ops/pallas_w8a8.py) --------------------------

def _prep_q4s(packed, scales):
    from jlama_tpu.nn.qarray import QArray
    from jlama_tpu.ops.pallas_w8a8 import to_q4s

    q = to_q4s(QArray(packed, scales, "q4"))
    return (q.data, q.scales[0], q.scales[1])


def _q4s_fn(x, packed3, sig, sw):
    from jlama_tpu.ops.pallas_w8a8 import q4s_matmul_2d

    return q4s_matmul_2d(x, packed3, sig, sw)


VARIANTS = {
    "q4s": (_prep_q4s, _q4s_fn, None, 0.875),  # correctness in tests/test_pallas_w8a8.py
    "xb8": (_prep_xb8, xb8, 2e-2, 2.0),
    "xb4": (_prep_xb4, xb4, 2e-2, 1.0),
    "xb4f": (_prep_xb4f, xb4f, 2e-2, 1.0),
    "xb4K": (_prep_xb4K, xb4K, None, 1.0),
    "pb8": (_prep_pb8, pb8, 2e-2, 1.0),
    "pgb8": (_prep_pb8, lambda x, p, s: pgb(x, p, s, dom="i8"), 2e-2, 1.0),
    "pgbf": (_prep_pb8, lambda x, p, s: pgb(x, p, s, dom="bf16"), 5e-2, 1.0),
    "di8b": (_prep_di8b, di8b, None, 2.0),
    "pk4": (_prep_pk4, pk4, None, 1.0),
}


def main():
    key = jax.random.PRNGKey(0)
    shapes = [(8192, 2048), (2048, 8192)]
    names = sys.argv[1:] or list(VARIANTS)
    for n, k in shapes:
        kp, ks, kx = jax.random.split(jax.random.fold_in(key, n * k), 3)
        packed = jax.random.randint(kp, (n, k // 2), 0, 256, jnp.int32).astype(jnp.uint8)
        scales = (jax.random.uniform(ks, (n, k // 32)) * 0.02 + 0.001).astype(jnp.float32)
        x = jax.random.normal(kx, (1, k), jnp.bfloat16)
        bytes_w4 = n * k // 2 + n * k // 32 * 2

        xq, xs = q8_quantize(x)
        yref = ref_w8a8(
            np.asarray(xq), np.asarray(xs), q4_unpack_np(np.asarray(packed)),
            np.asarray(scales),
        )
        row = [f"[{n:>7}x{k}]"]
        for name in names:
            prep, fn, tol, byte_mult = VARIANTS[name]
            try:
                wops = prep(packed, scales)
                y = np.asarray(fn(x, *wops)).astype(np.float32)
                ref = ref_pk4(x, *wops) if name == "pk4" else yref
                tol = 2e-2 if name == "pk4" else tol
                if tol is not None:
                    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
                    if rel > tol:
                        row.append(f"{name}: WRONG({rel:.1e})")
                        continue
                t = bench(fn, x, wops, bytes_w4 * byte_mult)
                row.append(
                    f"{name} {t*1e6:7.1f}us {bytes_w4/t/1e9:6.1f}GB/s(q4-bytes)"
                )
            except Exception as e:  # noqa: BLE001
                row.append(f"{name}: FAIL({type(e).__name__}:{str(e)[:60]})")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
