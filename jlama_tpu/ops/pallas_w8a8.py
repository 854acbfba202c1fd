"""w8a8 Pallas kernel: Q8 activations x Q4 weights on the int8 MXU.

TPU-native counterpart of the reference's primary hot path — gemm_q8_q4
(/root/reference/jlama-native/src/main/c/simd/vector_simd.c:186-480, VNNI
path :409; dispatched via PanamaTensorOperations.java:768-1045 with default
working qtype I8, TensorOperations.java:32): int8 activations x 4-bit
weights, integer dot products, per-block scale products, f32 accumulation.

Per-32-block partial dots would waste the MXU (a K=32 slice of a 128-deep
systolic pass), so the JQ4 checkpoint re-quantizes ONCE at load into the
two-level "q4s" kernel format over GROUPs of 256 elements (8 JQ4 blocks):

    weight[n, c] = value[n, c] * sigma[n, b(c)] * swk[n, g(c)]

- swk[n, g]    f32 = (8/7) * max|block scale| / 16  (one per group),
- sigma[n, b]  uint8 in [1, 16] = ceil(16 * |sb| / (16 * swk)): the block's
               scale ratio on a 1/16 grid,
- value        4-bit, re-rounded against the block's effective scale
               sigma * swk. The 8/7 padding of swk makes the re-rounded
               range symmetric [-7, 7], so block-scale SIGNS (JQ4 scales are
               signed: Q4ByteBufferTensor.java:83 `extreme / -8`) fold into
               the values exactly and every stored scale is positive.

The kernel then runs ONE full-depth int8 MXU dot per nibble plane per group
(K = 128): sigma multiplies the unsigned nibbles in the u8 domain (products
<= 15*16 = 240), the group scale and the activation's group scale touch the
[m, n] tile once per group, and the +8 nibble offset is removed with a tiny
per-block correction dot (activation block-sums x sigma, K = 8) — the same
rank-k correction the bf16 q4k kernel uses. f32 accumulation across groups.

Activations quantize per-GROUP (amax/127 int8) inside the jitted step — the
runtime analog of the reference's Q8 activation blocks.

HBM cost: 4 (nibbles) + 0.25 (sigma) + 0.125 (swk) = 4.375 bits/weight vs
JQ4's 5 bits — the weight-bandwidth speed-of-light itself improves ~14%.

Quality: re-rounding adds at most half an effective step (<= ~0.65 of a q4
step) per weight; bounded by construction (no clipping is possible) and
gated end-to-end by the perplexity tests in tests/test_ppl.py.

Mosaic notes (probed on this toolchain): converting u8->i8 before a dot
HANGS the compiler; mixed i8 x u8 dot_general lowers but SIGN-extends the
u8 operand; and 8-bit vector arithmetic is unimplemented — both `arith.addi`
("Only vector<i16> and vector<i32> are supported") and `arith.muli`
("failed to legalize") on vector<...xi8> abort the on-chip compile. The
sigma multiply therefore CANNOT run in the 8-bit domain on current Mosaic,
which blocks the int8-MXU form of this kernel on TPU: only bitwise ops are
available on stored bytes, and per-block scales are mathematically
inseparable from the contraction otherwise (per-block partial dots waste
8-16x MXU passes; measured). The kernel remains fully functional in
interpret mode (tests) and the q4s format + tests + this analysis document
exactly what a Mosaic with 8-bit `muli` support would unlock
(int8 full-K ingest measured at ~732 GB/s vs the bf16 kernel's 433-495).
On TPU, `q4s_matmul` raises with this explanation unless
JLAMA_Q4S_FORCE=1 (which runs the offset form WRONGLY sign-extended —
debugging only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.qarray import QArray
from ..quant.blockq import BLOCK_SIZE, q4_unpack_np

GROUP = 256  # elements per scale group (8 JQ4 blocks)
HALF = GROUP // 2
BPG = GROUP // BLOCK_SIZE  # blocks per group (8)
BPP = BPG // 2  # blocks per nibble plane (4)
BITS_PER_WEIGHT = 4 + 8 / BLOCK_SIZE + 32 / GROUP  # 4.375


def _group_perm() -> np.ndarray:
    """Element order inside one nibble plane of a group: packed column c
    holds the element of block (c mod BPP) at within-block index (c // BPP),
    so a TILED (pltpu.repeat) per-block vector lines up with the columns."""
    c = np.arange(HALF)
    return (c % BPP) * BLOCK_SIZE + c // BPP


def to_q4s(w: QArray) -> QArray:
    """Re-quantize a canonical JQ4 QArray [n, k] into the q4s kernel format.

    Returns QArray(data=[ngrp, n, 128] u8 packed nibbles,
    scales=(sigma [ngrp, n, 8] u8, swk [ngrp, 1, n] f32), fmt="q4s").
    """
    if w.fmt != "q4":
        raise ValueError(f"expected fmt q4, got {w.fmt}")
    vals = q4_unpack_np(np.asarray(w.data)).astype(np.float32)  # [n,k] -8..7
    scales = np.asarray(w.scales, np.float32)  # [n, k/32] signed
    n, k = vals.shape
    if k % GROUP:
        raise ValueError(f"k={k} not divisible by group={GROUP}")
    ngrp = k // GROUP

    sb = scales.reshape(n, ngrp, BPG)
    absb = np.abs(sb)
    gmax = np.max(absb, axis=2)  # [n, ngrp]
    gmax = np.where(gmax == 0, 1.0, gmax)
    swk = ((8.0 / 7.0) * gmax / 16.0).astype(np.float32)
    # sigma = ceil(16 r): eff = sigma*swk >= 16r*(8/7)gmax/16 = (8/7)|sb|,
    # so |requant| <= 8|sb|/eff <= 7 — the symmetric range, no clipping
    sigma = np.clip(np.ceil(16.0 * absb / gmax[:, :, None]), 1, 16).astype(
        np.float32
    )
    eff = sigma * swk[:, :, None]

    vb = vals.reshape(n, ngrp, BPG, BLOCK_SIZE)
    orig = vb * sb[:, :, :, None]  # exact dequantized weights
    requant = np.rint(orig / eff[:, :, :, None])
    assert float(np.abs(requant).max(initial=0.0)) <= 7.0, "q4s range overflow"

    vq = (requant + 8.0).astype(np.uint8).reshape(n, ngrp, GROUP)
    perm = _group_perm()
    lo = vq[:, :, :HALF][:, :, perm]
    hi = vq[:, :, HALF:][:, :, perm]
    packed = np.ascontiguousarray((lo | (hi << 4)).transpose(1, 0, 2))
    sig8 = np.ascontiguousarray(sigma.astype(np.uint8).transpose(1, 0, 2))
    sw3 = np.ascontiguousarray(swk.T[:, None, :])  # [ngrp, 1, n]
    return QArray(
        jnp.asarray(packed), (jnp.asarray(sig8), jnp.asarray(sw3)), "q4s"
    )


def q4s_dequantize(q: QArray, dtype=jnp.float32) -> jnp.ndarray:
    """jnp dequant of a q4s QArray -> [n, k] (XLA fallback path: lets q4s
    weights run — and SHARD under GSPMD meshes — wherever the Pallas kernel
    can't, e.g. CPU tests and the current Mosaic-blocked TPU)."""
    packed = q.data
    sigma = q.scales[0].astype(jnp.float32)  # [ngrp, n, 8]
    swk = q.scales[1].astype(jnp.float32)[:, 0, :]  # [ngrp, n]
    ngrp, n, _ = packed.shape
    inv = jnp.asarray(np.argsort(_group_perm()))
    p32 = packed.astype(jnp.int32)
    lo = ((p32 & 0x0F) - 8)[:, :, inv]
    hi = ((p32 >> 4) - 8)[:, :, inv]
    vals = jnp.concatenate([lo, hi], axis=2).astype(jnp.float32)
    vb = vals.reshape(ngrp, n, BPG, BLOCK_SIZE)
    out = vb * sigma[:, :, :, None] * swk[:, :, None, None]
    return (
        out.reshape(ngrp, n, GROUP)
        .transpose(1, 0, 2)
        .reshape(n, ngrp * GROUP)
        .astype(dtype)
    )


def q4s_dequantize_np(q: QArray) -> np.ndarray:
    """Exact f32 dequant of a q4s QArray (test/ppl reference). [n, k]."""
    packed = np.asarray(q.data)
    sigma = np.asarray(q.scales[0], np.float32)  # [ngrp, n, 8]
    swk = np.asarray(q.scales[1], np.float32)[:, 0, :]  # [ngrp, n]
    ngrp, n, _ = packed.shape
    inv = np.argsort(_group_perm())
    lo = (packed & 0x0F).astype(np.int16)[:, :, inv] - 8
    hi = (packed >> 4).astype(np.int16)[:, :, inv] - 8
    vals = np.concatenate([lo, hi], axis=2).astype(np.float32)  # [ngrp,n,256]
    vb = vals.reshape(ngrp, n, BPG, BLOCK_SIZE)
    out = vb * sigma[:, :, :, None] * swk[:, :, None, None]
    return (
        out.reshape(ngrp, n, GROUP).transpose(1, 0, 2).reshape(n, ngrp * GROUP)
    )


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _w8a8_kernel(xl_ref, xh_ref, xb_ref, xs_ref, p_ref, sg_ref, sw_ref,
                 o_ref, acc_ref, *, out_dtype, signed_form):
    g = pl.program_id(2)
    ngrp = pl.num_programs(2)

    @pl.when(g == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = p_ref[0]  # [bn, 128] u8
    sg = sg_ref[0]  # [bn, 8] u8 (sigma, 1..16)
    slo = pltpu.repeat(sg[:, :BPP], HALF // BPP, axis=1)  # col c -> c mod BPP
    shi = pltpu.repeat(sg[:, BPP:], HALF // BPP, axis=1)
    if signed_form:
        # TPU form. This Mosaic SIGN-extends the u8 dot operand (probed) and
        # its 8-bit vectors support MUL and bitwise ops but NOT add/sub.
        # Build the signed product bits (nibble-8)*sigma multiply-only:
        #   m = nibble ^ 8           (= nibble-8 for nibble>=8)
        #   v = m | (m & 8) * 30     (sign-extends m<8 cases to 0xF8|nibble)
        # so v == (nibble-8) mod 256, and v * sigma == (nibble-8)*sigma
        # mod 256 with |true value| <= 7*16 = 112 < 128 — the dot's
        # sign-extension reads the bits exactly. No offset correction needed.
        def sext(nib):
            m = nib ^ jnp.uint8(8)
            return m | (m & jnp.uint8(8)) * jnp.uint8(30)

        lo = sext(w & jnp.uint8(0x0F)) * slo
        hi = sext(w >> jnp.uint8(4)) * shi
        d = jax.lax.dot_general(
            xl_ref[...], lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        d += jax.lax.dot_general(
            xh_ref[...], hi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        df = d.astype(jnp.float32)
    else:
        # interpret/CPU form: unsigned u8 semantics (products <= 240), the
        # +8 nibble offset removed by a per-block correction dot
        lo = (w & jnp.uint8(0x0F)) * slo  # u8, <= 240
        hi = (w >> jnp.uint8(4)) * shi
        d = jax.lax.dot_general(
            xl_ref[...], lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        d += jax.lax.dot_general(
            xh_ref[...], hi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        sgf = sg.astype(jnp.int32).astype(jnp.float32)  # [bn, 8]
        corr = jax.lax.dot_general(
            xb_ref[0], sgf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [m, bn]
        df = d.astype(jnp.float32) - 8.0 * corr
    xs = xs_ref[0, 0]  # [m] activation group scales
    acc_ref[...] += df * xs[:, None] * sw_ref[0, 0][None, :]

    @pl.when(g == ngrp - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_n", "block_m", "interpret")
)
def q4s_matmul_2d(
    x: jnp.ndarray,  # [M, K]
    packed: jnp.ndarray,  # [ngrp, N, 128] u8
    sigma: jnp.ndarray,  # [ngrp, N, 8] u8
    sw: jnp.ndarray,  # [ngrp, 1, N] f32
    out_dtype=jnp.bfloat16,
    block_n: int = 1024,
    block_m: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    from ..quant.blockq import q8_quantize

    m, k = x.shape
    ngrp, n, _ = packed.shape
    bm = min(block_m, m)
    pad_m = (-m) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    m_p = m + pad_m
    bn = min(block_n, n)
    while n % bn:
        bn //= 2

    xq, xs = q8_quantize(x, block=GROUP)  # [m,k] i8, [m,ngrp] f32
    x3 = xq.reshape(m_p, ngrp, GROUP)
    perm = jnp.asarray(_group_perm())
    xl = x3[:, :, :HALF][:, :, perm].reshape(m_p, ngrp * HALF)
    xh = x3[:, :, HALF:][:, :, perm].reshape(m_p, ngrp * HALF)
    xb = jnp.sum(
        x3.reshape(m_p, ngrp, BPG, BLOCK_SIZE).astype(jnp.float32), axis=3
    ).transpose(1, 0, 2)  # [ngrp, m, 8]
    xs3 = xs.T[:, None, :]  # [ngrp, 1, m]

    from .flags import _on_tpu

    out = pl.pallas_call(
        functools.partial(
            _w8a8_kernel,
            out_dtype=out_dtype,
            # the signed-bits form relies on the TPU Mosaic dot's u8
            # sign-extension; interpreters and CPU backends zero-extend
            signed_form=not interpret and _on_tpu(),
        ),
        out_shape=jax.ShapeDtypeStruct((m_p, n), out_dtype),
        grid=(m_p // bm, n // bn, ngrp),
        in_specs=[
            pl.BlockSpec((bm, HALF), lambda i, j, g: (i, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, HALF), lambda i, j, g: (i, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, BPG), lambda i, j, g: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bm), lambda i, j, g: (g, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, HALF), lambda i, j, g: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, BPG), lambda i, j, g: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i, j, g: (g, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, g: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_p * n * k,
            bytes_accessed=int(n * k * BITS_PER_WEIGHT / 8)
            + m_p * k + m_p * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xl, xh, xb, xs3, packed, sigma, sw)
    return out[:m] if pad_m else out


def q4s_matmul(x: jnp.ndarray, w: QArray, out_dtype=jnp.bfloat16,
               interpret=False):
    """y = x @ dequant(w).T for fmt 'q4s' weights, any leading dims of x."""
    import os

    from .flags import _on_tpu

    if not interpret and _on_tpu() and not os.environ.get("JLAMA_Q4S_FORCE"):
        raise NotImplementedError(
            "q4s (w8a8) on TPU is blocked by this Mosaic toolchain: 8-bit "
            "vector mul/add are unimplemented (arith.muli/addi on "
            "vector<i8> fail to legalize), so the in-kernel sigma multiply "
            "cannot run. Use the q4k bf16 kernel (--pallas auto) or set "
            "JLAMA_Q4S_FORCE=1 for the (numerically wrong on TPU) debug "
            "path. See ops/pallas_w8a8.py's module docstring."
        )
    sigma, sw = w.scales
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = q4s_matmul_2d(
        x2, w.data, sigma, sw, out_dtype=out_dtype, interpret=interpret
    )
    return y.reshape(*lead, -1)


def prepare_params_for_w8a8(params):
    """Convert 2-D q4 QArray leaves to q4s (one-time, at load).

    Mirrors pallas_q4.prepare_params_for_pallas: the embedding table stays
    canonical q4 (positional row gather); tied-embedding models get a q4s
    lm_head copy; non-2-D (stacked/expert) and GROUP-misaligned weights keep
    their existing format and dispatch.
    """

    def conv(leaf):
        if (
            isinstance(leaf, QArray)
            and leaf.fmt == "q4"
            and leaf.data.ndim == 2
            and leaf.data.shape[-1] * 2 % GROUP == 0
        ):
            return to_q4s(leaf)
        if isinstance(leaf, QArray) and leaf.fmt == "q4" and leaf.data.ndim == 3:
            # stacked per-layer weights: convert layer-wise, stack leading
            ls = [
                to_q4s(QArray(leaf.data[i], leaf.scales[i], "q4"))
                for i in range(leaf.data.shape[0])
            ]
            return QArray(
                jnp.stack([q.data for q in ls]),
                (
                    jnp.stack([q.scales[0] for q in ls]),
                    jnp.stack([q.scales[1] for q in ls]),
                ),
                "q4s",
            )
        return leaf

    out = dict(params)
    embed = out.get("embed")
    if isinstance(embed, QArray) and embed.fmt == "q4" and "lm_head" not in out:
        if embed.data.shape[-1] * 2 % GROUP == 0:
            out["lm_head"] = to_q4s(embed)
    for k, v in out.items():
        if k == "embed":
            continue
        out[k] = jax.tree.map(conv, v, is_leaf=lambda x: isinstance(x, QArray))
    return out
