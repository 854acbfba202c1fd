"""Microbench: q4 matmul kernel variants on decode shapes (M=1).

Measures effective HBM GB/s on the weight bytes for each variant, plus a
pure-streaming kernel as the roofline.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jlama_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

from jlama_tpu.ops.pallas_q4 import q4k_matmul_2d, split_x


def _grid_call(kernel, m, k, n, bn, extra_in_specs, out_dtype=jnp.bfloat16):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=(n // bn,),
        in_specs=extra_in_specs
        + [
            pl.BlockSpec((bn, k // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k // 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )


# ---- v3a: lo via u16 bit-trick (exact n-8); hi via i32 shift + bf16 trick ----

def _k_v3a(xl_ref, xh_ref, wp_ref, s_ref, o_ref, *, out_dtype):
    wp = wp_ref[...]
    w16 = wp.astype(jnp.uint16)
    lo = pltpu.bitcast((w16 & 0xF) | 0x4300, jnp.bfloat16) - jnp.bfloat16(136.0)
    w32 = wp.astype(jnp.int32)
    hi = (
        pltpu.bitcast(((w32 >> 4) | 0x4300).astype(jnp.uint16), jnp.bfloat16)
        - jnp.bfloat16(136.0)
    )
    s = s_ref[...]
    srep = pltpu.repeat(s, 16, axis=1)
    d = jax.lax.dot_general(
        xl_ref[...], lo * srep, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d += jax.lax.dot_general(
        xh_ref[...], hi * srep, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = d.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_n",))
def v3a(x, packed, scales, block_n=512):
    m, k = x.shape
    n = packed.shape[0]
    bn = min(block_n, n)
    while n % bn:
        bn //= 2
    xl, xh, _ = split_x(x.astype(jnp.bfloat16))
    xspec = [
        pl.BlockSpec((m, k // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((m, k // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    return _grid_call(
        functools.partial(_k_v3a, out_dtype=jnp.bfloat16), m, k, n, bn, xspec
    )(xl, xh, packed, scales.astype(jnp.bfloat16))


# ---- v3b: float-domain nibble extraction (convert byte to bf16, floor) ----

def _k_v3b(xl_ref, xh_ref, wp_ref, s_ref, o_ref, *, out_dtype):
    # u8->bf16 must route via i32 (direct convert is unimplemented in Mosaic)
    wf = wp_ref[...].astype(jnp.int32).astype(jnp.bfloat16)  # byte value, exact
    hi = jnp.floor(wf * jnp.bfloat16(0.0625))
    lo = wf - hi * jnp.bfloat16(16.0)
    s = s_ref[...]
    srep = pltpu.repeat(s, 16, axis=1)
    d = jax.lax.dot_general(
        xl_ref[...], (lo - jnp.bfloat16(8.0)) * srep, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d += jax.lax.dot_general(
        xh_ref[...], (hi - jnp.bfloat16(8.0)) * srep, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = d.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_n",))
def v3b(x, packed, scales, block_n=512):
    m, k = x.shape
    n = packed.shape[0]
    bn = min(block_n, n)
    while n % bn:
        bn //= 2
    xl, xh, _ = split_x(x.astype(jnp.bfloat16))
    xspec = [
        pl.BlockSpec((m, k // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((m, k // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    return _grid_call(
        functools.partial(_k_v3b, out_dtype=jnp.bfloat16), m, k, n, bn, xspec
    )(xl, xh, packed, scales.astype(jnp.bfloat16))


# ---- v4: u16 bitcast both planes + rank-1 corr (no per-plane subtract) ----
# stored plane value = 128 + nibble; y = d - 136 * (xblocksums @ s.T)

def _k_v4(xl_ref, xh_ref, xb_ref, wp_ref, s_ref, o_ref, *, out_dtype):
    w16 = wp_ref[...].astype(jnp.uint16)
    lo = pltpu.bitcast((w16 & 0xF) | 0x4300, jnp.bfloat16)  # 128 + lo
    hi = pltpu.bitcast((w16 >> 4) | 0x4300, jnp.bfloat16)  # 128 + hi
    s = s_ref[...]
    srep = pltpu.repeat(s, 16, axis=1)
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
    o_ref[...] = (d - 136.0 * corr).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_n",))
def v4(x, packed, scales, block_n=512):
    m, k = x.shape
    n = packed.shape[0]
    bn = min(block_n, n)
    while n % bn:
        bn //= 2
    xl, xh, xb = split_x(x.astype(jnp.bfloat16))
    xspec = [
        pl.BlockSpec((m, k // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((m, k // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((m, k // 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    return _grid_call(
        functools.partial(_k_v4, out_dtype=jnp.bfloat16), m, k, n, bn, xspec
    )(xl, xh, xb, packed, scales.astype(jnp.bfloat16))


# ---- v7: byte-direct dot (min VPU ops/byte) ------------------------------
# lo*xl + hi*xh == byte*xl + hi*(xh - 16*xl); byte feeds a dot directly
# (exact in bf16: integers <= 255), only the hi nibble is extracted
# (floor(byte/16)); the -8 shift is the usual rank-1 correction.
# ~5 VPU ops/byte: convert, mul, floor, 2x scale-mult.

def _k_v7(xl_ref, xh16_ref, xb_ref, wp_ref, s_ref, o_ref, *, out_dtype):
    wf = wp_ref[...].astype(jnp.int32).astype(jnp.bfloat16)  # byte value, exact
    hi = jnp.floor(wf * jnp.bfloat16(0.0625))
    s = s_ref[...]
    srep = pltpu.repeat(s, 16, axis=1)
    d = jax.lax.dot_general(
        xl_ref[...], wf * srep, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d += jax.lax.dot_general(
        xh16_ref[...], hi * srep, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    corr = jax.lax.dot_general(
        xb_ref[...], s.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (d - 8.0 * corr).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_n",))
def v7(x, packed, scales, block_n=512):
    m, k = x.shape
    n = packed.shape[0]
    bn = min(block_n, n)
    while n % bn:
        bn //= 2
    xl, xh, xb = split_x(x.astype(jnp.bfloat16))
    xh16 = (xh.astype(jnp.float32) - 16.0 * xl.astype(jnp.float32)).astype(
        jnp.bfloat16
    )
    xspec = [
        pl.BlockSpec((m, k // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((m, k // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((m, k // 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    return _grid_call(
        functools.partial(_k_v7, out_dtype=jnp.bfloat16), m, k, n, bn, xspec
    )(xl, xh16, xb, packed, scales.astype(jnp.bfloat16))


# ---- stream: read-bandwidth roofline (convert + matvec, no dequant math) ----

def _k_stream(xl_ref, wp_ref, s_ref, o_ref):
    w = wp_ref[...].astype(jnp.int32).astype(jnp.bfloat16)
    d = jax.lax.dot_general(
        xl_ref[...], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (d + jnp.sum(s_ref[...].astype(jnp.float32))).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("block_n",))
def stream(x, packed, scales, block_n=512):
    m, k = x.shape
    n, kh = packed.shape
    bn = min(block_n, n)
    while n % bn:
        bn //= 2
    xl = x[:, : kh].astype(jnp.bfloat16)
    xspec = [pl.BlockSpec((m, kh), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    return _grid_call(_k_stream, m, kh * 2, n, bn, xspec)(
        xl, packed, scales.astype(jnp.bfloat16)
    )


_RELAY_FLOOR = None  # measured once: dispatch+fetch cost of an empty loop


def relay_floor(x):
    """Round-trip cost of dispatching a trivial jit and fetching the result —
    the axon relay adds ~30-40 ms per dispatch+fetch that must be subtracted
    from every timed window."""
    global _RELAY_FLOOR
    if _RELAY_FLOOR is not None:
        return _RELAY_FLOOR

    @jax.jit
    def nothing(x):
        return x + jnp.bfloat16(0)

    np.asarray(nothing(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(nothing(x))
        ts.append(time.perf_counter() - t0)
    _RELAY_FLOOR = min(ts)
    return _RELAY_FLOOR


def bench(fn, x, packed, scales, bytes_w):
    """Chain kernel calls inside one jit (feed a scalar of the output back
    into x so iterations serialize) with enough iterations that kernel time
    dominates the relay overhead, which is also measured and subtracted."""
    floor = relay_floor(x)
    # iteration count: assume the kernel might hit ~600 GB/s; target >=10x
    # the relay floor of pure kernel time, capped to keep runtime sane
    est = bytes_w / 600e9
    iters = int(min(3000, max(64, 10 * floor / est)))

    @jax.jit
    def loop(x, packed, scales):
        def body(i, x):
            y = fn(x, packed, scales)
            return x + y[0, 0].astype(x.dtype) * jnp.bfloat16(1e-24)

        return jax.lax.fori_loop(0, iters, body, x)

    out = loop(x, packed, scales)
    np.asarray(out)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        out = loop(x, packed, scales)
        np.asarray(out)
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
    return max(best - floor, 1e-9) / iters


VARIANTS = {
    "v2cur": lambda x, p, s: q4k_matmul_2d(x, p, s),
    "v3a": v3a,
    "v3b": v3b,
    "v4": v4,
    "v7": v7,
    "stream": stream,
}


def main():
    key = jax.random.PRNGKey(0)
    shapes = [(8192, 2048), (2048, 8192), (2048, 2048), (128256, 2048)]
    names = sys.argv[1:] or list(VARIANTS)
    unknown = [n for n in names if n not in VARIANTS]
    if unknown:
        print(f"unknown variant(s) {unknown}; valid: {list(VARIANTS)}")
        sys.exit(2)
    for n, k in shapes:
        kp, ks, kx = jax.random.split(jax.random.fold_in(key, n * k), 3)
        packed = jax.random.randint(kp, (n, k // 2), 0, 256, jnp.int32).astype(jnp.uint8)
        scales = (jax.random.uniform(ks, (n, k // 32)) * 0.02).astype(jnp.float32)
        x = jax.random.normal(kx, (1, k), jnp.bfloat16)
        bytes_w = n * k // 2 + n * k // 32 * 2

        yref = np.asarray(q4k_matmul_2d(x, packed, scales)).astype(np.float32)
        row = [f"[{n:>7}x{k}]"]
        for name in names:
            fn = VARIANTS[name]
            try:
                y = np.asarray(fn(x, packed, scales)).astype(np.float32)
                if name not in ("stream",):
                    rel = np.abs(y - yref).max() / (np.abs(yref).max() + 1e-9)
                    if rel > 2e-2:
                        row.append(f"{name}: WRONG({rel:.1e})")
                        continue
                t = bench(VARIANTS[name], x, packed, scales, bytes_w)
                row.append(f"{name} {t*1e6:7.1f}us {bytes_w/t/1e9:6.1f}GB/s")
            except Exception as e:  # noqa: BLE001
                row.append(f"{name}: FAIL({type(e).__name__})")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
