"""Probe: native int4 (u4/s4) support on this TPU toolchain.

Three questions, each with a decode-shaped timing if it works:
  1. XLA: does a jnp matmul with int4 weights (dequant fused by XLA) run,
     and at what effective weight-stream bandwidth?
  2. Pallas: does Mosaic accept a u4->bf16 convert inside a kernel
     (killing the &0xF / >>4 extraction entirely)?
  3. Pallas: does Mosaic accept jax.lax.bitcast_convert_type(u8 -> 2xu4)
     in-kernel (so HBM still streams packed u8)?

Usage: python scripts/probe_int4.py [xla|pallas|bitcast ...]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jlama_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K = 4096, 4096
NB = K // 32


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    return out, dt


def probe_xla():
    key = jax.random.PRNGKey(0)
    w4 = jax.random.randint(key, (N, K), -8, 8, jnp.int32).astype(jnp.int4)
    scales = jnp.full((N, NB), 0.01, jnp.bfloat16)
    x = jax.random.normal(key, (1, K), jnp.bfloat16)

    @jax.jit
    def mm(x, w4, scales):
        wf = w4.astype(jnp.bfloat16).reshape(N, NB, 32)
        wf = wf * scales[:, :, None]
        return jax.lax.dot_general(
            x, wf.reshape(N, K), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out, dt = bench(mm, x, w4, scales)
    gb = (N * K // 2 + N * NB * 2) / 1e9
    print(f"xla int4 matmul: OK {dt*1e3:.3f} ms -> {gb/dt:.0f} GB/s")


def probe_pallas():
    def kern(x_ref, w_ref, s_ref, o_ref):
        w = w_ref[...].astype(jnp.bfloat16)  # u4 -> bf16 convert
        s = pltpu.repeat(s_ref[...], 32, axis=1)
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w * s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    w4 = jax.random.randint(key, (N, K), 0, 15, jnp.int32).astype(jnp.uint4)
    scales = jnp.full((N, NB), 0.01, jnp.bfloat16)
    x = jax.random.normal(key, (8, K), jnp.bfloat16)
    bn = 512

    @jax.jit
    def mm(x, w4, scales):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.bfloat16),
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((8, K), lambda j: (0, 0)),
                pl.BlockSpec((bn, K), lambda j: (j, 0)),
                pl.BlockSpec((bn, NB), lambda j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((8, bn), lambda j: (0, j)),
        )(x, w4, scales)

    out, dt = bench(mm, x, w4, scales)
    gb = (N * K // 2 + N * NB * 2) / 1e9
    print(f"pallas u4 load+convert: OK {dt*1e3:.3f} ms -> {gb/dt:.0f} GB/s")


def probe_bitcast():
    def kern(x_ref, w_ref, s_ref, o_ref):
        w8 = w_ref[...]
        w4 = jax.lax.bitcast_convert_type(w8, jnp.uint4)  # [bn, K/2, 2]
        w = w4.reshape(w8.shape[0], -1).astype(jnp.bfloat16)
        s = pltpu.repeat(s_ref[...], 32, axis=1)
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w * s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    w8 = jax.random.randint(key, (N, K // 2), 0, 256, jnp.int32).astype(jnp.uint8)
    scales = jnp.full((N, NB), 0.01, jnp.bfloat16)
    x = jax.random.normal(key, (8, K), jnp.bfloat16)
    bn = 512

    @jax.jit
    def mm(x, w8, scales):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.bfloat16),
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((8, K), lambda j: (0, 0)),
                pl.BlockSpec((bn, K // 2), lambda j: (j, 0)),
                pl.BlockSpec((bn, NB), lambda j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((8, bn), lambda j: (0, j)),
        )(x, w8, scales)

    out, dt = bench(mm, x, w8, scales)
    gb = (N * K // 2 + N * NB * 2) / 1e9
    print(f"pallas u8->2xu4 bitcast: OK {dt*1e3:.3f} ms -> {gb/dt:.0f} GB/s")


def main():
    which = sys.argv[1:] or ["xla", "pallas", "bitcast"]
    for name in which:
        fn = {"xla": probe_xla, "pallas": probe_pallas, "bitcast": probe_bitcast}[name]
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()
            print(f"{name}: FAIL {type(e).__name__}: {msg[0][:200]}")
            for ln in msg[1:4]:
                print(f"    {ln[:200]}")


if __name__ == "__main__":
    main()
