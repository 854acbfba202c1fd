"""Probe: alternative TPU lowerings for the q4s sigma multiply.

The w8a8 kernel is blocked because Mosaic has no 8-bit vector mul/add
(ops/pallas_w8a8.py docstring). VERDICT r4 asks for the supported-path
alternatives to be tried before calling it blocked:

  A. u8 -> i16 widen, i16 x i16 multiply (arith on vector<i16> is
     nominally supported), i16 -> bf16 convert, bf16 MXU dot.
     (Loses the int8-dot ingest rate but would land the 4.375-bit format
     on-chip with per-block scales inside the kernel.)
  B. sigma folded into the activation operand at f32: per-(n, block)
     scales cannot fold into x (they depend on n) — algebraically
     impossible, recorded here for completeness.
  C. i16 widen + multiply feeding an i32 dot (preferred_element_type=i32)
     — known from round-3 probes to crash the remote compiler, re-probed.

Each variant compiles-and-runs a minimal kernel on the real chip and checks
numerics vs numpy; results go to stdout (and the module docstring of
pallas_w8a8.py records the conclusion).
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jlama_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K = 256, 512  # tiny


def run(name, kernel, *args, check=None):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
        got = np.asarray(out)
        if check is not None:
            rel = np.abs(got - check).max() / (np.abs(check).max() + 1e-9)
            status = f"OK rel={rel:.2e}" if rel < 1e-2 else f"WRONG rel={rel:.2e}"
        else:
            status = "RAN"
        print(f"{name}: {status}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:180]
        print(f"{name}: FAIL({type(e).__name__}: {msg})", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    w8 = jax.random.randint(k1, (N, K), 0, 16, jnp.int32).astype(jnp.uint8)
    sg = jax.random.randint(k2, (N, K), 1, 17, jnp.int32).astype(jnp.uint8)
    x = jax.random.randint(k3, (1, K), -64, 64, jnp.int32).astype(jnp.int8)

    prod = np.asarray(w8, np.int32) * np.asarray(sg, np.int32)
    ref = (np.asarray(x, np.int32) @ prod.T).astype(np.float32)

    # A: i16 widen + i16 mul + bf16 convert + bf16 dot
    def kA(w_ref, s_ref, x_ref, o_ref):
        w16 = w_ref[...].astype(jnp.int16)
        s16 = s_ref[...].astype(jnp.int16)
        p = (w16 * s16).astype(jnp.bfloat16)  # <= 240, exact in bf16
        xb = x_ref[...].astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot_general(
            xb, p, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    run("A_i16mul_bf16dot", kA, w8, sg, x, check=ref)

    # A2: same but widen via i32 (isolates the u8->i16 convert)
    def kA2(w_ref, s_ref, x_ref, o_ref):
        p32 = w_ref[...].astype(jnp.int32) * s_ref[...].astype(jnp.int32)
        p = p32.astype(jnp.bfloat16)
        xb = x_ref[...].astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot_general(
            xb, p, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    run("A2_i32mul_bf16dot", kA2, w8, sg, x, check=ref)

    # C: i16 mul feeding an int dot (known r3 crash, re-probe)
    def kC(w_ref, s_ref, x_ref, o_ref):
        w16 = w_ref[...].astype(jnp.int16)
        s16 = s_ref[...].astype(jnp.int16)
        p = w16 * s16
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], p, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)

    run("C_i16mul_i32dot", kC, w8, sg, x, check=ref)

    # D: i32 mul feeding an i32 dot
    def kD(w_ref, s_ref, x_ref, o_ref):
        p = w_ref[...].astype(jnp.int32) * s_ref[...].astype(jnp.int32)
        o_ref[...] = jax.lax.dot_general(
            x_ref[...].astype(jnp.int32), p, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)

    run("D_i32mul_i32dot", kD, w8, sg, x, check=ref)


if __name__ == "__main__":
    main()
