"""Prefill matmul throughput decomposition on the real chip.

Serving TTFT at 4-way is prefill-throughput-bound (2048 prompt tokens /
6.5k tok/s ≈ the 313 ms p50), and prefill runs ~53% of the bf16 MXU peak —
consistent with the in-kernel VPU dequant being recomputed for every
row-tile of the same weight block. This measures, per 8B matmul shape at
prefill row counts, the achieved TFLOP/s of:

  pallas      the production q4k kernel (current bm/bn policy)
  pallas-bm   the q4k kernel at a larger row tile (fewer dequant repeats)
  xla-deq     XLA dequant to bf16 + plain MXU matmul (dequant traffic in
              HBM instead of repeated VPU work)
  bf16        plain bf16 matmul (the MXU ceiling for this shape)

Usage: python scripts/kbench_prefill.py [m ...] (default 1024 2048)
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

from jlama_tpu.nn.qarray import QArray
from jlama_tpu.ops.pallas_q4 import q4k_matmul_2d

# 8B shapes (the prefill FLOPs: w13 is ~54%, w2 ~27%, wqkv+wo ~19%)
SHAPES = {
    "wqkv": (6144, 4096),
    "wo": (4096, 4096),
    "w13": (28672, 4096),
    "w2": (4096, 14336),
}


def bench(fn, *args, iters=20):
    # reduce on device and sync ONE scalar: np.asarray of the full output
    # would stream tens of MB over the axon relay per iteration and swamp
    # the kernel time entirely
    red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    np.asarray(red(*args))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [red(*args) for _ in range(iters)]
        np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


@functools.partial(jax.jit, static_argnames=("nb",))
def xla_deq_matmul(x, packed, scales, nb):
    # canonical q4 dequant (even/odd nibble planes) + bf16 MXU dot
    n = packed.shape[0]
    lo = (packed & 0x0F).astype(jnp.bfloat16)
    hi = (packed >> 4).astype(jnp.bfloat16)
    w = jnp.stack([lo, hi], axis=-1).reshape(n, -1)
    s = jnp.repeat(scales.astype(jnp.bfloat16), 32, axis=1)
    wf = (w - 8.0) * s
    return jax.lax.dot_general(
        x, wf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)


@jax.jit
def bf16_matmul(x, w):
    return jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)


def main():
    ms = [int(a) for a in sys.argv[1:]] or [1024, 2048]
    key = jax.random.PRNGKey(0)
    for m in ms:
        print(f"== m={m} ==", flush=True)
        for name, (n, k) in SHAPES.items():
            kx, kw = jax.random.split(jax.random.fold_in(key, n * k))
            x = jax.random.normal(kx, (m, k), jnp.bfloat16)
            packed = jax.random.randint(kw, (n, k // 2), 0, 256, jnp.int32).astype(
                jnp.uint8
            )
            scales = jnp.full((n, k // 32), 0.01, jnp.float32)
            wbf = jax.random.normal(kw, (n, k), jnp.bfloat16)
            flops = 2 * m * n * k

            rows = {}
            rows["pallas"] = bench(
                lambda x, p, s: q4k_matmul_2d(x, p, s), x, packed, scales
            )
            if os.environ.get("JLAMA_Q4_BLOCK_M"):
                # rerun with the env override visible to the kernel's tiler
                rows[f"pallas-bm{os.environ['JLAMA_Q4_BLOCK_M']}"] = rows.pop(
                    "pallas"
                )
            rows["xla-deq"] = bench(
                lambda x, p, s: xla_deq_matmul(x, p, s, k // 32), x, packed, scales
            )
            rows["bf16"] = bench(bf16_matmul, x, wbf)
            out = "  ".join(
                f"{tag}={flops / dt / 1e12:6.1f}T" for tag, dt in rows.items()
            )
            print(f"  {name:5s} [n={n:5d} k={k:5d}]  {out}", flush=True)


if __name__ == "__main__":
    main()
