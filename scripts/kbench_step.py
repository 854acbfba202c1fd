"""Decode-step decomposition microbench.

Measures, on the real chip, the pure q4k-matmul floor of one decode step
(the per-layer wqkv/wo/w13/w2 chain x L + lm_head, data-dependent so steps
serialize like the real model) against the model's actual per-step time —
isolating how much of a step is matmul kernels vs everything else
(attention/KV, norms, rope, sampling, loop overhead).

Usage: python scripts/kbench_step.py [1b|8b] [n_steps]
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

from jlama_tpu.ops.pallas_q4 import q4k_matmul_2d

MODEL = sys.argv[1] if len(sys.argv) > 1 else "1b"
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 64

if MODEL == "8b":
    D, H, QD, KVD, L, V = 4096, 14336, 4096, 1024, 32, 128256
else:
    D, H, QD, KVD, L, V = 2048, 8192, 2048, 512, 16, 128256

SHAPES = {
    "wqkv": (QD + 2 * KVD, D),
    "wo": (D, QD),
    "w13": (2 * H, D),
    "w2": (D, H),
}


def make_weights(key, n, k):
    kp, ks = jax.random.split(key)
    packed = jax.random.randint(kp, (n, k // 2), 0, 256, jnp.int32).astype(jnp.uint8)
    sdt = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
        os.environ.get("JLAMA_KBENCH_SCALES", "bf16")
    ]
    scales = jnp.full((n, k // 32), 0.01, sdt)
    return packed, scales


def main():
    key = jax.random.PRNGKey(0)
    key, sub = jax.random.split(key)
    head_w = make_weights(sub, V, D)
    # per-layer copies so HBM traffic matches the real model (no cache reuse)
    weights = [
        {name: make_weights(jax.random.fold_in(key, li * 7 + i), *SHAPES[name])
         for i, name in enumerate(SHAPES)}
        for li in range(L)
    ]

    total_bytes = (
        sum(L * (n * k // 2 + n * k // 32 * 2) for n, k in SHAPES.values())
        + V * D // 2 + V * D // 32 * 2
    )

    @jax.jit
    def step_chain(weights, head_w, x, n_steps_arr):
        # weights ride in as jit ARGUMENTS: closure capture would inline
        # 0.6+ GB of constants into the HLO (the remote-compile relay 413s)
        def one_step(x):
            h = x
            for li in range(L):
                w = weights[li]
                qkv = q4k_matmul_2d(h, *w["wqkv"])
                h = q4k_matmul_2d(qkv[:, : D], *w["wo"]) + h
                g = q4k_matmul_2d(h, *w["w13"])
                h = q4k_matmul_2d(g[:, : H], *w["w2"]) + h
            logits = q4k_matmul_2d(h, *head_w)
            return h + logits[:, :1].astype(h.dtype) * jnp.bfloat16(1e-24)

        def body(i, x):
            return one_step(x)

        return jax.lax.fori_loop(0, n_steps_arr, body, x)

    x = jax.random.normal(key, (1, D), jnp.bfloat16)
    n = jnp.int32(N_STEPS)
    out = step_chain(weights, head_w, x, n)
    np.asarray(out)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(step_chain(weights, head_w, x, n))
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
    per_step = best / N_STEPS
    print(
        f"{MODEL}: pure-matmul chain {per_step*1e3:.3f} ms/step "
        f"({total_bytes/per_step/1e9:.1f} GB/s over {total_bytes/1e6:.0f} MB; "
        f"{1/per_step:.1f} steps/s ceiling)"
    )


if __name__ == "__main__":
    main()
