"""Diagnose scheduler decode-step time vs the raw decode loop.

Times, on the attached TPU:
  a) sched.step() wall time in the steady decode state (4 running slots)
  b) a chained loop of the scheduler's own jitted _decode (relay-amortized)
  c) for reference, the same chain with the paged-attention kernel disabled
     (XLA gather path)

Env: JLAMA_BENCH_MODEL, JLAMA_LAYER_MODE (default unrolled), JLAMA_DECODE_LAG.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jlama_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

import bench as headline

N = 4
PROMPT = 512


def main():
    from jlama_tpu.runtime.scheduler import BatchScheduler, GenRequest

    if os.environ.get("JLAMA_BENCH_MODEL", "8b") == "8b":
        from jlama_tpu.models.init import llama_8b_config as mk
    else:
        from jlama_tpu.models.init import llama_1b_config as mk
    cfg = mk()
    params = headline.init_params_device(cfg, quant="q4")
    sched = BatchScheduler(
        params, cfg, n_slots=N, n_pages=64, page_size=64,
        max_seq_len=1024, kv_dtype=jnp.bfloat16,
        layer_mode=os.environ.get("JLAMA_LAYER_MODE", "unrolled"),
    )
    rng = np.random.default_rng(0)
    reqs = [
        GenRequest(
            prompt_ids=rng.integers(5, 1000, PROMPT).tolist(),
            max_new_tokens=400, temperature=0.0,
        )
        for _ in range(N)
    ]
    for r in reqs:
        sched.submit(r)
    # drive until all 4 are decoding
    while any(r.state.value != "RUNNING" for r in reqs):
        sched.step()
    # warm the decode path
    for _ in range(3):
        sched.step()

    # a) step() wall
    t0 = time.perf_counter()
    steps = 6
    toks0 = sum(len(r.out_ids) for r in reqs)
    for _ in range(steps):
        sched.step()
    dt = time.perf_counter() - t0
    toks = sum(len(r.out_ids) for r in reqs) - toks0
    print(
        f"step(): {dt / steps * 1000:.1f} ms/step, {toks} tokens in {dt:.2f}s"
        f" -> {toks / dt:.1f} tok/s (lag={sched.decode_lag})",
        flush=True,
    )

    # b) chained raw _decode (no host in the loop)
    B = N
    tokens = jnp.ones((B, 1), jnp.int32)
    positions = jnp.full((B, 1), PROMPT + 20, jnp.int32)
    pts = jnp.asarray(sched.kv.page_table([r.id for r in reqs]))
    z = jnp.zeros(B, jnp.float32)
    zi = jnp.zeros(B, jnp.int32)
    ones = jnp.ones(B, jnp.float32)
    win = 1024

    state = sched.kv.state
    counts = sched.counts
    iters = 32
    t0 = time.perf_counter()
    toksd = tokens
    posd = positions
    for i in range(iters):
        out, state, counts = sched._decode(
            sched.params, state, toksd, posd, pts, zi, zi, z, ones, zi,
            counts, True, True, False, z, z, win,
        )
        toksd = out[:, None]
        posd = posd + 1
    np.asarray(out)
    dt = time.perf_counter() - t0
    print(f"_decode chain: {dt / iters * 1000:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
