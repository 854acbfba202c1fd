"""On-chip correctness check of the w8a8 (q4s) kernel's signed-bits form.

The TPU form relies on Mosaic's u8 sign-extension in dots (see
ops/pallas_w8a8.py); interpreters can't reproduce that, so this runs the
REAL compiled kernel on the attached TPU and checks it against the exact
f32 dequant of the q4s representation with int8-lossless activations.

Run: python scripts/verify_q4s_tpu.py  (needs the TPU backend)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jlama_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

from jlama_tpu.nn.qarray import quantize_q4
from jlama_tpu.ops.pallas_w8a8 import q4s_dequantize_np, q4s_matmul, to_q4s


def main():
    ok = True
    for n, k, m in [(2048, 2048, 1), (1024, 4096, 4), (4096, 1024, 16)]:
        key = jax.random.fold_in(jax.random.PRNGKey(0), n * k + m)
        w = np.asarray(jax.random.normal(key, (n, k), jnp.float32)) * 0.05
        q4s = to_q4s(quantize_q4(w))
        wt = q4s_dequantize_np(q4s)

        rng = np.random.default_rng(m)
        ints = rng.integers(-127, 128, (m, k)).astype(np.float32)
        x = jnp.asarray(ints * 0.5)  # per-group int8 quantization is lossless
        y = np.asarray(q4s_matmul(x, q4s, out_dtype=jnp.float32))
        ref = np.asarray(x, np.float32) @ wt.T
        rel = float(np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9))
        status = "OK" if rel < 2e-3 else "FAIL"
        ok &= rel < 2e-3
        print(f"[{n}x{k} m={m}] rel={rel:.2e} {status}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
