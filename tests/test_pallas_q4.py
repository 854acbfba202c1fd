"""Kernel-equivalence tests: Pallas q4 matmul vs the XLA reference path.

Tier-1 strategy per SURVEY.md §4: interpret-mode Pallas on CPU vs jnp
reference (the reference's TestOperations.java cross-backend pattern).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from jlama_tpu.nn.qarray import quantize_q4
from jlama_tpu.ops.pallas_q4 import q4_matmul
from jlama_tpu.ops.linear import linear


@pytest.mark.parametrize("m,n,k", [(1, 256, 256), (8, 512, 128), (16, 128, 512)])
def test_q4_matmul_matches_xla(m, n, k):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = quantize_q4(rng.standard_normal((n, k)).astype(np.float32) * 0.1)

    ref = linear(jnp.asarray(x), w, out_dtype=jnp.float32)  # XLA dequant path
    got = q4_matmul(jnp.asarray(x), w, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-2, atol=5e-2
    )
    # tighter check against an exact f32 reference
    exact = x @ np.asarray(w.dequantize(jnp.float32)).T
    rel = np.linalg.norm(np.asarray(got) - exact) / np.linalg.norm(exact)
    assert rel < 5e-3, rel  # bf16 MXU rounding only


def test_q4_matmul_batched_lead_dims():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 128)).astype(np.float32)
    w = quantize_q4(rng.standard_normal((256, 128)).astype(np.float32) * 0.1)
    got = q4_matmul(jnp.asarray(x), w, out_dtype=jnp.float32, interpret=True)
    assert got.shape == (2, 3, 256)
    ref = linear(jnp.asarray(x), w, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=5e-2)


def test_q4_matmul_uneven_n_blocks():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 64)).astype(np.float32)
    w = quantize_q4(rng.standard_normal((384, 64)).astype(np.float32) * 0.1)
    got = q4_matmul(jnp.asarray(x), w, out_dtype=jnp.float32, interpret=True)
    ref = linear(jnp.asarray(x), w, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=5e-2)
