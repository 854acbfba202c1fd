"""Native C++ quantization kernels: bit-exact vs the NumPy implementation."""

import numpy as np
import pytest

from jlama_tpu import native
from jlama_tpu.quant import blockq


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_q4_quantize_bit_exact():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 256)).astype(np.float32)
    pn, sn = blockq.q4_quantize_np(x)
    pc, sc = native.q4_quantize(x)
    np.testing.assert_array_equal(pc, pn)
    np.testing.assert_array_equal(sc, sn)


def test_q4_quantize_edge_cases():
    cases = [
        np.zeros((1, 32), np.float32),
        np.full((1, 32), 1e-30, np.float32),
        np.concatenate([np.full((1, 16), -5.0), np.full((1, 16), 5.0)], 1).astype(np.float32),
    ]
    for x in cases:
        pn, sn = blockq.q4_quantize_np(x)
        pc, sc = native.q4_quantize(x)
        np.testing.assert_array_equal(pc, pn)
        np.testing.assert_array_equal(sc, sn)


def test_q4_dequantize_bit_exact():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 128)).astype(np.float32)
    p, s = blockq.q4_quantize_np(x)
    np.testing.assert_array_equal(
        native.q4_dequantize(p, s), blockq.q4_dequantize_np(p, s)
    )


def test_q8_quantize_bit_exact():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((32, 96)).astype(np.float32)
    qn, sn = blockq.q8_quantize_np(x)
    qc, sc = native.q8_quantize(x)
    np.testing.assert_array_equal(qc, qn)
    np.testing.assert_array_equal(sc, sn)


def test_kernel_layout_matches_python():
    from jlama_tpu.ops.pallas_q4 import kernel_column_perm

    rng = np.random.default_rng(3)
    packed = rng.integers(0, 256, (8, 128)).astype(np.uint8)
    ref = packed[..., kernel_column_perm(256)]
    np.testing.assert_array_equal(native.q4_to_kernel_layout(packed), ref)
