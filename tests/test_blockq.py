"""Tier-1 numerics tests for block quantization (model: reference TestOperations.java)."""

import numpy as np
import jax.numpy as jnp

from jlama_tpu.quant import blockq


def _scalar_q4_reference(x: np.ndarray):
    """Direct scalar transcription of the reference semantics for cross-checking."""
    flat = x.astype(np.float32).reshape(-1)
    nblocks = flat.size // 32
    packed = np.zeros(flat.size // 2, dtype=np.uint8)
    scales = np.zeros(nblocks, dtype=np.float32)
    for b in range(nblocks):
        blk = flat[b * 32 : (b + 1) * 32]
        maxv = np.float32(0.0)
        amax = np.float32(0.0)
        first = True
        for v in blk:
            av = -v if v < 0 else v
            if first or av > amax:
                amax = av
                maxv = v
                first = False
        scale = np.float32(maxv / np.float32(-8.0))
        iscale = np.float32(0.0) if scale == 0 else np.float32(1.0) / scale
        scales[b] = scale
        for j in range(16):
            f0 = np.float32(blk[j] * iscale)
            f1 = np.float32(blk[j + 16] * iscale)
            fb0 = min(15, int(np.trunc(np.float32(f0 + np.float32(8.5)))))
            fb1 = min(15, int(np.trunc(np.float32(f1 + np.float32(8.5)))))
            packed[b * 16 + j] = (fb0 & 0xF) | ((fb1 & 0xF) << 4)
    return packed, scales


def test_q4_matches_scalar_reference():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    packed, scales = blockq.q4_quantize_np(x)
    ref_packed, ref_scales = _scalar_q4_reference(x)
    np.testing.assert_array_equal(packed.reshape(-1), ref_packed)
    np.testing.assert_array_equal(scales.reshape(-1), ref_scales)


def test_q4_roundtrip_error_bounded():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 128)).astype(np.float32)
    packed, scales = blockq.q4_quantize_np(x)
    deq = blockq.q4_dequantize_np(packed, scales)
    assert deq.shape == x.shape
    # error is half a step except at the clipped +8 end of the asymmetric
    # [-8, 7] range, where it reaches one full step
    step = np.abs(scales).repeat(32, axis=-1)
    assert np.all(np.abs(deq - x) <= step * 1.0 + 1e-6)


def test_q4_zero_block():
    x = np.zeros((1, 32), dtype=np.float32)
    packed, scales = blockq.q4_quantize_np(x)
    assert np.all(blockq.q4_unpack_np(packed) == 0)
    deq = blockq.q4_dequantize_np(packed, scales)
    np.testing.assert_array_equal(deq, x)


def test_q4_pack_unpack_inverse():
    rng = np.random.default_rng(2)
    vals = rng.integers(-8, 8, size=(4, 64)).astype(np.int8)
    np.testing.assert_array_equal(blockq.q4_unpack_np(blockq.q4_pack_np(vals)), vals)


def test_q8_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((8, 96)).astype(np.float32)
    q, scales = blockq.q8_quantize_np(x)
    deq = blockq.q8_dequantize_np(q, scales)
    step = np.abs(scales).repeat(32, axis=-1)
    assert np.all(np.abs(deq - x) <= step * 0.5 + 1e-6)
    # exact max representation: the absmax element maps to ±127
    blocks = np.abs(x.reshape(-1, 32))
    qb = np.abs(q.reshape(-1, 32))
    assert np.all(qb.max(axis=1) == 127)


def test_q8_zero_block():
    x = np.zeros((2, 32), dtype=np.float32)
    q, scales = blockq.q8_quantize_np(x)
    assert np.all(q == 0)
    assert np.all(scales == 0)


def test_jnp_matches_numpy():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((4, 128)).astype(np.float32)
    packed, scales = blockq.q4_quantize_np(x)
    deq_np = blockq.q4_dequantize_np(packed, scales)
    deq_j = np.asarray(blockq.q4_dequantize(jnp.asarray(packed), jnp.asarray(scales)))
    np.testing.assert_allclose(deq_j, deq_np, rtol=0, atol=0)

    q_np, s_np = blockq.q8_quantize_np(x)
    q_j, s_j = blockq.q8_quantize(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(q_j), q_np)
    np.testing.assert_allclose(np.asarray(s_j), s_np, rtol=1e-6)
