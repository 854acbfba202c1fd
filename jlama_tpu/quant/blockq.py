"""Block-wise Q4/Q8 quantization numerics (the "JQ4" scheme).

Bit-exact reimplementation of the reference checkpoint format so JQ4
checkpoints interoperate both ways:

- Q4 (cf. /root/reference/jlama-core/.../tensor/Q4ByteBufferTensor.java:66-120):
  blocks of 32 elements along the (row-major, contiguous) last axis. The block
  scale is ``signed_extreme / -8`` where ``signed_extreme`` is the value with
  the largest magnitude (first occurrence wins ties). Each element quantizes to
  ``min(15, trunc(v / scale + 8.5))`` stored as a nibble; byte ``j`` of a block
  (j in [0,16)) packs element ``j`` in the low nibble and element ``j+16`` in
  the high nibble. Dequant is ``(nibble - 8) * scale``.

- Q8/I8 (cf. Q8ByteBufferTensor.java:67-90): blocks of 32, scale = amax/127,
  value = round_half_up(v * 127/amax), stored int8.

Scales are float32, shape ``[..., n/32]``, serialized as the companion
``<name>.qb`` tensor (cf. SafeTensorSupport.java:258-280).

NumPy versions are the offline/checkpoint path; jnp versions are jittable and
used on-device (activation quantization, tests of Pallas kernels).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

BLOCK_SIZE = 32
HALF_BLOCK = 16


def _check_last_dim(n: int) -> None:
    if n % BLOCK_SIZE != 0:
        raise ValueError(f"last dim {n} is not a multiple of {BLOCK_SIZE}")


# ---------------------------------------------------------------------------
# Q4 — NumPy (bit-exact checkpoint path)
# ---------------------------------------------------------------------------


def q4_quantize_np(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Quantize to JQ4. Returns (packed uint8 [..., n/2], scales f32 [..., n/32])."""
    _check_last_dim(x.shape[-1])
    shape = x.shape
    xb = np.ascontiguousarray(x, dtype=np.float32).reshape(-1, BLOCK_SIZE)
    absx = np.abs(xb)
    idx = np.argmax(absx, axis=1)  # first max, matching the reference's `>`
    signed_extreme = xb[np.arange(xb.shape[0]), idx]
    scale = (signed_extreme / np.float32(-8.0)).astype(np.float32)
    nonzero = scale != 0  # -0.0 compares equal to 0.0, like Java
    iscale = np.divide(
        np.float32(1.0), scale, out=np.zeros_like(scale), where=nonzero
    ).astype(np.float32)
    scaled = (xb * iscale[:, None]).astype(np.float32) + np.float32(8.5)
    q = np.minimum(np.float32(15.0), np.trunc(scaled)).astype(np.uint8)
    lo, hi = q[:, :HALF_BLOCK], q[:, HALF_BLOCK:]
    packed = (lo | (hi << 4)).astype(np.uint8)
    return (
        packed.reshape(*shape[:-1], shape[-1] // 2),
        scale.reshape(*shape[:-1], shape[-1] // BLOCK_SIZE),
    )


def q4_dequantize_np(packed: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Dequantize JQ4 back to float32 with the original shape."""
    n = packed.shape[-1] * 2
    pb = packed.reshape(-1, HALF_BLOCK)
    lo = (pb & 0x0F).astype(np.int8) - 8
    hi = ((pb >> 4) & 0x0F).astype(np.int8) - 8
    vals = np.concatenate([lo, hi], axis=1).astype(np.float32)  # [blocks, 32]
    out = vals * scales.reshape(-1, 1).astype(np.float32)
    return out.reshape(*packed.shape[:-1], n)


def q4_unpack_np(packed: np.ndarray) -> np.ndarray:
    """Unpack JQ4 nibbles to int8 values in [-8, 7], original element order."""
    n = packed.shape[-1] * 2
    pb = packed.reshape(-1, HALF_BLOCK)
    lo = (pb & 0x0F).astype(np.int8) - 8
    hi = ((pb >> 4) & 0x0F).astype(np.int8) - 8
    return np.concatenate([lo, hi], axis=1).reshape(*packed.shape[:-1], n)


def q4_pack_np(vals: np.ndarray) -> np.ndarray:
    """Pack int8 values in [-8,7] into the JQ4 nibble layout."""
    _check_last_dim(vals.shape[-1])
    vb = (vals.reshape(-1, BLOCK_SIZE).astype(np.int16) + 8).astype(np.uint8)
    packed = (vb[:, :HALF_BLOCK] | (vb[:, HALF_BLOCK:] << 4)).astype(np.uint8)
    return packed.reshape(*vals.shape[:-1], vals.shape[-1] // 2)


# ---------------------------------------------------------------------------
# Q8 — NumPy
# ---------------------------------------------------------------------------


def q8_quantize_np(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Quantize to block-32 int8. Returns (int8 [...], scales f32 [..., n/32])."""
    _check_last_dim(x.shape[-1])
    shape = x.shape
    xb = np.ascontiguousarray(x, dtype=np.float32).reshape(-1, BLOCK_SIZE)
    amax = np.max(np.abs(xb), axis=1)
    nonzero = amax > 0
    iscale = np.divide(
        np.float32(127.0), amax, out=np.zeros_like(amax), where=nonzero
    ).astype(np.float32)
    scale = np.divide(
        np.float32(1.0), iscale, out=np.zeros_like(iscale), where=nonzero
    ).astype(np.float32)
    # Java Math.round == floor(x + 0.5)
    q = np.floor((xb * iscale[:, None]).astype(np.float32) + np.float32(0.5))
    q = np.clip(q, -127, 127).astype(np.int8)
    return (
        q.reshape(shape),
        scale.reshape(*shape[:-1], shape[-1] // BLOCK_SIZE),
    )


def q8_dequantize_np(q: np.ndarray, scales: np.ndarray) -> np.ndarray:
    qb = q.reshape(-1, BLOCK_SIZE).astype(np.float32)
    out = qb * scales.reshape(-1, 1).astype(np.float32)
    return out.reshape(q.shape)


# ---------------------------------------------------------------------------
# jnp versions (jittable; used on-device and to validate Pallas kernels)
# ---------------------------------------------------------------------------


def q4_dequantize(packed: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Jittable JQ4 dequant. packed uint8 [..., n/2] -> float32 [..., n]."""
    n = packed.shape[-1] * 2
    pb = packed.reshape(*packed.shape[:-1], -1, HALF_BLOCK)
    lo = (pb & 0x0F).astype(jnp.int8) - 8
    hi = ((pb >> 4) & 0x0F).astype(jnp.int8) - 8
    vals = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    out = vals * scales[..., None].astype(jnp.float32)
    return out.reshape(*packed.shape[:-1], n)


def q8_quantize(x: jnp.ndarray, block: int = BLOCK_SIZE) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Jittable activation quantization (the GEMM input path).

    Matches the reference semantics (amax/127 scale, round-half-up) without
    bit-exactness guarantees on-device. `block` defaults to the reference's
    32; KV-cache quantization passes the head size when 32 doesn't divide it.
    """
    shape = x.shape
    xb = x.reshape(*shape[:-1], shape[-1] // block, block).astype(
        jnp.float32
    )
    amax = jnp.max(jnp.abs(xb), axis=-1)
    iscale = jnp.where(amax > 0, 127.0 / amax, 0.0)
    scale = jnp.where(amax > 0, amax / 127.0, 0.0)
    q = jnp.clip(jnp.floor(xb * iscale[..., None] + 0.5), -127, 127).astype(jnp.int8)
    return q.reshape(shape), scale.astype(jnp.float32)  # scales [..., n/block]


def q8_dequantize(q: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    shape = q.shape
    qb = q.reshape(*shape[:-1], shape[-1] // BLOCK_SIZE, BLOCK_SIZE).astype(
        jnp.float32
    )
    return (qb * scales[..., None]).reshape(shape)
