"""Rotary position embeddings.

Covers the reference's RoPE support (precomputeFreqsCis,
/root/reference/jlama-core/.../math/VectorMath.java:148-165, and the HF
permutation applied in CausalSelfAttention.java:247-311) with the HF
rotate-half convention, plus llama3-style NTK frequency scaling which the
reference lacks (it only supports linear scaling).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig


def rope_frequencies(cfg: ModelConfig) -> np.ndarray:
    """Per-dimension inverse frequencies [head_size/2], f32, with scaling."""
    hs = cfg.head_size
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, hs, 2, dtype=np.float64) / hs))
    rs = cfg.rope_scaling
    if rs.rope_type == "linear":
        inv = inv / rs.factor
    elif rs.rope_type == "llama3":
        low_wl = rs.original_max_position_embeddings / rs.low_freq_factor
        high_wl = rs.original_max_position_embeddings / rs.high_freq_factor
        wl = 2 * math.pi / inv
        scaled = np.where(wl > low_wl, inv / rs.factor, inv)
        smooth = (rs.original_max_position_embeddings / wl - rs.low_freq_factor) / (
            rs.high_freq_factor - rs.low_freq_factor
        )
        smoothed = (1 - smooth) / rs.factor * inv + smooth * inv
        is_medium = (wl <= low_wl) & (wl >= high_wl)
        scaled = np.where(is_medium, smoothed, scaled)
        inv = scaled
    return inv.astype(np.float32)


def rope_cos_sin(
    positions: jnp.ndarray, inv_freq: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for given positions. positions [...], returns [..., hs/2]."""
    angles = positions[..., None].astype(jnp.float32) * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """HF rotate-half RoPE.

    x: [..., T, n_heads, head_size]; cos/sin: [..., T, head_size/2].
    """
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[..., None, :]  # broadcast over heads
    s = sin[..., None, :]
    dtype = x.dtype
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out1 = x1f * c - x2f * s
    out2 = x2f * c + x1f * s
    return jnp.concatenate([out1, out2], axis=-1).astype(dtype)
