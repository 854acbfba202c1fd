"""Auto shard planner (cf. reference JlamaService.java:79-126 shard math)."""

import pytest

from jlama_tpu.config import ModelConfig
from jlama_tpu.parallel.mesh import plan_mesh_axes

GB = 1 << 30


def cfg(n_heads=32, n_kv=8, layers=32):
    return ModelConfig(
        model_type="llama",
        n_layers=layers,
        n_heads=n_heads,
        n_kv_heads=n_kv,
        embedding_length=4096,
        hidden_length=14336,
        vocab_size=128256,
        context_length=8192,
        head_size=128,
    )


def test_single_device():
    assert plan_mesh_axes(1, cfg()) == (1, 1, 1)


def test_tp_maximized_within_kv_heads():
    # 16 devices, 8 kv heads -> tp=8, dp absorbs the rest
    assert plan_mesh_axes(16, cfg(n_kv=8)) == (2, 1, 8)


def test_tp_capped_by_device_count():
    assert plan_mesh_axes(4, cfg(n_kv=8)) == (1, 1, 4)


def test_odd_device_count():
    # 6 devices: tp=2 (6 % 4 != 0), dp=3
    assert plan_mesh_axes(6, cfg(n_kv=8)) == (3, 1, 2)


def test_prime_device_count():
    assert plan_mesh_axes(7, cfg(n_kv=8)) == (7, 1, 1)


def test_memory_forces_pp():
    # 70B-class: 8 kv heads caps tp at 8; 140 GB of weights needs >8 shards
    c = cfg(n_kv=8, layers=80)
    dp, pp, tp = plan_mesh_axes(
        16, c, weight_bytes=140 * GB, hbm_bytes_per_device=16 * GB
    )
    assert tp == 8
    assert pp == 2  # 80 layers % 2 == 0, 16 shards fit 140 GB
    assert dp == 1


def test_does_not_fit_raises():
    c = cfg(n_kv=8)
    with pytest.raises(MemoryError):
        plan_mesh_axes(2, c, weight_bytes=200 * GB, hbm_bytes_per_device=16 * GB)


def test_fits_without_pp_stays_dp():
    # 8B q4 (~4.2 GB) on 8 devices: no pp needed
    dp, pp, tp = plan_mesh_axes(
        8, cfg(n_kv=8), weight_bytes=4 * GB, hbm_bytes_per_device=16 * GB
    )
    assert (dp, pp, tp) == (1, 1, 8)
