"""SafeTensors IO tests (model: reference TestParser.java)."""

import json

import numpy as np
import pytest

from jlama_tpu.quant import blockq
from jlama_tpu.st import SafeTensorIndex, SafeTensorWriter, SafeTensorFile


@pytest.fixture
def model_dir(tmp_path):
    rng = np.random.default_rng(0)
    w = SafeTensorWriter(metadata={"format": "pt"})
    w.add("a", rng.standard_normal((4, 64)).astype(np.float32))
    w.add("b", rng.standard_normal((8, 32)).astype(np.float32))
    w.write(tmp_path / "model.safetensors")
    return tmp_path


def test_roundtrip_f32(model_dir):
    idx = SafeTensorIndex(model_dir)
    assert set(idx.names()) == {"a", "b"}
    a = idx.load("a")
    assert a.shape == (4, 64) and a.dtype == np.float32
    idx.close()


def test_row_col_slicing(model_dir):
    idx = SafeTensorIndex(model_dir)
    full = idx.load("a")
    np.testing.assert_array_equal(idx.load("a", row_range=(1, 3)), full[1:3])
    np.testing.assert_array_equal(idx.load("a", col_range=(32, 64)), full[:, 32:])
    np.testing.assert_array_equal(
        idx.load("a", row_range=(0, 2), col_range=(0, 32)), full[:2, :32]
    )
    idx.close()


def test_q4_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 128)).astype(np.float32)
    packed, scales = blockq.q4_quantize_np(x)

    w = SafeTensorWriter()
    w.add_q4("w", packed, scales)
    w.write(tmp_path / "model.safetensors")

    idx = SafeTensorIndex(tmp_path)
    info = idx.info("w")
    assert info.dtype == "Q4"
    assert info.shape == (16, 128)  # logical shape
    assert info.nbytes == 16 * 128 // 2  # packed payload

    data, sc, st_dtype = idx.load_quantized("w")
    assert st_dtype == "Q4"
    np.testing.assert_array_equal(data, packed)
    np.testing.assert_array_equal(sc, scales)

    deq = blockq.q4_dequantize_np(data, sc)
    np.testing.assert_allclose(deq, blockq.q4_dequantize_np(packed, scales))
    idx.close()


def test_q4_sharded_load(tmp_path):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 256)).astype(np.float32)
    packed, scales = blockq.q4_quantize_np(x)
    w = SafeTensorWriter()
    w.add_q4("w", packed, scales)
    w.write(tmp_path / "model.safetensors")

    idx = SafeTensorIndex(tmp_path)
    data, sc, _ = idx.load_quantized("w", row_range=(2, 6), col_range=(64, 192))
    deq = blockq.q4_dequantize_np(data, sc)
    full = blockq.q4_dequantize_np(packed, scales)
    np.testing.assert_allclose(deq, full[2:6, 64:192])
    idx.close()


def test_multifile_index(tmp_path):
    rng = np.random.default_rng(3)
    w1 = SafeTensorWriter()
    w1.add("x", rng.standard_normal((2, 32)).astype(np.float32))
    w1.write(tmp_path / "model-00001-of-00002.safetensors")
    w2 = SafeTensorWriter()
    w2.add("y", rng.standard_normal((3, 32)).astype(np.float32))
    w2.write(tmp_path / "model-00002-of-00002.safetensors")
    (tmp_path / "model.safetensors.index.json").write_text(
        json.dumps(
            {
                "metadata": {"total_size": 0},
                "weight_map": {
                    "x": "model-00001-of-00002.safetensors",
                    "y": "model-00002-of-00002.safetensors",
                },
            }
        )
    )
    idx = SafeTensorIndex(tmp_path)
    assert idx.load("x").shape == (2, 32)
    assert idx.load("y").shape == (3, 32)
    idx.close()


def test_bf16_roundtrip(tmp_path):
    import ml_dtypes

    rng = np.random.default_rng(4)
    x = rng.standard_normal((4, 32)).astype(ml_dtypes.bfloat16)
    w = SafeTensorWriter()
    w.add("x", x)
    w.write(tmp_path / "model.safetensors")
    idx = SafeTensorIndex(tmp_path)
    got = idx.load("x")
    assert got.dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(got.view(np.uint16), x.view(np.uint16))
    idx.close()


def test_interop_with_hf_safetensors(tmp_path):
    """Cross-check against the canonical safetensors library (via torch stack)."""
    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file, load_file

    rng = np.random.default_rng(5)
    arrs = {"w1": rng.standard_normal((4, 32)).astype(np.float32)}
    save_file(arrs, tmp_path / "model.safetensors")
    idx = SafeTensorIndex(tmp_path)
    np.testing.assert_array_equal(idx.load("w1"), arrs["w1"])
    idx.close()

    # and the reverse: our writer, their reader
    w = SafeTensorWriter()
    w.add("z", arrs["w1"])
    w.write(tmp_path / "ours.safetensors")
    theirs = load_file(tmp_path / "ours.safetensors")
    np.testing.assert_array_equal(theirs["z"], arrs["w1"])
