"""SafeTensorSplitter parity test."""

import numpy as np

from jlama_tpu.quant import blockq
from jlama_tpu.st import SafeTensorIndex, SafeTensorWriter
from jlama_tpu.st.splitter import split_safetensors


def test_split_and_reload(tmp_path):
    rng = np.random.default_rng(0)
    src = tmp_path / "src"
    src.mkdir()
    w = SafeTensorWriter()
    tensors = {}
    for i in range(6):
        a = rng.standard_normal((8, 64)).astype(np.float32)
        tensors[f"t{i}"] = a
        w.add(f"t{i}", a)
    qx = rng.standard_normal((4, 64)).astype(np.float32)
    packed, scales = blockq.q4_quantize_np(qx)
    w.add_q4("q", packed, scales)
    w.write(src / "model.safetensors")

    out = split_safetensors(src, tmp_path / "parts", n_parts=3)
    assert (out / "model.safetensors.index.json").exists()
    assert len(list(out.glob("model-*.safetensors"))) == 3

    idx = SafeTensorIndex(out)
    for name, a in tensors.items():
        np.testing.assert_array_equal(idx.load(name), a)
    data, sc, dtype = idx.load_quantized("q")
    assert dtype == "Q4"
    np.testing.assert_array_equal(data, packed)
    np.testing.assert_array_equal(sc, scales)
    # .qb rides with its tensor in the same part
    assert idx.weight_map["q"] == idx.weight_map["q.qb"]
    idx.close()
