"""Offline quantizer: JQ4 checkpoint round trip through the full stack."""

import numpy as np
import pytest
import jax.numpy as jnp

from tests.helpers import make_tiny_llama

torch = pytest.importorskip("torch")


def test_quantize_model_roundtrip(tmp_path):
    model_dir, _ = make_tiny_llama(tmp_path / "src")
    from jlama_tpu.quant.quantizer import quantize_model
    from jlama_tpu.st import SafeTensorIndex
    from jlama_tpu.models.loader import load_params
    from jlama_tpu.models.base import forward_logits
    from jlama_tpu.nn.qarray import QArray

    out = quantize_model(model_dir, out_dir=tmp_path / "q4")
    assert (out / "model.safetensors").exists()
    assert (out / "config.json").exists()
    assert (out / "README.md").read_text().startswith("# Quantized version")

    idx = SafeTensorIndex(out)
    info = idx.info("model.layers.0.self_attn.q_proj.weight")
    assert info.dtype == "Q4"
    assert "model.layers.0.self_attn.q_proj.weight.qb" in idx.names()
    # norms stay float
    assert idx.info("model.layers.0.input_layernorm.weight").dtype == "F32"
    idx.close()

    params, cfg = load_params(out, float_dtype=jnp.float32)
    assert isinstance(params["layers"]["wq"], QArray)
    assert params["layers"]["wq"].fmt == "q4"

    # logits close to the fp model's (quantization-level tolerance)
    fp_params, _ = load_params(model_dir, float_dtype=jnp.float32)
    toks = np.array([[1, 5, 9, 42]], dtype=np.int32)
    pos = np.arange(4, dtype=np.int32)[None, :]
    ql, _ = forward_logits(params, cfg, jnp.asarray(toks), jnp.asarray(pos),
                           dtype=jnp.float32)
    fl, _ = forward_logits(fp_params, cfg, jnp.asarray(toks), jnp.asarray(pos),
                           dtype=jnp.float32)
    # same top token for most positions (tiny random model is sensitive)
    agree = (np.argmax(np.asarray(ql), -1) == np.argmax(np.asarray(fl), -1)).mean()
    assert agree >= 0.5
    rel = np.linalg.norm(np.asarray(ql) - np.asarray(fl)) / np.linalg.norm(
        np.asarray(fl)
    )
    assert rel < 0.5


def test_quantize_skip_and_drop(tmp_path):
    model_dir, _ = make_tiny_llama(tmp_path / "src2")
    from jlama_tpu.quant.quantizer import quantize_model
    from jlama_tpu.st import SafeTensorIndex

    out = quantize_model(
        model_dir,
        out_dir=tmp_path / "q4b",
        skip_prefixes=("q_proj",),
        drop_prefixes=("lm_head",),
    )
    idx = SafeTensorIndex(out)
    assert idx.info("model.layers.0.self_attn.q_proj.weight").dtype == "F32"
    assert idx.info("model.layers.0.self_attn.k_proj.weight").dtype == "Q4"
    assert "lm_head.weight" not in idx.names()
    idx.close()


def test_cli_version_and_parser():
    from jlama_tpu.cli import build_parser

    ap = build_parser()
    args = ap.parse_args(["version"])
    args.fn(args)
    args = ap.parse_args(
        ["serve", "m", "--port", "9999", "--batch-slots", "4"]
    )
    assert args.port == 9999 and args.batch_slots == 4
    args = ap.parse_args(["quantize", "m", "--quantize-to", "i8"])
    assert args.quantize_to == "i8"
