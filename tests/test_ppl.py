"""Perplexity harness tests: exact-counting invariant + q4 quality delta."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from tests.helpers import make_tiny_llama

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tiny_ppl")
    model_dir, hf = make_tiny_llama(tmp)
    from jlama_tpu.models.loader import load_params

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)
    return params, cfg, hf


def _hf_ppl(hf, ids):
    """Single full-context pass (ids shorter than context)."""
    with torch.no_grad():
        t = torch.tensor([list(ids)], dtype=torch.long)
        out = hf(t, labels=t)
    return math.exp(out.loss.item())


def test_ppl_matches_torch_full_window(tiny):
    params, cfg, hf = tiny
    from jlama_tpu.eval.ppl import score_tokens

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, 96).astype(np.int32)
    ours = score_tokens(params, cfg, ids, seq_len=96, stride=48)
    ref = _hf_ppl(hf, ids)
    assert abs(ours - ref) / ref < 0.02, (ours, ref)


def test_ppl_windowing_consistency(tiny):
    """Windowed scoring (stride < len) stays close to single-pass scoring."""
    params, cfg, _ = tiny
    from jlama_tpu.eval.ppl import score_tokens

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, 120).astype(np.int32)
    one = score_tokens(params, cfg, ids, seq_len=120, stride=120)
    win = score_tokens(params, cfg, ids, seq_len=64, stride=32)
    # windowed sees less context so ppl differs slightly, but must be finite
    # and in the same range
    assert 0.5 < win / one < 2.0


def test_q4_ppl_delta_small(tiny, tmp_path):
    """Quantized model ppl within a sane delta of fp32 on random text."""
    params, cfg, _ = tiny
    from jlama_tpu.eval.ppl import score_tokens
    from jlama_tpu.nn.qarray import quantize_q4, QArray

    qparams = dict(params)
    qlayers = {}
    # simpler: quantize stacked 3D weights directly (blocks are on last axis)
    for k, v in params["layers"].items():
        if k in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
            qlayers[k] = quantize_q4(np.asarray(v, dtype=np.float32))
        else:
            qlayers[k] = v
    qparams["layers"] = qlayers

    rng = np.random.default_rng(2)
    ids = rng.integers(0, 256, 96).astype(np.int32)
    fp = score_tokens(params, cfg, ids, seq_len=96, stride=48)
    q4 = score_tokens(qparams, cfg, ids, seq_len=96, stride=48)
    # tiny random model on random tokens: both near vocab-size ppl; the
    # quantized delta must be small in relative terms
    assert abs(q4 - fp) / fp < 0.05, (q4, fp)


def test_q4s_ppl_delta_vs_q4(tmp_path_factory):
    """The w8a8 kernel's q4s re-rounding must not move perplexity more than
    marginally relative to the q4 baseline (BASELINE.md gate is <=0.1 ppl on
    WikiText-2 for real checkpoints; this tiny-model harness bounds the same
    quantity on random text). Weight-format effect isolated by scoring with
    exact dequantized weights; kernel-vs-dequant equivalence is covered in
    tests/test_pallas_w8a8.py."""
    tmp = tmp_path_factory.mktemp("tiny_ppl_q4s")
    # dims divisible by the q4s GROUP (256)
    model_dir, _ = make_tiny_llama(
        tmp,
        {
            "hidden_size": 256,
            "intermediate_size": 512,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
        },
    )
    from jlama_tpu.models.loader import load_params
    from jlama_tpu.eval.ppl import score_tokens
    from jlama_tpu.nn.qarray import quantize_q4, QArray
    from jlama_tpu.ops.pallas_w8a8 import q4s_dequantize_np, to_q4s

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)

    def variant(kind):
        out = dict(params)
        layers = {}
        for k, v in params["layers"].items():
            if k in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
                per = []
                for l in range(v.shape[0]):
                    q4 = quantize_q4(np.asarray(v[l], np.float32))
                    if kind == "q4":
                        from jlama_tpu.quant.blockq import q4_dequantize_np

                        per.append(
                            q4_dequantize_np(
                                np.asarray(q4.data), np.asarray(q4.scales)
                            )
                        )
                    else:
                        per.append(q4s_dequantize_np(to_q4s(q4)))
                layers[k] = jnp.asarray(np.stack(per))
            else:
                layers[k] = v
        out["layers"] = layers
        return out

    rng = np.random.default_rng(5)
    ids = rng.integers(0, 256, 96).astype(np.int32)
    p_q4 = score_tokens(variant("q4"), cfg, ids, seq_len=96, stride=48)
    p_q4s = score_tokens(variant("q4s"), cfg, ids, seq_len=96, stride=48)
    assert abs(p_q4s - p_q4) / p_q4 < 0.03, (p_q4s, p_q4)
