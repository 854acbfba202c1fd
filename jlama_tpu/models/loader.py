"""Weight loading: HF safetensors checkpoints → stacked jnp param trees.

Covers what the reference spreads across per-arch model constructors and
Weights.java (/root/reference/jlama-core/.../safetensors/Weights.java:119-199,
model/llama/LlamaModel.java:106-158, model/gpt2/GPT2Model.java:77-92, ...):
name mapping per architecture, dtype handling (F16 up-convert, BF16 kept,
Q4/I8 + `.qb` scales), GPT-2's fused-QKV split + Conv1D transpose, and tied
lm_head fallback. Per-layer tensors are stacked along a leading axis for the
scan-based forward pass.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, load_config
from ..nn.qarray import QArray
from ..quant import blockq
from ..st import SafeTensorIndex


def _to_np_float(arr: np.ndarray) -> np.ndarray:
    """F16 → F32 up-convert (cf. Weights.java:139-154); other dtypes as-is."""
    if arr.dtype == np.float16:
        return arr.astype(np.float32)
    return arr


class WeightReader:
    """Reads possibly-quantized tensors from a SafeTensorIndex."""

    def __init__(self, idx: SafeTensorIndex, float_dtype=jnp.bfloat16):
        self.idx = idx
        self.float_dtype = float_dtype

    def has(self, name: str) -> bool:
        return name in self.idx

    def load_linear(self, name: str):
        """Load a weight matrix: QArray when quantized, else jnp float."""
        data, scales, st_dtype = self.idx.load_quantized(name)
        if st_dtype == "Q4":
            # packed payload is the runtime layout (QArray fmt "q4")
            return ("q4", np.ascontiguousarray(data), np.ascontiguousarray(scales))
        if st_dtype == "I8" and scales is not None:
            return ("q8", np.ascontiguousarray(data), np.ascontiguousarray(scales))
        return ("f", _to_np_float(np.ascontiguousarray(data)), None)

    def load_float(self, name: str) -> np.ndarray:
        data, scales, st_dtype = self.idx.load_quantized(name)
        if st_dtype == "Q4":
            return blockq.q4_dequantize_np(data, scales)
        if st_dtype == "I8" and scales is not None:
            return blockq.q8_dequantize_np(data, scales)
        return _to_np_float(np.ascontiguousarray(data))


def _stack_linears(items: list[tuple]) -> object:
    """Stack per-layer load_linear results into one leaf (QArray or jnp)."""
    kinds = {k for k, _, _ in items}
    if kinds == {"f"}:
        return np.stack([d for _, d, _ in items])
    if kinds <= {"q4", "q8"} and len(kinds) == 1:
        fmt = items[0][0]
        return QArray(
            jnp.asarray(np.stack([d for _, d, _ in items])),
            jnp.asarray(np.stack([s for _, _, s in items])),
            fmt,
        )
    # mixed (e.g. some layers skipped during quantization): dequantize all
    out = []
    for k, d, s in items:
        if k == "q4":
            out.append(blockq.q4_dequantize_np(d, s))
        elif k == "q8":
            out.append(blockq.q8_dequantize_np(d, s))
        else:
            out.append(d)
    return np.stack(out)


# ---------------------------------------------------------------------------
# Per-architecture name maps
# ---------------------------------------------------------------------------
# Each entry: our per-layer key -> callable(reader, cfg, i) returning a
# load_linear tuple (for matrices) — or, for *_np keys (norms/biases), a
# plain numpy array.


def _llama_layer_map(prefix: str = "model.layers") -> dict[str, Callable]:
    def lin(name):
        return lambda r, cfg, i: r.load_linear(f"{prefix}.{i}.{name}.weight")

    def lin_bias(name):
        return lambda r, cfg, i: r.load_float(f"{prefix}.{i}.{name}.bias")

    m = {
        "wq": lin("self_attn.q_proj"),
        "wk": lin("self_attn.k_proj"),
        "wv": lin("self_attn.v_proj"),
        "wo": lin("self_attn.o_proj"),
        "w1": lin("mlp.gate_proj"),
        "w2": lin("mlp.down_proj"),
        "w3": lin("mlp.up_proj"),
        "attn_norm.weight:np": lambda r, cfg, i: r.load_float(
            f"{prefix}.{i}.input_layernorm.weight"
        ),
        "ff_norm.weight:np": lambda r, cfg, i: r.load_float(
            f"{prefix}.{i}.post_attention_layernorm.weight"
        ),
    }
    m["wq.bias:np?"] = lin_bias("self_attn.q_proj")
    m["wk.bias:np?"] = lin_bias("self_attn.k_proj")
    m["wv.bias:np?"] = lin_bias("self_attn.v_proj")
    return m


def _gemma2_layer_map() -> dict[str, Callable]:
    m = _llama_layer_map()
    p = "model.layers"
    m["post_attn_norm.weight:np"] = lambda r, cfg, i: r.load_float(
        f"{p}.{i}.post_attention_layernorm.weight"
    )
    m["ff_norm.weight:np"] = lambda r, cfg, i: r.load_float(
        f"{p}.{i}.pre_feedforward_layernorm.weight"
    )
    m["post_ff_norm.weight:np"] = lambda r, cfg, i: r.load_float(
        f"{p}.{i}.post_feedforward_layernorm.weight"
    )
    return m


def _mixtral_layer_map() -> dict[str, Callable]:
    m = _llama_layer_map()
    for k in ("w1", "w2", "w3"):
        m.pop(k)
    p = "model.layers"

    def expert_stack(wname):
        def f(r, cfg, i):
            items = [
                r.load_linear(f"{p}.{i}.block_sparse_moe.experts.{e}.{wname}.weight")
                for e in range(cfg.n_experts)
            ]
            return ("stacked", _stack_linears(items), None)

        return f

    m["experts.w1"] = expert_stack("w1")
    m["experts.w2"] = expert_stack("w2")
    m["experts.w3"] = expert_stack("w3")
    m["router"] = lambda r, cfg, i: r.load_linear(
        f"{p}.{i}.block_sparse_moe.gate.weight"
    )
    return m


def _gpt2_split_qkv(r: WeightReader, i: int, which: int, cfg: ModelConfig):
    """GPT-2 fused c_attn: Conv1D weight [D, 3D] → transpose → split 3 ways.

    cf. GPT2Model.java:77-92 (split + transpose of conv1d weights).
    """
    w = r.load_float(f"h.{i}.attn.c_attn.weight")  # [D, 3D]
    d = cfg.embedding_length
    return ("f", np.ascontiguousarray(w[:, which * d : (which + 1) * d].T), None)


def _gpt2_layer_map() -> dict[str, Callable]:
    def convt(name):  # Conv1D stores [in, out]; we want [out, in]
        return lambda r, cfg, i: (
            "f",
            np.ascontiguousarray(r.load_float(f"h.{i}.{name}.weight").T),
            None,
        )

    def bias(name, split=None):
        def f(r, cfg, i):
            b = r.load_float(f"h.{i}.{name}.bias")
            if split is not None:
                d = cfg.embedding_length
                b = b[split * d : (split + 1) * d]
            return np.ascontiguousarray(b)

        return f

    return {
        "wq": lambda r, cfg, i: _gpt2_split_qkv(r, i, 0, cfg),
        "wk": lambda r, cfg, i: _gpt2_split_qkv(r, i, 1, cfg),
        "wv": lambda r, cfg, i: _gpt2_split_qkv(r, i, 2, cfg),
        "wo": convt("attn.c_proj"),
        "w1": convt("mlp.c_fc"),
        "w2": convt("mlp.c_proj"),
        "wq.bias:np?": bias("attn.c_attn", 0),
        "wk.bias:np?": bias("attn.c_attn", 1),
        "wv.bias:np?": bias("attn.c_attn", 2),
        "wo.bias:np?": bias("attn.c_proj"),
        "w1.bias:np?": bias("mlp.c_fc"),
        "w2.bias:np?": bias("mlp.c_proj"),
        "attn_norm.weight:np": lambda r, cfg, i: r.load_float(f"h.{i}.ln_1.weight"),
        "attn_norm.bias:np": lambda r, cfg, i: r.load_float(f"h.{i}.ln_1.bias"),
        "ff_norm.weight:np": lambda r, cfg, i: r.load_float(f"h.{i}.ln_2.weight"),
        "ff_norm.bias:np": lambda r, cfg, i: r.load_float(f"h.{i}.ln_2.bias"),
    }


def _bert_layer_map() -> dict[str, Callable]:
    p = "encoder.layer"

    def lin(name):
        return lambda r, cfg, i: r.load_linear(f"{p}.{i}.{name}.weight")

    def npf(name):
        return lambda r, cfg, i: r.load_float(f"{p}.{i}.{name}")

    return {
        "wq": lin("attention.self.query"),
        "wk": lin("attention.self.key"),
        "wv": lin("attention.self.value"),
        "wo": lin("attention.output.dense"),
        "w1": lin("intermediate.dense"),
        "w2": lin("output.dense"),
        "wq.bias:np?": npf("attention.self.query.bias"),
        "wk.bias:np?": npf("attention.self.key.bias"),
        "wv.bias:np?": npf("attention.self.value.bias"),
        "wo.bias:np?": npf("attention.output.dense.bias"),
        "w1.bias:np?": npf("intermediate.dense.bias"),
        "w2.bias:np?": npf("output.dense.bias"),
        "attn_norm.weight:np": npf("attention.output.LayerNorm.weight"),
        "attn_norm.bias:np": npf("attention.output.LayerNorm.bias"),
        "ff_norm.weight:np": npf("output.LayerNorm.weight"),
        "ff_norm.bias:np": npf("output.LayerNorm.bias"),
    }


LAYER_MAPS: dict[str, Callable[[], dict[str, Callable]]] = {
    "llama": _llama_layer_map,
    "mistral": _llama_layer_map,
    "qwen2": _llama_layer_map,
    "granite": _llama_layer_map,
    "gemma": _llama_layer_map,
    "gemma2": _gemma2_layer_map,
    "mixtral": _mixtral_layer_map,
    "gpt2": _gpt2_layer_map,
    "bert": _bert_layer_map,
}

TOPLEVEL_MAPS: dict[str, dict[str, str]] = {
    # our key -> hf name ("?" suffix = optional)
    "llama": {
        "embed": "model.embed_tokens.weight",
        "final_norm.weight:np": "model.norm.weight",
        "lm_head": "lm_head.weight?",
    },
    "gpt2": {
        "embed": "wte.weight",
        "wpe:np": "wpe.weight",
        "final_norm.weight:np": "ln_f.weight",
        "final_norm.bias:np": "ln_f.bias",
    },
    "bert": {
        "embed": "embeddings.word_embeddings.weight",
        "wpe:np": "embeddings.position_embeddings.weight",
        "token_type_embed:np": "embeddings.token_type_embeddings.weight",
        "embed_norm.weight:np": "embeddings.LayerNorm.weight",
        "embed_norm.bias:np": "embeddings.LayerNorm.bias",
        "pooler.weight?": "pooler.dense.weight?",
        "pooler.bias:np?": "pooler.dense.bias?",
    },
}
for _a in ("mistral", "qwen2", "granite", "gemma", "gemma2", "mixtral"):
    TOPLEVEL_MAPS[_a] = TOPLEVEL_MAPS["llama"]


def _strip_prefix(idx: SafeTensorIndex, cfg: ModelConfig) -> str:
    """Detect checkpoint name prefixes ('bert.', 'transformer.', 'model.')."""
    names = idx.names()
    for pref in ("bert.", "transformer.", ""):
        probe = {
            "gpt2": f"{pref}wte.weight",
            "bert": f"{pref}embeddings.word_embeddings.weight",
        }.get(cfg.model_type, f"{pref}model.embed_tokens.weight")
        if probe in names:
            return pref
    return ""


class PrefixedReader(WeightReader):
    def __init__(self, idx, prefix: str, float_dtype=jnp.bfloat16):
        super().__init__(idx, float_dtype)
        self.prefix = prefix

    def has(self, name):
        return super().has(self.prefix + name)

    def load_linear(self, name):
        return super().load_linear(self.prefix + name)

    def load_float(self, name):
        return super().load_float(self.prefix + name)


def load_params(
    model_dir: str | Path,
    cfg: ModelConfig | None = None,
    float_dtype=jnp.bfloat16,
    layer_range: tuple[int, int] | None = None,
    include_embeddings: bool = True,
    include_head: bool = True,
) -> tuple[dict, ModelConfig]:
    """Load a model directory into (params, cfg).

    The partial-load arguments mirror the reference's InferenceType weight
    gating (AbstractModel.java:59-83): a pipeline middle stage loads only its
    layer_range with no embeddings/head (FORWARD_PASS); a sampler host loads
    embeddings+head with no layers (OUTPUT_TO_TOKEN). Stacked layer arrays
    still span [layer_range), so `forward_hidden(..., layer_range=...)`
    should use 0-based offsets into them.
    """
    from ..st.http_loader import is_url, open_weights

    if not is_url(model_dir):
        model_dir = Path(model_dir)
    if cfg is None:
        cfg = load_config(model_dir)
    idx = open_weights(model_dir)
    prefix = _strip_prefix(idx, cfg)
    r = PrefixedReader(idx, prefix, float_dtype)

    params: dict = {}
    lo, hi = layer_range if layer_range is not None else (0, cfg.n_layers)

    # top-level tensors (lm_head may live outside the prefix)
    top_map = dict(TOPLEVEL_MAPS[cfg.model_type])
    if not include_embeddings and not include_head:
        top_map = {
            k: v
            for k, v in top_map.items()
            if k.split(":")[0].rstrip("?")
            not in ("embed", "wpe", "token_type_embed", "lm_head",
                    "final_norm.weight", "final_norm.bias")
        }
    elif not include_head:
        top_map = {
            k: v
            for k, v in top_map.items()
            if k.split(":")[0].rstrip("?") != "lm_head"
        }
    for key, hf_name in top_map.items():
        optional = hf_name.endswith("?")
        hf = hf_name.rstrip("?")
        is_np = ":np" in key
        key_clean = key.replace(":np", "").rstrip("?")
        target = r if r.has(hf) else None
        if target is None and idx.__contains__(hf):  # unprefixed fallback
            target = WeightReader(idx, float_dtype)
        if target is None:
            if optional:
                continue
            raise KeyError(f"missing tensor {hf!r} (prefix={prefix!r})")
        if is_np:
            params[key_clean] = jnp.asarray(target.load_float(hf), dtype=jnp.float32)
        else:
            kind, data, scales = target.load_linear(hf)
            if kind == "f":
                params[key_clean] = jnp.asarray(data, dtype=float_dtype)
            else:
                params[key_clean] = QArray(
                    jnp.asarray(data), jnp.asarray(scales), kind
                )

    # per-layer stacked tensors
    layer_map = LAYER_MAPS[cfg.model_type]()
    layers: dict = {}
    for key, fn in layer_map.items():
        optional = key.endswith("?")
        is_np = ":np" in key
        key_clean = key.replace(":np", "").rstrip("?")
        if lo >= hi:
            continue
        try:
            items = [fn(r, cfg, i) for i in range(lo, hi)]
        except KeyError:
            if optional:
                continue
            raise
        if is_np:
            layers[key_clean] = jnp.asarray(
                np.stack(items), dtype=jnp.float32
            )
        elif items[0][0] == "stacked":  # MoE pre-stacked experts
            stacked = [it[1] for it in items]
            if isinstance(stacked[0], QArray):
                layers[key_clean] = QArray(
                    jnp.stack([s.data for s in stacked]),
                    jnp.stack([s.scales for s in stacked]),
                    stacked[0].fmt,
                )
            else:
                layers[key_clean] = jnp.asarray(
                    np.stack(stacked), dtype=float_dtype
                )
        else:
            leaf = _stack_linears(items)
            if isinstance(leaf, np.ndarray):
                layers[key_clean] = jnp.asarray(leaf, dtype=float_dtype)
            else:
                layers[key_clean] = leaf
    params["layers"] = layers

    # classifier head (BERT sequence classification)
    if cfg.model_type == "bert":
        for cname in ("classifier.weight", "classifier.bias"):
            if cname in idx:
                arr = WeightReader(idx, float_dtype).load_float(cname)
                params[cname] = jnp.asarray(arr, dtype=jnp.float32)

    idx.close()
    return params, cfg
