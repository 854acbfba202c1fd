"""Offline model quantization: HF checkpoint → JQ4/I8 checkpoint.

Parity with the reference's quantizeModel
(/root/reference/jlama-core/.../safetensors/SafeTensorSupport.java:215-332):
reads every tensor, quantizes 2-D weight matrices to Q4 (or I8) with `.qb`
block-scale companions, honors skip/drop prefixes, writes a single
`model.safetensors` plus copied config/tokenizer files into
`<model>-JQ4/`, and prepends a model-card header to README.md.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np

from ..st import SafeTensorIndex, SafeTensorWriter
from . import blockq

COPY_FILES = (
    "config.json",
    "tokenizer.json",
    "tokenizer_config.json",
    "generation_config.json",
    "special_tokens_map.json",
)

CARD_HEADER = """# Quantized version of {name}

This model is a quantized variant of the {name} model, optimized for use with
jlama-tpu, a TPU-native inference engine implementing the Jlama JQ4 format.
Block-wise 4-bit quantization (32-element blocks, per-block scales) reduces
the model's size and HBM bandwidth while maintaining accuracy.

"""


def _quantizable(name: str, shape: tuple[int, ...], dtype: str) -> bool:
    if dtype not in ("F32", "F16", "BF16"):
        return False
    if len(shape) != 2:
        return False  # norms/biases stay float
    if shape[-1] % blockq.BLOCK_SIZE != 0:
        return False
    if "norm" in name.lower() or "bias" in name.lower():
        return False
    return True


def quantize_model(
    model_dir: str | Path,
    out_dir: str | Path | None = None,
    quantize_to: str = "q4",  # q4 | i8
    skip_prefixes: tuple[str, ...] = (),
    drop_prefixes: tuple[str, ...] = (),
    progress=None,
) -> Path:
    model_dir = Path(model_dir)
    suffix = {"q4": "JQ4", "i8": "JI8"}[quantize_to]
    out = Path(out_dir) if out_dir else model_dir.parent / f"{model_dir.name}-{suffix}"
    out.mkdir(parents=True, exist_ok=True)

    idx = SafeTensorIndex(model_dir)
    w = SafeTensorWriter(metadata={"format": "pt", "quantized_by": "jlama-tpu"})
    names = [n for n in idx.names() if not n.endswith(".qb")]
    for i, name in enumerate(names):
        if any(name.startswith(p) for p in drop_prefixes):
            continue
        info = idx.info(name)
        skip = any(p in name for p in skip_prefixes)
        if not skip and _quantizable(name, info.shape, info.dtype):
            from .. import native  # threaded C++ kernels, numpy fallback

            data = np.asarray(idx.load(name), dtype=np.float32)
            if quantize_to == "q4":
                packed, scales = native.q4_quantize(data)
                w.add_q4(name, packed, scales)
            else:
                values, scales = native.q8_quantize(data)
                w.add_i8(name, values, scales)
        else:
            arr = idx.load(name)
            w.add(name, np.ascontiguousarray(arr))
        if progress:
            progress(name, i + 1, len(names))
    idx.close()
    w.write(out / "model.safetensors")

    for f in COPY_FILES:
        src = model_dir / f
        if src.exists():
            shutil.copyfile(src, out / f)
    readme = model_dir / "README.md"
    header = CARD_HEADER.format(name=model_dir.name)
    if readme.exists():
        (out / "README.md").write_text(header + readme.read_text())
    else:
        (out / "README.md").write_text(header)
    return out
