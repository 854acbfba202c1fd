"""Multi-host bootstrap and per-host sharded weight loading.

TPU-native replacement for the reference's cluster bootstrap
(/root/reference/jlama-net/.../Coordinator.java + Worker.java register/
discover): instead of a gRPC registration dance assigning (layerShard,
headShard) ordinals, `jax.distributed.initialize` + a global mesh assigns
every chip its coordinates, and XLA's collectives replace the `combine`
(all-reduce) and `pass` (ring) RPCs.

Per-host weight loading mirrors the reference's ranged-HTTP shard fetch
(HTTPSafeTensorLoader.java:114-213): each host materializes only the rows of
each tensor its addressable devices own, using the safetensors row-range
reads, then `jax.make_array_from_single_device_arrays` assembles the global
sharded arrays without any host ever holding the full model.
"""

from __future__ import annotations

import os

import jax
from jax.sharding import Mesh, PartitionSpec as P


def initialize_cluster(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the jax.distributed cluster (no-op when single-process).

    Args default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) so the CLI and k8s manifests can
    drive it either way.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes
        or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def global_mesh(dp: int = 1, pp: int = 1, tp: int | None = None) -> Mesh:
    """Mesh over ALL cluster devices (multi-host: tp should span hosts only
    if the interconnect supports it; keep tp within a host, dp/pp across)."""
    from .mesh import make_mesh

    return make_mesh(jax.devices(), dp=dp, pp=pp, tp=tp)


def _range(n: int, size: int, i: int) -> tuple[int, int]:
    """[start, end) of shard i when n is split into `size` equal parts."""
    if n % size:
        raise ValueError(f"dim {n} not divisible by shard count {size}")
    per = n // size
    return i * per, (i + 1) * per


# per-layer weights of the llama family and their TP shard policy:
# "row" = first (output) dim sharded over tp (column-parallel layer),
# "col" = second (input) dim sharded over tp (row-parallel layer, psum after)
_LLAMA_SHARD_TABLE = {
    "wq": ("self_attn.q_proj.weight", "row"),
    "wk": ("self_attn.k_proj.weight", "row"),
    "wv": ("self_attn.v_proj.weight", "row"),
    "wo": ("self_attn.o_proj.weight", "col"),
    "w1": ("mlp.gate_proj.weight", "row"),
    "w3": ("mlp.up_proj.weight", "row"),
    "w2": ("mlp.down_proj.weight", "col"),
}
_LLAMA_NORMS = {
    "attn_norm.weight": "input_layernorm.weight",
    "ff_norm.weight": "post_attention_layernorm.weight",
}
_GEMMA2_NORMS = {
    "attn_norm.weight": "input_layernorm.weight",
    "post_attn_norm.weight": "post_attention_layernorm.weight",
    "ff_norm.weight": "pre_feedforward_layernorm.weight",
    "post_ff_norm.weight": "post_feedforward_layernorm.weight",
}
_SHARDED_ARCHS = {"llama", "mistral", "qwen2", "granite", "gemma", "gemma2",
                  "mixtral"}

# diagnostics from the last load_params_sharded call on this process:
# {"bytes_loaded": payload bytes this host actually read from the checkpoint}
LOAD_STATS: dict = {}


def load_params_sharded(
    model_dir,
    cfg,
    mesh: Mesh,
    float_dtype=None,
):
    """Load weights with each host reading ONLY its devices' shards.

    TPU-native equivalent of the reference's per-worker sparse loads
    (Weights.java:99-117 row-range mmap reads; HTTPSafeTensorLoader.java:
    114-213 ranged per-shard fetch): each process walks its addressable
    devices' mesh coordinates, reads just those (layer-range x row/col-range)
    slices from the checkpoint via SafeTensorIndex range loads, and
    assembles global arrays with jax.make_array_from_single_device_arrays —
    no host ever materializes the full model.

    Single-process: full-load + shard_params (equivalent, simpler).
    Architectures outside the llama family (gpt2/bert — small models with
    fused-QKV transforms) fall back to the full load.
    """
    import jax.numpy as jnp

    from ..config import load_config
    from ..models.loader import load_params
    from .mesh import shard_params

    float_dtype = float_dtype or jnp.bfloat16
    if cfg is None:
        cfg = load_config(model_dir)

    if jax.process_count() == 1 or cfg.model_type not in _SHARDED_ARCHS:
        params, cfg = load_params(model_dir, cfg, float_dtype)
        return shard_params(params, cfg, mesh), cfg

    params = _load_sharded_llama(model_dir, cfg, mesh, float_dtype)
    return params, cfg


def _load_sharded_llama(model_dir, cfg, mesh: Mesh, float_dtype):
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding

    from ..models.loader import PrefixedReader, _strip_prefix, _to_np_float
    from ..nn.qarray import QArray
    from ..st.http_loader import open_weights

    # local dir -> mmap'd range reads; http(s) URL -> ranged fetch per shard
    # (HTTPSafeTensorLoader.java:114-213 parity)
    idx = open_weights(model_dir)
    prefix = _strip_prefix(idx, cfg)
    reader = PrefixedReader(idx, prefix, float_dtype)

    pp, tp = mesh.shape["pp"], mesh.shape["tp"]
    L = cfg.n_layers
    # device -> mesh coordinates
    coords = {}
    dev_mesh = np.asarray(mesh.devices)
    for di, d in np.ndenumerate(dev_mesh):
        coords[d] = di  # (dp_i, pp_i, tp_i)
    local = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]

    def q4_col_range(r):
        if r[0] % 32 or r[1] % 32:
            raise ValueError("tp column shard must be 32-aligned for q4")
        return r

    def load_slice(name: str, policy: str, tp_i: int):
        """One tensor's (rows|cols) tp-shard as (kind, data, scales)."""
        full = prefix + name if reader.has(name) else name
        ti = idx.info(full)
        shape = ti.shape
        if policy == "row":
            rr, cr = _range(shape[0], tp, tp_i), None
        elif policy == "col":
            rr, cr = None, q4_col_range(_range(shape[-1], tp, tp_i))
        else:
            rr = cr = None
        data, scales, st_dtype = idx.load_quantized(full, rr, cr)
        if st_dtype == "Q4":
            return "q4", np.ascontiguousarray(data), np.ascontiguousarray(scales)
        if st_dtype == "I8" and scales is not None:
            return "q8", np.ascontiguousarray(data), np.ascontiguousarray(scales)
        return "f", _to_np_float(np.ascontiguousarray(data)), None

    def stack_layer_shard(hf_name: str, policy: str, pp_i: int, tp_i: int):
        lo, hi = _range(L, pp, pp_i)
        items = [
            load_slice(f"model.layers.{i}.{hf_name}", policy, tp_i)
            for i in range(lo, hi)
        ]
        kinds = {k for k, _, _ in items}
        if kinds == {"f"}:
            return np.stack([d for _, d, _ in items]).astype(float_dtype), None, "f"
        fmt = items[0][0]
        return (
            np.stack([d for _, d, _ in items]),
            np.stack([s for _, _, s in items]),
            fmt,
        )

    def assemble(global_shape, spec, shard_for):
        """Build a global array from per-device host shards.

        shard_for(pp_i, tp_i) -> np shard (cached per unique coordinate,
        since dp replicates weights)."""
        cache: dict[tuple[int, int], np.ndarray] = {}
        arrs = []
        sharding = NamedSharding(mesh, spec)
        for d in local:
            _, pp_i, tp_i = coords[d]
            key = (pp_i, tp_i)
            if key not in cache:
                cache[key] = shard_for(pp_i, tp_i)
            arrs.append(jax.device_put(cache[key], d))
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, arrs
        )

    def assemble_linear(hf_name: str, policy: str, key: str, out: dict):
        """Assemble one stacked per-layer weight (data + optional scales)."""
        probe = f"model.layers.0.{hf_name}"
        full = prefix + probe if reader.has(probe) else probe
        ti = idx.info(full)
        shape = list(ti.shape)
        packed = ti.dtype == "Q4"
        if packed:
            shape[-1] //= 2
        gshape = (L, *shape)
        dspec = (
            P("pp", "tp", None) if policy == "row"
            else P("pp", None, "tp") if policy == "col"
            else P("pp", *([None] * len(shape)))
        )
        shards: dict[tuple[int, int], tuple] = {}

        def get(pp_i, tp_i):
            if (pp_i, tp_i) not in shards:
                shards[(pp_i, tp_i)] = stack_layer_shard(hf_name, policy, pp_i, tp_i)
            return shards[(pp_i, tp_i)]

        data = assemble(gshape, dspec, lambda p_, t_: get(p_, t_)[0])
        fmt = next(iter(shards.values()))[2]
        if fmt in ("q4", "q8"):
            sshape = (L, shape[0], (shape[-1] * (2 if packed else 1)) // 32)
            sdata = assemble(sshape, dspec, lambda p_, t_: get(p_, t_)[1])
            out[key] = QArray(data, sdata, fmt)
        else:
            out[key] = data

    layers: dict = {}
    table = dict(_LLAMA_SHARD_TABLE)
    norms = _GEMMA2_NORMS if cfg.model_type == "gemma2" else _LLAMA_NORMS
    if cfg.model_type == "mixtral":
        for k in ("w1", "w2", "w3"):
            table.pop(k)
        table["router"] = ("block_sparse_moe.gate.weight", "rep")
        # expert-parallel: experts sharded over tp (one contiguous expert
        # range per shard), cf. _LAYER_RULES["experts.*"] = P("tp", ...)
        E = cfg.n_experts

        def expert_stack_shard(wname, pp_i, tp_i):
            lo, hi = _range(L, pp, pp_i)
            e0, e1 = _range(E, tp, tp_i)
            per_layer = []
            for i in range(lo, hi):
                items = [
                    load_slice(
                        f"model.layers.{i}.block_sparse_moe.experts.{e}.{wname}.weight",
                        "rep", 0,
                    )
                    for e in range(e0, e1)
                ]
                per_layer.append(items)
            kinds = {k for lay in per_layer for k, _, _ in lay}
            d = np.stack([np.stack([d for _, d, _ in lay]) for lay in per_layer])
            if kinds == {"f"}:
                return d.astype(float_dtype), None, "f"
            s = np.stack([np.stack([s for _, _, s in lay]) for lay in per_layer])
            return d, s, next(iter(kinds))

        for wname, key in (("w1", "experts.w1"), ("w2", "experts.w2"),
                           ("w3", "experts.w3")):
            probe = f"model.layers.0.block_sparse_moe.experts.0.{wname}.weight"
            full = prefix + probe if reader.has(probe) else probe
            ti = idx.info(full)
            shape = list(ti.shape)
            packed = ti.dtype == "Q4"
            if packed:
                shape[-1] //= 2
            gshape = (L, E, *shape)
            dspec = P("pp", "tp", *([None] * len(shape)))
            cacheE: dict[tuple[int, int], tuple] = {}

            def getE(pp_i, tp_i, wname=wname):
                if (pp_i, tp_i) not in cacheE:
                    cacheE[(pp_i, tp_i)] = expert_stack_shard(wname, pp_i, tp_i)
                return cacheE[(pp_i, tp_i)]

            data = assemble(gshape, dspec, lambda p_, t_: getE(p_, t_)[0])
            fmt = next(iter({v[2] for v in cacheE.values()}))
            if fmt in ("q4", "q8"):
                sshape = (L, E, shape[0], (shape[-1] * (2 if packed else 1)) // 32)
                sdata = assemble(sshape, dspec, lambda p_, t_: getE(p_, t_)[1])
                layers[key] = QArray(data, sdata, fmt)
            else:
                layers[key] = data

    for key, (hf_name, policy) in table.items():
        assemble_linear(hf_name, policy, key, layers)
    # norms: replicated within a pipeline stage, layer-stacked over pp
    for key, hf_name in norms.items():
        def norm_shard(pp_i, tp_i, hf_name=hf_name):
            lo, hi = _range(L, pp, pp_i)
            return np.stack(
                [reader.load_float(f"model.layers.{i}.{hf_name}")
                 for i in range(lo, hi)]
            ).astype(np.float32)

        probe = f"model.layers.0.{hf_name}"
        full = prefix + probe if reader.has(probe) else probe
        ti = idx.info(full)
        layers[key] = assemble(
            (L, *ti.shape), P("pp", *([None] * len(ti.shape))), norm_shard
        )
    # optional qkv biases (qwen2)
    for key, hf in (("wq.bias", "self_attn.q_proj.bias"),
                    ("wk.bias", "self_attn.k_proj.bias"),
                    ("wv.bias", "self_attn.v_proj.bias")):
        if not reader.has(f"model.layers.0.{hf}"):
            continue

        def bias_shard(pp_i, tp_i, hf=hf):
            lo, hi = _range(L, pp, pp_i)
            rows = []
            for i in range(lo, hi):
                b = reader.load_float(f"model.layers.{i}.{hf}")
                r0, r1 = _range(b.shape[0], tp, tp_i)
                rows.append(b[r0:r1])
            return np.stack(rows).astype(np.float32)

        probe = f"model.layers.0.{hf}"
        full = prefix + probe if reader.has(probe) else probe
        ti = idx.info(full)
        layers[key] = assemble((L, *ti.shape), P("pp", "tp"), bias_shard)

    params: dict = {"layers": layers}

    # top-level: embed (vocab-row-sharded over tp), final norm (replicated),
    # optional lm_head (vocab-row-sharded)
    def top_linear(key, hf_name):
        full = prefix + hf_name if reader.has(hf_name) else hf_name
        if full not in idx:
            return
        ti = idx.info(full)
        shape = list(ti.shape)
        packed = ti.dtype == "Q4"
        if packed:
            shape[-1] //= 2
        dspec = P("tp", None)
        cacheT: dict[tuple[int, int], tuple] = {}

        def getT(pp_i, tp_i):
            if tp_i not in cacheT:
                rr = _range(ti.shape[0], tp, tp_i)
                data, scales, st_dtype = idx.load_quantized(full, rr, None)
                kind = (
                    "q4" if st_dtype == "Q4"
                    else "q8" if st_dtype == "I8" and scales is not None
                    else "f"
                )
                if kind == "f":
                    data = _to_np_float(np.ascontiguousarray(data)).astype(
                        float_dtype
                    )
                cacheT[tp_i] = (np.ascontiguousarray(data), scales, kind)
            return cacheT[tp_i]

        data = assemble(tuple(shape), dspec, lambda p_, t_: getT(p_, t_)[0])
        kind = next(iter({v[2] for v in cacheT.values()}))
        if kind in ("q4", "q8"):
            sshape = (shape[0], (shape[-1] * (2 if packed else 1)) // 32)
            sdata = assemble(
                sshape, dspec,
                lambda p_, t_: np.ascontiguousarray(getT(p_, t_)[1]),
            )
            params[key] = QArray(data, sdata, kind)
        else:
            params[key] = data

    top_linear("embed", "model.embed_tokens.weight")
    top_linear("lm_head", "lm_head.weight")

    def rep_top(key, hf_name):
        def shard(pp_i, tp_i):
            return reader.load_float(hf_name).astype(np.float32)

        full = prefix + hf_name if reader.has(hf_name) else hf_name
        ti = idx.info(full)
        params[key] = assemble(
            tuple(ti.shape), P(*([None] * len(ti.shape))), shard
        )

    rep_top("final_norm.weight", "model.norm.weight")

    LOAD_STATS["bytes_loaded"] = idx.bytes_loaded
    idx.close()
    return params
