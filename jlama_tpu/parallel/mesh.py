"""Device mesh construction and parameter sharding rules.

The TPU-native replacement for the reference's DistributedContext + gRPC
shard planner (/root/reference/jlama-core/.../model/DistributedContext.java,
jlama-net/.../grpc/JlamaService.java:79-134): instead of head/layer ordinals
negotiated over RPC, a `jax.sharding.Mesh` with axes

  dp — data parallel (batch / concurrent sequences)
  pp — pipeline parallel (the stacked layer axis; reference "layer shard")
  tp — tensor parallel (heads / FFN hidden; reference "model shard"),
       also used for expert parallelism (MoE expert axis) and sequence
       parallelism (activation sequence axis between blocks)

and GSPMD inserting the collectives the reference implemented as the
`combine` all-reduce RPC (psum over tp) and the `pass` ring (pp boundaries).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..nn.qarray import QArray


def make_mesh(
    devices=None, dp: int = 1, pp: int = 1, tp: int | None = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = n // (dp * pp)
    if dp * pp * tp != n:
        raise ValueError(f"dp*pp*tp={dp * pp * tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, pp, tp)
    return Mesh(arr, ("dp", "pp", "tp"))


def plan_mesh_axes(
    n_devices: int,
    cfg: ModelConfig,
    weight_bytes: int | None = None,
    hbm_bytes_per_device: int = 16 << 30,  # v5e
    kv_reserve_frac: float = 0.35,
) -> tuple[int, int, int]:
    """Derive (dp, pp, tp) automatically when no --mesh is given.

    The TPU analog of the reference's shard planner
    (/root/reference/jlama-net/.../grpc/JlamaService.java:79-126), which
    rounds head shards to a power of two and sizes shards to ~3B params per
    worker. Policy here:

    - tp (head sharding) first: the largest power of two that divides both
      the device count and n_kv_heads — TP rides ICI with one psum per
      projection and cuts per-token latency.
    - pp (layer sharding) only when tp alone cannot fit the weights in
      per-chip HBM (minus a KV-page reserve): smallest stage count that fits
      and divides n_layers.
    - dp absorbs the remaining devices: the shard_map serving path shards
      batch slots + the KV page pool over dp (runtime/scheduler.py), so dp
      devices serve disjoint slices of the continuous batch — beyond the
      reference, which has no DP at all (SURVEY §2.6).
    """
    if n_devices < 1:
        raise ValueError("need at least one device")
    budget = int(hbm_bytes_per_device * (1.0 - kv_reserve_frac))
    min_shards = 1
    if weight_bytes:
        min_shards = max(1, -(-weight_bytes // budget))
    tp = 1
    while (
        tp * 2 <= n_devices
        and n_devices % (tp * 2) == 0
        and cfg.n_kv_heads % (tp * 2) == 0
        and cfg.n_heads % (tp * 2) == 0
        # embed/lm_head are vocab-row-sharded over tp
        and cfg.vocab_size % (tp * 2) == 0
    ):
        tp *= 2
    rest = n_devices // tp
    pp = 1
    if tp < min_shards:
        # memory-forced pipeline stages: smallest divisor of the remaining
        # devices that fits the per-stage weights and divides the layer count
        for cand in range(2, rest + 1):
            if rest % cand:
                continue
            if cfg.n_layers % cand:
                continue
            if tp * cand >= min_shards:
                pp = cand
                break
        else:
            if rest > 1 and cfg.n_layers % rest == 0:
                pp = rest  # best effort: all remaining devices as stages
    dp = rest // pp
    if weight_bytes and tp * pp < min_shards:
        raise MemoryError(
            f"model ({weight_bytes / 1e9:.1f} GB) does not fit on {n_devices} "
            f"device(s) with {hbm_bytes_per_device / 1e9:.0f} GB HBM each "
            f"(best mesh dp={dp},pp={pp},tp={tp})"
        )
    return dp, pp, tp


def plan_mesh(
    cfg: ModelConfig,
    devices=None,
    weight_bytes: int | None = None,
    hbm_bytes_per_device: int = 16 << 30,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    dp, pp, tp = plan_mesh_axes(
        len(devices), cfg, weight_bytes, hbm_bytes_per_device
    )
    return make_mesh(devices, dp=dp, pp=pp, tp=tp)


# sharding rules for stacked layer params: key -> PartitionSpec (without the
# leading pp/layer axis, which is added automatically)
_LAYER_RULES: dict[str, P] = {
    "wq": P("tp", None),  # column-parallel: heads sharded
    "wk": P("tp", None),
    "wv": P("tp", None),
    "wo": P(None, "tp"),  # row-parallel: psum after (the combine point)
    "w1": P("tp", None),
    "w3": P("tp", None),
    "w2": P(None, "tp"),
    "wqkv": P("tp", None),  # fused QKV (GSPMD block-partitions rows; the
    "w13": P("tp", None),   # post-matmul split is a logical slice, so head
    "wqkv.bias": P("tp"),   # boundaries need not align with shard cuts)
    "wq.bias": P("tp"),
    "wk.bias": P("tp"),
    "wv.bias": P("tp"),
    "wo.bias": P(None),
    "w1.bias": P("tp"),
    "w2.bias": P(None),
    "router": P(None, None),
    "experts.w1": P("tp", None, None),  # expert-parallel over tp
    "experts.w2": P("tp", None, None),
    "experts.w3": P("tp", None, None),
    "experts.w1_t": P("tp", None, None),  # ragged_dot layout [E, in, out]
    "experts.w2_t": P("tp", None, None),
    "experts.w3_t": P("tp", None, None),
}


def _spec_for_layer_key(key: str, ndim_tail: int) -> P:
    base = _LAYER_RULES.get(key)
    if base is None:  # norms and other vectors: replicate within a stage
        base = P(*([None] * ndim_tail))
    return P("pp", *base)


def _leaf_ndim(leaf) -> int:
    return leaf.data.ndim if isinstance(leaf, QArray) else leaf.ndim


def param_pspecs(params: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    """Build the fitted PartitionSpec tree matching the param tree (QArray
    leaves become QArray-of-specs so data and scales each get a spec).

    Any spec axis whose mesh extent does not divide the array dim degrades to
    replicated on that axis (e.g. an odd vocab under tp — the reference's
    planner likewise rounds head shards to what divides,
    JlamaService.java:79-126); correctness is preserved, only the sharding
    weakens. Fitted specs always carry one entry per array dim.

    Used both to place params (param_shardings wraps these in NamedShardings)
    and as shard_map in_specs for the tensor-parallel forward
    (parallel/tp_forward.py).
    """

    def fit(spec: P, shape: tuple) -> P:
        axes = list(spec) + [None] * (len(shape) - len(spec))
        fixed = []
        for dim, ax in zip(shape, axes):
            ext = 1
            for name in (ax if isinstance(ax, tuple) else (ax,) if ax else ()):
                ext *= mesh.shape[name]
            fixed.append(ax if ext and dim % ext == 0 else None)
        return P(*fixed)

    def specd(spec: P, leaf):
        if isinstance(leaf, QArray) and leaf.fmt == "q4s":
            # group-major w8a8 layout (ops/pallas_w8a8.py): data
            # [(L,) ngrp, N, 128], sigma [(L,) ngrp, N, 8], swk
            # [(L,) ngrp, 1, N]. The incoming spec follows the canonical
            # [(L,) out, in] layout: translate out->N axis, in->ngrp axis.
            axes = list(spec)
            lead = axes[:-2] if len(axes) > 2 else []
            out_ax, in_ax = axes[-2] if len(axes) >= 2 else None, axes[-1]
            dspec = P(*lead, in_ax, out_ax, None)
            sigma, swk = leaf.scales
            return QArray(
                fit(dspec, leaf.data.shape),
                (
                    fit(dspec, sigma.shape),
                    fit(P(*lead, in_ax, None, out_ax), swk.shape),
                ),
                leaf.fmt,
            )
        if isinstance(leaf, QArray):
            return QArray(
                fit(spec, leaf.data.shape),
                # scales share leading dims; block dim follows data last-dim
                fit(spec, leaf.scales.shape),
                leaf.fmt,
            )
        return fit(spec, leaf.shape)

    def top_spec(key: str, leaf) -> P:
        nd = _leaf_ndim(leaf)
        if key in ("embed", "lm_head"):
            return P("tp", None)  # vocab-sharded large tables
        return P(*([None] * nd))

    out: dict = {}
    for k, v in params.items():
        if k == "layers":
            continue
        out[k] = specd(top_spec(k, v), v)

    stacked = params["layers"]
    if isinstance(stacked, (list, tuple)):
        # unrolled per-layer list: same rules, no leading pp/layer axis
        out["layers"] = [
            {
                k: specd(_layer_rule(k, _leaf_ndim(v)), v)
                for k, v in d.items()
            }
            for d in stacked
        ]
    else:
        lay: dict = {}
        for k, v in stacked.items():
            nd = _leaf_ndim(v) - 1  # drop stacked layer axis
            lay[k] = specd(_spec_for_layer_key(k, nd), v)
        out["layers"] = lay
    return out


def _layer_rule(key: str, ndim: int) -> P:
    base = _LAYER_RULES.get(key)
    if base is None:
        base = P(*([None] * ndim))
    return base


def param_shardings(params: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    """NamedSharding tree matching the param tree (see param_pspecs)."""
    specs = param_pspecs(params, cfg, mesh)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    """device_put the param tree with TP/PP shardings."""
    shardings = param_shardings(params, cfg, mesh)

    # QArray is a registered pytree node, so the shardings tree (QArray leaves
    # holding NamedShardings) pairs leaf-wise with the param tree.
    def put(a, s):
        if jax.process_count() > 1 and not getattr(
            a, "is_fully_addressable", True
        ):
            # already a global array (shard-local load path): leave in place
            # when the sharding matches; resharding global arrays is a
            # collective all processes perform identically
            if a.sharding == s:
                return a
            return jax.device_put(a, s)
        if jax.process_count() > 1:
            # host-local full copy (every process holds identical values,
            # e.g. same-seed test init): slice out this process's shards
            host = np.asarray(a)
            return jax.make_array_from_callback(
                host.shape, s, lambda idx: host[idx]
            )
        return jax.device_put(a, s)

    return jax.tree.map(put, params, shardings)


def kv_cache_sharding(mesh: Mesh) -> NamedSharding:
    """KV cache [L, B, n_kv, S, hd]: heads over tp, batch over dp.

    Mirrors the reference's per-shard KV-head slice
    (tensor/KvBufferCache.java:105-110).
    """
    return NamedSharding(mesh, P(None, "dp", "tp", None, None))


def shard_kv_cache(cache, mesh: Mesh):
    s = kv_cache_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), cache)
