"""Multi-host execution scaffolding.

Single-controller JAX spans hosts once `jax.distributed.initialize` has
run on every process; the estimation step itself (parallel/mesh.py) is
host-count agnostic — blocks shard over the global "jack" axis and the
totals psum rides ICI within a slice / DCN across hosts.

Pattern (run the same program on every host):

    import pyrhe_tpu.parallel.distributed as dist
    dist.initialize()                       # env-driven (coordinator etc.)
    mesh = dist.global_mesh()
    data = load_dataset(prefix, ...)        # readers are cheap; every host
                                            # reads the small tabular files
    eng = Engine(data, spec, cfg)
    eng.run_sharded(mesh)                   # host j loads only the .bed
                                            # byte ranges of blocks it owns

Host-local .bed IO: `local_block_indices(mesh, J)` gives the block ids
this process owns; `make_global_blocks(...)` assembles the global stacked
array from process-local shards with
`jax.make_array_from_process_local_data`, so no host ever touches another
host's genotype bytes.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(**kwargs) -> None:
    """jax.distributed.initialize passthrough (env-driven on TPU pods)."""
    if jax.process_count() == 1 and not kwargs:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process / already initialized
    elif kwargs:
        jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "jack") -> Mesh:
    return Mesh(np.array(jax.devices()), (axis,))


def local_block_indices(mesh: Mesh, num_jack: int) -> list[int]:
    """Jackknife block ids owned by this process under a block-sharded
    (J,)-leading layout."""
    devs = list(mesh.devices.flat)
    per_dev = num_jack // len(devs)
    out = []
    for i, d in enumerate(devs):
        if d.process_index == jax.process_index():
            out.extend(range(i * per_dev, (i + 1) * per_dev))
    return out


def make_global_blocks(mesh: Mesh, local_arrays: np.ndarray,
                       global_shape: tuple, axis: str = "jack"):
    """Assemble a (J, ...) global array from this process's local block
    slab (concatenated along axis 0 in local_block_indices order)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(
        sharding, local_arrays, global_shape)
