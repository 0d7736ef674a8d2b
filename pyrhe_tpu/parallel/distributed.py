"""Multi-host bootstrap.

Single-controller JAX spans hosts once `jax.distributed.initialize` has
run on every process; the sharded estimation step itself
(pyrhe_tpu.parallel.sharded.ShardedRunner) is host-count agnostic —
jackknife blocks shard over the global "jack" axis, every process stages
only the .bed byte ranges its own devices own
(ShardedRunner.owned_rows -> jax.make_array_from_process_local_data), and
the totals reduction rides ICI within a slice / DCN across hosts.

Pattern (run the same program on every host — scripts/tpu_pod_run.sh):

    import pyrhe_tpu.parallel.distributed as dist
    dist.initialize()                  # env/metadata-driven on TPU pods
    data = load_dataset(prefix, ...)   # every host reads the small
                                       # tabular files; .bed stays lazy
    eng = Engine(data, spec, cfg)
    eng.run_sharded(dist.global_mesh())

Validated by tests/test_multihost.py: 2 CPU processes under
jax.distributed + gloo reproduce the sequential engine bit-for-bit.
"""
from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh


def initialize(**kwargs) -> None:
    """jax.distributed.initialize passthrough. On TPU pods the
    coordinator/process-id resolve from the TPU metadata; elsewhere set
    COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID or pass kwargs."""
    if kwargs:
        jax.distributed.initialize(**kwargs)
        return
    env = {k: os.environ[v] for k, v in
           (("coordinator_address", "COORDINATOR_ADDRESS"),
            ("num_processes", "NUM_PROCESSES"),
            ("process_id", "PROCESS_ID")) if v in os.environ}
    if "num_processes" in env:
        env["num_processes"] = int(env["num_processes"])
    if "process_id" in env:
        env["process_id"] = int(env["process_id"])
    try:
        jax.distributed.initialize(**env)
    except Exception:
        pass  # single-process / already initialized


def global_mesh(axis: str = "jack") -> Mesh:
    return Mesh(np.array(jax.devices()), (axis,))
