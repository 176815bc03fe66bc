"""Multi-host (pod-slice) initialization and host-level sharding helpers.

The reference is strictly single-process (SURVEY.md §2.4).  At pod scale the
recipe is: initialize the jax distributed runtime on every host, build ONE
global 1-D "data" mesh over all chips (env batch rides ICI within a host and
DCN across hosts), and create the global env batch with
`jax.make_array_from_process_local_data` so each host only materializes its
local shard.  The training step itself is unchanged —
`parallel.make_sharded_update` works on the global mesh; XLA routes the
gradient all-reduce hierarchically over ICI then DCN.

(This image exposes a single chip; multi-host paths are exercised by the
virtual-device tests and dry runs.)
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> int:
    """jax.distributed.initialize wrapper; returns this process's index.

    With no arguments, relies on the cluster environment (TPU pod metadata)
    like jax.distributed.initialize itself.  Safe to call once per process
    before any jax computation.
    """
    if num_processes is None or num_processes > 1:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        except (ValueError, RuntimeError):
            pass  # single-process fallback
    return jax.process_index()


def global_env_batch(mesh: Mesh, local_leaves, axis_name: str = "data",
                     env_axis: int = 0):
    """Assemble a globally-sharded pytree from per-host local env shards.

    local_leaves: pytree of host-local arrays whose `env_axis` dimension is
    local_num_envs; the result is the global array of
    (num_hosts * local_num_envs) envs, sharded over the mesh without any
    cross-host data movement.  env_axis=0 covers EnvState pytrees and
    actions (env-major); the fused rollout's packed carry keeps envs in the
    trailing LANE axis (ops/pallas_fused.py), so pass env_axis=1 for it.
    """
    spec = P(*([None] * env_axis + [axis_name]))
    sharding = NamedSharding(mesh, spec)

    def assemble(x):
        global_shape = list(x.shape)
        global_shape[env_axis] *= jax.process_count()
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), tuple(global_shape))

    return jax.tree.map(assemble, local_leaves)
