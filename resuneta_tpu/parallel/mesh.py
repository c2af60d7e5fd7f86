"""Device mesh + GSPMD shardings — the replacement for the reference's
tf.distribute.MirroredStrategy / NCCL layer (train_ISPRS.py:347-348, SURVEY.md §2.3).

The framework exposes exactly one parallelism knob: a Mesh with a 'data' axis
(optionally a 'space' axis for spatial sharding of very large inputs). Everything
else — gradient all-reduce, sync-BN batch statistics, sharded patch-grid
inference — falls out of GSPMD partitioning of the single jitted program; no
user-visible collectives, mirroring how MirroredStrategy hid NCCL.
"""

import contextlib

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_trace_scope(mesh):
    """Pallas calls are opaque to GSPMD — under a multi-device mesh they would
    force their operands to gather, so the fused segment kernels
    (ops/pallas/convseg.py) must be off while TRACING a GSPMD-partitioned
    program. Wrap the trace-causing call (the first step/apply invocation) in
    this scope; it is a no-op for single-device meshes.

    This is only the GSPMD ('space'-sharded) path's mechanism, applied
    INTERNALLY by make_train_step/make_eval_step(mesh=...) and
    predict_patches(mesh=...): pure data-parallel meshes instead run the
    computation per-shard under shard_map, where the kernels stay live
    (train/steps.py — do NOT wrap a shard_map'ed step in this scope, it would
    trace the body with the kernels disabled). The label-gen kernels stay on
    either way (they run inside the vmapped per-sample pipeline, whose batch
    sharding XLA keeps outside the kernel)."""
    if mesh is None or np.prod(list(mesh.shape.values())) <= 1:
        return contextlib.nullcontext()
    from ..ops.pallas import convseg
    return convseg.disabled()


def make_mesh(n_devices=None, axis_name="data", devices=None):
    """1-D data-parallel mesh over the first n_devices (default: all)."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def make_mesh_2d(n_data, n_space, devices=None):
    """2-D mesh (data, space) for combined batch + spatial sharding: the 'space'
    axis partitions the image height of every activation, XLA inserting conv halo
    exchanges automatically (the scaling path for 512px+ inputs, SURVEY.md §2.3
    'spatial parallelism')."""
    devs = list(devices if devices is not None else jax.devices())
    assert len(devs) >= n_data * n_space, "not enough devices"
    grid = np.asarray(devs[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(grid, ("data", "space"))


def spatial_batch_sharding(mesh):
    """Images (B, H, W, C): shard batch over 'data' and height over 'space'."""
    return NamedSharding(mesh, P("data", "space"))


def shard_batch_spatial(batch, mesh):
    """Place a raw/packed batch with batch+height sharding. 2-D arrays per sample
    (labels) shard on (data, space) too; 1-D arrays shard on data only."""

    def put(x):
        if x.ndim >= 2:
            return jax.device_put(x, NamedSharding(mesh, P("data", "space")))
        return jax.device_put(x, NamedSharding(mesh, P("data")))

    return jax.tree_util.tree_map(put, batch)


def batch_sharding(mesh, axis_name="data"):
    """Sharding for a batch-leading array: shard dim 0 over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh):
    """Fully-replicated sharding (for params / optimizer state / scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name="data"):
    """Place a (possibly nested) batch onto the mesh, sharded along dim 0.
    The global batch size must be divisible by the mesh axis size.

    Multi-host: when the runtime spans processes (jax.distributed), `batch` is
    this HOST'S shard and the result is the global array assembled across all
    processes (parallel/multihost.py) — the train loop code is identical on one
    host and on a pod."""
    if jax.process_count() > 1:
        from .multihost import assemble_global_batch
        return assemble_global_batch(batch, mesh, axis_name)
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate_state(state, mesh):
    """Replicate a TrainState (or any pytree) across the mesh."""
    sharding = replicate(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x, state
    )
