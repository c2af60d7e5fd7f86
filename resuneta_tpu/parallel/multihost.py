"""Multi-host (multi-process) distribution — the DCN path of SURVEY.md §2.3.

The reference is single-host (train_ISPRS.py:347 MirroredStrategy over local
GPUs); this module is the TPU-pod extension: each host process drives its local
chips, `jax.distributed` wires the processes into one global runtime, and the
SAME single jitted train step runs over a global mesh — GSPMD inserts ICI
collectives inside a slice and DCN collectives across slices. The only
host-visible differences from single-host training:

  * call `initialize()` once per process before touching devices;
  * each host loads ONLY its shard of every global batch (`host_batch_slice`),
    and `assemble_global_batch` stitches the host-local shards into one global
    jax.Array (no host ever materializes the full batch);
  * checkpointing/logging is gated on `process_index() == 0`.

Exercised by tests/test_multihost.py with 2 processes x 4 virtual CPU devices
(Gloo collectives), asserting numerical parity with a single-process 8-device
run of the identical step.
"""

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               **kwargs):
    """jax.distributed.initialize wrapper. On TPU pods all arguments are
    auto-detected from the environment; on CPU/GPU fleets pass them explicitly
    (coordinator 'host:port', total process count, this process's rank)."""
    jax.distributed.initialize(coordinator_address, num_processes, process_id,
                               **kwargs)


def process_count():
    return jax.process_count()


def process_index():
    return jax.process_index()


def is_coordinator():
    """True on the process that should checkpoint/log (rank 0)."""
    return jax.process_index() == 0


def barrier(name, timeout_s=600):
    """Block until every process reaches this barrier (coordination-service
    KV store, NOT a device collective). Use after per-process compilation and
    before the first collective dispatch: compile times differ across hosts
    and the collective transport's rendezvous window (Gloo: 30 s on CPU) is
    far shorter than a cold XLA compile."""
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(name,
                                                    int(timeout_s * 1000))


def host_batch_slice(global_batch_size, n_hosts=None, host_id=None):
    """The [start, stop) sample range of this host's shard of a global batch.
    Global batch size must divide evenly over hosts (static shapes under jit)."""
    n_hosts = jax.process_count() if n_hosts is None else n_hosts
    host_id = jax.process_index() if host_id is None else host_id
    if global_batch_size % n_hosts:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {n_hosts} hosts")
    per = global_batch_size // n_hosts
    return host_id * per, (host_id + 1) * per


def shard_host_indices(n_samples, n_hosts=None, host_id=None, seed=0,
                       epoch=0):
    """Per-host dataset sharding: every host derives the SAME global permutation
    (seeded by (seed, epoch)) and takes its contiguous slice, so the union over
    hosts is exactly one epoch with no duplicates. Drops the tail remainder so
    all hosts contribute equal counts (static global batch)."""
    n_hosts = jax.process_count() if n_hosts is None else n_hosts
    host_id = jax.process_index() if host_id is None else host_id
    perm = np.random.default_rng((seed, epoch)).permutation(n_samples)
    per = n_samples // n_hosts
    return perm[host_id * per:(host_id + 1) * per]


def assemble_global_batch(local_batch, mesh, axis_name="data"):
    """Stitch host-local batch shards into global jax.Arrays sharded over the
    mesh's data axis. Each process passes only its own samples; the returned
    arrays have the GLOBAL batch dimension (= sum over processes) and each
    device holds exactly its shard — no cross-host data movement."""
    def put(x):
        x = np.asarray(x)
        spec = (P(axis_name) if x.ndim >= 1 else P())
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return jax.tree_util.tree_map(put, local_batch)
