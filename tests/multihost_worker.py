"""Worker process for tests/test_multihost.py — NOT a test module.

Runs one production multitask train step as one rank of a 2-process x
4-virtual-CPU-device global runtime (jax.distributed + Gloo): global mesh over
all 8 devices, per-host batch shard assembled into the global batch, GSPMD
step. Rank 0 writes the metrics row to the path given in argv so the test can
compare against a single-process 8-device run of the identical program.

Usage: python multihost_worker.py <pid> <nproc> <port> <out_path>
"""

import os
import sys

# Run green without `pip install -e .`: the worker is launched as a bare
# subprocess from tests/test_multihost.py, so it inherits no conftest sys.path
# bootstrap — insert the repo root (parent of tests/) ourselves.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    # concurrency_optimized_scheduler=false: XLA:CPU's concurrent thunk
    # executor runs INDEPENDENT collectives in nondeterministic order across
    # device threads; on a many-collective program (this full multitask train
    # step) two cliques can interleave their Gloo context creation across
    # ranks and deadlock on the hardcoded 30 s kv-store timeout. A serialized
    # schedule makes the collective order deterministic and identical on every
    # rank. CPU-test-only — the real TPU path uses ICI collectives, not Gloo.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
        + " --xla_cpu_enable_concurrency_optimized_scheduler=false"
        # virtual devices sharing few physical cores skew past XLA:CPU's
        # default 40 s collective-rendezvous abort (see conftest.py)
        + " --xla_cpu_collective_timeout_seconds=3600")
    os.environ["JAX_PLATFORMS"] = "cpu"
    from resuneta_tpu.utils.cpucache import cpu_cache_dir
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cpu_cache_dir())

    import jax
    jax.config.update("jax_platforms", "cpu")

    from resuneta_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", num_processes=nproc,
                         process_id=pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    import numpy as np
    import jax.numpy as jnp  # noqa: F401  (keeps platform pinned before use)

    from resuneta_tpu.models import ResUnetA
    from resuneta_tpu.losses import make_losses
    from resuneta_tpu.train import create_train_state, make_train_step
    from resuneta_tpu.data import make_device_pipeline
    from resuneta_tpu.parallel import make_mesh, shard_batch

    ps, nc = 64, 5
    global_bs = jax.device_count()
    mesh = make_mesh()  # all GLOBAL devices on the data axis

    model = ResUnetA(num_classes=nc, img_size=ps, multitasking=True)
    # same seed on every process -> identical replicated params
    state = create_train_state(model, jax.random.PRNGKey(0), (1, ps, ps, 3),
                               "adam", 1e-3)
    pipeline = make_device_pipeline(nc, norm_type=1, multitasking=True)
    step = make_train_step(make_losses("tanimoto"),
                           {"seg": 1., "bound": 1., "dist": 1., "color": 1.},
                           multitasking=True, preprocess=pipeline,
                           donate=False)

    # deterministic GLOBAL batch; each host slices out only its own samples
    rng = np.random.default_rng(0)
    full = {
        "image_u8": rng.integers(0, 256, (global_bs, ps, ps, 3),
                                 dtype=np.uint8),
        "label_ids": rng.integers(0, nc, (global_bs, ps, ps)).astype(np.uint8),
        "aug": rng.integers(0, 5, global_bs).astype(np.int32),
    }
    lo, hi = multihost.host_batch_slice(global_bs)
    local = {k: v[lo:hi] for k, v in full.items()}
    batch = shard_batch(local, mesh)  # multihost-aware: assembles global arrays
    assert batch["image_u8"].shape[0] == global_bs

    # compile locally first, then rendezvous: cold CPU compiles take minutes
    # and differ across ranks, far beyond Gloo's 30 s rendezvous window
    compiled = step.lower(state, batch).compile()
    multihost.barrier("step_compiled", timeout_s=1500)
    state, row = compiled(state, batch)
    row = np.asarray(jax.device_get(row))
    assert np.all(np.isfinite(row)), row

    # host-sharded epoch indices: union over hosts == one epoch, no dups
    idx = multihost.shard_host_indices(10, seed=1, epoch=0)
    assert len(idx) == 10 // nproc

    if multihost.is_coordinator():
        np.save(out_path, row)
    print(f"rank {pid} OK: {row}", flush=True)


if __name__ == "__main__":
    main()
