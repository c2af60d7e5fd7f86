"""Multi-host distribution (SURVEY.md §2.3 DCN path): a 2-process x
4-virtual-CPU-device run of the production multitask train step must execute
(jax.distributed + Gloo collectives) and match a single-process 8-device run of
the identical program bit-closely."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from resuneta_tpu.models import ResUnetA
from resuneta_tpu.losses import make_losses
from resuneta_tpu.train import create_train_state, make_train_step
from resuneta_tpu.data import make_device_pipeline
from resuneta_tpu.parallel import make_mesh, shard_batch
from resuneta_tpu.parallel import multihost

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_row():
    """The same global step on this process's 8 virtual devices."""
    ps, nc = 64, 5
    bs = 8
    mesh = make_mesh(8)
    model = ResUnetA(num_classes=nc, img_size=ps, multitasking=True)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, ps, ps, 3),
                               "adam", 1e-3)
    pipeline = make_device_pipeline(nc, norm_type=1, multitasking=True)
    step = make_train_step(make_losses("tanimoto"),
                           {"seg": 1., "bound": 1., "dist": 1., "color": 1.},
                           multitasking=True, preprocess=pipeline,
                           donate=False)
    rng = np.random.default_rng(0)
    batch = shard_batch({
        "image_u8": rng.integers(0, 256, (bs, ps, ps, 3), dtype=np.uint8),
        "label_ids": rng.integers(0, nc, (bs, ps, ps)).astype(np.uint8),
        "aug": rng.integers(0, 5, bs).astype(np.int32),
    }, mesh)
    _, row = step(state, batch)
    return np.asarray(row)


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    port = _free_port()
    out = str(tmp_path / "row0.npy")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(pid), "2", str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout.decode(errors="replace"))
    for pid, (p, text) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{text[-4000:]}"
    row_mh = np.load(out)

    row_sp = _single_process_row()
    # identical global program + deterministic CPU math -> tight tolerance
    np.testing.assert_allclose(row_mh, row_sp, rtol=2e-4, atol=2e-4)


def test_host_slicing_helpers():
    lo, hi = multihost.host_batch_slice(16, n_hosts=4, host_id=2)
    assert (lo, hi) == (8, 12)
    with pytest.raises(ValueError):
        multihost.host_batch_slice(10, n_hosts=4, host_id=0)
    parts = [multihost.shard_host_indices(103, n_hosts=4, host_id=h, seed=7,
                                          epoch=3) for h in range(4)]
    allidx = np.concatenate(parts)
    assert len(allidx) == 100  # tail dropped
    assert len(np.unique(allidx)) == 100  # no duplicates across hosts
