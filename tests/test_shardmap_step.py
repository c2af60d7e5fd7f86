"""shard_map data-parallel train/eval steps vs the single-device program
(VERDICT r4 #2): pure-dp meshes run the step body per-shard with the fused
kernels live and EXPLICIT collectives — pmean'd BatchNorm statistics
(sync-BN), pmean'd Tanimoto class volumes, pmean'd gradients, psum'd metric
counts. Numerics must match the single-device step.

On CPU the Pallas kernels are off in both programs, so this pins the
collective/metric plumbing; kernel numerics are covered by the kernel parity
tests, and on TPU the shard_map body traces WITH the kernels (the GSPMD path
had to trace without them — parallel/mesh.py sharded_trace_scope)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from resuneta_tpu.models import ResUnetA
from resuneta_tpu.losses import make_losses
from resuneta_tpu.train import create_train_state, make_train_step, make_eval_step
from resuneta_tpu.data import make_device_pipeline
from resuneta_tpu.parallel import make_mesh
from resuneta_tpu.parallel.mesh import shard_batch, replicate_state

PS, BS, NC = 64, 8, 5


def _setup():
    model = ResUnetA(num_classes=NC, img_size=PS, multitasking=True,
                     dtype=jnp.float32)
    # SGD, deliberately: its update is LINEAR in the gradient, so the final
    # param-drift assert below directly bounds the cross-program gradient
    # mismatch. (Adam's step-1 update is +-lr*sign-ish — a near-zero gradient
    # whose f32 reduction noise flips sign between the two programs moves a
    # param by 2*lr, turning the assert into a coin flip.)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, PS, PS, 3),
                               "sgd", 1e-3)
    pipe = make_device_pipeline(NC, norm_type=1, multitasking=True)
    losses = make_losses("tanimoto")  # the batch-coupled loss (Vli pmean)
    weights = {k: 1.0 for k in ("seg", "bound", "dist", "color")}
    rng = np.random.default_rng(0)
    batch = {
        "image_u8": jnp.asarray(
            rng.integers(0, 256, (BS, PS, PS, 3), dtype=np.uint8)),
        "label_ids": jnp.asarray(
            rng.integers(0, NC, (BS, PS, PS)).astype(np.uint8)),
        "aug": jnp.asarray(rng.integers(0, 5, BS).astype(np.int32)),
    }
    return state, pipe, losses, weights, batch


def _assert_rows_close(rowN, row1):
    """Loss entries are collective-reduced means (tight); accuracy and the
    confusion counts derive from per-pixel argmax, where different f32
    reduction orders legitimately flip near-tie pixels (loose absolute)."""
    np.testing.assert_allclose(rowN[:5], row1[:5], rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(rowN[5], row1[5], atol=5e-3)      # accuracy
    np.testing.assert_allclose(rowN[6:], row1[6:], atol=64)      # tp/fp/tn/fn


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
class TestShardMapStep:
    def test_train_step_matches_single_device(self):
        state, pipe, losses, weights, batch = _setup()
        step1 = make_train_step(losses, weights, True, preprocess=pipe,
                                donate=False)
        s1, row1 = step1(state, batch)
        s1, row1 = step1(s1, batch)
        row1 = np.asarray(row1)

        mesh = make_mesh(8)
        stepN = make_train_step(losses, weights, True, preprocess=pipe,
                                donate=False, mesh=mesh)
        sN = replicate_state(state, mesh)
        bN = shard_batch(batch, mesh)
        sN, rowN = stepN(sN, bN)
        sN, rowN = stepN(sN, bN)
        rowN = np.asarray(rowN)

        _assert_rows_close(rowN, row1)
        # parameters and BN running statistics after 2 steps: pmean'd grads +
        # sync-BN must track the global-batch program to f32 reduction noise
        for name, t1, tN in (("params", s1.params, sN.params),
                             ("batch_stats", s1.batch_stats, sN.batch_stats)):
            diffs = jax.tree_util.tree_map(
                lambda a, b: float(np.max(np.abs(np.asarray(a) -
                                                 np.asarray(b)))), t1, tN)
            mx = max(jax.tree_util.tree_leaves(diffs))
            assert mx < 1e-4, (name, mx)

    def test_eval_step_matches_single_device(self):
        state, pipe, losses, weights, batch = _setup()
        ev1 = make_eval_step(losses, weights, True, preprocess=pipe)
        row1 = np.asarray(ev1(state, batch))

        mesh = make_mesh(8)
        evN = make_eval_step(losses, weights, True, preprocess=pipe, mesh=mesh)
        rowN = np.asarray(evN(replicate_state(state, mesh),
                              shard_batch(batch, mesh)))
        _assert_rows_close(rowN, row1)

    def test_gspmd_space_mesh_still_served(self):
        """'space'-bearing meshes keep the GSPMD strategy: the returned step
        wraps its trace in the Pallas blackout internally and still matches
        single-device numerics (the dp x sp path of test_spatial_sharding)."""
        from resuneta_tpu.parallel import make_mesh_2d
        from resuneta_tpu.parallel.mesh import shard_batch_spatial

        state, pipe, losses, weights, batch = _setup()
        step1 = make_train_step(losses, weights, True, preprocess=pipe,
                                donate=False)
        _, row1 = step1(state, batch)

        mesh = make_mesh_2d(4, 2)
        stepN = make_train_step(losses, weights, True, preprocess=pipe,
                                donate=False, mesh=mesh)
        _, rowN = stepN(replicate_state(state, mesh),
                        shard_batch_spatial(batch, mesh))
        _assert_rows_close(np.asarray(rowN), np.asarray(row1))
