"""Checkpoint/resume — best-model policy + resume-with-lr-override, the orbax
equivalent of the reference's best_model.h5 save (train_ISPRS.py:291-292) and
compiled load_model + K.set_value(lr) resume (train_ISPRS.py:471-480).

A checkpoint carries params, batch_stats, opt_state (incl. injected lr), step and
host metadata (epoch, min_val_loss) so training resumes exactly where it stopped.

Beyond the reference's blocking best-only .h5 save, `AsyncSaver` writes
checkpoints asynchronously (training continues while orbax serializes to disk
in the background) and optionally keeps the last N epoch checkpoints alongside
the best one — production-training conveniences the Keras callback lacked.
"""

import json
import os

import jax
import orbax.checkpoint as ocp


def _abs(path):
    return os.path.abspath(path)


def _payload(state):
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }


def save_best(ckpt_dir, state, epoch: int, min_loss: float):
    """Overwrite the single best checkpoint (save_best_only semantics)."""
    ckpt_dir = _abs(ckpt_dir)
    os.makedirs(os.path.dirname(ckpt_dir) or ".", exist_ok=True)
    with ocp.StandardCheckpointer() as saver:
        saver.save(ckpt_dir, _payload(state), force=True)
    with open(ckpt_dir + ".meta.json", "w") as f:
        json.dump({"epoch": epoch, "min_val_loss": float(min_loss)}, f)


class AsyncSaver:
    """Non-blocking checkpointing with best-model + keep-last-N policies.

    save_best(...) mirrors save_best() above but returns immediately — the
    device arrays are snapshotted and serialized by orbax's background thread.
    save_epoch(...) writes `<dir>/epoch_<n>` and prunes to the newest
    `keep_last` epochs. Call close() (or use as a context manager) to drain
    pending writes; restore() works on any of the produced directories.
    """

    def __init__(self, keep_last: int = 0):
        self._saver = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self.keep_last = keep_last
        self._pending_meta = None

    def _flush_meta(self):
        """Write the meta.json of the last best-save. Only called after
        wait_until_finished(), so metadata never points at an uncommitted
        checkpoint (a crash mid-commit leaves the OLD meta/ckpt pair or none,
        never meta-without-checkpoint)."""
        if self._pending_meta is not None:
            path, meta = self._pending_meta
            self._pending_meta = None
            with open(path, "w") as f:
                json.dump(meta, f)

    def save_best(self, ckpt_dir, state, epoch: int, min_loss: float):
        ckpt_dir = _abs(ckpt_dir)
        os.makedirs(os.path.dirname(ckpt_dir) or ".", exist_ok=True)
        self.wait()  # drain any in-flight save of the same directory
        self._saver.save(ckpt_dir, args=ocp.args.StandardSave(_payload(state)),
                         force=True)
        self._pending_meta = (ckpt_dir + ".meta.json",
                              {"epoch": epoch, "min_val_loss": float(min_loss)})

    def save_epoch(self, root_dir, state, epoch: int):
        root_dir = _abs(root_dir)
        os.makedirs(root_dir, exist_ok=True)
        path = os.path.join(root_dir, f"epoch_{epoch}")
        self._saver.save(path, args=ocp.args.StandardSave(_payload(state)),
                         force=True)
        if self.keep_last:
            self.wait()  # prune only completed checkpoints
            eps = sorted(
                (int(d.split("_")[1]), d) for d in os.listdir(root_dir)
                if d.startswith("epoch_") and d.split("_")[1].isdigit())
            for _, d in eps[:-self.keep_last]:
                import shutil
                shutil.rmtree(os.path.join(root_dir, d), ignore_errors=True)

    def wait(self):
        self._saver.wait_until_finished()
        self._flush_meta()

    def close(self):
        self.wait()
        self._saver.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def restore_variables(ckpt_dir):
    """Restore just the model variables ({'params', 'batch_stats'}) from a
    checkpoint — no optimizer-state skeleton needed. For eval/export tooling
    (tools/export_keras.py) that consumes training checkpoints without
    rebuilding the TrainState."""
    ckpt_dir = _abs(ckpt_dir)
    with ocp.StandardCheckpointer() as saver:
        restored = saver.restore(ckpt_dir)
    return {"params": restored["params"],
            "batch_stats": restored["batch_stats"]}


def restore(ckpt_dir, state, learning_rate_override=None):
    """Restore into an existing (freshly-initialized) state skeleton; optionally
    override the learning rate like the reference does on resume."""
    ckpt_dir = _abs(ckpt_dir)
    skeleton = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, skeleton)
    with ocp.StandardCheckpointer() as saver:
        restored = saver.restore(ckpt_dir, abstract)
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    if learning_rate_override is not None:
        state = state.override_learning_rate(learning_rate_override)
    meta = {}
    meta_path = ckpt_dir + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
