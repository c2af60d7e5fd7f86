"""Checkpoint/resume — best-model policy + resume-with-lr-override, the orbax
equivalent of the reference's best_model.h5 save (train_ISPRS.py:291-292) and
compiled load_model + K.set_value(lr) resume (train_ISPRS.py:471-480).

A checkpoint carries params, batch_stats, opt_state (incl. injected lr), step and
host metadata (epoch, min_val_loss) so training resumes exactly where it stopped.
"""

import json
import os

import jax
import orbax.checkpoint as ocp


def _abs(path):
    return os.path.abspath(path)


def save_best(ckpt_dir, state, epoch: int, min_loss: float):
    """Overwrite the single best checkpoint (save_best_only semantics)."""
    ckpt_dir = _abs(ckpt_dir)
    os.makedirs(os.path.dirname(ckpt_dir) or ".", exist_ok=True)
    with ocp.StandardCheckpointer() as saver:
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        saver.save(ckpt_dir, payload, force=True)
    with open(ckpt_dir + ".meta.json", "w") as f:
        json.dump({"epoch": epoch, "min_val_loss": float(min_loss)}, f)


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
