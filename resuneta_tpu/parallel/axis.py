"""Trace-time data-axis context for shard_map'ed train programs.

Under GSPMD (one logical program, compiler-partitioned) batch-global
reductions — BatchNorm statistics, the Tanimoto class-volume weights, loss
means, metric counts — are global automatically. Under `shard_map` the body
sees only its LOCAL batch shard, so those reductions need explicit
collectives to preserve single-device numerics (sync-BN semantics, the
reference's MirroredStrategy contract — train_ISPRS.py:347-348).

Rather than thread an axis name through every op signature, the shard_map'ed
train step (train/steps.py) activates this context while TRACING its body;
the batch-coupled ops (ops/fused_bn.bn_stats*, losses.tanimoto_loss) consult
it and insert a pmean when active. Outside the context (single device, or a
GSPMD-partitioned program) every helper is the identity, so the vast majority
of callers never know it exists.
"""

import contextlib

import jax

_AXIS_STACK = []


@contextlib.contextmanager
def data_axis(name):
    """Activate `name` as the mapped data axis for the enclosed trace."""
    _AXIS_STACK.append(name)
    try:
        yield
    finally:
        _AXIS_STACK.pop()


def current_data_axis():
    """The active mapped data-axis name, or None."""
    return _AXIS_STACK[-1] if _AXIS_STACK else None


def pmean(x):
    """Cross-shard mean of x over the data axis (identity when unmapped)."""
    axis = current_data_axis()
    if axis is None:
        return x
    return jax.tree_util.tree_map(lambda v: jax.lax.pmean(v, axis), x)


def psum(x):
    """Cross-shard sum of x over the data axis (identity when unmapped)."""
    axis = current_data_axis()
    if axis is None:
        return x
    return jax.tree_util.tree_map(lambda v: jax.lax.psum(v, axis), x)
