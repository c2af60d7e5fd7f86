"""Short-trajectory smoke: the production train step vs a pinned loss series.

The CPU/f32 parity harness (tests/test_train_parity.py) pins the training
TRAJECTORY against the reference graph, but nothing pinned the bf16 TPU step
against that trajectory — a bf16-specific numerics break (e.g. in the custom
VJPs of the fused kernels) would pass every f32 parity test and only surface
as a convergence-gate miss hundreds of steps later (VERDICT r4 weak #7).

This module fixes a tiny deterministic workload (64px multitask, uint8 packed
pipeline, tanimoto, adam) and records its first N_STEPS losses from the
CPU/f32 production step as REFERENCE_LOSSES. bench.py replays the same
workload with the production bf16 step on the real chip and reports
`trajectory_ok` when every step's loss sits within BAND of the pinned series;
tests/test_train.py re-derives the series on CPU/f32 so the pin can never go
stale silently.

Regenerate after an intentional numerics change:
    JAX_PLATFORMS=cpu python -m resuneta_tpu.utils.trajectory
"""

import numpy as np

N_STEPS = 5
PS, BS, NC = 64, 4, 5
LR = 1e-3

# CPU, f32, RESUNETA_NO_PALLAS irrelevant (no TPU): production step losses
# for the fixed workload below (regenerated with the module CLI).
REFERENCE_LOSSES = [1.9445424, 1.8224735, 1.7690991, 1.7192669, 1.6923072]

# |loss/ref - 1| tolerated per step: bf16 compute + fused-kernel reduction
# orders drift a few 1e-3 by step 5; a broken VJP blows past this in 1-2
# steps (measured: sign-flipped dvar -> +35% by step 3).
BAND = 0.05


def make_workload(dtype=None):
    """(state, step_fn, batches): the fixed deterministic workload on the
    current backend. dtype None -> float32."""
    import jax
    import jax.numpy as jnp
    from ..models import ResUnetA
    from ..losses import make_losses
    from ..train import create_train_state, make_train_step
    from ..data import make_device_pipeline

    dtype = dtype or jnp.float32
    model = ResUnetA(num_classes=NC, img_size=PS, multitasking=True,
                     dtype=dtype)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, PS, PS, 3),
                               "adam", LR)
    pipe = make_device_pipeline(NC, norm_type=1, multitasking=True)
    step = make_train_step(make_losses("tanimoto"),
                           {k: 1.0 for k in ("seg", "bound", "dist", "color")},
                           multitasking=True, preprocess=pipe, donate=False)
    rng = np.random.default_rng(1234)
    batches = []
    for _ in range(N_STEPS):
        batches.append({
            "image_u8": jnp.asarray(
                rng.integers(0, 256, (BS, PS, PS, 3), dtype=np.uint8)),
            "label_ids": jnp.asarray(
                rng.integers(0, NC, (BS, PS, PS)).astype(np.uint8)),
            "aug": jnp.asarray(rng.integers(0, 5, BS).astype(np.int32)),
        })
    return state, step, batches


def run_losses(dtype=None):
    """Run the workload on the current backend; returns the N_STEPS losses."""
    state, step, batches = make_workload(dtype)
    losses = []
    for batch in batches:
        state, row = step(state, batch)
        losses.append(float(np.asarray(row)[0]))
    return losses


def check(losses, band=BAND):
    """True when every step's loss is within `band` of the pinned series."""
    return all(abs(l / r - 1.0) <= band
               for l, r in zip(losses, REFERENCE_LOSSES))


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    series = run_losses()
    print("REFERENCE_LOSSES =", [round(l, 7) for l in series])
