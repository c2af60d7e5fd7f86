#!/usr/bin/env python
"""Headline benchmark: multitask ResUnet-a d6 training throughput at 256px,
patches/sec/chip, measured on the real device (BASELINE.json primary metric).

The measured step is the FULL production train step: uint8 packed batch ->
on-device augmentation + boundary/distance/HSV label generation -> forward/backward
-> optimizer update, all one jitted XLA program (the reference's equivalent step is
np.load of 5 float32 tensors + Keras train_on_batch, train_ISPRS.py:115-148).

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6;
BASELINE.json "published" is empty). We anchor against 15 patches/s for the
TF-Keras reference at batch 4 on a single modern GPU. That number is grounded in
measurement (see BENCH_NOTES.md "Measured reference baseline"): the reference's
own graph runs at a measured 0.128 patches/s on this machine's CPU
(tools/measure_tf_baseline.py), and XLA cost analysis puts the step at 2.37e11
FLOP/patch, so 15 patches/s corresponds to the reference sustaining 3.6 TFLOP/s
(~23% of V100 f32 peak) — a generous single-GPU equivalent. The BASELINE.json
north star asks for >= 5x that.
"""

import json
import os
import time

import numpy as np

REFERENCE_ESTIMATE_PATCHES_PER_SEC = 15.0


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    # BENCH_MESH: "dp=8" or "dp=4,sp=2" — shard the measured step over a device
    # mesh (batch over 'data', activation height over 'space'). On the
    # single-real-chip environment this is exercised with BENCH_FORCE_CPU=8
    # (virtual host devices); on real multi-chip hardware it measures scaling.
    mesh_spec = os.environ.get("BENCH_MESH")
    force_cpu = os.environ.get("BENCH_FORCE_CPU")
    if force_cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={force_cpu}")
    import jax
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from resuneta_tpu.models import ResUnetA
    from resuneta_tpu.losses import make_losses
    from resuneta_tpu.train import create_train_state, make_train_step
    from resuneta_tpu.data import make_device_pipeline
    from resuneta_tpu.parallel.mesh import (make_mesh, make_mesh_2d,
                                            shard_batch, shard_batch_spatial,
                                            replicate_state)

    ps = int(os.environ.get("BENCH_PATCH_SIZE", 256))
    bs = int(os.environ.get("BENCH_BATCH_SIZE", 16))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16" \
        else jnp.float32
    num_classes = 5

    import sys

    mesh = None
    if mesh_spec:
        parts = dict(kv.split("=") for kv in mesh_spec.split(","))
        dp = int(parts.get("dp", 1))
        sp = int(parts.get("sp", 1))
        mesh = make_mesh_2d(dp, sp) if sp > 1 else make_mesh(dp)
        bs = max(bs // dp, 1) * dp  # keep the global batch divisible

    dev = jax.devices()[0]
    print(f"# device: {dev} x{jax.device_count()}, ps={ps}, bs={bs}, "
          f"dtype={dtype.__name__}, mesh={mesh_spec}", file=sys.stderr)

    model = ResUnetA(num_classes=num_classes, img_size=ps, multitasking=True,
                     dtype=dtype)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, ps, ps, 3),
                               "adam", 1e-4)
    pipeline = make_device_pipeline(num_classes, norm_type=1, multitasking=True)
    loss_fns = make_losses("tanimoto")
    weights = {"seg": 1.0, "bound": 1.0, "dist": 1.0, "color": 1.0}
    train_step = make_train_step(loss_fns, weights, multitasking=True,
                                 preprocess=pipeline)

    rng = np.random.default_rng(0)
    batch = {
        "image_u8": jnp.asarray(
            rng.integers(0, 256, (bs, ps, ps, 3), dtype=np.uint8)),
        "label_ids": jnp.asarray(
            rng.integers(0, num_classes, (bs, ps, ps)).astype(np.uint8)),
        "aug": jnp.asarray(rng.integers(0, 5, bs).astype(np.int32)),
    }
    if mesh is not None:
        state = replicate_state(state, mesh)
        batch = (shard_batch_spatial(batch, mesh) if "space" in mesh.axis_names
                 else shard_batch(batch, mesh))

    # warmup / compile
    for _ in range(3):
        state, row = train_step(state, batch)
    np.asarray(row)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, row = train_step(state, batch)
    np.asarray(row)  # block
    dt = time.perf_counter() - t0

    patches_per_sec = bs * steps / dt
    label = f"train patches/sec/chip ({ps}px multitask)"
    if mesh is not None:
        label = f"train patches/sec ({ps}px multitask, mesh {mesh_spec})"
    result = {
        "metric": label,
        "value": round(patches_per_sec, 2),
        "unit": "patches/s",
        "vs_baseline": round(patches_per_sec / REFERENCE_ESTIMATE_PATCHES_PER_SEC, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
