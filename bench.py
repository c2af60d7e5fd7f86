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
                                            replicate_state,
                                            sharded_trace_scope)

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
    # BENCH_REMAT=1: apply the SAVE_CONVS rematerialization policy — measured
    # negative at 256px (BENCH_NOTES.md) but halves activation memory, the
    # relevant regime for 512px/large-batch configs
    train_step = make_train_step(loss_fns, weights, multitasking=True,
                                 preprocess=pipeline,
                                 remat=os.environ.get("BENCH_REMAT") == "1")

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

    # warmup / compile (mesh-sharded programs trace without the Pallas
    # segment kernels — they are opaque to GSPMD)
    with sharded_trace_scope(mesh):
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

    # ---- tunnel-independent accounting: device time from a profiler trace
    # (wall-clock through the axon tunnel drifts day to day; device op time is
    # the reproducible number — BENCH_NOTES.md) + the secondary inference metric
    extras = {"train_wall_ms_per_step": round(dt / steps * 1e3, 2)}
    if not os.environ.get("BENCH_NO_PROFILE"):
        import tempfile
        from resuneta_tpu.utils.xprof import capture_device_ms

        def one_step():
            nonlocal state, row
            state, row = train_step(state, batch)

        with tempfile.TemporaryDirectory() as td:
            dev_ms = capture_device_ms(one_step, 3, td,
                                       sync=lambda: np.asarray(row))
        if dev_ms:
            extras["train_device_ms_per_step"] = round(dev_ms, 2)
            extras["train_device_patches_per_sec"] = round(bs / dev_ms * 1e3, 2)

    # ---- secondary 512px row (BASELINE config #5 shape): recorded alongside
    # the 256px headline so every BENCH_r*.json carries both patch sizes
    if ps == 256 and mesh is None and not os.environ.get("BENCH_NO_512"):
        # bs=8 beats bs=4 (17.7 vs 14.8 patches/s) and remat loses at both
        # (15.2/13.x) — the 512px step is compute/layout-bound, not memory-bound
        ps2, bs2, steps2 = 512, 8, 6
        model2 = ResUnetA(num_classes=num_classes, img_size=ps2,
                          multitasking=True, dtype=dtype)
        state2 = create_train_state(model2, jax.random.PRNGKey(0),
                                    (1, ps2, ps2, 3), "adam", 1e-4)
        step2 = make_train_step(loss_fns, weights, multitasking=True,
                                preprocess=pipeline)
        batch2 = {
            "image_u8": jnp.asarray(
                rng.integers(0, 256, (bs2, ps2, ps2, 3), dtype=np.uint8)),
            "label_ids": jnp.asarray(
                rng.integers(0, num_classes, (bs2, ps2, ps2)).astype(np.uint8)),
            "aug": jnp.asarray(rng.integers(0, 5, bs2).astype(np.int32)),
        }
        for _ in range(2):
            state2, row2 = step2(state2, batch2)
        np.asarray(row2)
        t0 = time.perf_counter()
        for _ in range(steps2):
            state2, row2 = step2(state2, batch2)
        np.asarray(row2)
        extras["train_512px_patches_per_sec"] = round(
            bs2 * steps2 / (time.perf_counter() - t0), 2)
        del state2, batch2

    if not os.environ.get("BENCH_NO_INFER") and mesh is None:
        from resuneta_tpu.infer import predict_patches, make_seg_ids_fn

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        ids_fn = make_seg_ids_fn(model, variables, multitask=True, norm_type=1)
        n_inf = int(os.environ.get("BENCH_N_PATCHES", 96))
        ipatches = np.random.default_rng(1).integers(
            0, 256, (n_inf, ps, ps, 3), dtype=np.uint8)
        ibs = 32
        predict_patches(ids_fn, ipatches[:ibs], batch_size=ibs)  # compile
        t0 = time.perf_counter()
        predict_patches(ids_fn, ipatches, batch_size=ibs)
        idt = time.perf_counter() - t0
        extras["infer_mpix_per_sec"] = round(n_inf * ps * ps / idt / 1e6, 2)
        # device-time pixel rate: wall-clock Mpix/s swings with the day's
        # tunnel bandwidth (BENCH_NOTES.md round-2 drift note); the profiler
        # denominator is the reproducible one
        if not os.environ.get("BENCH_NO_PROFILE"):
            import tempfile
            from resuneta_tpu.utils.xprof import capture_device_ms

            with tempfile.TemporaryDirectory() as td:
                dev_ms = capture_device_ms(
                    lambda: predict_patches(ids_fn, ipatches, batch_size=ibs),
                    1, td, lambda: None)  # predict_patches downloads=self-sync
            if dev_ms:
                extras["infer_device_mpix_per_sec"] = round(
                    n_inf * ps * ps / dev_ms / 1e3, 2)

    result = {
        "metric": label,
        "value": round(patches_per_sec, 2),
        "unit": "patches/s",
        "vs_baseline": round(patches_per_sec / REFERENCE_ESTIMATE_PATCHES_PER_SEC, 2),
        "extras": extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
