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
    # BENCH_REMAT=1: apply the SAVE_CONVS rematerialization policy — measured
    # negative at 256px (BENCH_NOTES.md) but halves activation memory, the
    # relevant regime for 512px/large-batch configs
    # mesh: pure-dp meshes run the shard_map step (fused kernels live,
    # explicit collectives); dp x sp meshes run GSPMD (kernel blackout
    # handled inside the returned step) — train/steps.py
    train_step = make_train_step(loss_fns, weights, multitasking=True,
                                 preprocess=pipeline,
                                 remat=os.environ.get("BENCH_REMAT") == "1",
                                 mesh=mesh)

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
            # ---- MFU accounting (VERDICT r3 #2): FLOPs from XLA's cost
            # model, so the JSON is self-judging against hardware capability
            # (v5e bf16 nominal peak 197 TFLOP/s). Counted on a no-Pallas
            # lowering of the SAME step: custom-call kernels are opaque to
            # the cost model (they report zero flops), so the default program
            # undercounts by whatever fraction runs fused.
            try:
                os.environ["RESUNETA_NO_PALLAS"] = "1"
                count_step = make_train_step(loss_fns, weights,
                                             multitasking=True,
                                             preprocess=pipeline,
                                             donate=False)
                lowered = count_step.lower(state, batch)
                try:
                    ca = lowered.cost_analysis()
                except Exception:
                    ca = None
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                if not ca or not ca.get("flops"):
                    ca = lowered.compile().cost_analysis()
                    if isinstance(ca, (list, tuple)):
                        ca = ca[0]
                flops_per_step = float(ca.get("flops", 0.0))
            except Exception as e:
                print(f"# MFU accounting failed: {e!r}", file=sys.stderr)
                flops_per_step = 0.0
            finally:
                os.environ.pop("RESUNETA_NO_PALLAS", None)
            if flops_per_step > 0:
                tf_s = flops_per_step / (dev_ms * 1e9)
                extras["train_flops_per_patch"] = float(f"{flops_per_step / bs:.4g}")
                extras["model_tflops_per_sec"] = round(tf_s, 2)
                extras["pct_v5e_bf16_peak"] = round(100 * tf_s / 197.0, 2)
            # ---- in-situ chip calibration: a large clean bf16 matmul timed
            # in the SAME session gives this environment's effective compute
            # ceiling (the axon-tunneled chip measures far below the 197
            # nominal — BENCH_NOTES.md round-1 hardware note), so the JSON
            # carries a same-day roofline denominator, not just the nominal.
            if flops_per_step > 0 and not os.environ.get("BENCH_NO_CALIB"):
                try:
                    k = 8192
                    a = jnp.ones((k, k), jnp.bfloat16)
                    b = jnp.ones((k, k), jnp.bfloat16)
                    mm = jax.jit(lambda a, b: a @ b)
                    r = mm(a, b)
                    np.asarray(r.ravel()[:1])  # compile+sync (axon fence)
                    reps, last = 8, [r]

                    def run_mms():
                        for _ in range(reps):
                            last[0] = mm(a, b)

                    with tempfile.TemporaryDirectory() as td:
                        mm_ms = capture_device_ms(
                            run_mms, 2, td,
                            sync=lambda: np.asarray(last[0].ravel()[:1]))
                    if mm_ms:
                        eff = 2 * k**3 * reps / (mm_ms * 1e9)
                        extras["chip_matmul_tflops_eff"] = round(eff, 2)
                        extras["pct_of_measured_chip_peak"] = round(
                            100 * tf_s / eff, 2)
                    del a, b, r
                except Exception as e:
                    print(f"# chip calibration failed: {e!r}", file=sys.stderr)

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
        if not os.environ.get("BENCH_NO_PROFILE"):
            import tempfile
            from resuneta_tpu.utils.xprof import capture_device_ms

            def one_step2():
                nonlocal state2, row2
                state2, row2 = step2(state2, batch2)

            with tempfile.TemporaryDirectory() as td:
                dev_ms2 = capture_device_ms(one_step2, 2, td,
                                            sync=lambda: np.asarray(row2))
            if dev_ms2:
                extras["train_512px_device_patches_per_sec"] = round(
                    bs2 / dev_ms2 * 1e3, 2)
        del state2, batch2

    # ---- 1024px long-context row (VERDICT r3 #5): the full multitask step —
    # on-device label gen (row-tiled >=1024px JFA/Canny) + fwd/bwd + update —
    # at 1024px with remat, the regime SURVEY §5's tiling machinery exists for
    if ps == 256 and mesh is None and not os.environ.get("BENCH_NO_1024"):
        ps3, bs3, steps3 = 1024, 2, 3
        try:
            model3 = ResUnetA(num_classes=num_classes, img_size=ps3,
                              multitasking=True, dtype=dtype)
            state3 = create_train_state(model3, jax.random.PRNGKey(0),
                                        (1, ps3, ps3, 3), "adam", 1e-4)
            step3 = make_train_step(loss_fns, weights, multitasking=True,
                                    preprocess=pipeline, remat=True)
            batch3 = {
                "image_u8": jnp.asarray(rng.integers(
                    0, 256, (bs3, ps3, ps3, 3), dtype=np.uint8)),
                "label_ids": jnp.asarray(rng.integers(
                    0, num_classes, (bs3, ps3, ps3)).astype(np.uint8)),
                "aug": jnp.asarray(rng.integers(0, 5, bs3).astype(np.int32)),
            }
            for _ in range(2):
                state3, row3 = step3(state3, batch3)
            np.asarray(row3)
            t0 = time.perf_counter()
            for _ in range(steps3):
                state3, row3 = step3(state3, batch3)
            np.asarray(row3)
            extras["train_1024px_patches_per_sec"] = round(
                bs3 * steps3 / (time.perf_counter() - t0), 2)
            del state3, batch3
        except Exception as e:  # memory wall is a result, not a crash
            # record the MESSAGE, not just the type — four rounds of artifacts
            # couldn't tell a Mosaic lowering bug from an OOM (VERDICT r4)
            extras["train_1024px_patches_per_sec"] = (
                f"failed: {type(e).__name__}: {str(e)[:300]}")

    # ---- Amazon workload rows (VERDICT r3 #4): 14-channel 3-class multitask
    # ResUnet-a (main_tcc/main_mabel config, 128px) — the second headline
    # workload, train patches/s + whole-scene prediction() Mpix/s
    if ps == 256 and mesh is None and not os.environ.get("BENCH_NO_AMAZON"):
        from resuneta_tpu.losses import weighted_categorical_crossentropy
        from resuneta_tpu.data.pipeline import make_label_head_pipeline

        ps4, bs4, steps4, ch4 = 128, 32, 10, 14
        model4 = ResUnetA(num_classes=3, img_size=ps4, multitasking=True,
                          color_head=False, dtype=dtype)
        state4 = create_train_state(model4, jax.random.PRNGKey(0),
                                    (1, ps4, ps4, ch4), "adam", 1e-4)
        wce = weighted_categorical_crossentropy([0.2, 0.8, 0.0])
        step4 = make_train_step({"seg": wce, "bound": wce, "dist": wce},
                                {"seg": 1.0, "bound": 1.0, "dist": 1.0},
                                multitasking=True,
                                preprocess=make_label_head_pipeline())
        onehot = np.eye(3, dtype=np.float32)[
            rng.integers(0, 2, (bs4, ps4, ps4))]
        batch4 = {"image": jnp.asarray(
                      rng.standard_normal((bs4, ps4, ps4, ch4)), jnp.float32),
                  "seg": jnp.asarray(onehot)}
        for _ in range(2):
            state4, row4 = step4(state4, batch4)
        np.asarray(row4)
        t0 = time.perf_counter()
        for _ in range(steps4):
            state4, row4 = step4(state4, batch4)
        np.asarray(row4)
        extras["amazon_train_patches_per_sec"] = round(
            bs4 * steps4 / (time.perf_counter() - t0), 2)
        if not os.environ.get("BENCH_NO_PROFILE"):
            import tempfile
            from resuneta_tpu.utils.xprof import capture_device_ms

            def one_step4():
                nonlocal state4, row4
                state4, row4 = step4(state4, batch4)

            with tempfile.TemporaryDirectory() as td:
                dev_ms4 = capture_device_ms(one_step4, 3, td,
                                            sync=lambda: np.asarray(row4))
            if dev_ms4:
                extras["amazon_train_device_patches_per_sec"] = round(
                    bs4 / dev_ms4 * 1e3, 2)

        # whole-scene prediction() (infer/amazon.py, utils.py:505-546 flow):
        # regime = float32 14ch scene in, full per-patch softmax out + host
        # argmax/reconstruction/area-opening — the reference's own eval path
        import jax as _jax
        from resuneta_tpu.infer.amazon import prediction

        Hs = Ws = 1280  # 100 patches of 128px
        scene = rng.standard_normal((Hs, Ws, ch4)).astype(np.float32)
        ref = rng.integers(0, 2, (Hs, Ws)).astype(np.float32)
        variables4 = {"params": state4.params,
                      "batch_stats": state4.batch_stats}

        @_jax.jit
        def apply4(x):
            return model4.apply(variables4, x, train=False)

        prediction(apply4, scene[:128 * 2, :128 * 2], ref[:256, :256],
                   ref[:256, :256], np.ones((256, 256), np.float32),
                   ps4, area=4)  # compile
        t0 = time.perf_counter()
        prediction(apply4, scene, ref, ref, np.ones((Hs, Ws), np.float32),
                   ps4, area=4)
        extras["amazon_scene_mpix_per_sec"] = round(
            Hs * Ws / (time.perf_counter() - t0) / 1e6, 2)
        # light regime since r5 (VERDICT r4 #5): argmax ids (uint8) + class-1
        # probs (f16) reduced on device; metric-identical to the full download
        # (tests/test_amazon.py light-regime parity)
        extras["amazon_scene_regime"] = ("f32 14ch scene in, uint8 ids + f16 "
                                         "prob1 out (device-reduced), host "
                                         "area-opening (utils.py prediction "
                                         "flow)")
        if not os.environ.get("BENCH_NO_PROFILE"):
            import tempfile
            from resuneta_tpu.utils.xprof import capture_device_ms

            with tempfile.TemporaryDirectory() as td:
                dev_msA = capture_device_ms(
                    lambda: prediction(apply4, scene, ref, ref,
                                       np.ones((Hs, Ws), np.float32),
                                       ps4, area=4),
                    1, td, lambda: None)  # host post-processing self-syncs
            if dev_msA:
                extras["amazon_scene_device_mpix_per_sec"] = round(
                    Hs * Ws / dev_msA / 1e3, 2)
        # ---- same-session tunnel link calibration: the 14-channel f32 scene
        # regime moves 56 MB per Mpix UP (1280^2 x 14 x 4B = 92 MB for 1.64
        # Mpix), so the wall row is upload-bound on this axon link no matter
        # how light the download regime is. Recording the measured host->
        # device / device->host MB/s makes the JSON self-judging: the physical
        # wall ceiling is tunnel_up_mb_per_sec / 56 Mpix/s.
        try:
            cal = np.zeros((4096, 4096), np.float32)  # 64 MiB
            t0 = time.perf_counter()
            xcal = jax.device_put(jnp.asarray(cal))
            np.asarray(xcal.ravel()[:1])  # fence (axon: block_until_ready no-op)
            up_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(xcal)
            down_s = time.perf_counter() - t0
            extras["tunnel_up_mb_per_sec"] = round(64.0 / up_s, 1)
            extras["tunnel_down_mb_per_sec"] = round(64.0 / down_s, 1)
            extras["amazon_scene_upload_mb_per_mpix"] = round(ch4 * 4.0, 1)
            del xcal
        except Exception as e:
            print(f"# tunnel calibration failed: {e!r}", file=sys.stderr)
        del state4, batch4

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
        # transfer regime label (VERDICT r3 #5-weak): these rows are the
        # LIGHT regime — uint8 patches up, argmax'd uint8 class ids down;
        # full-probability-volume regimes are ~16x more transfer
        # (bench_infer.py table, BENCH_NOTES round 1)
        extras["infer_regime"] = "uint8 patches in, uint8 class ids out"
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

        # 512px inference row (VERDICT r3 #8), same light regime
        if ps == 256 and not os.environ.get("BENCH_NO_512"):
            model5 = ResUnetA(num_classes=num_classes, img_size=512,
                              multitasking=True, dtype=dtype)
            import jax as _jax
            vars5 = model5.init(_jax.random.PRNGKey(0),
                                jnp.zeros((1, 512, 512, 3), dtype),
                                train=False)
            ids5 = make_seg_ids_fn(model5, vars5, multitask=True, norm_type=1)
            ip5 = np.random.default_rng(2).integers(
                0, 256, (24, 512, 512, 3), dtype=np.uint8)
            predict_patches(ids5, ip5[:8], batch_size=8)  # compile
            t0 = time.perf_counter()
            predict_patches(ids5, ip5, batch_size=8)
            extras["infer_512px_mpix_per_sec"] = round(
                24 * 512 * 512 / (time.perf_counter() - t0) / 1e6, 2)
            if not os.environ.get("BENCH_NO_PROFILE"):
                import tempfile
                from resuneta_tpu.utils.xprof import capture_device_ms

                with tempfile.TemporaryDirectory() as td:
                    dev5 = capture_device_ms(
                        lambda: predict_patches(ids5, ip5, batch_size=8),
                        1, td, lambda: None)
                if dev5:
                    extras["infer_512px_device_mpix_per_sec"] = round(
                        24 * 512 * 512 / dev5 / 1e3, 2)
            del vars5

    # ---- bf16 trajectory smoke (VERDICT r4 #8): the production bf16 step's
    # 5-step loss series must track the pinned CPU/f32 series — catches
    # bf16-only VJP breaks rounds before a convergence-gate miss would
    if mesh is None and not os.environ.get("BENCH_NO_TRAJ"):
        try:
            from resuneta_tpu.utils import trajectory

            tl = trajectory.run_losses(dtype)
            extras["trajectory_losses"] = [round(l, 5) for l in tl]
            extras["trajectory_ok"] = bool(trajectory.check(tl))
        except Exception as e:
            extras["trajectory_ok"] = (
                f"failed: {type(e).__name__}: {str(e)[:200]}")

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
