#!/usr/bin/env python
"""Secondary benchmark: sliding-window whole-scene inference throughput (Mpix/s)
on the multitask ResUnet-a d6 — the BASELINE.json secondary metric. The reference
equivalent predicts with batch_size=1 (test_ISPRS.py:28); here the patch grid is
batched through one jitted forward."""

import json
import os
import time

import numpy as np


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp

    from resuneta_tpu.models import ResUnetA
    from resuneta_tpu.infer import predict_patches, make_seg_ids_fn

    ps = int(os.environ.get("BENCH_PATCH_SIZE", 256))
    bs = int(os.environ.get("BENCH_BATCH_SIZE", 32))
    n_patches = int(os.environ.get("BENCH_N_PATCHES", 128))

    model = ResUnetA(num_classes=5, img_size=ps, multitasking=True,
                     dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, ps, ps, 3)),
                           train=False)

    # whole-scene segmentation path: uint8 in, normalize + argmax on device,
    # uint8 class ids out — minimal traffic in both directions
    ids_fn = make_seg_ids_fn(model, variables, multitask=True, norm_type=1)

    rng = np.random.default_rng(0)
    patches = rng.integers(0, 256, (n_patches, ps, ps, 3), dtype=np.uint8)

    predict_patches(ids_fn, patches[:bs], batch_size=bs)  # compile
    t0 = time.perf_counter()
    ids = predict_patches(ids_fn, patches, batch_size=bs)
    assert ids.dtype == np.uint8
    dt = time.perf_counter() - t0

    # device-time accounting (tunnel-independent denominator, BENCH_NOTES.md)
    extras = {"wall_s": round(dt, 3)}
    if not os.environ.get("BENCH_NO_PROFILE"):
        import tempfile
        from resuneta_tpu.utils.xprof import capture_device_ms

        with tempfile.TemporaryDirectory() as td:
            dev_ms = capture_device_ms(
                lambda: predict_patches(ids_fn, patches, batch_size=bs),
                2, td, sync=lambda: None)
        if dev_ms:
            extras["device_ms_per_pass"] = round(dev_ms, 2)
            extras["device_mpix_per_sec"] = round(
                n_patches * ps * ps / dev_ms / 1e3, 2)

    mpix = n_patches * ps * ps / dt / 1e6
    print(json.dumps({
        "metric": "sliding-window inference Mpix/s (256px multitask)",
        "value": round(mpix, 2),
        "unit": "Mpix/s",
        "vs_baseline": None,
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
