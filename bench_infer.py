#!/usr/bin/env python
"""Secondary benchmark: sliding-window whole-scene inference throughput (Mpix/s)
on the multitask ResUnet-a d6 — the BASELINE.json secondary metric. The reference
equivalent predicts with batch_size=1 (test_ISPRS.py:28) and downloads full
probability volumes; here the patch grid is batched through one jitted forward.

Every row is labeled with its TRANSFER REGIME (what crosses the host<->device
boundary), because on this axon-tunneled chip the regime dominates wall numbers
(16x spread, BENCH_NOTES.md round 1):
  * ids:   uint8 patches in, normalize + argmax on device, uint8 class ids out
           (the production whole-scene segmentation path) — the headline.
  * probs: float32 patches in, full multitask probability volumes out
           (seg 5ch + bound 5ch + dist 5ch + color 3ch f32) — the reference's
           own shape (test_ISPRS.py:26-36), kept for like-with-like context.
Device ms (xprof) is regime-independent compute time; wall includes the tunnel.

Env: BENCH_PATCH_SIZE / BENCH_BATCH_SIZE / BENCH_N_PATCHES; BENCH_NO_PROFILE=1
skips xprof; BENCH_NO_PROBS / BENCH_NO_512 skip the secondary rows."""

import json
import os
import time

import numpy as np


def _measure(fn, n_patches, ps, profile):
    """wall + device Mpix/s for one regime; fn() runs the full patch grid."""
    fn()  # compile
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    row = {"wall_s": round(dt, 3),
           "wall_mpix_per_sec": round(n_patches * ps * ps / dt / 1e6, 2)}
    if profile:
        import tempfile
        from resuneta_tpu.utils.xprof import capture_device_ms

        with tempfile.TemporaryDirectory() as td:
            dev_ms = capture_device_ms(fn, 2, td, sync=lambda: None)
        if dev_ms:
            row["device_ms_per_pass"] = round(dev_ms, 2)
            row["device_mpix_per_sec"] = round(
                n_patches * ps * ps / dev_ms / 1e3, 2)
    return row


def _rows_for(ps, bs, n_patches, profile, probs_too):
    import jax
    import jax.numpy as jnp

    from resuneta_tpu.models import ResUnetA
    from resuneta_tpu.infer import predict_patches, make_seg_ids_fn

    model = ResUnetA(num_classes=5, img_size=ps, multitasking=True,
                     dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, ps, ps, 3)),
                           train=False)
    rng = np.random.default_rng(0)
    patches = rng.integers(0, 256, (n_patches, ps, ps, 3), dtype=np.uint8)

    rows = {}
    ids_fn = make_seg_ids_fn(model, variables, multitask=True, norm_type=1)
    rows["regime=ids uint8-in uint8-out"] = _measure(
        lambda: predict_patches(ids_fn, patches, batch_size=bs),
        n_patches, ps, profile)

    if probs_too:
        # the reference's transfer shape: f32 in, all four head volumes out
        fwd = jax.jit(lambda x: model.apply(variables, x, train=False))
        pf32 = patches.astype(np.float32) / 255.0

        def run_probs():
            outs = []
            for i in range(0, n_patches, bs):
                out = fwd(jnp.asarray(pf32[i:i + bs]))
                outs.append([np.asarray(o, np.float32)
                             for o in jax.tree.leaves(out)])
            return outs

        rows["regime=probs f32-in full-multitask-f32-out"] = _measure(
            run_probs, n_patches, ps, profile)
    return rows


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    ps = int(os.environ.get("BENCH_PATCH_SIZE", 256))
    bs = int(os.environ.get("BENCH_BATCH_SIZE", 32))
    n_patches = int(os.environ.get("BENCH_N_PATCHES", 128))
    profile = not os.environ.get("BENCH_NO_PROFILE")

    extras = {}
    rows = _rows_for(ps, bs, n_patches, profile,
                     probs_too=not os.environ.get("BENCH_NO_PROBS"))
    head = rows.pop("regime=ids uint8-in uint8-out")
    extras["regime"] = "ids: uint8 in, on-device norm+argmax, uint8 ids out"
    extras.update(head)
    for name, row in rows.items():
        extras[name] = row

    if ps == 256 and not os.environ.get("BENCH_NO_512"):
        # 512px inference row (test_ISPRS.py tiling shape), headline regime
        extras["512px regime=ids uint8-in uint8-out"] = _rows_for(
            512, max(bs // 4, 4), max(n_patches // 4, 16), profile,
            probs_too=False)["regime=ids uint8-in uint8-out"]

    print(json.dumps({
        "metric": f"sliding-window inference Mpix/s ({ps}px multitask)",
        "value": extras.get("wall_mpix_per_sec"),
        "unit": "Mpix/s",
        "vs_baseline": None,
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
