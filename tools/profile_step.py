#!/usr/bin/env python
"""Capture a profiler trace of the production train step (bench.py's exact
program) and print a per-op-category time breakdown parsed from the xplane.

Run: python tools/profile_step.py [outdir]
"""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def capture(outdir):
    import jax
    import jax.numpy as jnp
    from resuneta_tpu.models import ResUnetA
    from resuneta_tpu.losses import make_losses
    from resuneta_tpu.train import create_train_state, make_train_step
    from resuneta_tpu.data import make_device_pipeline

    ps = int(os.environ.get("BENCH_PATCH_SIZE", 256))
    bs = int(os.environ.get("BENCH_BATCH_SIZE", 16))
    num_classes = 5
    model = ResUnetA(num_classes=num_classes, img_size=ps, multitasking=True,
                     dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, ps, ps, 3),
                               "adam", 1e-4)
    pipeline = make_device_pipeline(num_classes, norm_type=1, multitasking=True)
    loss_fns = make_losses("tanimoto")
    weights = {"seg": 1.0, "bound": 1.0, "dist": 1.0, "color": 1.0}
    # BENCH_REMAT=1: match bench.py's 1024px row (SAVE_CONVS remat — the
    # unrematerialized 1024px step does not fit HBM)
    train_step = make_train_step(loss_fns, weights, multitasking=True,
                                 preprocess=pipeline,
                                 remat=os.environ.get("BENCH_REMAT") == "1")
    rng = np.random.default_rng(0)
    batch = {
        "image_u8": jnp.asarray(rng.integers(0, 256, (bs, ps, ps, 3), dtype=np.uint8)),
        "label_ids": jnp.asarray(rng.integers(0, num_classes, (bs, ps, ps)).astype(np.uint8)),
        "aug": jnp.asarray(rng.integers(0, 5, bs).astype(np.int32)),
    }
    for _ in range(3):
        state, row = train_step(state, batch)
    np.asarray(row)

    jax.profiler.start_trace(outdir)
    for _ in range(5):
        state, row = train_step(state, batch)
    np.asarray(row)
    jax.profiler.stop_trace()
    t0 = time.perf_counter()
    for _ in range(10):
        state, row = train_step(state, batch)
    np.asarray(row)
    print(f"# step time (untraced): {(time.perf_counter()-t0)/10*1e3:.1f} ms",
          file=sys.stderr)


def analyze(outdir):
    """Parse the xplane protobuf: sum device-side op durations by category."""
    import glob
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane found", file=sys.stderr)
        return
    path = max(paths, key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        total = defaultdict(float)
        count = defaultdict(int)
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name:
                # device op lines are usually named 'XLA Ops' / 'XLA Modules'
                pass
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur_ms = ev.duration_ps / 1e9
                total[name] += dur_ms
                count[name] += 1
        if not total:
            continue
        print(f"== plane: {plane.name}, distinct ops: {len(total)}")
        items = sorted(total.items(), key=lambda kv: -kv[1])
        grand = sum(total.values())
        print(f"total device op time: {grand:.1f} ms (5 steps) -> {grand/5:.1f} ms/step")

        # ---- category rollup: where does the step actually go? 'relayout'
        # sums the pure data-movement ops (copies/transposes/bare reshapes/
        # converts) — the tax the dense-layout work exists to kill.
        def category(name):
            op = name.split(" = ")[0].lstrip("%")
            base = op.rstrip("0123456789.").split(".")[0]
            if base in ("copy", "transpose", "reshape", "convert", "bitcast",
                        "copy-done", "copy-start") or "relayout" in base:
                return "relayout/copy"
            if "pallas" in base or "custom-call" in name:
                return f"pallas:{base.split('_pallas')[0][:24]}"
            if "convolution" in base:
                return "convolution fusions"
            if base.startswith(("fusion", "loop_fusion", "input_fusion")):
                return "elementwise/reduce fusions"
            if base.startswith(("reduce", "all-reduce")):
                return "reduces"
            if base.startswith("dot"):
                return "dots"
            return f"other:{base[:24]}"

        cats = defaultdict(float)
        for name, ms in total.items():
            cats[category(name)] += ms
        print("-- category rollup (ms/step, % of step):")
        for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"  {ms/5:8.2f}  {100*ms/grand:5.1f}%  {cat}")

        for name, ms in items[:45]:
            print(f"  {ms/5:7.2f} ms/step x{count[name]//5:<4d} {name[:110]}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_step"
    if not os.environ.get("ANALYZE_ONLY"):
        capture(outdir)
    analyze(outdir)
