"""Profiler-trace accounting: device-time-per-step from an xplane capture.

Wall-clock through the axon tunnel drifts day to day (BENCH_NOTES.md), so the
benchmarks also record DEVICE time: capture a jax.profiler trace of the measured
program and sum the 'XLA Ops' line durations on the TPU plane. Device op time
excludes host<->device transfer stalls and tunnel latency — it is the
reproducible, hardware-bound denominator.
"""

import glob
import os
from collections import defaultdict


def op_times_ms(trace_dir):
    """Parse the newest xplane in trace_dir: {op_name: total_ms} summed over the
    whole capture on the first TPU device plane. Returns {} when no TPU plane or
    no xplane exists (e.g. CPU runs)."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # pragma: no cover
        return {}
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return {}
    xspace = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xspace.ParseFromString(f.read())
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        total = defaultdict(float)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                total[ev_meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9
        if total:
            return dict(total)
    return {}


def device_ms_per_step(trace_dir, n_steps):
    """Total device op ms divided by the number of steps captured in the trace.
    None when the trace has no TPU op data."""
    total = sum(op_times_ms(trace_dir).values())
    return total / n_steps if total else None


def capture_device_ms(step_thunk, n_steps, trace_dir, sync):
    """Run `step_thunk()` n_steps times under a profiler trace and return device
    ms/step (None on any profiling failure — never break the caller's bench).
    `sync()` must block until the submitted work is done."""
    import jax

    try:
        jax.profiler.start_trace(trace_dir)
        for _ in range(n_steps):
            step_thunk()
        sync()
        jax.profiler.stop_trace()
        return device_ms_per_step(trace_dir, n_steps)
    except Exception:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass
        return None
