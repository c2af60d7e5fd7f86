#!/usr/bin/env python
"""One-session A/B: device ms/step for the finish-line levers (VERDICT r4 #6).

Measures, in ONE process on the real chip (so the rows are comparable):

  train 256px bs=16 bf16 (the headline step):
    head          — all defaults at HEAD
    densemm_ups0  — RESUNETA_DENSEMM_UPS=0   (upsample-folding kron matmuls off;
                    commit 30b25dc)
    poolconv_off  — RESUNETA_NO_PALLAS_POOLCONV=1 (fused max-pool->1x1-conv PSP
                    kernel off; ops/pallas/poolconv.py)
    bwd_wide1     — RESUNETA_CONVSEG_BWD_WIDE=1 (C=256 fused TRAIN tier ON;
                    opt-in since the round-5 A/B measured it losing to XLA)

  train 512px bs=8: head vs bwd_wide1

  eval 256px (ids regime, uint8 in/out, full patch grid):
    head vs RESUNETA_CONVSEG_FWD_WIDE=1 (C=256 fused EVAL segments ON; opt-in)

All toggles are read at trace time (convseg.py/densemm.py/poolconv.py), so a
fresh make_train_step per config picks them up. Prints one JSON line per row.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def _with_env(env):
    class _Ctx:
        def __enter__(self):
            self.old = {k: os.environ.get(k) for k in env}
            os.environ.update(env)

        def __exit__(self, *a):
            for k, v in self.old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    return _Ctx()


def train_dev_ms(ps, bs, env):
    import jax
    import jax.numpy as jnp
    from resuneta_tpu.models import ResUnetA
    from resuneta_tpu.losses import make_losses
    from resuneta_tpu.train import create_train_state, make_train_step
    from resuneta_tpu.data import make_device_pipeline
    from resuneta_tpu.utils.xprof import capture_device_ms

    with _with_env(env):
        model = ResUnetA(num_classes=5, img_size=ps, multitasking=True,
                         dtype=jnp.bfloat16)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, ps, ps, 3), "adam", 1e-4)
        pipeline = make_device_pipeline(5, norm_type=1, multitasking=True)
        step = make_train_step(make_losses("tanimoto"),
                               {"seg": 1.0, "bound": 1.0, "dist": 1.0,
                                "color": 1.0},
                               multitasking=True, preprocess=pipeline)
        rng = np.random.default_rng(0)
        batch = {
            "image_u8": jnp.asarray(
                rng.integers(0, 256, (bs, ps, ps, 3), dtype=np.uint8)),
            "label_ids": jnp.asarray(
                rng.integers(0, 5, (bs, ps, ps)).astype(np.uint8)),
            "aug": jnp.asarray(rng.integers(0, 5, bs).astype(np.int32)),
        }
        carry = [state, None]

        def one():
            carry[0], carry[1] = step(carry[0], batch)

        t0 = time.perf_counter()
        one()
        np.asarray(carry[1])
        compile_s = time.perf_counter() - t0
        one()
        np.asarray(carry[1])
        with tempfile.TemporaryDirectory() as td:
            dev_ms = capture_device_ms(one, 3, td,
                                       sync=lambda: np.asarray(carry[1]))
    return dev_ms, compile_s


def eval_dev_ms(ps, bs, n_patches, env):
    import jax
    import jax.numpy as jnp
    from resuneta_tpu.models import ResUnetA
    from resuneta_tpu.infer import predict_patches, make_seg_ids_fn
    from resuneta_tpu.utils.xprof import capture_device_ms

    with _with_env(env):
        model = ResUnetA(num_classes=5, img_size=ps, multitasking=True,
                         dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, ps, ps, 3)), train=False)
        rng = np.random.default_rng(0)
        patches = rng.integers(0, 256, (n_patches, ps, ps, 3), dtype=np.uint8)
        ids_fn = make_seg_ids_fn(model, variables, multitask=True, norm_type=1)

        def one():
            predict_patches(ids_fn, patches, batch_size=bs)

        one()  # compile
        with tempfile.TemporaryDirectory() as td:
            dev_ms = capture_device_ms(one, 2, td, sync=lambda: None)
    return dev_ms


def main():
    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    train_cfgs = [
        ("head", {}),
        ("densemm_ups0", {"RESUNETA_DENSEMM_UPS": "0"}),
        ("poolconv_off", {"RESUNETA_NO_PALLAS_POOLCONV": "1"}),
        ("bwd_wide1", {"RESUNETA_CONVSEG_BWD_WIDE": "1"}),
    ]
    only = os.environ.get("AB_ONLY")  # comma-list of config names
    for name, env in train_cfgs:
        if only and name not in only.split(","):
            continue
        dev_ms, comp_s = train_dev_ms(256, 16, env)
        emit({"row": f"train256 {name}", "device_ms_per_step":
              round(dev_ms, 2) if dev_ms else None,
              "device_patches_per_sec":
              round(16 / dev_ms * 1e3, 2) if dev_ms else None,
              "compile_s": round(comp_s, 1)})

    if not os.environ.get("AB_NO_512"):
        for name, env in [("head", {}),
                          ("bwd_wide1", {"RESUNETA_CONVSEG_BWD_WIDE": "1"})]:
            if only and name not in only.split(","):
                continue
            dev_ms, comp_s = train_dev_ms(512, 8, env)
            emit({"row": f"train512 {name}", "device_ms_per_step":
                  round(dev_ms, 2) if dev_ms else None,
                  "device_patches_per_sec":
                  round(8 / dev_ms * 1e3, 2) if dev_ms else None,
                  "compile_s": round(comp_s, 1)})

    if not os.environ.get("AB_NO_EVAL"):
        for name, env in [("head", {}),
                          ("fwd_wide1", {"RESUNETA_CONVSEG_FWD_WIDE": "1"})]:
            n, bs, ps = 64, 16, 256
            dev_ms = eval_dev_ms(ps, bs, n, env)
            emit({"row": f"eval256 {name}", "device_ms_per_grid":
                  round(dev_ms, 2) if dev_ms else None,
                  "device_mpix_per_sec":
                  round(n * ps * ps / dev_ms / 1e3, 2) if dev_ms else None})

    out = os.environ.get("AB_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
