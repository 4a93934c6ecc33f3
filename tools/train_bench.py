#!/usr/bin/env python
"""Training-step throughput on the real TPU (FCN-8 and DAE workloads).

Prints one JSON line per workload: images/sec/chip for the full jitted train
step (forward + backward + adam), CamVid shapes. Relay-safe timing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--crop", type=int, default=224)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--remat", action="store_true")
    args = p.parse_args()

    import dataclasses

    from iterative_inference_segm_tpu.data.config_datasets import CAMVID
    from iterative_inference_segm_tpu.models import init_fcn8
    from iterative_inference_segm_tpu.train.loop import TrainConfig, make_optimizer
    from iterative_inference_segm_tpu.train.train_fcn8 import make_fcn8_train_step
    from iterative_inference_segm_tpu.train.train_dae import make_dae_train_step

    cfg = dataclasses.replace(CAMVID, train_crop=(args.crop, args.crop))
    tcfg = TrainConfig(
        learning_rate=1e-3,
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        remat=args.remat,
    )
    tx = make_optimizer(tcfg)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((args.batch, args.height, args.width, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, cfg.n_classes, (args.batch, args.height, args.width)).astype(np.int32))

    def timed(step_fn, state, extra_args, label):
        params, opt_state = state
        # compile
        out = step_fn(params, opt_state, *extra_args, jax.random.PRNGKey(0))
        jax.device_get(out[2])
        t0 = time.perf_counter()
        acc = None
        p_, o_ = params, opt_state
        for i in range(args.iters):
            p_, o_, loss = step_fn(p_, o_, *extra_args, jax.random.fold_in(jax.random.PRNGKey(1), i))
            acc = loss if acc is None else acc + loss
        jax.device_get(acc)
        per = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "metric": f"train images/sec/chip ({label}, crop {args.crop}, {args.dtype}, batch={args.batch})",
            "value": round(args.batch / per, 2),
            "unit": "images/sec/chip",
        }), flush=True)

    fcn_params = init_fcn8(jax.random.PRNGKey(0), n_classes=cfg.n_classes)
    fcn_step, _ = make_fcn8_train_step(cfg, tcfg, tx)
    timed(
        lambda p, o, im, lb, r: fcn_step(p, o, im, lb, r),
        (fcn_params, tx.init(fcn_params)),
        (images, labels),
        "FCN-8",
    )

    from iterative_inference_segm_tpu.models.dae import init_dae, DAE_H_CHANNELS

    dae_params = init_dae(
        jax.random.PRNGKey(1), n_classes=cfg.n_classes,
        h_specs={"pool4": DAE_H_CHANNELS["pool4"]}, depth=3, stem_pool=1,
    )
    dae_step, _ = make_dae_train_step(
        cfg, tcfg, tx, h_taps=("pool4",), sigma=1.0, from_gt=True, dae_depth=3
    )
    timed(
        lambda p, o, f, im, lb, r: dae_step(p, o, f, im, lb, r),
        (dae_params, tx.init(dae_params)),
        (fcn_params, images, labels),
        "DAE(stem1,d3)",
    )


if __name__ == "__main__":
    main()
